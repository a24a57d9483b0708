"""Pallas df32 kernel tests.

On the CPU suite the kernels run in INTERPRET mode, which executes the
kernel jaxpr through XLA CPU where the error-free-transform barriers are
dropped — accuracy floors at ~1e-9 (measured round 4), so these tests
check STRUCTURE and loose agreement only.  Exact (~1e-13) validation runs
on TPU hardware, where Mosaic does not reassociate float arithmetic:
the same tests tighten automatically when the backend is TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ON_TPU = jax.default_backend() == "tpu"
INTERP = not ON_TPU
TOL = 1e-11 if ON_TPU else 2e-6


def test_francis_kernel_full_solve():
    from starneig_tpu.ops.pallas_schur import small_schur_pallas

    n = 16
    rng = np.random.default_rng(0)
    H = np.triu(rng.standard_normal((n, n)), -1)
    S, Z, info = small_schur_pallas(
        jnp.asarray(H), jnp.eye(n, dtype=jnp.float64), n,
        float(np.finfo(np.float64).eps / 2 * np.linalg.norm(H)),
        interpret=INTERP)
    assert int(info) == 0
    S, Z = np.asarray(S), np.asarray(Z)
    # exact quasi-triangular structure (plants are exact in any mode)
    assert np.abs(np.tril(S, -2)).max() == 0.0
    sub = np.diagonal(S, -1)
    assert not np.any((sub[:-1] != 0) & (sub[1:] != 0))
    res = np.linalg.norm(Z @ S @ Z.T - H) / np.linalg.norm(H)
    orth = np.linalg.norm(Z @ Z.T - np.eye(n))
    assert res < TOL and orth < TOL, (res, orth)
    ev = np.sort_complex(np.linalg.eigvals(H))
    from starneig_tpu.ops.eigvals import extract_eigenvalues
    er, ei = extract_eigenvalues(jnp.asarray(S))
    got = np.sort_complex(np.asarray(er) + 1j * np.asarray(ei))
    assert np.max(np.abs(got - ev)) / np.max(np.abs(ev)) < 100 * TOL


def test_train_hop_kernel_matches_xla():
    from starneig_tpu.ops.schur import _train_hop
    from starneig_tpu.ops.pallas_schur import train_hops_pallas

    B = 3
    WC = 6 * B + 4
    HOP = 3 * B
    rng = np.random.default_rng(7)
    Wnd = np.triu(rng.standard_normal((WC, WC)), -1)
    l_rel = 3 * (B - 1) + 1
    ihi_rel = WC + 40
    sh = rng.standard_normal((B, 4))
    sh[:, 3] = -sh[:, 1]
    Wj, shj = jnp.asarray(Wnd), jnp.asarray(sh)
    W2x, Qwx = _train_hop(Wj, jnp.eye(WC, dtype=jnp.float64),
                          shj[:, 0], shj[:, 1], shj[:, 2], shj[:, 3],
                          jnp.int32(l_rel), jnp.int32(ihi_rel),
                          jnp.int32(0), B=B, WC=WC, HOP=HOP)
    W2p, Qwp = train_hops_pallas(Wj[None], shj[None],
                                 jnp.asarray([l_rel]),
                                 jnp.asarray([ihi_rel]), jnp.asarray([0]),
                                 B=B, HOP=HOP, interpret=INTERP)
    scale = float(np.abs(np.asarray(W2x)).max())
    assert np.abs(np.asarray(W2p[0]) - np.asarray(W2x)).max() / scale < TOL
    assert np.abs(np.asarray(Qwp[0]) - np.asarray(Qwx)).max() < TOL


def test_recondense_kernel_backward_residual():
    from starneig_tpu.ops.pallas_schur import aed_recondense_pallas

    WA = 40
    rng = np.random.default_rng(3)
    T = np.triu(rng.standard_normal((WA, WA)))
    Q, _ = np.linalg.qr(rng.standard_normal((WA, WA)))
    s, kbot = 0.37, 25
    To, Vo, b = aed_recondense_pallas(jnp.asarray(T), jnp.asarray(Q),
                                      jnp.float64(s), jnp.int32(kbot),
                                      interpret=INTERP)
    To, Vo = np.asarray(To), np.asarray(Vo)
    U = Q.T @ Vo
    res = np.linalg.norm(U.T @ T @ U - To) / np.linalg.norm(T)
    orth = np.linalg.norm(U.T @ U - np.eye(WA))
    assert res < TOL and orth < 10 * TOL, (res, orth)
    # spike condensed into beta * e1
    spm = s * Q[0, :].copy()
    spm[kbot:] = 0
    out = U.T @ spm
    assert abs(out[0] - float(b)) < 10 * TOL
    assert np.abs(out[1:kbot]).max() < 10 * TOL
    # Hessenberg structure of the reduced block is exact
    assert np.abs(np.tril(To[:kbot, :kbot], -2)).max() == 0.0


@pytest.mark.skipif(not ON_TPU, reason="deflate kernel's swap state machine "
                    "takes >5 min to compile through the interpret path on "
                    "XLA CPU; validated on hardware")
def test_deflate_kernel_matches_xla():
    from starneig_tpu.ops.schur import _aed_deflate
    from starneig_tpu.ops.pallas_schur import aed_deflate_pallas

    w = 40
    rng = np.random.default_rng(5)
    T = np.triu(rng.standard_normal((w, w)))
    for p in (6, 14, 30):
        T[p + 1, p] = -abs(rng.standard_normal())
        T[p, p + 1] = abs(rng.standard_normal())
    V, _ = np.linalg.qr(np.eye(w) + 0.05 * rng.standard_normal((w, w)))
    s, th = 0.8, 1e-13
    Tx, Vx, kx, fx = _aed_deflate(jnp.asarray(T), jnp.asarray(V), s, w, th)
    Tp, Vp, kp, fp = aed_deflate_pallas(jnp.asarray(T), jnp.asarray(V), s,
                                        w, th)
    assert int(kx) == int(kp)
    Tpn, Vpn = np.asarray(Tp), np.asarray(Vp)
    U = V.T @ Vpn
    res = np.linalg.norm(U.T @ T @ U - Tpn) / np.linalg.norm(T)
    orth = np.linalg.norm(U.T @ U - np.eye(w))
    assert res < TOL and orth < TOL, (res, orth)
    # deflated bottom blocks carry the same eigenvalues
    kx = int(kx)
    ex = np.sort_complex(np.linalg.eigvals(np.asarray(Tx)[kx:, kx:]))
    ep = np.sort_complex(np.linalg.eigvals(Tpn[kx:, kx:]))
    assert np.allclose(ex, ep, atol=1e-9)


def test_matvec_kernel():
    from starneig_tpu.ops.pallas_hess import split_panel_matrix, matvec_df

    n = 96
    rng = np.random.default_rng(5)
    A = rng.standard_normal((n, n))
    v = rng.standard_normal(n)
    Ahl = split_panel_matrix(jnp.asarray(A))
    u = np.asarray(matvec_df(*Ahl, jnp.asarray(v), interpret=INTERP))
    ref = A @ v
    assert np.abs(u - ref).max() / np.linalg.norm(ref) < TOL
