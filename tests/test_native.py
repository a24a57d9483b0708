"""Native host window codelets (native/window_kernels.cpp) vs oracles.

The native library is the codelet backend for f64 window work (the
analogue of the reference's CPU codelets, src/schur/cpu_utils.c); these
tests gate it against numpy/LAPACK semantics the same way the JAX kernels
are gated.
"""

import numpy as np
import pytest

from starneig_tpu import native_kernels as nk

pytestmark = pytest.mark.skipif(not nk.available(),
                                reason="native codelets unavailable")

U = np.finfo(np.float64).eps / 2


def test_hseqr_residual_and_eigenvalues():
    rng = np.random.default_rng(0)
    for w in (8, 64, 150):
        H0 = np.triu(rng.standard_normal((w, w)), -1)
        H = H0.copy()
        Z = np.eye(w)
        info = nk.hseqr(H, Z, 0, w, U * np.linalg.norm(H0))
        assert info == 0
        res = np.linalg.norm(Z @ H @ Z.T - H0) / np.linalg.norm(H0) / U
        orth = np.linalg.norm(Z @ Z.T - np.eye(w)) / U
        assert res < 500, res
        assert orth < 2000, orth
        assert np.abs(np.tril(H, -2)).max() == 0.0
        er, ei = nk.eigvals(H)
        ev = np.sort_complex(er + 1j * ei)
        ev_ref = np.sort_complex(np.linalg.eigvals(H0))
        # forward eigenvalue error is amplified by condition numbers on a
        # random Hessenberg spectrum; the residual above is the stability
        # gate — this is only a sanity bound
        assert np.max(np.abs(ev - ev_ref)) / np.abs(ev_ref).max() / U < 1e6


def test_hseqr_partial_range():
    rng = np.random.default_rng(1)
    w = 40
    H0 = np.triu(rng.standard_normal((w, w)), -1)
    H0[20, 19] = 0.0  # decouples [0, 20) from [20, 40)
    H = H0.copy()
    Z = np.eye(w)
    assert nk.hseqr(H, Z, 20, w, 0.0) == 0
    # leading block untouched
    assert np.array_equal(H[:20, :20], H0[:20, :20])
    assert np.abs(np.tril(H[20:, 20:], -2)).max() == 0.0


def test_reorder_moves_selection_to_top():
    rng = np.random.default_rng(2)
    w = 100
    H = np.triu(rng.standard_normal((w, w)), -1)
    T = H.copy()
    Z = np.eye(w)
    nk.hseqr(T, Z, 0, w, 0.0)
    T0 = T.copy()
    Q = np.eye(w)
    er, ei = nk.eigvals(T)
    sel = (er > 0).astype(np.uint8)
    want = set(np.round(np.sort(er[sel.astype(bool)] + 1j * ei[sel.astype(bool)]), 6).tolist())
    fails = nk.reorder(T, Q, sel)
    assert fails == 0
    res = np.linalg.norm(Q @ T @ Q.T - T0) / np.linalg.norm(T0) / U
    orth = np.linalg.norm(Q @ Q.T - np.eye(w)) / U
    assert res < 2000 and orth < 2000
    er2, ei2 = nk.eigvals(T)
    nsel = int(sel.sum())
    assert (er2[:nsel] > 0).all()
    got = set(np.round(np.sort(er2[:nsel] + 1j * ei2[:nsel]), 6).tolist())
    assert got == want


def test_aed_invariants():
    rng = np.random.default_rng(3)
    w = 96
    H0 = np.triu(rng.standard_normal((w, w)), -1)
    s = 0.25
    T, V, kbot, sr, si, beta, info = nk.aed(H0, s, 1e-13)
    assert info == 0
    # similarity: T == V^T H0 V
    res = np.linalg.norm(V.T @ H0 @ V - T) / np.linalg.norm(H0) / U
    orth = np.linalg.norm(V @ V.T - np.eye(w)) / U
    assert res < 2000 and orth < 2000
    # leading kbot block is Hessenberg, trailing is quasi-triangular
    if kbot > 2:
        assert np.abs(np.tril(T[:kbot, :kbot], -2)).max() == 0.0
    assert len(sr) == kbot
    # deflated trailing spike entries are negligible: s*V[0, kbot:] tiny
    tail = np.abs(s * V[0, kbot:])
    assert (tail <= np.maximum(
        np.finfo(np.float64).eps *
        (np.abs(np.diagonal(T)[kbot:]) * 2 + np.abs(T).max()), 1e-12)).all()
