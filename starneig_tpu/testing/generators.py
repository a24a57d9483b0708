"""Input-matrix generators, including the known-spectrum initializer.

Reference semantics (test driver initializers, SURVEY.md section 4):
  * ``default``/``random``: random dense matrix (test/common/init_schur.c).
  * ``known``: build a quasi-triangular Schur form with a *controlled
    eigenvalue distribution* (complex-pair ratio, zero-eigenvalue ratio and
    — for pencils — infinite-eigenvalue ratio), scramble it by a random
    orthogonal similarity, and keep the planted eigenvalues as supplementary
    data (reference: test/schur/experiment.c:219-413,
    test/common/init_schur.c:331-350, complex_distr.c:82-112).

Implemented with numpy on host — generation is test scaffolding, not the
compute path.
"""

from __future__ import annotations

import numpy as np


def _rng(seed):
    return np.random.default_rng(seed)


def random_dense(n: int, seed: int = 0, dtype=np.float64) -> np.ndarray:
    return _rng(seed).standard_normal((n, n)).astype(dtype)


def random_orthogonal(n: int, seed: int = 0, dtype=np.float64) -> np.ndarray:
    q, r = np.linalg.qr(_rng(seed).standard_normal((n, n)))
    return (q * np.sign(np.diag(r))).astype(dtype)


def random_hessenberg(n: int, seed: int = 0, dtype=np.float64) -> np.ndarray:
    a = random_dense(n, seed, dtype)
    return np.triu(a, -1)


def known_spectrum_matrix(
    n: int,
    complex_ratio: float = 0.5,
    zero_ratio: float = 0.0,
    seed: int = 0,
    dtype=np.float64,
    hessenberg: bool = False,
):
    """Dense matrix with a planted spectrum.

    Returns (A, eig) where eig is the complex eigenvalue array.  When
    ``hessenberg`` is True the scrambled matrix is reduced back to upper
    Hessenberg by numpy Householder so schur tests can start from H while the
    spectrum stays planted.
    """
    rng = _rng(seed)
    S = np.zeros((n, n), dtype)
    eig = np.zeros(n, complex)
    i = 0
    while i < n:
        make_pair = i + 1 < n and rng.random() < complex_ratio
        if make_pair:
            # standardized 2x2 block: [[p, b], [c, p]] with b*c < 0
            p = rng.standard_normal()
            b = np.abs(rng.standard_normal()) + 0.1
            c = -(np.abs(rng.standard_normal()) + 0.1)
            S[i, i] = p
            S[i + 1, i + 1] = p
            S[i, i + 1] = b
            S[i + 1, i] = c
            w = np.sqrt(-b * c)
            eig[i] = p + 1j * w
            eig[i + 1] = p - 1j * w
            i += 2
        else:
            lam = 0.0 if rng.random() < zero_ratio else rng.standard_normal()
            S[i, i] = lam
            eig[i] = lam
            i += 1
    # fill strict upper triangle (above the blocks); scaled by 1/sqrt(n) to
    # keep the departure from normality polynomial — an unscaled random
    # triangle makes eigenvalue condition numbers grow exponentially in n,
    # which would defeat eigenvalue-comparison oracles entirely
    upper = np.triu(rng.standard_normal((n, n)), 2) / np.sqrt(max(n, 2))
    S = S + upper.astype(dtype)
    Q0 = random_orthogonal(n, seed + 1, dtype)
    A = Q0 @ S @ Q0.T
    if hessenberg:
        A = _to_hessenberg(A)
    return A.astype(dtype), eig


def known_spectrum_pencil(
    n: int,
    complex_ratio: float = 0.5,
    zero_ratio: float = 0.0,
    inf_ratio: float = 0.0,
    seed: int = 0,
    dtype=np.float64,
):
    """Pencil (A, B) with a planted generalized spectrum.

    Builds (S, T) generalized Schur: S quasi-triangular, T upper triangular
    with zero diagonal entries planting infinite eigenvalues; scrambles with
    random orthogonal Q0, Z0: A = Q0 S Z0^T, B = Q0 T Z0^T.

    Returns (A, B, alpha, beta): eigenvalues are alpha/beta, beta==0 -> inf.
    """
    rng = _rng(seed)
    S = np.zeros((n, n), dtype)
    T = np.zeros((n, n), dtype)
    alpha = np.zeros(n, complex)
    beta = np.ones(n)
    i = 0
    while i < n:
        make_pair = i + 1 < n and rng.random() < complex_ratio
        if make_pair:
            p = rng.standard_normal()
            b = np.abs(rng.standard_normal()) + 0.1
            c = -(np.abs(rng.standard_normal()) + 0.1)
            S[i, i] = p
            S[i + 1, i + 1] = p
            S[i, i + 1] = b
            S[i + 1, i] = c
            T[i, i] = 1.0
            T[i + 1, i + 1] = 1.0
            w = np.sqrt(-b * c)
            alpha[i] = p + 1j * w
            alpha[i + 1] = p - 1j * w
            i += 2
        else:
            r = rng.random()
            if r < inf_ratio:
                S[i, i] = np.abs(rng.standard_normal()) + 0.5
                T[i, i] = 0.0
                alpha[i] = S[i, i]
                beta[i] = 0.0
            elif r < inf_ratio + zero_ratio:
                S[i, i] = 0.0
                T[i, i] = np.abs(rng.standard_normal()) + 0.5
                alpha[i] = 0.0
            else:
                S[i, i] = rng.standard_normal()
                T[i, i] = np.abs(rng.standard_normal()) + 0.5
                alpha[i] = S[i, i]
                beta[i] = T[i, i]
            i += 1
    scale = 1.0 / np.sqrt(max(n, 2))
    S = S + (np.triu(rng.standard_normal((n, n)), 2) * scale).astype(dtype)
    Tnoise = np.triu(rng.standard_normal((n, n)), 1) * scale
    # keep T exactly diagonal inside 2x2 S-blocks: a nonzero T[i, i+1] there
    # would change the planted pair eigenvalues
    for i in range(n - 1):
        if S[i + 1, i] != 0:
            Tnoise[i, i + 1] = 0.0
    T = T + Tnoise.astype(dtype)
    Q0 = random_orthogonal(n, seed + 1, dtype)
    Z0 = random_orthogonal(n, seed + 2, dtype)
    A = Q0 @ S @ Z0.T
    B = Q0 @ T @ Z0.T
    return A.astype(dtype), B.astype(dtype), alpha, beta


def _to_hessenberg(A: np.ndarray) -> np.ndarray:
    """Reduce to upper Hessenberg via host Householder (test scaffolding)."""
    import scipy.linalg

    return scipy.linalg.hessenberg(A)
