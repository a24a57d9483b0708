"""Eigenvectors from a real Schur form (SEP): overflow-guarded backsolve.

TPU-native rebuild of the reference standard eigenvector component
(``src/eigenvectors/standard/``, SURVEY.md section 2.5): for each selected
eigenvalue, solve (S - lambda I) y = 0 by backward substitution over the
quasi-triangular S, then backtransform X = Q Y as one GEMM.

Design: the reference tiles the backsolve into bound/solve/update tasks with
per-tile scaling factors (robust.h:185-381); here each eigenvector's
backward recurrence is one masked ``lax.fori_loop`` and all selected
eigenvectors run *simultaneously* via ``vmap`` — the per-step work becomes a
batched dot across the whole eigenvector block (VPU/MXU friendly), which is
the level-3 reformulation of the same algorithm.  Overflow protection:
small-denominator guards (smlnum floors, as in LAPACK dtrevc) plus periodic
rescaling of growing columns; vectors are normalized at the end.

Output convention (LAPACK/dtrevc style, matching the reference's
``starneig_SEP_SM_Eigenvectors`` sep_sm.h:229-527): one real column per real
eigenvalue; a selected complex pair contributes two consecutive columns
(real part, imaginary part) for the eigenvalue with positive imaginary part.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from starneig_tpu.config import EigenvectorsConf
from starneig_tpu.errors import Error


def _cdiv(ar, ai, br, bi, guard):
    """Complex division (ar+i*ai)/(br+i*bi), Smith's algorithm, guarded."""
    babs = jnp.abs(br) + jnp.abs(bi)
    scale = jnp.where(babs < guard, guard, 0.0)
    br = br + jnp.where(babs < guard, scale, 0.0)
    big = jnp.abs(br) >= jnp.abs(bi)
    # |br| >= |bi| branch
    r1 = bi / jnp.where(br == 0, 1.0, br)
    den1 = br + bi * r1
    den1 = jnp.where(den1 == 0, guard, den1)
    xr1 = (ar + ai * r1) / den1
    xi1 = (ai - ar * r1) / den1
    # |bi| > |br| branch
    r2 = br / jnp.where(bi == 0, 1.0, bi)
    den2 = bi + br * r2
    den2 = jnp.where(den2 == 0, guard, den2)
    xr2 = (ar * r2 + ai) / den2
    xi2 = (ai * r2 - ar) / den2
    return jnp.where(big, xr1, xr2), jnp.where(big, xi1, xi2)


@jax.jit
def _backsolve_all(S, lam_r, lam_i, pos, is_pair, valid):
    """Backward substitution for a batch of eigenvalues (vmapped).

    Args:
      S: (n, n) real Schur form.
      lam_r, lam_i: (m,) eigenvalues (lam_i > 0 for pairs).
      pos: (m,) block start positions.
      is_pair, valid: (m,) bool flags.

    Returns:
      (xr, xi): (m, n) real and imaginary parts of the (unnormalized then
      normalized) eigenvectors.
    """
    n = S.shape[0]
    dtype = S.dtype
    smlnum = jnp.finfo(dtype).tiny / jnp.finfo(dtype).eps
    sub = jnp.concatenate([jnp.diagonal(S, offset=-1), jnp.zeros((1,), dtype)])
    rows = jnp.arange(n)

    def one(lr, li, p, pair):
        # initial entries at the eigenvalue's own block
        xr = jnp.zeros(n, dtype)
        xi = jnp.zeros(n, dtype)
        b12 = S[p, jnp.minimum(p + 1, n - 1)]
        xr = xr.at[p].set(jnp.where(pair, b12, 1.0))
        xi = xi.at[jnp.minimum(p + 1, n - 1)].add(jnp.where(pair, li, 0.0))

        def step(t, carry):
            xr, xi = carry
            k = n - 2 - t
            in_range = (k >= 0) & (k < p)
            is_second = jnp.where(k >= 1, sub[jnp.maximum(k - 1, 0)] != 0, False)
            top2 = sub[jnp.maximum(k, 0)] != 0   # 2x2 block at (k, k+1)
            do_1 = in_range & ~is_second & ~top2
            do_2 = in_range & ~is_second & top2

            mask_k = (rows > k).astype(dtype)
            rhs_r = -jnp.dot(S[k] * mask_k, xr)
            rhs_i = -jnp.dot(S[k] * mask_k, xi)

            # --- 1x1: x[k] = rhs / (S[k,k] - lambda) ---
            vr, vi = _cdiv(rhs_r, rhs_i, S[k, k] - lr, -li, smlnum)
            xr = jnp.where(do_1, xr.at[k].set(vr), xr)
            xi = jnp.where(do_1, xi.at[k].set(vi), xi)

            # --- 2x2 block rows (k, k+1): solve the complex 2x2 system ---
            k1 = jnp.minimum(k + 1, n - 1)
            mask_k1 = (rows > k1).astype(dtype)
            rhs2_r = -jnp.dot(S[k1] * mask_k1, xr)
            rhs2_i = -jnp.dot(S[k1] * mask_k1, xi)
            m11r, m11i = S[k, k] - lr, -li
            m22r, m22i = S[k1, k1] - lr, -li
            m12 = S[k, k1]
            m21 = S[k1, k]
            # det = m11*m22 - m12*m21 (complex)
            detr = m11r * m22r - m11i * m22i - m12 * m21
            deti = m11r * m22i + m11i * m22r
            # x_k = (m22*r1 - m12*r2)/det ; x_k1 = (m11*r2 - m21*r1)/det
            n1r = m22r * rhs_r - m22i * rhs_i - m12 * rhs2_r
            n1i = m22r * rhs_i + m22i * rhs_r - m12 * rhs2_i
            n2r = m11r * rhs2_r - m11i * rhs2_i - m21 * rhs_r
            n2i = m11r * rhs2_i + m11i * rhs2_r - m21 * rhs_i
            w1r, w1i = _cdiv(n1r, n1i, detr, deti, smlnum)
            w2r, w2i = _cdiv(n2r, n2i, detr, deti, smlnum)
            xr = jnp.where(do_2, xr.at[k].set(w1r).at[k1].set(w2r), xr)
            xi = jnp.where(do_2, xi.at[k].set(w1i).at[k1].set(w2i), xi)

            # overflow guard: rescale runaway columns (normalized at the end)
            mx = jnp.maximum(jnp.max(jnp.abs(xr)), jnp.max(jnp.abs(xi)))
            fac = jnp.where(mx > 1e250, 1e-250, 1.0)
            return xr * fac, xi * fac

        xr, xi = lax.fori_loop(0, n - 1, step, (xr, xi))
        nrm = jnp.sqrt(jnp.sum(xr * xr) + jnp.sum(xi * xi))
        nrm = jnp.where(nrm == 0, 1.0, nrm)
        return xr / nrm, xi / nrm

    xr, xi = jax.vmap(one)(lam_r, lam_i, pos, is_pair)
    xr = jnp.where(valid[:, None], xr, 0.0)
    xi = jnp.where(valid[:, None], xi, 0.0)
    return xr, xi


@jax.jit
def _backtransform(Q, Y):
    return Q @ Y


def eigenvectors_schur(S, Q, select, conf: Optional[EigenvectorsConf] = None):
    """Eigenvectors of the matrix A = Q S Q^T for selected eigenvalues.

    Mirrors ``starneig_SEP_SM_Eigenvectors`` (reference: sep_sm.h:229-527).

    Args:
      S: (n, n) real Schur form.
      Q: (n, n) orthogonal matrix (A = Q S Q^T).
      select: (n,) bool array, 2x2 blocks selected atomically.

    Returns:
      (X, info): X is (n, ncols) with one column per selected real
      eigenvalue and (Re, Im) column pairs per selected complex pair.
    """
    S = jnp.asarray(S)
    Q = jnp.asarray(Q)
    n = S.shape[0]
    select = np.asarray(select, bool)
    sub = np.concatenate([np.asarray(jnp.diagonal(S, offset=-1)), [0.0]])
    diag = np.asarray(jnp.diagonal(S))
    sup = np.concatenate([np.asarray(jnp.diagonal(S, offset=1)), [0.0]])

    # collect selected blocks on host
    entries = []  # (pos, is_pair, lam_r, lam_i)
    i = 0
    while i < n:
        if sub[i] != 0:  # 2x2 block (i, i+1)
            if select[i] or select[i + 1]:
                lr = 0.5 * (diag[i] + diag[i + 1])
                li = np.sqrt(np.abs(sup[i])) * np.sqrt(np.abs(sub[i]))
                entries.append((i, True, lr, li))
            i += 2
        else:
            if select[i]:
                entries.append((i, False, diag[i], 0.0))
            i += 1

    ncols = sum(2 if e[1] else 1 for e in entries)
    if ncols == 0:
        return jnp.zeros((n, 0), S.dtype), Error.SUCCESS

    m = len(entries)
    mp = max(8, int(np.ceil(m / 8.0)) * 8)  # pad batch to bucketed size
    pos = np.zeros(mp, np.int32)
    is_pair = np.zeros(mp, bool)
    lam_r = np.zeros(mp)
    lam_i = np.zeros(mp)
    valid = np.zeros(mp, bool)
    for j, (p, pr, lr, li) in enumerate(entries):
        pos[j], is_pair[j], lam_r[j], lam_i[j], valid[j] = p, pr, lr, li, True

    xr, xi = _backsolve_all(S, jnp.asarray(lam_r), jnp.asarray(lam_i),
                            jnp.asarray(pos), jnp.asarray(is_pair),
                            jnp.asarray(valid))
    xr = np.asarray(xr)
    xi = np.asarray(xi)

    Y = np.zeros((n, ncols))
    c = 0
    for j, (p, pr, lr, li) in enumerate(entries):
        if pr:
            Y[:, c] = xr[j]
            Y[:, c + 1] = xi[j]
            c += 2
        else:
            Y[:, c] = xr[j]
            c += 1
    X = _backtransform(Q, jnp.asarray(Y))
    return X, Error.SUCCESS
