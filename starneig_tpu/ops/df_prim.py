"""df32 (double-float) ports of the scalar eigensolver primitives.

Mechanical ports of :mod:`starneig_tpu.ops.primitives` (dlarfg / dlartg /
dlanv2 / dlaqr1 / 2x2 eigenvalues) onto :class:`~starneig_tpu.ops.df32.Df`
values — the scalar substrate for Pallas TPU window kernels, where Mosaic
lowers no f64 (PLAN_r4.md).  Same select-chain structure as the f64
originals; branch predicates evaluate on hi components.
"""

from __future__ import annotations

import jax.numpy as jnp

from starneig_tpu.ops.df32 import (
    Df, dfw, dfabs, dfmax, dfmin, dfsqrt, dfsign, df_safe_div, dfhypot2)


def _zero():
    return Df(0.0)


def _one():
    return Df(1.0)


def df_givens(f, g):
    """Plane rotation zeroing g (dlartg): [c s; -s c] [f; g] = [r; 0]."""
    rmag = dfhypot2(f, g)
    r0 = dfsign(f) * rmag
    rsafe = dfw(r0.eq0(), _one(), r0)
    g0 = g.eq0()
    f0 = f.eq0()
    c = dfw(g0, _one(), dfw(f0, _zero(), f / rsafe))
    s = dfw(g0, _zero(), dfw(f0, _one(), g / rsafe))
    r = dfw(g0, f, dfw(f0, g, r0))
    return c, s, r


def df_householder3(x0, x1, x2, use3):
    """3-element Householder (dlarfg): (I - tau v v^T) x = beta e1, v0=1.

    ``use3`` masks the third element.  Returns (v1, v2, tau, beta).
    """
    x2 = dfw(use3, x2, _zero())
    m = dfmax(dfabs(x0), dfmax(dfabs(x1), dfabs(x2)))
    msafe = dfw(m.eq0(), _one(), m)
    a = x0 / msafe
    t1 = x1 / msafe
    t2 = x2 / msafe
    xnorm = dfsqrt(t1 * t1 + t2 * t2)
    beta = -dfsign(a) * dfhypot2(a, xnorm)
    degen = xnorm.eq0()
    tau = dfw(degen, _zero(), df_safe_div(beta - a, beta))
    scale = df_safe_div(_one(), a - beta)
    v1 = dfw(degen, _zero(), t1 * scale)
    v2 = dfw(degen, _zero(), t2 * scale)
    beta = dfw(degen, a, beta) * msafe
    return v1, v2, tau, beta


def df_eig2x2(a, b, c, d):
    """Eigenvalues of [[a,b],[c,d]] -> (re1, im1, re2, im2) as Df."""
    sc = dfabs(a) + dfabs(b) + dfabs(c) + dfabs(d)
    sc = dfw(sc.eq0(), _one(), sc)
    a, b, c, d = a / sc, b / sc, c / sc, d / sc
    p = Df(0.5) * (a - d)
    bc = b * c
    disc = p * p + bc
    sq = dfsqrt(dfabs(disc))
    real_case = disc.hi >= 0
    z = p + dfsign(p) * sq
    half_tr = Df(0.5) * (a + d)
    lam1_r = dfw(real_case, d + z, half_tr)
    lam2_r = dfw(real_case, dfw(z.eq0(), d, d - df_safe_div(bc, z)), half_tr)
    lam1_i = dfw(real_case, _zero(), sq)
    return lam1_r * sc, lam1_i * sc, lam2_r * sc, -(lam1_i * sc)


def df_standardize_2x2(a, b, c, d, eps32=float(2 ** -45)):
    """dlanv2: standardize a real 2x2 Schur block at df precision.

    Returns (aa, bb, cc, dd, cs, sn); eigenvalues follow from the block.
    ``eps32`` is the effective df epsilon used in the real/complex gate.
    """
    half = Df(0.5)
    temp0 = a - d
    p0 = half * temp0
    bcmax = dfmax(dfabs(b), dfabs(c))
    bcmis = dfmin(dfabs(b), dfabs(c)) * dfsign(b) * dfsign(c)
    scale = dfmax(dfabs(p0), bcmax)
    z0 = df_safe_div(p0, scale) * p0 + df_safe_div(bcmax, scale) * bcmis
    real_gen = z0.hi >= 4.0 * eps32

    # general / real branch
    zr = p0 + dfsign(p0) * dfsqrt(dfw(scale.hi >= 0, scale, _zero())) * \
        dfsqrt(dfw(z0.hi >= 0, z0, _zero()))
    a_r = d + zr
    d_r = d - df_safe_div(bcmax, zr) * bcmis
    tau_r = dfhypot2(c, zr)
    cs_r = df_safe_div(zr, tau_r)
    sn_r = df_safe_div(c, tau_r)
    b_r = b - c
    c_r = _zero()

    # general / complex-or-equal branch
    sigma = b + c
    tau_c = dfhypot2(sigma, temp0)
    cs_c = dfsqrt(half * (df_safe_div(dfabs(sigma), tau_c) + _one()))
    sn_c = -df_safe_div(p0, tau_c * cs_c) * dfsign(sigma)
    aa0 = a * cs_c + b * sn_c
    bb0 = -(a * sn_c) + b * cs_c
    cc0 = c * cs_c + d * sn_c
    dd0 = -(c * sn_c) + d * cs_c
    a1 = aa0 * cs_c + cc0 * sn_c
    b1 = bb0 * cs_c + dd0 * sn_c
    c1 = -(aa0 * sn_c) + cc0 * cs_c
    d1 = -(bb0 * sn_c) + dd0 * cs_c
    tmid = half * (a1 + d1)
    sab = dfsqrt(dfabs(b1))
    sac = dfsqrt(dfabs(c1))
    p1 = dfsign(c1) * sab * sac
    bc_sum = dfabs(b1 + c1)
    tau1 = df_safe_div(_one(), dfsqrt(dfmax(bc_sum, Df(1e-37))))
    a_i = tmid + p1
    d_i = tmid - p1
    b_i = b1 - c1
    c_i = _zero()
    cs1 = sab * tau1
    sn1 = sac * tau1
    cs_i = cs_c * cs1 - sn_c * sn1
    sn_i = cs_c * sn1 + sn_c * cs1
    b_ii = -c1
    cs_ii = -sn_c
    sn_ii = cs_c
    same_sign = dfsign(b1).hi == dfsign(c1).hi
    sub_i = c1.ne0() & b1.ne0() & same_sign
    sub_ii = c1.ne0() & b1.eq0()
    a_cx = dfw(sub_i, a_i, tmid)
    b_cx = dfw(sub_i, b_i, dfw(sub_ii, b_ii, b1))
    c_cx = dfw(sub_i, c_i, dfw(sub_ii, _zero(), c1))
    d_cx = dfw(sub_i, d_i, tmid)
    cs_cx = dfw(sub_i, cs_i, dfw(sub_ii, cs_ii, cs_c))
    sn_cx = dfw(sub_i, sn_i, dfw(sub_ii, sn_ii, sn_c))

    a_g = dfw(real_gen, a_r, a_cx)
    b_g = dfw(real_gen, b_r, b_cx)
    c_g = dfw(real_gen, c_r, c_cx)
    d_g = dfw(real_gen, d_r, d_cx)
    cs_g = dfw(real_gen, cs_r, cs_cx)
    sn_g = dfw(real_gen, sn_r, sn_cx)

    case1 = c.eq0()
    case2 = (~case1) & b.eq0()
    case3 = (~case1) & (~case2) & temp0.eq0() & \
        (dfsign(b).hi != dfsign(c).hi)

    aa_f = dfw(case1, a, dfw(case2, d, dfw(case3, a, a_g)))
    bb_f = dfw(case1, b, dfw(case2, -c, dfw(case3, b, b_g)))
    cc_f = dfw(case1, c, dfw(case2, _zero(), dfw(case3, c, c_g)))
    dd_f = dfw(case1, d, dfw(case2, a, dfw(case3, d, d_g)))
    cs_f = dfw(case1 | case3, _one(), dfw(case2, _zero(), cs_g))
    sn_f = dfw(case1 | case3, _zero(), dfw(case2, _one(), sn_g))
    dd_f = dfw(cc_f.eq0(), dd_f, aa_f)
    return aa_f, bb_f, cc_f, dd_f, cs_f, sn_f


def df_first_column_shifted(h, sr1, si1, sr2, si2, use3):
    """dlaqr1: first column of (H - s1)(H - s2); h is a 3x3 of Df scalars.

    Returns (v0, v1, v2) Df (v2 zero in the 2x2 case)."""
    (h11, h12, h13), (h21, h22, h23), (h31, h32, h33) = h
    s3 = dfabs(h11 - sr2) + dfabs(si2) + dfabs(h21) + dfabs(h31)
    h21s3 = df_safe_div(h21, s3)
    h31s3 = df_safe_div(h31, s3)
    v1_3 = (h11 - sr1) * df_safe_div(h11 - sr2, s3) - \
        si1 * df_safe_div(si2, s3) + h12 * h21s3 + h13 * h31s3
    v2_3 = h21s3 * (h11 + h22 - sr1 - sr2) + h23 * h31s3
    v3_3 = h31s3 * (h11 + h33 - sr1 - sr2) + h21s3 * h32

    s2 = dfabs(h11 - sr2) + dfabs(si2) + dfabs(h21)
    h21s2 = df_safe_div(h21, s2)
    v1_2 = h21s2 * h12 + (h11 - sr1) * df_safe_div(h11 - sr2, s2) - \
        si1 * df_safe_div(si2, s2)
    v2_2 = h21s2 * (h11 + h22 - sr1 - sr2)

    z = _zero()
    v0 = dfw(use3, dfw(s3.eq0(), z, v1_3), dfw(s2.eq0(), z, v1_2))
    v1 = dfw(use3, dfw(s3.eq0(), z, v2_3), dfw(s2.eq0(), z, v2_2))
    v2 = dfw(use3, dfw(s3.eq0(), z, v3_3), z)
    return v0, v1, v2
