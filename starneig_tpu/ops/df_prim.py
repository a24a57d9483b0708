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


def df_solve4(A, b):
    """Solve a 4x4 Df system by unrolled Gauss-Jordan with partial
    pivoting (scalar port of ops/swaps.py:_solve4 — compare-swap chains
    stand in for argmax row pivoting)."""
    tiny = Df(float(2.0 ** -100))
    M = [[A[r][c] for c in range(4)] + [b[r]] for r in range(4)]
    for k in range(4):
        for r in range(k + 1, 4):
            swap = dfabs(M[r][k]).hi > dfabs(M[k][k]).hi
            for c in range(5):
                mk, mr = M[k][c], M[r][c]
                M[k][c] = dfw(swap, mr, mk)
                M[r][c] = dfw(swap, mk, mr)
        piv = dfw(M[k][k].eq0(), tiny, M[k][k])
        for r in range(4):
            if r == k:
                continue
            f = M[r][k] / piv
            for c in range(5):
                M[r][c] = M[r][c] - f * M[k][c]
    out = []
    for k in range(4):
        piv = dfw(M[k][k].eq0(), tiny, M[k][k])
        out.append(M[k][4] / piv)
    return out


def df_householder4(x, mask, pivot: int = 0):
    """4-element dlarfg on a list of Df scalars: (I - tau v v^T) x = beta e_p.

    ``mask[i]`` (bool, traced ok) activates element i; the pivot element is
    at static index ``pivot`` and assumed active.  Returns (v, tau, beta)
    with v[pivot] == 1, masked tail elements scaled, others zero.
    """
    xm = [dfw(mask[i], x[i], _zero()) for i in range(4)]
    a = xm[pivot]
    m = dfabs(xm[0])
    for i in range(1, 4):
        m = dfmax(m, dfabs(xm[i]))
    msafe = dfw(m.eq0(), _one(), m)
    t = [xi / msafe for xi in xm]
    tail = [t[i] for i in range(4) if i != pivot]
    xnorm = dfsqrt(tail[0] * tail[0] + tail[1] * tail[1]
                   + tail[2] * tail[2])
    al = t[pivot]
    beta = -dfsign(al) * dfhypot2(al, xnorm)
    degen = xnorm.eq0()
    tau = dfw(degen, _zero(), df_safe_div(beta - al, beta))
    scale = df_safe_div(_one(), al - beta)
    v = []
    for i in range(4):
        if i == pivot:
            v.append(_one())
        else:
            v.append(dfw(degen, _zero(), t[i] * scale))
    beta = dfw(degen, al, beta) * msafe
    return v, tau, beta


def _eye4():
    return [[_one() if r == c else _zero() for c in range(4)]
            for r in range(4)]


def _mat4_qtdq(Q, D):
    """Q^T D Q on 4x4 lists of Df."""
    QD = [[sum((Q[k][r] * D[k][c] for k in range(1, 4)),
               Q[0][r] * D[0][c]) for c in range(4)] for r in range(4)]
    return [[sum((QD[r][k] * Q[k][c] for k in range(1, 4)),
                 QD[r][0] * Q[0][c]) for c in range(4)] for r in range(4)]


def df_swap_adjacent(D, p, q, eps_hi=float(2.0 ** -40)):
    """Adjacent diagonal-block swap on a 4x4 Df block (dlaexc semantics).

    Scalar df32 port of ops/swaps.py:swap_adjacent for Pallas kernels:
    D is a 4x4 nested list of Df; p, q traced int32 block sizes in {1, 2}.
    Returns (Q 4x4 Df, Dh 4x4 Df, accept bool).  ``eps_hi`` is the df32
    acceptance epsilon (the f64 path uses 10*2^-52; df32 swap chains carry
    ~2^-42 worst-case error, tests/test_df32.py).
    """
    import numpy as _np

    both1 = (p == 1) & (q == 1)

    # ---- 1x1 <-> 1x1: exact rotation (always succeeds) ----
    t11, t12, t22 = D[0][0], D[0][1], D[1][1]
    cs, sn, _r = df_givens(t12, t22 - t11)
    Q11 = _eye4()
    Q11[0][0], Q11[1][0] = cs, sn
    Q11[0][1], Q11[1][1] = -sn, cs
    Dh11 = _mat4_qtdq(Q11, D)
    Dh11[0][0], Dh11[1][1] = t22, t11
    Dh11[1][0] = _zero()

    # ---- general (p*q > 1): Sylvester + Householder QR of [X; I] ----
    def at_pp(i, j):
        """D[p+i][p+j] with traced p in {1, 2}."""
        return dfw(p == 1, D[1 + i][1 + j], D[2 + i][2 + j])

    def at_0p(i, j):
        """D[i][p+j]."""
        return dfw(p == 1, D[i][1 + j], D[i][2 + j])

    T11 = [[dfw((i < p) & (j < p), D[i][j], _zero()) for j in range(2)]
           for i in range(2)]
    T22 = [[dfw((i < q) & (j < q), at_pp(i, j), _zero()) for j in range(2)]
           for i in range(2)]
    T12 = [[dfw((i < p) & (j < q), at_0p(i, j), _zero()) for j in range(2)]
           for i in range(2)]

    A = [[_zero() for _ in range(4)] for _ in range(4)]
    b = [_zero() for _ in range(4)]
    for k in range(4):
        i, j = k % 2, k // 2
        row = [_zero() for _ in range(4)]
        row[2 * j + 0] = row[2 * j + 0] + T11[i][0]
        row[2 * j + 1] = row[2 * j + 1] + T11[i][1]
        row[2 * 0 + i] = row[2 * 0 + i] - T22[0][j]
        row[2 * 1 + i] = row[2 * 1 + i] - T22[1][j]
        active = (i < p) & (j < q)
        for c in range(4):
            ident = _one() if c == k else _zero()
            A[k][c] = dfw(active, row[c], ident)
        b[k] = dfw(active, -T12[i][j], _zero())
    x = df_solve4(A, b)
    X = [[x[2 * j + i] for j in range(2)] for i in range(2)]  # X[i][j]

    # M = [X; I_q] packed into first p+q rows of 4x2
    import numpy as _np2
    ri = [_np2.int32(r) for r in range(4)]
    ci = [_np2.int32(c) for c in range(2)]
    M = [[_zero() for _ in range(2)] for _ in range(4)]
    for r in range(4):
        for c in range(2):
            xval = X[r][c] if r < 2 else _zero()
            inx = ri[r] < p                       # implies r < 2 (p <= 2)
            ineye = ((ri[r] - p) == ci[c]) & (ri[r] >= p) & (ci[c] < q)
            M[r][c] = dfw(inx, xval, _zero()) + dfw(ineye, _one(), _zero())

    d = p + q
    rmask = [ri[r] < d for r in range(4)]
    v1, tau1, _b1 = df_householder4([M[r][0] for r in range(4)], rmask, 0)
    w = [sum((v1[r] * M[r][c] for r in range(1, 4)), v1[0] * M[0][c])
         for c in range(2)]
    M1 = [[M[r][c] - tau1 * v1[r] * w[c] for c in range(2)]
          for r in range(4)]
    col2 = [_zero()] + [M1[r][1] for r in range(1, 4)]
    false_ = jnp.bool_(False)
    mask2 = [false_] + [rmask[r] for r in range(1, 4)]
    v2, tau2, _b2 = df_householder4(col2, mask2, 1)
    tau2 = dfw(q > 1, tau2, _zero())

    Q = _eye4()
    for v, tau in ((v1, tau1), (v2, tau2)):
        wq = [sum((v[r] * Q[r][c] for r in range(1, 4)), v[0] * Q[0][c])
              for c in range(4)]
        Q = [[Q[r][c] - tau * v[r] * wq[c] for c in range(4)]
             for r in range(4)]
    Q = [[Q[c][r] for c in range(4)] for r in range(4)]  # transpose: H1 H2

    Dh = _mat4_qtdq(Q, D)

    # acceptance: (2,1) block of the active d x d region negligible
    dnorm = _zero()
    err = _zero()
    for r in range(4):
        for c in range(4):
            act = (r < d) & (c < d)
            dnorm = dfmax(dnorm, dfw(act, dfabs(D[r][c]), _zero()))
            blk21 = act & (r >= q) & (c < q)
            err = dfmax(err, dfw(blk21, dfabs(Dh[r][c]), _zero()))
    accept_g = err.hi <= jnp.maximum(
        _np.float32(eps_hi) * dnorm.hi, _np.float32(2.0 ** -100))
    for r in range(4):
        for c in range(4):
            blk21 = (r < d) & (c < d) & (r >= q) & (c < q)
            Dh[r][c] = dfw(blk21, _zero(), Dh[r][c])

    # select the 1x1 or general result
    accept = jnp.where(both1, jnp.bool_(True), accept_g)
    Dh = [[dfw(both1, Dh11[r][c], Dh[r][c]) for c in range(4)]
          for r in range(4)]
    Q = [[dfw(both1, Q11[r][c], Q[r][c]) for c in range(4)]
         for r in range(4)]

    # standardize the two new blocks: upper now size q, lower size p
    def standardize_at(Dh, Q, off_is_0, off_q, active):
        """Standardize the 2x2 at offset (0 if off_is_0 else off_q)."""
        def ent(i, j):
            if off_is_0:
                return Dh[i][j]
            return dfw(off_q == 1, Dh[1 + i][1 + j], Dh[2 + i][2 + j])

        aa, bb, cc, dd, cs, sn = df_standardize_2x2(
            ent(0, 0), ent(0, 1), ent(1, 0), ent(1, 1))
        cs = dfw(active, cs, _one())
        sn = dfw(active, sn, _zero())

        # embed G^T at the (possibly traced) offset via per-entry selects
        def gval(r, c):
            base = _one() if r == c else _zero()
            if off_is_0:
                o = 0
                if r == o and c == o:
                    return cs
                if r == o + 1 and c == o:
                    return sn
                if r == o and c == o + 1:
                    return -sn
                if r == o + 1 and c == o + 1:
                    return cs
                return base
            v = base
            for o in (1, 2):
                here = off_q == o
                if r == o and c == o:
                    v = dfw(here, cs, v)
                elif r == o + 1 and c == o:
                    v = dfw(here, sn, v)
                elif r == o and c == o + 1:
                    v = dfw(here, -sn, v)
                elif r == o + 1 and c == o + 1:
                    v = dfw(here, cs, v)
            return v

        G = [[gval(r, c) for c in range(4)] for r in range(4)]
        Dh2 = _mat4_qtdq(G, Dh)
        new = [[aa, bb], [cc, dd]]

        def planted(r, c):
            v = Dh2[r][c]
            if off_is_0:
                if r < 2 and c < 2:
                    return dfw(active, new[r][c], v)
                return v
            for o in (1, 2):
                if o <= r <= o + 1 and o <= c <= o + 1:
                    v = dfw(active & (off_q == o), new[r - o][c - o], v)
            return v

        Dh2 = [[planted(r, c) for c in range(4)] for r in range(4)]
        Qn = [[sum((Q[r][k] * G[k][c] for k in range(1, 4)),
                   Q[r][0] * G[0][c]) for c in range(4)] for r in range(4)]
        return Dh2, Qn

    Dh, Q = standardize_at(Dh, Q, True, None, (q == 2) & accept)
    Dh, Q = standardize_at(Dh, Q, False, q, (p == 2) & accept)

    # rejected swap: leave everything untouched
    Dh = [[dfw(accept, Dh[r][c], D[r][c]) for c in range(4)]
          for r in range(4)]
    eye = _eye4()
    Q = [[dfw(accept, Q[r][c], eye[r][c]) for c in range(4)]
         for r in range(4)]
    return Q, Dh, accept


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
