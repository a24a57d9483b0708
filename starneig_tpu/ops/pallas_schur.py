"""Pallas TPU kernels for the Schur solver's serial window work.

The fused Schur driver (ops/schur.py) is GEMM-rich everywhere except the
serial in-window steps: the AED window Francis iteration and the bulge
train hops.  Inside the XLA fused loop each serial step costs 58-210 us
(measured round 3, PLAN_r4.md); as a Pallas kernel with the whole window
resident in VMEM a step costs ~1-3 us.  These kernels implement that plan:

  * :func:`small_schur_pallas` — the ENTIRE Francis double-shift state
    machine (ops/small_schur.py, the dlahqr-equivalent recursion base;
    the reference runs the same role through LAPACK dhseqr and its own
    sequential kernel, ``src/schur/cpu_utils.c:2426``) as ONE
    ``pl.pallas_call``: deflation scan, Wilkinson/exceptional shifts,
    bulge-chase sweeps, 2x2 standardization — a flat one-step-per-
    iteration ``lax.while_loop`` over a (mode, i, k, ...) scalar carry.

Arithmetic is df32 (hi/lo f32 pairs, ~2^-47 effective precision — the
same float-float substrate the platform's own emulated f64 uses; Mosaic
lowers no f64).  Scalar algorithms come from :mod:`ops.df_prim`; array
updates use the row-band patterns Mosaic likes:

  * row ranges are ``pl.ds`` slices on the sublane dim (legal);
  * single columns are read by lane-mask reduction (no dynamic lane-dim
    slicing on TPU);
  * column updates run as lane-masked row-chunk passes restricted to the
    rows a Hessenberg/bulge structure can touch (rows <= k+3), which is
    what keeps a step near the ~1 us arithmetic bound instead of the
    29 us whole-array read-modify-write (PLAN_r4.md measurements).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starneig_tpu.ops.df32 import (
    Df, dfw, dfabs, df_from_f64, dfsqrt as dfsqrt_,
    dfhypot2 as dfhypot2_, df_safe_div as df_safe_div_)
from starneig_tpu.ops.df_prim import (
    df_householder3, df_eig2x2, df_standardize_2x2, df_first_column_shifted)

# effective df32 epsilon for negligibility tests: per-op df32 error is
# ~2^-48 typical / 2^-42 worst (tests/test_df32.py); 2^-46 converges and
# keeps the deflation-induced backward error at a few device-u.
# STARNEIG_DF_ULP_LOG2 overrides (accuracy/iteration-count tradeoff).
import os as _os
ULP = float(2.0 ** int(_os.environ.get("STARNEIG_DF_ULP_LOG2", "-46")))
# vigilant deflation inside the hop kernel (off with STARNEIG_VIGILANT=0)
VIGILANT = _os.environ.get("STARNEIG_VIGILANT", "1") != "0"
ITMAX_PER_BLOCK = 30    # exceptional-shift cadence 10, hard cap (LAPACK)
# row-chunk height for lane-masked column passes.  Round-5 hardware scan
# at W=384: CH=8 wins (8.6 ms vs 13.6 ms at CH=32 for a full 380-window
# solve) — active blocks are short (~12 rows typical), so most col_passes
# span 1-2 chunks and bigger chunks only waste VPU work.  Overridable.
_CH = int(_os.environ.get("STARNEIG_PALLAS_CH", "8"))
# chunk height for the Francis sweep's FULL-HEIGHT right update (rows
# [0, k+3] each step — the kernel's dominant volume); wider chunks cut the
# while-loop iteration count on the long pass
_CHR = int(_os.environ.get("STARNEIG_PALLAS_CHR", "32"))

# state-machine modes (flat while_loop: one scan OR one chase step/iter)
# np scalars: Python ints inside jnp.where recurse during weak-type
# promotion in x64-mode kernel traces; numpy scalars inline as literals
_SCAN, _INTRO, _CHASE = np.int32(0), np.int32(1), np.int32(2)
# f32 scalars for jnp.where branches (weak f64 literals crash Mosaic)
_F0, _F1 = np.float32(0.0), np.float32(1.0)


def _band(hi_ref, lo_ref, r0, rows: int):
    """(rows, W) Df band starting at dynamic row r0.

    Read ROW BY ROW: Mosaic supports unaligned dynamic multi-row vector
    loads only within a single 128-lane tile, but single dynamic rows
    work at any width (measured round 4) — per-row reads keep the kernel
    W-agnostic so the AED window can grow past 126.
    """
    his = [hi_ref[pl.ds(r0 + np.int32(j), 1), :] for j in range(rows)]
    los = [lo_ref[pl.ds(r0 + np.int32(j), 1), :] for j in range(rows)]
    return Df(jnp.concatenate(his, axis=0), jnp.concatenate(los, axis=0))


def _write_row(hi_ref, lo_ref, r, val):
    hi_ref[pl.ds(r, 1), :] = val.hi
    lo_ref[pl.ds(r, 1), :] = val.lo


def _lane_pick(band, lane, c):
    """Column c of a (r, W) Df band -> (r, 1) Df (lane-mask reduction)."""
    m = (lane == c).astype(jnp.float32)
    return Df(jnp.sum(band.hi * m, axis=1, keepdims=True),
              jnp.sum(band.lo * m, axis=1, keepdims=True))


def _at(col, j: int):
    """Static row j of an (r, 1) Df column -> scalar Df."""
    return Df(col.hi[j, 0], col.lo[j, 0])


def _row(band, j: int):
    """Static row j of an (r, W) Df band -> (1, W) Df."""
    return Df(band.hi[j:j + 1], band.lo[j:j + 1])


def _df_shifts(h11, h12, h21, h22, habs, its):
    """Wilkinson double shift from the trailing 2x2; exceptional every 10
    iterations (ops/small_schur.py:_shifts recast in df32)."""
    # its is capped at ITMAX_PER_BLOCK = 30; spelled-out comparisons stand
    # in for (its % 10 == 0) — the jnp mod operator recurses in x64-mode
    # Pallas kernel traces (weak-int promotion loop, PLAN_r4.md)
    exceptional = (its == 10) | (its == 20)
    e11 = Df(0.75) * habs + h22
    a = dfw(exceptional, e11, h11)
    b = dfw(exceptional, Df(-0.4375) * habs, h12)
    c = dfw(exceptional, habs, h21)
    d = dfw(exceptional, e11, h22)
    rt1r, rt1i, rt2r, rt2i = df_eig2x2(a, b, c, d)
    real_pair = rt1i.eq0()
    use1 = dfabs(h22 - rt1r).hi <= dfabs(h22 - rt2r).hi
    sr1 = dfw(real_pair, dfw(use1, rt1r, rt2r), rt1r)
    sr2 = dfw(real_pair, sr1, rt2r)
    si1 = dfw(real_pair, Df(0.0), rt1i)
    return sr1, si1, sr2, -si1


def _francis_kernel(iscal, fscal, Hhi, Hlo, Zthi, Ztlo,
                    Shi, Slo, Zohi, Zolo, info, lf_ref, sh_ref, *, W: int,
                    guard: bool = False):
    """The Francis state machine.  One flat while_loop; each iteration is
    a deflation SCAN (mode 0) or one bulge-chase step (modes 1/2).

    Buffers: S (the matrix, hi/lo pair) and Zt (the TRANSPOSED accumulation
    matrix: Z column updates become row-band updates, the cheap Mosaic
    orientation; the wrapper transposes at the boundary).  lf_ref/sh_ref
    are SMEM scratch carrying the scan's l_found and shift pair across the
    gated scan block (see loop_body).
    """
    import contextlib
    from starneig_tpu.ops import df32 as _df32
    ctx = contextlib.nullcontext() if guard else _df32.no_guard()
    with ctx:
        _francis_body(iscal, fscal, Hhi, Hlo, Zthi, Ztlo,
                      Shi, Slo, Zohi, Zolo, info, lf_ref, sh_ref, W=W)


def _francis_body(iscal, fscal, Hhi, Hlo, Zthi, Ztlo,
                  Shi, Slo, Zohi, Zolo, info, lf_ref, sh_ref, *, W: int):
    Shi[:] = Hhi[:]
    Slo[:] = Hlo[:]
    Zohi[:] = Zthi[:]
    Zolo[:] = Ztlo[:]

    m = iscal[0]
    ilo = iscal[1]
    maxiter = iscal[2]
    th = fscal[0]
    lf_ref[0] = ilo
    for _j in range(8):
        sh_ref[_j] = jnp.float32(0.0)

    lane = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    rows2 = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (W, W), 1)
    diag_mask = (rows2 == cols2).astype(jnp.float32)
    sub_mask = (rows2 == cols2 + 1).astype(jnp.float32)

    def col_pass(last_row, update_fn, first_row=None, ch: int = _CH):
        """Row-chunked pass over rows [first_row, last_row] (chunk-aligned;
        default first_row=0): update_fn(band)->band.

        ``first_row`` band-limiting is sound ONLY for single-pass uses
        whose upper rows are never re-read before an f64 rebuild (the 2x2
        rot_cols below; deflate/hop kernels) — NOT for the sweep's right
        update, where full-width left updates walk strictly-upper content
        ~2 rows down per sweep into future decisions (measured round 5:
        the residual degrades smoothly with any finite margin)."""
        chn = np.int32(ch)

        def body(c):
            # chunk starts are ch-aligned by construction; the hint lets
            # Mosaic prove it and emit one multi-row load at any W
            base = pl.multiple_of(c * chn, ch)
            Bb = Df(Shi[pl.ds(base, ch), :], Slo[pl.ds(base, ch), :])
            Bn = update_fn(Bb)
            Shi[pl.ds(base, ch), :] = Bn.hi
            Slo[pl.ds(base, ch), :] = Bn.lo
            return c + np.int32(1)

        c0 = jnp.int32(0) if first_row is None else \
            (jnp.maximum(first_row, 0) // chn).astype(jnp.int32)
        lax.while_loop(lambda c: c * chn <= last_row, body, c0)

    def loop_cond(st):
        return (st[1] >= ilo) & (st[5] == 0) & (st[4] < maxiter)

    def loop_body(st):
        (mode, i, k, its, total, failed,
         s1rh, s1rl, s1ih, s1il, s2rh, s2rl, s2ih, s2il) = st
        is_scan = mode == _SCAN
        in_sweep = mode != _SCAN
        sr1 = Df(s1rh, s1rl)
        si1 = Df(s1ih, s1il)
        sr2 = Df(s2rh, s2rl)
        si2 = Df(s2ih, s2il)

        # ---------------- SCAN (gated: chase steps skip it all) -----------
        # The whole deflation search, shift computation, and 2x2
        # standardize run only in scan mode; results cross into the
        # un-gated carry logic through SMEM scratch (lf_ref, sh_ref).
        # Chase iterations dominate the solve ~30:1, and the two (W, W)
        # masked reductions alone cost ~1 us/step at W=384 — gating them
        # is a large share of the round-5 per-step cut.
        @pl.when(is_scan)
        def _():
            Hh = Shi[:]
            dh = jnp.sum(Hh * diag_mask, axis=0, keepdims=True)  # H[c,c]
            subh = jnp.sum(Hh * sub_mask, axis=0, keepdims=True)  # H[c+1,c]
            dnext = pltpu.roll(dh, np.int32(W - 1), 1)           # d[c+1]
            tst = jnp.abs(dh) + jnp.abs(dnext)
            neg = jnp.abs(subh) <= jnp.maximum(ULP * tst, th)
            cand = neg & (lane + 1 > ilo) & (lane + 1 <= i)
            lf = jnp.max(jnp.where(cand, lane + 1, ilo)).astype(jnp.int32)
            lf_ref[0] = lf

            @pl.when(lf > ilo)
            def _():
                r = _band(Shi, Slo, lf, 1)
                mz = lane == (lf - 1)
                _write_row(Shi, Slo, lf,
                           Df(jnp.where(mz, _F0, r.hi),
                              jnp.where(mz, _F0, r.lo)))

            # ---- scalar reads for shifts / 2x2 standardize (rows i-1, i)
            isafe = jnp.maximum(i, 1)
            T2 = _band(Shi, Slo, isafe - 1, 2)
            cm2 = _lane_pick(T2, lane, jnp.maximum(isafe - 2, 0))
            cm1 = _lane_pick(T2, lane, isafe - 1)
            cc0 = _lane_pick(T2, lane, isafe)
            h11, h21 = _at(cm1, 0), _at(cm1, 1)
            h12, h22 = _at(cc0, 0), _at(cc0, 1)
            him2 = _at(cm2, 0)

            habs = dfabs(h21) + dfabs(him2)
            nsr1, nsi1, nsr2, nsi2 = _df_shifts(h11, h12, h21, h22, habs,
                                                its)
            sh_ref[0] = nsr1.hi
            sh_ref[1] = nsr1.lo
            sh_ref[2] = nsi1.hi
            sh_ref[3] = nsi1.lo
            sh_ref[4] = nsr2.hi
            sh_ref[5] = nsr2.lo
            sh_ref[6] = nsi2.hi
            sh_ref[7] = nsi2.lo

            # ------------ 2x2 deflation (standardize, rotate) ------------
            @pl.when((lf == i - 1) & (i >= 1))
            def _():
                aa, bb, cc2, dd, cs, sn = df_standardize_2x2(
                    h11, h12, h21, h22)
                # rows first (full width), then columns (they see the new
                # rows), then plant the exact standardized block — the
                # ordering of ops/small_schur.py:_deflate_block
                r0, r1 = _row(T2, 0), _row(T2, 1)
                _write_row(Shi, Slo, isafe - 1, cs * r0 + sn * r1)
                _write_row(Shi, Slo, isafe, cs * r1 - sn * r0)

                m0 = lane == isafe - 1
                m1 = lane == isafe

                def rot_cols(Bb):
                    b0 = _lane_pick(Bb, lane, isafe - 1)
                    b1 = _lane_pick(Bb, lane, isafe)
                    n0 = cs * b0 + sn * b1
                    n1 = cs * b1 - sn * b0
                    return Df(
                        jnp.where(m0, n0.hi, jnp.where(m1, n1.hi, Bb.hi)),
                        jnp.where(m0, n0.lo, jnp.where(m1, n1.lo, Bb.lo)))

                # band-limit IS sound here (single pass: cols i-1, i leave
                # the active block and are never re-read in-kernel; the
                # wrapper rebuilds rows < i-3 of them in f64)
                col_pass(i, rot_cols)

                B2 = _band(Shi, Slo, isafe - 1, 2)
                top = _row(B2, 0)
                bot = _row(B2, 1)
                top_h = jnp.where(m0, aa.hi, jnp.where(m1, bb.hi, top.hi))
                top_l = jnp.where(m0, aa.lo, jnp.where(m1, bb.lo, top.lo))
                bot_h = jnp.where(m0, cc2.hi, jnp.where(m1, dd.hi, bot.hi))
                bot_l = jnp.where(m0, cc2.lo, jnp.where(m1, dd.lo, bot.lo))
                _write_row(Shi, Slo, isafe - 1, Df(top_h, top_l))
                _write_row(Shi, Slo, isafe, Df(bot_h, bot_l))

                Zb = _band(Zohi, Zolo, isafe - 1, 2)
                z0, z1 = _row(Zb, 0), _row(Zb, 1)
                _write_row(Zohi, Zolo, isafe - 1, cs * z0 + sn * z1)
                _write_row(Zohi, Zolo, isafe, cs * z1 - sn * z0)

        l_found = lf_ref[0]
        defl1 = is_scan & (l_found == i)
        defl2 = is_scan & (l_found == i - 1) & (i >= 1)
        start_sweep = is_scan & (l_found < i - 1)

        sr1 = dfw(start_sweep, Df(sh_ref[0], sh_ref[1]), sr1)
        si1 = dfw(start_sweep, Df(sh_ref[2], sh_ref[3]), si1)
        sr2 = dfw(start_sweep, Df(sh_ref[4], sh_ref[5]), sr2)
        si2 = dfw(start_sweep, Df(sh_ref[6], sh_ref[7]), si2)

        # ---------------- SWEEP: one chase step at column k ---------------
        @pl.when(in_sweep)
        def _():
            use3 = k <= i - 2
            intro = mode == _INTRO
            R = _band(Shi, Slo, k, 3)
            xm1 = _lane_pick(R, lane, k - 1)
            c0 = _lane_pick(R, lane, k)
            c1 = _lane_pick(R, lane, k + 1)
            c2 = _lane_pick(R, lane, k + 2)
            hblk = ((_at(c0, 0), _at(c1, 0), _at(c2, 0)),
                    (_at(c0, 1), _at(c1, 1), _at(c2, 1)),
                    (_at(c0, 2), _at(c1, 2), _at(c2, 2)))
            vi0, vi1, vi2 = df_first_column_shifted(
                hblk, sr1, si1, sr2, si2, use3)
            x0 = dfw(intro, vi0, _at(xm1, 0))
            x1 = dfw(intro, vi1, _at(xm1, 1))
            x2 = dfw(intro, vi2, dfw(use3, _at(xm1, 2), Df(0.0)))
            v1, v2, tau, beta = df_householder3(x0, x1, x2, use3)

            # left update on rows k..k+2 (full width)
            r0, r1, r2 = _row(R, 0), _row(R, 1), _row(R, 2)
            wl = r0 + v1 * r1 + v2 * r2
            tw = tau * wl
            r0n = r0 - tw
            r1n = r1 - v1 * tw
            r2n = r2 - v2 * tw
            # plant the exact chase column (chase steps only)
            pm = (lane == k - 1) & ~intro
            r0n = Df(jnp.where(pm, beta.hi, r0n.hi),
                     jnp.where(pm, beta.lo, r0n.lo))
            r1n = Df(jnp.where(pm, _F0, r1n.hi), jnp.where(pm, _F0, r1n.lo))
            pm3 = pm & use3
            r2n = Df(jnp.where(pm3, _F0, r2n.hi), jnp.where(pm3, _F0, r2n.lo))
            _write_row(Shi, Slo, k, r0n)
            _write_row(Shi, Slo, k + 1, r1n)
            _write_row(Shi, Slo, k + 2, r2n)

            # right update on rows 0..k+3 (columns k..k+2, lane-masked)
            vl_h = (jnp.where(lane == k, _F1, _F0)
                    + jnp.where(lane == k + 1, v1.hi, _F0)
                    + jnp.where(lane == k + 2, v2.hi, _F0))
            vl_l = (jnp.where(lane == k + 1, v1.lo, _F0)
                    + jnp.where(lane == k + 2, v2.lo, _F0))
            vlane = Df(vl_h, vl_l)

            def right_update(Bb):
                b0 = _lane_pick(Bb, lane, k)
                b1 = _lane_pick(Bb, lane, k + 1)
                b2 = _lane_pick(Bb, lane, k + 2)
                wch = b0 + v1 * b1 + v2 * b2
                return Bb - (tau * wch) * vlane

            # Full-height pass — band-limiting here is UNSOUND (see
            # col_pass docstring); _CHR trades loop iterations for chunk
            # width on the long pass
            col_pass(k + 3, right_update, ch=_CHR)

            # Zt rows k..k+2 (Z columns k..k+2)
            Zb = _band(Zohi, Zolo, k, 3)
            z0, z1, z2 = _row(Zb, 0), _row(Zb, 1), _row(Zb, 2)
            wz = z0 + v1 * z1 + v2 * z2
            twz = tau * wz
            _write_row(Zohi, Zolo, k, z0 - twz)
            _write_row(Zohi, Zolo, k + 1, z1 - v1 * twz)
            _write_row(Zohi, Zolo, k + 2, z2 - v2 * twz)

        # ---------------- carry updates -----------------------------------
        sweep_done = in_sweep & (k + 1 > i - 1)
        new_mode = jnp.where(is_scan,
                             jnp.where(start_sweep, _INTRO, _SCAN),
                             jnp.where(sweep_done, _SCAN, _CHASE))
        new_i = jnp.where(defl1, i - 1, jnp.where(defl2, i - 2, i))
        new_k = jnp.where(start_sweep, l_found,
                          jnp.where(in_sweep, k + 1, k))
        new_its = jnp.where(defl1 | defl2, np.int32(0),
                            jnp.where(sweep_done, its + 1, its))
        new_total = total + (defl1 | defl2 | sweep_done).astype(jnp.int32)
        new_failed = jnp.where(sweep_done & (its + 1 >= ITMAX_PER_BLOCK),
                               np.int32(1), failed)
        return (new_mode.astype(jnp.int32), new_i.astype(jnp.int32),
                new_k.astype(jnp.int32), new_its.astype(jnp.int32),
                new_total, new_failed,
                sr1.hi, sr1.lo, si1.hi, si1.lo,
                sr2.hi, sr2.lo, si2.hi, si2.lo)

    z32 = jnp.int32(0)
    zf = jnp.float32(0.0)
    st = (z32, (m - 1).astype(jnp.int32), z32, z32, z32, z32,
          zf, zf, zf, zf, zf, zf, zf, zf)
    st = lax.while_loop(loop_cond, loop_body, st)
    info[0] = jnp.where(st[5] != 0, st[1] + 1,
                    np.int32(0)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _francis_call(iscal, fscal, Hhi, Hlo, Zthi, Ztlo, W: int,
                  interpret: bool = False):
    out_shape = (
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    return pl.pallas_call(
        functools.partial(_francis_kernel, W=W, guard=interpret),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((8,), jnp.float32)],
        interpret=interpret,
    )(iscal, fscal, Hhi, Hlo, Zthi, Ztlo)


def small_schur_pallas(H, Z, m, thresh=0.0, ilo=0, max_total_iter=0,
                       interpret: bool = False):
    """Drop-in Pallas/df32 implementation of :func:`ops.small_schur.small_schur`.

    H, Z are (w, w) f64 arrays (JAX emulated f64 on TPU); m the dynamic
    active size; thresh the absolute deflation floor.  Returns (S, Z, info)
    with identical semantics.

    Round-5 structure: the kernel runs BAND-LIMITED (right updates confined
    to rows [k-1, k+3]; see ``col_pass``) with a pure-identity internal
    accumulator, so its S output is only trustworthy on the |r-c| <= 1 band
    (diag, subdiag — with the exact planted deflation zeros and
    standardized 2x2 blocks — and superdiag).  The wrapper rebuilds the
    strict upper triangle exactly: Newton-orthonormalize the kernel's Q
    (f64 GEMMs are ~0.3u-exact on this chip; the df32 accumulation defect
    ~1e-11 squares to negligible), recompute S = Q^T H Q in f64, and merge
    {strict lower: 0, band: kernel, strict upper: recompute}.  This is
    both ~15x faster at W=384 (0.5 vs 7.5 us/step) and MORE accurate than
    the round-4 full in-kernel update (strict upper is now f64-exact).
    """
    H = jnp.asarray(H)
    Z = jnp.asarray(Z)
    w = H.shape[0]
    dtype = H.dtype
    # the kernel is W-agnostic (per-row band reads + aligned chunk loads);
    # the buffer snaps to the smallest 128-lane-multiple tier with 2 guard
    # rows (the 3-row chase band may touch row m)
    W = 128 if w + 2 <= 128 else (256 if w + 2 <= 256 else 384)
    if w + 2 > W:
        raise ValueError(f"small_schur_pallas window {w} > {W - 2}")
    if max_total_iter == 0:
        max_total_iter = 30 * w
    Hp = jnp.zeros((W, W), dtype).at[:w, :w].set(H)
    Ztp = jnp.eye(W, dtype=dtype)
    Hhi, Hlo = df_from_f64(Hp)
    Zthi, Ztlo = df_from_f64(Ztp)
    iscal = jnp.stack([jnp.asarray(m), jnp.asarray(ilo),
                       jnp.asarray(max_total_iter)]).astype(jnp.int32)
    thf = jnp.asarray(thresh, dtype).astype(jnp.float32)
    fscal = jnp.stack([thf, jnp.float32(0.0)])
    Shi, Slo, Zohi, Zolo, info = _francis_call(
        iscal, fscal, Hhi, Hlo, Zthi, Ztlo, W=W, interpret=interpret)
    Sk = (Shi.astype(dtype) + Slo.astype(dtype))[:w, :w]
    Qk = jnp.swapaxes(Zohi.astype(dtype) + Zolo.astype(dtype), 0, 1)[:w, :w]
    # Newton re-orthonormalization + exact-similarity recompute (f64)
    Qc = Qk @ (1.5 * jnp.eye(w, dtype=dtype) - 0.5 * (Qk.T @ Qk))
    Srec = Qc.T @ H @ Qc
    r = jnp.arange(w)
    dr = r[None, :] - r[:, None]                    # col - row
    S = jnp.where(dr >= 2, Srec, jnp.where(jnp.abs(dr) <= 1, Sk, 0.0))
    return S, Z @ Qc, info[0]


# ---------------------------------------------------------------------------
# Bulge-train hop kernel: HOP in-window chase steps for G staggered trains
# (the serial body of ops/schur.py:_train_hop / _sweep_wave, reference
# pipelined window chains schur/core.c:563-782).  One grid step per train.
#
# Representation trick: every per-bulge scalar lives EXPANDED — copied to
# all three rows of its bulge triple (sublane orientation, (3B, 1)) or all
# three lanes (lane orientation, (1, W)).  Expansions/reductions are static
# pltpu.roll + j-phase masks; the sublane<->lane transfer is one masked
# (3B, W) reduction (exact: one term per lane).  No transposes, no strided
# slices, no dynamic lane addressing.
# ---------------------------------------------------------------------------


def _spread3(A, jphase, axis: int):
    """Given A nonzero only at phase-0 positions of each 3-group along
    ``axis``, return A copied to all three phases (static rolls)."""
    size = A.hi.shape[axis]
    r1 = functools.partial(pltpu.roll, shift=np.int32(1), axis=axis)
    r2 = functools.partial(pltpu.roll, shift=np.int32(2), axis=axis)
    return Df(A.hi + r1(A.hi) + r2(A.hi), A.lo + r1(A.lo) + r2(A.lo))


def _phase_sum3(P, jphase, axis: int):
    """Per-3-group sums of P along ``axis``, left at phase-0 positions.

    jphase is the int32 phase array (broadcastable to P's shape)."""
    size = P.hi.shape[axis]

    def sel(j):
        m = jphase == j
        return Df(jnp.where(m, P.hi, _F0), jnp.where(m, P.lo, _F0))

    def rback(A, j):
        sh = np.int32(size - j)  # roll by -j
        return Df(pltpu.roll(A.hi, sh, axis), pltpu.roll(A.lo, sh, axis))

    s = sel(0) + rback(sel(1), 1) + rback(sel(2), 2)
    return s


def _train_hops_kernel(lrel_s, ihir_s, s0_s, th_s, shr_hi, shr_lo, Whi, Wlo,
                       Ohi, Olo, Qthi, Qtlo, *, W: int, B: int, HOP: int,
                       guard: bool = False):
    import contextlib
    from starneig_tpu.ops import df32 as _df32
    ctx = contextlib.nullcontext() if guard else _df32.no_guard()
    with ctx:
        _train_hops_body(lrel_s, ihir_s, s0_s, th_s, shr_hi, shr_lo, Whi,
                         Wlo, Ohi, Olo, Qthi, Qtlo, W=W, B=B, HOP=HOP)


def _train_hops_body(lrel_s, ihir_s, s0_s, th_s, shr_hi, shr_lo, Whi, Wlo,
                     Ohi, Olo, Qthi, Qtlo, *, W: int, B: int, HOP: int):
    """One train's HOP chase steps.  Refs: shr_* (B, 4) REVERSED shifts
    (sublane b <-> row-triple b of the train block); O (window, in/out via
    copy-in), Qt (the TRANSPOSED accumulated window transform)."""
    g = pl.program_id(0)
    Ohi[:] = Whi[:]
    Olo[:] = Wlo[:]
    rows2 = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (W, W), 1)
    Qthi[:] = (rows2 == cols2).astype(jnp.float32)
    Qtlo[:] = jnp.zeros((W, W), jnp.float32)

    l_rel = lrel_s[g]
    ihi_rel = ihir_s[g]
    s0 = s0_s[g]
    th = th_s[0]

    lane = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    sub3 = lax.broadcasted_iota(jnp.int32, (3 * B, 1), 0)
    rq = sub3 // np.int32(3)        # triple index per train-block row
    jq = sub3 - np.int32(3) * rq    # phase within the triple
    lane3 = lax.broadcasted_iota(jnp.int32, (3 * B, W), 1)

    # shift rows arrive pre-REVERSED (triple q holds bulge B-1-q) and
    # pre-EXPANDED to (3B, 4) by the wrapper (pltpu.repeat is tile-order,
    # not element-repeat — expansion is an XLA-side jnp.repeat instead)
    sr1e = Df(shr_hi[:, 0:1], shr_lo[:, 0:1])
    si1e = Df(shr_hi[:, 1:2], shr_lo[:, 1:2])
    sr2e = Df(shr_hi[:, 2:3], shr_lo[:, 2:3])
    si2e = Df(shr_hi[:, 3:4], shr_lo[:, 3:4])

    # NB: a fori_loop's i64 induction variable is unusable in-kernel under
    # x64 (PLAN_r4.md) — run a while_loop over an explicit int32 counter
    def step(cnt):
        s = s0 + cnt
        lo = l_rel + s - np.int32(3 * (B - 1))
        # spelled-out clip: jnp.clip's weak-int min recurses in x64 traces
        loc = jnp.minimum(jnp.maximum(lo, np.int32(1)),
                          np.int32(W - 3 * B))

        TB = _band(Ohi, Olo, loc, 3 * B)

        # per-row gathers: element of row r at its triple's column kq+dc
        kq = lo + np.int32(3) * rq                       # (3B, 1)
        def gather(dc):
            m = (lane3 == kq + np.int32(dc)).astype(jnp.float32)
            return Df(jnp.sum(TB.hi * m, axis=1, keepdims=True),
                      jnp.sum(TB.lo * m, axis=1, keepdims=True))

        gm1 = gather(-1)
        g0 = gather(0)
        g1 = gather(1)
        g2 = gather(2)

        def phases(gv):
            """Split a per-row gather into 3 expanded phase vectors."""
            out = []
            for j in range(3):
                m = jq == j
                A = Df(jnp.where(m, gv.hi, _F0), jnp.where(m, gv.lo, _F0))
                sh = np.int32((3 * B - j) % (3 * B))
                A = Df(pltpu.roll(A.hi, sh, 0), pltpu.roll(A.lo, sh, 0))
                out.append(_spread3(A, jq, 0))
            return out

        x0c, x1c, x2c = phases(gm1)
        h00, h10, h20 = phases(g0)
        h01, h11, h21 = phases(g1)
        h02, h12, h22 = phases(g2)

        active = (kq >= l_rel) & (kq <= ihi_rel - 2)
        intro = active & (kq == l_rel)
        use3 = kq <= ihi_rel - 3

        # vigilant deflation (reference starneig_check_deflations,
        # cpu_utils.c:1060, used mid-sweep at 1309-1434): a bulge whose
        # whole chase column went negligible has converged early — plant
        # the exact zeros (a new deflation boundary the driver's next scan
        # will find) and REINTRODUCE the shift pair right here
        col_mag = jnp.maximum(jnp.abs(x0c.hi),
                              jnp.maximum(jnp.abs(x1c.hi),
                                          jnp.abs(x2c.hi)))
        tst_v = jnp.abs(h00.hi) + jnp.abs(h11.hi)
        vigil = active & (~intro) & np.bool_(VIGILANT) & \
            (col_mag <= jnp.maximum(np.float32(ULP) * tst_v, th))
        as_intro = intro | vigil

        vi0, vi1, vi2 = df_first_column_shifted(
            ((h00, h01, h02), (h10, h11, h12), (h20, h21, h22)),
            sr1e, si1e, sr2e, si2e, use3)
        x0 = dfw(as_intro, vi0, x0c)
        x1 = dfw(as_intro, vi1, x1c)
        x2 = dfw(as_intro, vi2, dfw(use3, x2c, Df(0.0)))
        v1, v2, tau, beta = df_householder3(x0, x1, x2, use3)
        tau = dfw(active, tau, Df(0.0))

        one = Df(1.0)
        Vexp = dfw(jq == 0, one, dfw(jq == 1, v1, v2))   # (3B, 1)

        # ---- left update on the train block ----
        P = TB * Vexp
        w_at0 = _phase_sum3(P, jq, 0)
        w_exp = _spread3(w_at0, jq, 0)
        TBn = TB - (tau * Vexp) * w_exp

        # ---- exact chase-column plant (between left and right) ----
        # chase steps plant beta + zeros; vigilant collapses plant ALL
        # zeros (the deflated boundary)
        fix = active & ~intro
        pm = (lane3 == kq - 1) & fix
        bh = jnp.where(vigil, _F0, beta.hi)
        bl = jnp.where(vigil, _F0, beta.lo)
        TBn = Df(jnp.where(pm & (jq == 0), bh,
                           jnp.where(pm & ((jq == 1) | (use3 & (jq == 2))),
                                     _F0, TBn.hi)),
                 jnp.where(pm & (jq == 0), bl,
                           jnp.where(pm & ((jq == 1) | (use3 & (jq == 2))),
                                     _F0, TBn.lo)))
        Ohi[pl.ds(loc, 3 * B), :] = TBn.hi
        Olo[pl.ds(loc, 3 * B), :] = TBn.lo

        # ---- sublane -> lane transfer of v and tau (exact: 1 term/lane) ----
        tmap = (lane3 == lo + sub3).astype(jnp.float32)

        def to_lane(x):
            return Df(jnp.sum(x.hi * tmap, axis=0, keepdims=True),
                      jnp.sum(x.lo * tmap, axis=0, keepdims=True))

        Vlane = to_lane(Vexp)
        taulane = to_lane(tau)
        jl_raw = lane - lo
        inr = (jl_raw >= 0) & (jl_raw < np.int32(3 * B))
        ql = jnp.where(inr, jl_raw, np.int32(0)) // np.int32(3)
        jl = jnp.where(inr, jl_raw - np.int32(3) * ql, np.int32(3))

        # ---- right update on rows [0, lo + 3B + 1] (col-masked chunks) ----
        rmax = lo + np.int32(3 * B + 1)

        def rbody(c):
            base = c * _CH
            Bb = _band(Ohi, Olo, base, _CH)
            P2 = Bb * Vlane
            s_at0 = _phase_sum3(P2, jl, 1)
            w2 = _spread3(s_at0, jl, 1)
            D = (taulane * w2) * Vlane
            Bn2 = Bb - D
            Bn = Df(jnp.where(inr, Bn2.hi, Bb.hi),
                    jnp.where(inr, Bn2.lo, Bb.lo))
            Ohi[pl.ds(base, _CH), :] = Bn.hi
            Olo[pl.ds(base, _CH), :] = Bn.lo
            return c + np.int32(1)

        lax.while_loop(lambda c: c * _CH <= rmax, rbody, jnp.int32(0))

        # ---- Qt rows [lo, lo+3B) (window transform columns) ----
        Qb = _band(Qthi, Qtlo, loc, 3 * B)
        Pq = Qb * Vexp
        wq = _spread3(_phase_sum3(Pq, jq, 0), jq, 0)
        Qbn = Qb - (tau * Vexp) * wq
        Qthi[pl.ds(loc, 3 * B), :] = Qbn.hi
        Qtlo[pl.ds(loc, 3 * B), :] = Qbn.lo
        return cnt + np.int32(1)

    lax.while_loop(lambda c: c < np.int32(HOP), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("B", "HOP", "W", "interpret"))
def _train_hops_call(lrels, ihirs, s0s, ths, shr_hi, shr_lo, Whi, Wlo,
                     B: int, HOP: int, W: int, interpret: bool = False):
    G = Whi.shape[0]
    blk = pl.BlockSpec((None, W, W),
                   lambda g: (g, np.int32(0), np.int32(0)),
                       memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((None, 3 * B, 4),
                    lambda g: (g, np.int32(0), np.int32(0)),
                        memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((G, W, W), jnp.float32)
                      for _ in range(4))
    # SMEM full-array specs need an EXPLICIT int32 index_map under a grid:
    # the default one returns weak-i64 indices in x64 mode, which Mosaic
    # rejects (func.return i64 legalization failure)
    smem = pl.BlockSpec((G,), lambda g: (np.int32(0),),
                        memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_train_hops_kernel, W=W, B=B, HOP=HOP,
                          guard=interpret),
        grid=(G,),
        out_shape=out_shape,
        in_specs=[
            smem, smem, smem,
            pl.BlockSpec((1,), lambda g: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            sblk, sblk, blk, blk,
        ],
        out_specs=(blk, blk, blk, blk),
        interpret=interpret,
    )(lrels, ihirs, s0s, ths, shr_hi, shr_lo, Whi, Wlo)


def train_hops_pallas(Wnds, shifts, l_rels, ihi_rels, s0s,
                      B: int, HOP: int, thresh=0.0,
                      interpret: bool = False):
    """Batched drop-in for vmapped :func:`ops.schur._train_hop`.

    Args: Wnds (G, WC, WC) f64 chase windows; shifts (G, B, 4) with rows
    (sr1, si1, sr2, si2) per bulge; l_rels/ihi_rels/s0s (G,) window-relative
    scalars.  Returns (Wnd2, Qw) like the vmapped XLA hop.
    """
    Wnds = jnp.asarray(Wnds)
    G, WC = Wnds.shape[0], Wnds.shape[1]
    dtype = Wnds.dtype
    W = 128
    if WC > W:
        raise ValueError(f"chase window {WC} > {W}")
    Wp = jnp.zeros((G, W, W), dtype).at[:, :WC, :WC].set(Wnds)
    Whi, Wlo = df_from_f64(Wp)
    # triple q of the train block holds bulge B-1-q: pre-reverse, then
    # expand per-bulge rows to per-train-block-row (3B, 4)
    shr = jnp.repeat(jnp.asarray(shifts)[:, ::-1, :], 3, axis=1)
    shr_hi, shr_lo = df_from_f64(shr)
    i32 = lambda x: jnp.asarray(x).astype(jnp.int32)
    ths = jnp.asarray(thresh, dtype).astype(jnp.float32).reshape(1)
    Ohi, Olo, Qthi, Qtlo = _train_hops_call(
        i32(l_rels), i32(ihi_rels), i32(s0s), ths, shr_hi, shr_lo, Whi,
        Wlo, B=B, HOP=HOP, W=W, interpret=interpret)
    Wnd2 = (Ohi.astype(dtype) + Olo.astype(dtype))[:, :WC, :WC]
    Qw = jnp.swapaxes(
        Qthi.astype(dtype) + Qtlo.astype(dtype), 1, 2)[:, :WC, :WC]
    return Wnd2, Qw


# ---------------------------------------------------------------------------
# AED spike-deflation kernel: the bottom-up deflation tests + adjacent
# block moves of ops/schur.py:_aed_deflate (reference deflate phase,
# schur/core.c:783-1267) as ONE Pallas state machine.  At WA=322 the XLA
# bounded-while version costs ~1 s/round (~14k move iterations x ~70 us
# of serial fused-loop steps) — the entire reason round 4 shelved the
# big-window AED; in-kernel a move is ~2-3 us (round-5 measurement).
#
# Structure mirrors the Francis kernel: T maintained fully in VMEM (full
# column passes — band-limiting is unsound, see col_pass note), the move
# transform accumulated TRANSPOSED, V's row 0 (all the spike tests read)
# carried in scratch; the wrapper Newton-corrects Q_m, recomputes the
# strict upper triangle as Q_m^T T Q_m in f64, and right-multiplies the
# full V outside.
# ---------------------------------------------------------------------------


def _deflate_kernel(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                    Tohi, Tolo, Qthi, Qtlo, stat, v0hi, v0lo, *, W: int,
                    guard: bool = False):
    import contextlib
    from starneig_tpu.ops import df32 as _df32
    ctx = contextlib.nullcontext() if guard else _df32.no_guard()
    with ctx:
        _deflate_body(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                      Tohi, Tolo, Qthi, Qtlo, stat, v0hi, v0lo, W=W)


def _deflate_body(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                  Tohi, Tolo, Qthi, Qtlo, stat, v0hi, v0lo, *, W: int):
    from starneig_tpu.ops.df_prim import df_swap_adjacent

    Tohi[:] = Thi[:]
    Tolo[:] = Tlo[:]
    rows2 = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (W, W), 1)
    Qthi[:] = (rows2 == cols2).astype(jnp.float32)
    Qtlo[:] = jnp.zeros((W, W), jnp.float32)
    v0hi[:] = Vhi[:]
    v0lo[:] = Vlo[:]

    w = iscal[0]
    maxsteps = iscal[1]
    s = Df(fscal[0], fscal[1])
    th = fscal[2]
    lane = lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def tband(r0, rows):
        return _band(Tohi, Tolo, r0, rows)

    def v0pick(c):
        return _at(_lane_pick(Df(v0hi[:], v0lo[:]), lane, c), 0)

    def col_pass(last_row, update_fn, first_row=None):
        def body(c):
            base = pl.multiple_of(c * _CH, _CH)
            Bb = Df(Tohi[pl.ds(base, _CH), :], Tolo[pl.ds(base, _CH), :])
            Bn = update_fn(Bb)
            Tohi[pl.ds(base, _CH), :] = Bn.hi
            Tolo[pl.ds(base, _CH), :] = Bn.lo
            return c + np.int32(1)

        c0 = jnp.int32(0) if first_row is None else \
            (jnp.maximum(first_row, 0) // np.int32(_CH)).astype(jnp.int32)
        lax.while_loop(lambda c: c * _CH <= last_row, body, c0)

    def loop_cond(st):
        kbot, ilst, src, fail, steps = st
        return (kbot > ilst) & (fail == 0) & (steps < maxsteps)

    def loop_body(st):
        kbot, ilst, src, fail, steps = st
        is_test = src < np.int32(0)

        # ---------------- TEST: spike negligibility at the bottom --------
        e = jnp.maximum(kbot - 1, 1)
        B2 = tband(e - 1, 2)
        cm1 = _lane_pick(B2, lane, jnp.maximum(e - 1, 0))
        coupled = dfw(kbot - 1 >= 1, _at(cm1, 1), Df(0.0))
        sz = jnp.where(coupled.eq0(), np.int32(1), np.int32(2))
        start = kbot - sz
        sp0 = s * v0pick(jnp.maximum(start, 0))
        sp1 = s * v0pick(jnp.maximum(kbot - 1, 0))
        d_s = _at(_lane_pick(tband(jnp.maximum(start, 0), 1), lane,
                             jnp.maximum(start, 0)), 0)
        d_e = _at(_lane_pick(tband(jnp.maximum(kbot - 1, 0), 1), lane,
                             jnp.maximum(kbot - 1, 0)), 0)
        two = sz == 2
        foot = jnp.maximum(dfabs(sp0).hi,
                           jnp.where(two, dfabs(sp1).hi, _F0))
        tstv = dfabs(d_s).hi + jnp.where(two, dfabs(d_e).hi, _F0)
        deflatable = foot <= jnp.maximum(np.float32(ULP) * tstv, th)

        t_kbot = jnp.where(deflatable, start, kbot)
        t_src = jnp.where(deflatable, np.int32(-1), start)
        at_front = (~deflatable) & (start == ilst)
        t_ilst = jnp.where(at_front, ilst + sz, ilst)
        t_src = jnp.where(at_front, np.int32(-1), t_src)

        # ---------------- MOVE: swap the block at src one position up ----
        srcc = jnp.maximum(src, 2)          # memory-safe index clamp only
        cm2 = _lane_pick(tband(srcc - 2, 2), lane,
                         jnp.maximum(srcc - 2, 0))
        coupled2 = dfw(src - 1 >= 1, _at(cm2, 1), Df(0.0))
        pm = jnp.where(coupled2.eq0(), np.int32(1), np.int32(2))
        # spelled-out clip: jnp.clip's weak-int min recurses in x64 traces
        a = jnp.minimum(jnp.maximum(src - pm, np.int32(0)),
                        np.int32(W - 4))
        srcs = jnp.minimum(jnp.maximum(src, np.int32(0)), np.int32(W - 2))
        below = dfw(src + 1 < w,
                    _at(_lane_pick(tband(srcs + 1, 1), lane, srcs), 0),
                    Df(0.0))
        qm = jnp.where(below.eq0(), np.int32(1), np.int32(2))

        B4 = tband(a, 4)
        cols = [_lane_pick(B4, lane, a + np.int32(j)) for j in range(4)]
        D = [[_at(cols[c], r) for c in range(4)] for r in range(4)]
        Q4, Dh, accept = df_swap_adjacent(D, pm, qm)

        @pl.when(~is_test)
        def _():
            # rows [a, a+4) <- Q4^T @ rows
            rv = [_row(B4, k) for k in range(4)]
            for r in range(4):
                nr = (Q4[0][r] * rv[0] + Q4[1][r] * rv[1]
                      + Q4[2][r] * rv[2] + Q4[3][r] * rv[3])
                _write_row(Tohi, Tolo, a + np.int32(r), nr)

            # cols [a, a+4) <- cols @ Q4 over rows [0, a+4)
            masks = [lane == a + np.int32(j) for j in range(4)]

            def colup(Bb):
                bj = [_lane_pick(Bb, lane, a + np.int32(j))
                      for j in range(4)]
                out = Bb
                for j in range(4):
                    nj = (bj[0] * Q4[0][j] + bj[1] * Q4[1][j]
                          + bj[2] * Q4[2][j] + bj[3] * Q4[3][j])
                    out = Df(jnp.where(masks[j], nj.hi, out.hi),
                             jnp.where(masks[j], nj.lo, out.lo))
                return out

            col_pass(a + np.int32(3), colup)

            # plant the swapped-and-standardized 4x4 block exactly
            B4b = tband(a, 4)
            for r in range(4):
                row = _row(B4b, r)
                for j in range(4):
                    row = Df(jnp.where(masks[j], Dh[r][j].hi, row.hi),
                             jnp.where(masks[j], Dh[r][j].lo, row.lo))
                _write_row(Tohi, Tolo, a + np.int32(r), row)

            # V row 0: cols [a, a+4) <- v @ Q4
            V0 = Df(v0hi[:], v0lo[:])
            vj = [_at(_lane_pick(V0, lane, a + np.int32(j)), 0)
                  for j in range(4)]
            out = V0
            for j in range(4):
                nv = (vj[0] * Q4[0][j] + vj[1] * Q4[1][j]
                      + vj[2] * Q4[2][j] + vj[3] * Q4[3][j])
                out = Df(jnp.where(masks[j], nv.hi, out.hi),
                         jnp.where(masks[j], nv.lo, out.lo))
            v0hi[:] = out.hi
            v0lo[:] = out.lo

            # Qm columns [a, a+4) (transposed: rows of Qt) <- Q4^T @ rows
            Qb = _band(Qthi, Qtlo, a, 4)
            qv = [_row(Qb, k) for k in range(4)]
            for r in range(4):
                nq = (Q4[0][r] * qv[0] + Q4[1][r] * qv[1]
                      + Q4[2][r] * qv[2] + Q4[3][r] * qv[3])
                _write_row(Qthi, Qtlo, a + np.int32(r), nq)

        m_src = jnp.where(accept, a, np.int32(-1))
        arrived = accept & (m_src == ilst)
        m_ilst = jnp.where(arrived, ilst + qm, ilst)
        m_src = jnp.where(arrived, np.int32(-1), m_src)
        m_fail = jnp.where(accept, fail, np.int32(1))

        new_kbot = jnp.where(is_test, t_kbot, kbot)
        new_ilst = jnp.where(is_test, t_ilst, m_ilst)
        new_src = jnp.where(is_test, t_src, m_src)
        new_fail = jnp.where(is_test, fail, m_fail)
        return (new_kbot.astype(jnp.int32), new_ilst.astype(jnp.int32),
                new_src.astype(jnp.int32), new_fail.astype(jnp.int32),
                steps + np.int32(1))

    z32 = jnp.int32(0)
    st = (w.astype(jnp.int32), z32, np.int32(-1) + z32, z32, z32)
    kbot, ilst, src, fail, steps = lax.while_loop(loop_cond, loop_body, st)
    stat[0] = kbot
    stat[1] = fail


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _deflate_call(iscal, fscal, Thi, Tlo, Vhi, Vlo, W: int,
                  interpret: bool = False):
    out_shape = (
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.int32),
    )
    return pl.pallas_call(
        functools.partial(_deflate_kernel, W=W, guard=interpret),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32),
                        pltpu.VMEM((1, W), jnp.float32)],
        interpret=interpret,
    )(iscal, fscal, Thi, Tlo, Vhi, Vlo)


def aed_deflate_pallas(Tw, Vw, s, w, thresh, interpret: bool = False):
    """Drop-in for ops/schur.py:_aed_deflate on the Pallas path.

    Tw (WA, WA) Schur form of the AED window, Vw the accumulated window
    transform, s the spike scalar, w the active size, thresh the absolute
    deflation floor.  Returns (Tw, Vw, kbot, fail) with the same
    contract: kbot = rows remaining undeflated.
    """
    Tw = jnp.asarray(Tw)
    Vw = jnp.asarray(Vw)
    WA = Tw.shape[0]
    dtype = Tw.dtype
    W = 128 if WA + 4 <= 128 else (256 if WA + 4 <= 256 else 384)
    if WA + 4 > W:
        raise ValueError(f"aed_deflate_pallas window {WA} > {W - 4}")
    Tp = jnp.zeros((W, W), dtype).at[:WA, :WA].set(Tw)
    V0 = jnp.zeros((1, W), dtype).at[0, :WA].set(Vw[0, :])
    Thi, Tlo = df_from_f64(Tp)
    Vhi, Vlo = df_from_f64(V0)
    iscal = jnp.stack([jnp.asarray(w),
                       jnp.asarray(4 * WA * WA)]).astype(jnp.int32)
    sh, sl = df_from_f64(jnp.asarray(s, dtype).reshape(1))
    thf = jnp.asarray(thresh, dtype).astype(jnp.float32).reshape(1)
    fscal = jnp.concatenate([sh, sl, thf])
    Tohi, Tolo, Qthi, Qtlo, stat = _deflate_call(
        iscal, fscal, Thi, Tlo, Vhi, Vlo, W=W, interpret=interpret)
    Tk = (Tohi.astype(dtype) + Tolo.astype(dtype))[:WA, :WA]
    Qm = jnp.swapaxes(Qthi.astype(dtype) + Qtlo.astype(dtype),
                      0, 1)[:WA, :WA]
    # Newton re-orthonormalization + exact-similarity strict-upper rebuild
    Qc = Qm @ (1.5 * jnp.eye(WA, dtype=dtype) - 0.5 * (Qm.T @ Qm))
    Trec = Qc.T @ Tw @ Qc
    r = jnp.arange(WA)
    dr = r[None, :] - r[:, None]
    Tm = jnp.where(dr >= 2, Trec, jnp.where(jnp.abs(dr) <= 1, Tk, 0.0))
    return Tm, Vw @ Qc, stat[0], stat[1] != 0


# ---------------------------------------------------------------------------
# AED recondense kernel: spike reflector + unblocked Hessenberg re-reduction
# of the undeflated window (ops/schur.py:_aed_recondense; the reference's
# post-deflation re-reduction inside perform_*_aed, core.c:1365-1551).
# Full-length reflectors: scalar work reduces with pairwise df trees; the
# power-of-two scaling keeps the dlarfg pre-scale EXACT.
# ---------------------------------------------------------------------------


def _tree_sum(x, axis: int):
    """Pairwise-halving df sum along ``axis`` (any size; odd levels fold
    their tail element into the head before halving)."""
    from starneig_tpu.ops.df32 import df_add

    def sl(h, l, a, b):
        if axis == 0:
            return (h[a:b], l[a:b])
        return (h[:, a:b], l[:, a:b])

    hi, lo = x.hi, x.lo
    while hi.shape[axis] > 1:
        nn = hi.shape[axis]
        if nn % 2 == 1:
            h0, l0 = df_add(sl(hi, lo, 0, 1), sl(hi, lo, nn - 1, nn))
            h1, l1 = sl(hi, lo, 1, nn - 1)
            hi = jnp.concatenate([h0, h1], axis=axis)
            lo = jnp.concatenate([l0, l1], axis=axis)
            nn -= 1
        half = nn // 2
        a, b = sl(hi, lo, 0, half), sl(hi, lo, half, nn)
        hi, lo = df_add(a, b)
    return Df(hi, lo)


def _dlarfg_lane(x, tail_mask, p, lane):
    """dlarfg on a (1, W) lane-oriented df vector: annihilate the tail.

    ``tail_mask``: active tail lanes (excludes p); alpha sits at lane p.
    Returns (v (1, W) with v[p] = 1 and masked tail, tau, beta) — the
    semantics of ops/primitives.py:householder.
    """
    from starneig_tpu.ops.df32 import dfsign as _dfsign
    from starneig_tpu.ops.df_prim import _zero as _z
    alpha = Df(jnp.sum(jnp.where(lane == p, x.hi, _F0), axis=1, keepdims=True),
               jnp.sum(jnp.where(lane == p, x.lo, _F0), axis=1, keepdims=True))
    alpha = Df(alpha.hi[0, 0], alpha.lo[0, 0])
    xt = Df(jnp.where(tail_mask, x.hi, _F0), jnp.where(tail_mask, x.lo, _F0))
    m = jnp.maximum(jnp.max(jnp.abs(xt.hi)), jnp.abs(alpha.hi))
    msafe = jnp.maximum(m, np.float32(1e-30))
    # exact power-of-two pre-scale (dlarfg's subnormal guard, made exact)
    e = jnp.floor(jnp.log2(msafe))
    sc = jnp.exp2(-e)
    sci = jnp.exp2(e)
    xs = Df(xt.hi * sc, xt.lo * sc)
    al = Df(alpha.hi * sc, alpha.lo * sc)
    nrm2 = _tree_sum(xs * xs, 1)
    nrm2 = Df(nrm2.hi[0, 0], nrm2.lo[0, 0])
    xnorm = dfsqrt_(nrm2)
    beta = -_dfsign(al) * dfhypot2_(al, xnorm)
    degen = xnorm.eq0()
    tau = dfw(degen, Df(0.0), df_safe_div_(beta - al, beta))
    scale = df_safe_div_(Df(1.0), al - beta)
    v = xs * scale
    v = Df(jnp.where(tail_mask, v.hi, _F0), jnp.where(tail_mask, v.lo, _F0))
    v = Df(jnp.where(lane == p, _F1, v.hi), jnp.where(lane == p, _F0, v.lo))
    v = dfw(degen, Df(jnp.where(lane == p, _F1, _F0),
                      jnp.full_like(v.lo, _F0)), v)
    beta_out = Df((dfw(degen, al, beta)).hi * sci,
                  (dfw(degen, al, beta)).lo * sci)
    return v, tau, beta_out


def _recondense_kernel(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                       Tohi, Tolo, Vohi, Volo, bout, *, W: int,
                       guard: bool = False):
    import contextlib
    from starneig_tpu.ops import df32 as _df32
    ctx = contextlib.nullcontext() if guard else _df32.no_guard()
    with ctx:
        _recondense_body(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                         Tohi, Tolo, Vohi, Volo, bout, W=W)


def _recondense_body(iscal, fscal, Thi, Tlo, Vhi, Vlo,
                     Tohi, Tolo, Vohi, Volo, bout, *, W: int):
    Tohi[:] = Thi[:]
    Tolo[:] = Tlo[:]
    Vohi[:] = Vhi[:]
    Volo[:] = Vlo[:]
    kbot = iscal[0]
    s_spike = Df(fscal[0], fscal[1])

    lane = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    rows2 = lax.broadcasted_iota(jnp.int32, (W, W), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (W, W), 1)
    rowc = lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    diag = (rows2 == cols2).astype(jnp.float32)

    def lane_to_col(vl):
        """(1, W) lane vector -> (W, 1) column (exact: one term per row)."""
        return Df(jnp.sum(vl.hi * diag, axis=1, keepdims=True),
                  jnp.sum(vl.lo * diag, axis=1, keepdims=True))

    def apply_both(v_lane, tau):
        """T <- (I - tau v v^T) T (I - tau v v^T); V <- V (I - tau v v^T)."""
        vc = lane_to_col(v_lane)
        T = Df(Tohi[:], Tolo[:])
        w = _tree_sum(T * vc, 0)                       # (1, W) = v^T T
        T = T - (tau * vc) * w
        w2 = _tree_sum(T * v_lane, 1)                  # (W, 1) = T v
        T = T - (tau * w2) * v_lane
        Tohi[:] = T.hi
        Tolo[:] = T.lo
        V = Df(Vohi[:], Volo[:])
        wv = _tree_sum(V * v_lane, 1)
        V = V - (tau * wv) * v_lane
        Vohi[:] = V.hi
        Volo[:] = V.lo

    # ---- spike reflector: sp = s * Vw[0, :], active rows [0, kbot) ----
    sp = s_spike * Df(Vohi[0:1, :], Volo[0:1, :])
    sp = Df(jnp.where(lane < kbot, sp.hi, _F0),
            jnp.where(lane < kbot, sp.lo, _F0))
    v0, tau0, beta0 = _dlarfg_lane(
        sp, (lane > 0) & (lane < kbot), jnp.int32(0), lane)
    apply_both(v0, tau0)
    bout[0] = beta0.hi
    bout[1] = beta0.lo

    # ---- unblocked Hessenberg on [0, kbot) ----
    def step(j):
        shift = j + np.int32(1)
        T = Df(Tohi[:], Tolo[:])
        colm = (cols2 == j).astype(jnp.float32)
        col = Df(jnp.sum(T.hi * colm, axis=1, keepdims=True),
                 jnp.sum(T.lo * colm, axis=1, keepdims=True))
        # column as a lane vector for the reflector helper
        cl = Df(jnp.sum(jnp.where(rows2 == cols2, col.hi, _F0), axis=0,
                        keepdims=True),
                jnp.sum(jnp.where(rows2 == cols2, col.lo, _F0), axis=0,
                        keepdims=True))
        ok = shift < kbot
        tail = (lane > shift) & (lane < kbot)
        v, tau, b = _dlarfg_lane(cl, tail, shift, lane)
        tau = dfw(ok, tau, Df(0.0))
        apply_both(v, tau)
        # plant the exact column j: zeros below shift (inside [0, kbot)),
        # beta at shift
        T = Df(Tohi[:], Tolo[:])
        zz = (rows2 > j + 1) & (rowc < kbot) & ok
        bm = (rows2 == j + 1) & ok
        cm = cols2 == j
        Tohi[:] = jnp.where(cm & zz, _F0,
                            jnp.where(cm & bm, b.hi, T.hi))
        Tolo[:] = jnp.where(cm & zz, _F0,
                            jnp.where(cm & bm, b.lo, T.lo))
        return j + np.int32(1)

    lax.while_loop(lambda j: j < np.int32(W - 2), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _recondense_call(iscal, fscal, Thi, Tlo, Vhi, Vlo, W: int,
                     interpret: bool = False):
    out_shape = (
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((W, W), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_recondense_kernel, W=W, guard=interpret),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        interpret=interpret,
    )(iscal, fscal, Thi, Tlo, Vhi, Vlo)


def aed_recondense_pallas(Tw, Vw, s, kbot, interpret: bool = False):
    """Drop-in for ops/schur.py:_aed_recondense on the Pallas path."""
    Tw = jnp.asarray(Tw)
    Vw = jnp.asarray(Vw)
    WA = Tw.shape[0]
    dtype = Tw.dtype
    W = 128 if WA + 2 <= 128 else (256 if WA + 2 <= 256 else 384)
    if WA > W - 2:
        raise ValueError(f"recondense window {WA} > {W - 2}")
    Tp = jnp.zeros((W, W), dtype).at[:WA, :WA].set(Tw)
    Vp = jnp.zeros((W, W), dtype).at[:WA, :WA].set(Vw)
    Thi, Tlo = df_from_f64(Tp)
    Vhi, Vlo = df_from_f64(Vp)
    iscal = jnp.stack([jnp.asarray(kbot)]).astype(jnp.int32)
    sh, sl = df_from_f64(jnp.asarray(s, dtype).reshape(1))
    fscal = jnp.concatenate([sh, sl])
    Tohi, Tolo, Vohi, Volo, bout = _recondense_call(
        iscal, fscal, Thi, Tlo, Vhi, Vlo, W=W, interpret=interpret)
    Tn = (Tohi.astype(dtype) + Tolo.astype(dtype))[:WA, :WA]
    Vn = (Vohi.astype(dtype) + Volo.astype(dtype))[:WA, :WA]
    beta = bout[0].astype(dtype) + bout[1].astype(dtype)
    return Tn, Vn, beta
