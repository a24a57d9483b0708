"""Pallas TPU matvec kernel for the Hessenberg panel loop.

The blocked Hessenberg reduction's only intrinsically sequential work is
one matrix-vector product per column (u = A v against the panel-start
matrix; reference ``src/hessenberg/core.c:461-521``).  On this TPU the
XLA f64 emulated matvec costs 11.4 ms at n=4000 (measured, PLAN_r4.md) —
~n * 11 ms dominates the whole reduction.  This kernel computes the df32
(hi/lo f32 pair, ~2^-47) matvec at the VPU/HBM bound (~0.5 ms at n=4000):

  * A is split hi/lo ONCE per panel (the panel loop deliberately reads
    the frozen panel-start matrix, so nb columns reuse one split);
  * the kernel grids over row blocks; each block does an elementwise
    df product with the broadcast v and a pairwise-halving df summation
    tree over the lane dimension (jnp.sum would collapse the compensation
    terms to f32 — measured in round 3);
  * lanes are padded to a 1024-multiple for the tree (odd widths fold
    their tail lane); padding lanes hold zeros and contribute exactly
    nothing.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starneig_tpu.ops import df32

_RB = 256  # rows per grid block (halved at wide Np to fit VMEM)


def _rb_for(Np: int) -> int:
    # hi+lo blocks are double-buffered by the pipeline: keep
    # 2 * 2 * RB * Np * 4B within ~12 MB of the 16 MB VMEM
    rb = _RB
    while 2 * 2 * rb * Np * 4 > 12 * 1024 * 1024 and rb > 8:
        rb //= 2
    return rb


def _matvec_kernel(Ahi, Alo, vhi, vlo, uhi, ulo, *, guard: bool = False):
    import contextlib
    ctx = contextlib.nullcontext() if guard else df32.no_guard()
    with ctx:
        P = df32.df_mul((Ahi[:], Alo[:]), (vhi[:], vlo[:]))
        hi, lo = P
        # pairwise-halving df tree over lanes; odd widths fold their tail
        # lane into the head first (lanes need only be a 1024-multiple —
        # power-of-two padding taxed n=10,000 with a 1.6x flop/bandwidth
        # overhead, 10240 -> 16384)
        while hi.shape[-1] > 1:
            w = hi.shape[-1]
            if w % 2 == 1:
                h0, l0 = df32.df_add((hi[:, :1], lo[:, :1]),
                                     (hi[:, w - 1:], lo[:, w - 1:]))
                hi = jnp.concatenate([h0, hi[:, 1:w - 1]], -1)
                lo = jnp.concatenate([l0, lo[:, 1:w - 1]], -1)
                w -= 1
            half = w // 2
            hi, lo = df32.df_add((hi[:, :half], lo[:, :half]),
                                 (hi[:, half:], lo[:, half:]))
        uhi[:] = hi
        ulo[:] = lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matvec_call(Ahi, Alo, vhi, vlo, interpret: bool = False):
    R, Np = Ahi.shape
    RB = _rb_for(Np)
    grid = (R // RB,)
    ablk = pl.BlockSpec((RB, Np), lambda r: (r, np.int32(0)),
                        memory_space=pltpu.VMEM)
    vblk = pl.BlockSpec((1, Np), lambda r: (np.int32(0), np.int32(0)),
                        memory_space=pltpu.VMEM)
    ublk = pl.BlockSpec((RB, 1), lambda r: (r, np.int32(0)),
                        memory_space=pltpu.VMEM)
    uhi, ulo = pl.pallas_call(
        functools.partial(_matvec_kernel, guard=interpret),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        in_specs=[ablk, ablk, vblk, vblk],
        out_specs=(ublk, ublk),
        interpret=interpret,
    )(Ahi, Alo, vhi, vlo)
    return uhi, ulo


def split_panel_matrix(A):
    """Split A (n, n) f64 into padded (hi, lo) f32 pair for the matvec
    kernel: rows padded to a _RB multiple, lanes to a 1024-multiple (the
    kernel's lane tree folds odd widths, so power-of-two is not needed;
    n=10,000 pads to 10,240 instead of 16,384)."""
    n = A.shape[0]
    R = ((n + _RB - 1) // _RB) * _RB  # rows padded to the largest RB
    Np = max(128, ((n + 1023) // 1024) * 1024)
    Ap = jnp.zeros((R, Np), A.dtype)
    Ap = Ap.at[:n, :n].set(A)
    return df32.df_from_f64(Ap)


def matvec_df(Ahi, Alo, v, out_len: int = 0, row0: int = 0,
              interpret: bool = False):
    """u = A @ v at df32 precision; A pre-split/padded (see
    :func:`split_panel_matrix` / :func:`split_mat`), v (n,) f64 with
    n <= lane count.  Returns u (out_len or n,) f64 — out_len covers the
    non-square shadow-buffer matvecs of the Hessenberg panel loop.

    ``row0`` (static, a multiple of the row block) restricts the kernel to
    rows [row0, R): the trailing-range bucketing of the panel matvec —
    rows above row0 are known-zero output (v's support starts there).
    """
    n = v.shape[0]
    Np = Ahi.shape[1]
    vp = jnp.zeros((1, Np), v.dtype).at[0, :n].set(v)
    vhi, vlo = df32.df_from_f64(vp)
    if row0:
        Ahi = Ahi[row0:]
        Alo = Alo[row0:]
    uhi, ulo = _matvec_call(Ahi, Alo, vhi, vlo, interpret=interpret)
    u = uhi.astype(v.dtype) + ulo.astype(v.dtype)
    m = out_len or n
    if row0:
        return jnp.zeros((m,), v.dtype).at[row0:m].set(u[:m - row0, 0])
    return u[:m, 0]


def split_mat(M, R: int, L: int):
    """Split an (r, c) f64 matrix into padded (R, L) hi/lo f32 pair for
    :func:`matvec_df`: R a multiple of the row block, L a power of two."""
    r, c = M.shape
    Mp = jnp.zeros((R, L), M.dtype).at[:r, :c].set(M)
    return df32.df_from_f64(Mp)


def pad_pow2(x: int, lo: int = 128) -> int:
    p = lo
    while p < x:
        p *= 2
    return p


def matvec_pallas_ok(dtype, n: int):
    import os
    return (jax.default_backend() == "tpu" and dtype == jnp.float64
            and not os.environ.get("STARNEIG_NO_PALLAS")
            and not os.environ.get("STARNEIG_NO_PALLAS_MATVEC"))
