"""Double-float (f32 pair) arithmetic for Pallas TPU kernels.

Mosaic does not lower f64 (measured this round: any f64 Pallas kernel
fails to compile), while the platform's own XLA f64 is ~47-bit float-float
emulation.  These helpers provide the same ~2^-47 effective precision on
explicit (hi, lo) f32 pairs, composable inside Pallas kernels where the
serial window solves (Francis, bulge chase — PLAN_r4.md) must run.

Classic error-free transforms WITHOUT fma (TPU VPU / jax expose none):
Knuth two_sum, Dekker split + two_prod.  References: Dekker (1971),
Shewchuk (1997) — standard published algorithms, implemented from the
formulas.

All functions operate elementwise on arrays (any shape); a df value is a
(hi, lo) tuple with value = hi + lo and |lo| <= ulp(hi)/2.
"""

from __future__ import annotations

import jax.numpy as jnp

# 2^12 + 1 for f32 (24-bit mantissa); a plain Python float stays
# weak-typed so kernels don't capture a traced constant (Pallas rejects
# captured array consts)
_SPLITTER = 4097.0

import numpy as _np0
# f32 scalars for jnp.where branches: weak Python floats leave f64
# literals in the jaxpr, which the Mosaic TPU compiler cannot lay out
_F32_ZERO = _np0.float32(0.0)
_F32_ONE = _np0.float32(1.0)


from jax import lax as _lax


_GUARD_OFF = False


class no_guard:
    """Context manager disabling the EFT optimization barriers.

    Used while TRACING compiled Pallas TPU kernels: Mosaic has no lowering
    for ``optimization_barrier``, and (unlike XLA CPU's algebraic
    simplifier) it does not reassociate float arithmetic, so the
    error-free transforms survive without the barrier.  Interpret-mode
    kernels execute through XLA CPU and keep the barriers.
    """

    def __enter__(self):
        global _GUARD_OFF
        self._prev = _GUARD_OFF
        _GUARD_OFF = True

    def __exit__(self, *exc):
        global _GUARD_OFF
        _GUARD_OFF = self._prev


def _guard(*xs):
    """Optimization barrier: XLA CPU's algebraic simplifier rewrites the
    error-free-transform identities when the ops fuse (measured: a jitted
    df householder loses 5 decimal digits vs its own eager evaluation;
    TPU/Mosaic compile unaffected).  The barrier pins the evaluation order.
    """
    if _GUARD_OFF:
        return xs
    return _lax.optimization_barrier(xs)


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a+b)."""
    s, = _guard(a + b)
    v, = _guard(s - a)
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b|."""
    s, = _guard(a + b)
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with 12-bit halves (exact products)."""
    t, = _guard(_SPLITTER * a)
    hi, = _guard(t - (t - a))
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a*b)."""
    p, = _guard(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x, y):
    """(hi, lo) + (hi, lo) -> (hi, lo)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_neg(x):
    return (-x[0], -x[1])


def df_mul(x, y):
    """(hi, lo) * (hi, lo) -> (hi, lo)."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_mul_f32(x, c):
    """df * plain f32 scalar/array."""
    p, e = two_prod(x[0], c)
    e = e + x[1] * c
    return fast_two_sum(p, e)


def df_div(x, y):
    """(hi, lo) / (hi, lo), division-free after the seed.

    XLA CPU lowers jitted f32 division/sqrt through ~1e-4 approximation
    sequences in some fusion contexts (measured), so refinements must not
    themselves divide: Newton-refine the reciprocal with exact multiplies,
    then correct with df remainders.
    """
    yh = y[0]
    r0 = 1.0 / yh
    r0 = r0 * (2.0 - yh * r0)
    r0 = r0 * (2.0 - yh * r0)           # full f32 accuracy regardless of seed
    q1 = x[0] * r0
    rem = df_sub(x, df_mul_f32(y, q1))
    q2 = (rem[0] + rem[1]) * r0
    q12 = fast_two_sum(q1, q2)
    rem2 = df_sub(x, df_mul(y, q12))
    q3 = (rem2[0] + rem2[1]) * r0
    s, e = two_sum(q12[0], q3)
    return fast_two_sum(s, e + q12[1])


def df_sqrt(x):
    """sqrt of a nonneg df value, division-free after the rsqrt seed
    (see df_div for why refinements must avoid div/sqrt ops)."""
    xh = x[0]
    pos = xh > 0
    xs = jnp.where(pos, xh, _F32_ONE)
    y = jax.lax.rsqrt(xs)
    y = y * (1.5 - 0.5 * xs * y * y)
    y = y * (1.5 - 0.5 * xs * y * y)    # full f32 rsqrt regardless of seed
    s1 = xs * y
    r = df_sub(x, two_prod(s1, s1))
    s1 = s1 + (r[0] + r[1]) * (0.5 * y)
    r = df_sub(x, two_prod(s1, s1))
    s2 = (r[0] + r[1]) * (0.5 * y)
    s1 = jnp.where(pos, s1, _F32_ZERO)
    s2 = jnp.where(pos, s2, _F32_ZERO)
    return fast_two_sum(s1, s2)


def df_sum_axis1(x):
    """df32 row sums of an (R, W) pair, W a power of two: pairwise
    halving tree of df_add (log2 W steps).  jnp.sum on the components
    collapses accuracy to f32 (measured 1.6e-9 after 1e3 steps) — the
    tree keeps the compensation terms."""
    hi, lo = x
    while hi.shape[-1] > 1:
        half = hi.shape[-1] // 2
        a = (hi[..., :half], lo[..., :half])
        b = (hi[..., half:], lo[..., half:])
        hi, lo = df_add(a, b)
    return hi[..., 0], lo[..., 0]


def df_where(c, x, y):
    return (jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1]))


def df_abs(x):
    neg = x[0] < 0
    return (jnp.where(neg, -x[0], x[0]), jnp.where(neg, -x[1], x[1]))


def df_from_f64(a):
    """Split an f64 array into an (hi, lo) f32 pair (host/XLA side)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def df_to_f64(x):
    """Recombine an (hi, lo) pair into f64 (host/XLA side)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


# ---------------------------------------------------------------------------
# Df: operator-overloaded view so the LAPACK-style primitive algorithms
# (householder / givens / eig2x2 / dlanv2 / dlaqr1 in ops/primitives.py)
# port mechanically into Pallas kernels at df precision.
# ---------------------------------------------------------------------------

import jax
import numpy as _np


def _as32(v):
    """To f32, keeping Python/numpy scalars as NUMPY scalars: they inline
    as jaxpr literals, while ``jnp.asarray`` creates a device constant that
    Pallas rejects as a captured const inside kernels."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return _np.float32(v)
    if isinstance(v, _np.floating):
        return _np.float32(v)
    return jnp.asarray(v, jnp.float32)


@jax.tree_util.register_pytree_node_class
class Df:
    """A double-float value (hi + lo, both f32). Arithmetic via the EFTs
    above; comparisons use the hi component (ample for branch decisions —
    branch boundaries are continuous in the algorithms used here)."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo=None):
        self.hi = _as32(hi)
        if lo is None:
            self.lo = (_np.float32(0.0) if isinstance(self.hi, _np.floating)
                       else jnp.zeros_like(self.hi))
        else:
            self.lo = _as32(lo)

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def pair(self):
        return (self.hi, self.lo)

    @staticmethod
    def _coerce(v):
        return v if isinstance(v, Df) else Df(v)

    def __add__(self, o):
        return Df(*df_add(self.pair, Df._coerce(o).pair))

    __radd__ = __add__

    def __sub__(self, o):
        return Df(*df_sub(self.pair, Df._coerce(o).pair))

    def __rsub__(self, o):
        return Df(*df_sub(Df._coerce(o).pair, self.pair))

    def __mul__(self, o):
        return Df(*df_mul(self.pair, Df._coerce(o).pair))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return Df(*df_div(self.pair, Df._coerce(o).pair))

    def __rtruediv__(self, o):
        return Df(*df_div(Df._coerce(o).pair, self.pair))

    def __neg__(self):
        return Df(-self.hi, -self.lo)

    # comparisons on hi (+lo for the zero tests, which gate exact branches)
    def __lt__(self, o):
        return self.hi < Df._coerce(o).hi

    def __le__(self, o):
        return self.hi <= Df._coerce(o).hi

    def __gt__(self, o):
        return self.hi > Df._coerce(o).hi

    def __ge__(self, o):
        return self.hi >= Df._coerce(o).hi

    def eq0(self):
        return (self.hi == 0) & (self.lo == 0)

    def ne0(self):
        return ~self.eq0()


def dfw(c, x, y):
    """where() over Df values (c broadcastable bool)."""
    x, y = Df._coerce(x), Df._coerce(y)
    return Df(jnp.where(c, x.hi, y.hi), jnp.where(c, x.lo, y.lo))


def dfabs(x):
    return dfw(x.hi < 0, -x, x)


def dfmax(x, y):
    return dfw(x.hi >= Df._coerce(y).hi, x, y)


def dfmin(x, y):
    return dfw(x.hi <= Df._coerce(y).hi, x, y)


def dfsqrt(x):
    return Df(*df_sqrt(x.pair))


def dfsign(x):
    """sign with sign(0) == +1 (Fortran SIGN semantics)."""
    return dfw(x.hi >= 0, Df(1.0), Df(-1.0))


def df_safe_div(num, den):
    ok = den.ne0()
    return dfw(ok, num / dfw(ok, den, Df(1.0)),
               Df(0.0))


def dfhypot2(x, y):
    """Robust sqrt(x^2 + y^2) (dlapy2) in df."""
    ax, ay = dfabs(x), dfabs(y)
    w = dfmax(ax, ay)
    z = dfmin(ax, ay)
    r = df_safe_div(z, w)
    return dfw(w.eq0(), Df(0.0),
               w * dfsqrt(r * r + Df(1.0)))
