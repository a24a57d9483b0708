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


def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a+b)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with 12-bit halves (exact products)."""
    t = _SPLITTER * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a*b)."""
    p = a * b
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
    """(hi, lo) / (hi, lo): one Newton refinement of the f32 quotient."""
    q1 = x[0] / y[0]
    # r = x - q1 * y (df-accurate remainder)
    r = df_sub(x, df_mul_f32(y, q1))
    q2 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q1, q2)


def df_sqrt(x):
    """sqrt of a nonneg df value: Newton step on the f32 root."""
    s1 = jnp.sqrt(x[0])
    safe = jnp.where(s1 > 0, s1, jnp.float32(1.0))
    # r = x - s1^2 ; correction r / (2 s1)
    r = df_sub(x, two_prod(s1, s1))
    s2 = jnp.where(s1 > 0, (r[0] + r[1]) / (2.0 * safe), jnp.float32(0.0))
    return fast_two_sum(s1, s2)


def df_from_f64(a):
    """Split an f64 array into an (hi, lo) f32 pair (host/XLA side)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def df_to_f64(x):
    """Recombine an (hi, lo) pair into f64 (host/XLA side)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)
