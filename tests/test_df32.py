"""df32 (double-float over f32) arithmetic accuracy: the Pallas kernel
substrate for f64-class precision on TPU (PLAN_r4.md).  Target: ~2^-45
relative error per operation (the platform's own f64 emulation measures
~2^-47; see the round-3 op-precision probes)."""

import numpy as np
import jax.numpy as jnp

from starneig_tpu.ops import df32


def _rand(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * scale).astype(np.float64)


def _relerr(df_val, ref):
    got = np.asarray(df32.df_to_f64(df_val))
    return np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300))


def test_df32_roundtrip():
    a = _rand(1000, 0)
    x = df32.df_from_f64(jnp.asarray(a))
    assert _relerr(x, a) < 2 ** -45


def test_df32_ops():
    a = _rand(1000, 1)
    b = _rand(1000, 2) + 2.0  # bounded away from 0 for div
    x = df32.df_from_f64(jnp.asarray(a))
    y = df32.df_from_f64(jnp.asarray(b))
    # add: error is ~2^-48 relative to the OPERANDS (cancellation makes
    # result-relative error unbounded — the platform's f64 emulation
    # behaves identically, measured add error ~2^-47 * |operands|)
    add_err = np.max(np.abs(np.asarray(df32.df_to_f64(df32.df_add(x, y)))
                            - (a + b)) / (np.abs(a) + np.abs(b)))
    assert add_err < 2 ** -42
    assert _relerr(df32.df_mul(x, y), a * b) < 2 ** -42
    assert _relerr(df32.df_div(x, y), a / b) < 2 ** -42
    assert _relerr(df32.df_sqrt((jnp.abs(x[0]), jnp.where(
        x[0] < 0, -x[1], x[1]))), np.sqrt(np.abs(a))) < 2 ** -42


def test_df32_dot_accumulation():
    """A 512-term df32 dot product stays at ~f64 accuracy (the pattern of
    in-kernel reflector applications)."""
    n = 512
    a = _rand(n, 3)
    b = _rand(n, 4)
    x = df32.df_from_f64(jnp.asarray(a))
    y = df32.df_from_f64(jnp.asarray(b))
    acc = (jnp.float32(0.0), jnp.float32(0.0))
    prods = df32.df_mul(x, y)
    # sequential accumulation (in-kernel loops accumulate the same way)
    ph, pl = np.asarray(prods[0]), np.asarray(prods[1])
    acc = (jnp.float32(0.0), jnp.float32(0.0))
    for i in range(n):
        acc = df32.df_add(acc, (jnp.float32(ph[i]), jnp.float32(pl[i])))
    ref = float(np.dot(a, b))
    got = float(df32.df_to_f64(acc))
    scale = float(np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(got - ref) / scale < 2 ** -40
