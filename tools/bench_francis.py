"""Measure the W=384 Francis kernel per-step cost on hardware (round-5
item 1: make big-window AED affordable).

Times small_schur_pallas on a synthetic Hessenberg window at several sizes
and reports us/step (step count is read from a replay with a counter via
max_total_iter binary... simpler: we report wall/window and the modelled
0.75*w^2 step estimate alongside).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from starneig_tpu.node import enable_compilation_cache
enable_compilation_cache()

from starneig_tpu.ops.pallas_schur import small_schur_pallas


def run(w, seed=0):
    rng = np.random.default_rng(seed)
    H = np.triu(rng.standard_normal((w, w)), -1)
    H = jnp.asarray(H)
    Z = jnp.eye(w, dtype=jnp.float64)
    t0 = time.time()
    S, Zo, info = small_schur_pallas(H, Z, w, thresh=1e-13)
    S.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3 if w <= 130 else 1
    for _ in range(reps):
        S, Zo, info = small_schur_pallas(H, Z, w, thresh=1e-13)
        S.block_until_ready()
    dt = (time.time() - t0) / reps
    # residual of the solve
    res = float(jnp.linalg.norm(Zo @ S @ Zo.T - H) / jnp.linalg.norm(H))
    orth = float(jnp.linalg.norm(Zo.T @ Zo - jnp.eye(w)))
    est_steps = 0.75 * w * w
    print(f"w={w:4d} info={int(info)} wall={dt*1e3:8.1f} ms "
          f"(compile {compile_s:.1f}s) est_us/step={dt/est_steps*1e6:6.2f} "
          f"res={res:.2e} orth={orth:.2e}", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [120, 250, 380]
    for w in sizes:
        run(w)
