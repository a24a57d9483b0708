"""Benchmark: Hessenberg + Schur wall-clock vs the reference baseline.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.md, reference test-driver transcripts, 6 CPU workers):
  Hessenberg n=4000: 13,121 ms;  Schur (from Hessenberg) n=4000: 9,479 ms
  -> combined 22,600 ms.  vs_baseline scales the reference cubically when
  BENCH_N != 4000.

Besides wall-clock the detail block reports per-phase GFLOP/s (standard
algorithmic flop counts: 10/3 n^3 Hessenberg + 4/3 n^3 Q accumulation;
Schur uses the reference's effective volume ~2.3 n^3 derived from its
9.5 s / 6-core transcript) and the fraction of this device's measured f64
GEMM ceiling — on TPU, f64 is emulated (~9 bf16 MXU passes per f64 MAC),
so fraction-of-peak against the *measured* f64 ceiling is the honest
speed-of-light number (BASELINE.json asks for flops/s and
fraction-of-peak, not just wall-clock).

Environment knobs: BENCH_N (default 4000), BENCH_DTYPE (float64|float32),
BENCH_WARMUP (default 1: one untimed full-size run so the timed run
measures execution, not compilation).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# BENCH_PLATFORM=cpu forces the CPU backend (the axon TPU plugin registers
# itself regardless of JAX_PLATFORMS, so an explicit config override is
# needed for the CPU-oracle timing runs)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

jax.config.update("jax_enable_x64", True)

from starneig_tpu.node import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax.numpy as jnp
from jax import lax


def measure_f64_gemm_peak(dtype, m: int = 2048, iters: int = 200) -> float:
    """Measured device GEMM throughput (GFLOP/s) in the bench dtype.

    Synchronizes via a scalar-sum fetch: a full-array np.asarray drags the
    32 MB result over the tunnel and was measured to understate the f64
    GEMM rate 10x (141 vs the true ~1540 GFLOP/s).
    """
    A = jnp.asarray(np.random.default_rng(1).standard_normal((m, m)) / m,
                    dtype)

    @jax.jit
    def chain(a):
        return lax.fori_loop(0, iters, lambda i, x: x @ a + 1e-9, a)

    float(jnp.sum(chain(A)))  # compile + sync
    t0 = time.time()
    float(jnp.sum(chain(A)))
    dt = time.time() - t0
    return 2.0 * m ** 3 * iters / dt / 1e9


def solve(A):
    from starneig_tpu.api import sep

    # NB: block_until_ready returns early on the tunneled TPU platform —
    # synchronize phase timings with a scalar D2H fetch instead
    t0 = time.time()
    H, Q = sep.hessenberg(A)
    float(jnp.sum(H))
    t_hess = time.time() - t0

    t0 = time.time()
    S, Q2, er, ei, info = sep.schur(H, Q)
    float(jnp.sum(S))
    t_schur = time.time() - t0
    return H, (S, Q2, er, ei, info), t_hess, t_schur


def main():
    n = int(os.environ.get("BENCH_N", "4000"))
    dtype = (jnp.float64
             if os.environ.get("BENCH_DTYPE", "float64") == "float64"
             else jnp.float32)

    rng = np.random.default_rng(0)
    A_host = rng.standard_normal((n, n))
    A = jnp.asarray(A_host, dtype=dtype)

    # warm-up: a full-size run so the timed pass measures execution only
    # (compiles are also persisted in .jax_cache across processes)
    if int(os.environ.get("BENCH_WARMUP", "1")):
        solve(A)

    H, (S, Q2, er, ei, info), t_hess, t_schur = solve(A)
    total_ms = (t_hess + t_schur) * 1e3

    # correctness gate: residual in units of u must stay within the
    # reference's fail threshold (10,000 u); u = eps of the bench dtype
    # (reference convention: 2^-52 for f64, test/common/checks.c:190)
    S_np, Q_np = map(np.asarray, (S, Q2))
    A_np = A_host.astype(S_np.dtype)
    u = float(jnp.finfo(dtype).eps)
    nrm = max(float(np.linalg.norm(A_np)), 1e-300)
    res = float(np.linalg.norm(Q_np @ S_np @ Q_np.T - A_np) / nrm / u)
    orth = float(np.linalg.norm(Q_np @ Q_np.T - np.eye(n)) / np.sqrt(n) / u)

    # this TPU's f64 is ~47-bit float-float emulation (measured per-op:
    # mul 60u, div 109u, sqrt 165u — see PLAN_r4.md); residuals in units
    # of the DEVICE epsilon are the apples-to-apples accuracy figure
    # (CPU true-f64 delivers 85u at n=2000, ACCURACY_r03.json)
    device_eps = 2.0 ** -47 if jax.default_backend() == "tpu" else u
    res_dev = res * u / device_eps
    orth_dev = orth * u / device_eps

    from starneig_tpu.node import verify_backend
    backend_defect = verify_backend()

    # flops: Hessenberg 10/3 n^3 + Q accumulation 4/3 n^3; Schur effective
    # volume from the reference transcript (9.5 s at 16 GFLOP/s, n=4000)
    hess_gflops = (10.0 / 3.0 + 4.0 / 3.0) * n ** 3 / 1e9
    schur_gflops = 2.3 * n ** 3 / 1e9
    peak = measure_f64_gemm_peak(dtype)

    baseline_ms = 22600.0 * (n / 4000.0) ** 3  # cubic scaling from n=4000
    achieved = (hess_gflops + schur_gflops) / (total_ms / 1e3)
    out = {
        "metric": f"sep_hessenberg+schur_n{n}_wallclock",
        "value": round(total_ms, 1),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / total_ms, 3),
        "detail": {
            "hessenberg_ms": round(t_hess * 1e3, 1),
            "schur_ms": round(t_schur * 1e3, 1),
            "residual_u": round(res, 1),
            "orthogonality_u": round(orth, 1),
            "residual_device_u": round(res_dev, 1),
            "orthogonality_device_u": round(orth_dev, 1),
            "info": int(info),
            "n": n,
            "dtype": str(np.dtype(dtype)),
            "backend": jax.default_backend(),
            "hessenberg_gflops": round(hess_gflops / t_hess, 1),
            "schur_gflops": round(schur_gflops / t_schur, 1),
            "device_gemm_peak_gflops": round(peak, 1),
            "fraction_of_gemm_peak": round(achieved / peak, 3),
            "backend_orth_defect": backend_defect,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
