"""Accuracy probe: per-phase residual/orthogonality in units of u (CPU f64).

Usage: JAX_PLATFORMS=cpu python tools/probe_accuracy.py [n] [seed]

Writes one JSON line per phase so the regression is bisectable
(ADVICE.md round 2: check in the probe + artifact).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if os.environ.get("PROBE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def report(name, A, S, Q, t):
    u = np.finfo(np.float64).eps
    nrm = np.linalg.norm(A)
    res = np.linalg.norm(Q @ S @ Q.T - A) / nrm / u
    orth = np.linalg.norm(Q @ Q.T - np.eye(A.shape[0])) / np.sqrt(A.shape[0]) / u
    print(json.dumps({"phase": name, "residual_u": round(float(res), 1),
                      "orth_u": round(float(orth), 1), "sec": round(t, 2)}))
    return res, orth


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    Aj = jnp.asarray(A)

    from starneig_tpu.api import sep

    # NB: on the tunneled TPU platform block_until_ready does not actually
    # wait for completion — force a scalar D2H to synchronize timings
    t0 = time.time()
    H, Q = sep.hessenberg(Aj)
    float(jnp.sum(H))
    t_h = time.time() - t0
    Hn, Qn = np.asarray(H), np.asarray(Q)
    report("hessenberg", A, Hn, Qn, t_h)

    t0 = time.time()
    S, Q2, er, ei, info = sep.schur(H, Q)
    float(jnp.sum(S))
    t_s = time.time() - t0
    Sn, Q2n = np.asarray(S), np.asarray(Q2)
    res, orth = report("hessenberg+schur", A, Sn, Q2n, t_s)

    # schur phase alone: residual of S vs H through the incremental Z
    Z = Qn.T @ Q2n
    report("schur-alone", Hn, Sn, Z, t_s)
    print(json.dumps({"phase": "meta", "n": n, "seed": seed,
                      "info": int(info), "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
