"""Command-line test/benchmark driver (the ``starneig-test`` equivalent).

Rebuild of the reference's modular experiment runner (``test/``, SURVEY.md
section 4): an experiment = initializer -> solver -> hooks, with
``--repeat/--warmup`` timing loops and standardized metric lines.

    python -m starneig_tpu.cli --experiment schur --n 1000 --repeat 3
    python -m starneig_tpu.cli --experiment full-chain --generalized \\
        --init known --complex-ratio 0.4 --hooks residual,eigenvalues

Experiments (reference test/main.c:66-121):
  hessenberg | schur | reorder | eigenvectors | full-chain
Initializers (reference initializers, section 4):
  random | known (planted spectrum; --complex-ratio/--zero-ratio/--inf-ratio)
  read-raw (--input file.npz) | read-mtx (--input a.mtx[,b.mtx], io.c:713)
Hooks (reference test/common/hooks.c):
  residual, orthogonality, structure, eigenvalues, known-eigenvalues
  (chordal for GEP, hooks.c:1344), analysis (zero/inf counts, hooks.c:1511),
  reordering (leading-block check + perturbation), print,
  store-raw (--output file.npz)
Selection: --select-ratio + --select-distr uniform|cluster
(select_distr.c:105-268).  --repeat prints avg/cv/min/max statistics
(hook_experiment.c:1923-1935).
Thresholds in units of unit roundoff u: residual warn 500 / fail 10000
(docs/_7_test_driver.md:129); known-eigenvalue comparisons warn 10000 /
fail 1000000 (conditioning-aware, hooks.c:1071-1072).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(prog="starneig-tpu-test", description=__doc__)
    p.add_argument("--experiment", required=True,
                   choices=["hessenberg", "schur", "reorder", "eigenvectors",
                            "full-chain"])
    p.add_argument("--generalized", action="store_true",
                   help="GEP variant (pencil) of the experiment")
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--init", default="random",
                   choices=["random", "known", "read-raw", "read-mtx"])
    p.add_argument("--complex-ratio", type=float, default=0.5)
    p.add_argument("--zero-ratio", type=float, default=0.0)
    p.add_argument("--inf-ratio", type=float, default=0.0)
    p.add_argument("--select-ratio", type=float, default=0.35)
    p.add_argument("--select-distr", default="uniform",
                   choices=["uniform", "cluster"],
                   help="selection distribution (select_distr.c:105-268)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--hooks", default="residual,orthogonality,structure")
    p.add_argument("--residual-fail-threshold", type=float, default=10000.0)
    p.add_argument("--residual-warn-threshold", type=float, default=500.0)
    p.add_argument("--eigenvalues-fail-threshold", type=float, default=10000.0)
    # known-spectrum comparisons carry eigenvalue-conditioning error; the
    # reference gates them 100x looser (hooks.c:1071-1072)
    p.add_argument("--known-eigenvalues-fail-threshold", type=float,
                   default=1000000.0)
    p.add_argument("--known-eigenvalues-warn-threshold", type=float,
                   default=10000.0)
    p.add_argument("--input", default=None, help="npz file for read-raw")
    p.add_argument("--output", default=None, help="npz file for store-raw")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu/tpu)")
    p.add_argument("--keep-going", action="store_true")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    return p


def main(argv=None):
    args = _build_parser().parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from starneig_tpu.api import sep, gep
    from starneig_tpu import testing as tst
    from starneig_tpu.testing import hooks as hk

    rng_seed = args.seed
    n = args.n
    u = 1.1102230246251565e-16 / 2 * 2  # f64 unit roundoff

    # ---------------- initializer ----------------
    supplement = {}
    if args.init == "read-raw":
        data = np.load(args.input)
        A = data["A"]
        B = data.get("B")
        n = A.shape[0]
    elif args.init == "read-mtx":
        # MatrixMarket input (reference test/common/io.c:713); a second
        # --input separated by a comma loads the pencil's B matrix
        import scipy.io

        def _mm(path):
            m = scipy.io.mmread(path)
            return np.asarray(m.todense() if hasattr(m, "todense") else m,
                              dtype=float)

        paths = args.input.split(",")
        A = _mm(paths[0])
        B = _mm(paths[1]) if len(paths) > 1 else None
        n = A.shape[0]
    elif args.init == "known":
        if args.generalized:
            A, B, alpha, beta = tst.known_spectrum_pencil(
                n, complex_ratio=args.complex_ratio,
                zero_ratio=args.zero_ratio, inf_ratio=args.inf_ratio,
                seed=rng_seed)
            supplement["alpha"], supplement["beta"] = alpha, beta
        else:
            A, eig = tst.known_spectrum_matrix(
                n, complex_ratio=args.complex_ratio,
                zero_ratio=args.zero_ratio, seed=rng_seed)
            supplement["eig"] = eig
            B = None
    else:
        A = tst.random_dense(n, seed=rng_seed)
        B = (tst.random_dense(n, seed=rng_seed + 1) + 3 * np.eye(n)
             if args.generalized else None)

    hooks = args.hooks.split(",")
    results = {"experiment": args.experiment, "n": n,
               "generalized": bool(args.generalized), "times_ms": []}
    ok = True

    def run_once():
        """One timed solver run; returns a dict of outputs."""
        t0 = time.time()
        out = {}
        if args.generalized:
            if args.experiment == "hessenberg":
                H, T, Q, Z = gep.hessenberg_triangular(A, B)
                out.update(S=H, T=T, Q=Q, Z=Z)
            elif args.experiment == "schur":
                H, T, Q, Z = gep.hessenberg_triangular(A, B)
                S, T2, Q, Z, ar, ai, bt, info = gep.schur(H, T, Q, Z)
                out.update(S=S, T=T2, Q=Q, Z=Z, ar=ar, ai=ai, bt=bt, info=info)
            else:  # reorder / eigenvectors / full-chain all need the chain
                S, T2, Q, Z, ar, ai, bt, nsel, info = gep.reduce(A, B)
                if args.experiment in ("reorder", "full-chain"):
                    sub = np.concatenate([np.diagonal(np.asarray(S), -1), [0.0]])
                    sel_in = hk.selection_bitmap(
                        np.asarray(ar), np.asarray(ai), sub,
                        args.select_ratio, args.select_distr, rng_seed)
                    out["pre_alpha"] = np.asarray(ar)[sel_in] + \
                        1j * np.asarray(ai)[sel_in]
                    out["pre_beta"] = np.asarray(bt)[sel_in]
                    out["sel_in"] = sel_in
                    S, T2, Q, Z, nsel, info = gep.reorder_schur(
                        S, T2, Q, Z, sel_in)
                    ar, ai, bt = gep.eigenvalues(S, T2)
                out.update(S=S, T=T2, Q=Q, Z=Z, ar=ar, ai=ai, bt=bt,
                           info=info, nsel=nsel)
                if args.experiment in ("eigenvectors", "full-chain"):
                    sel = np.zeros(n, bool)
                    sel[:max(1, int(nsel) or int(n * args.select_ratio))] = True
                    X, xinfo = gep.eigenvectors(S, T2, Q, Z, sel)
                    out.update(X=X, sel=sel)
        else:
            if args.experiment == "hessenberg":
                H, Q = sep.hessenberg(A)
                out.update(S=H, Q=Q)
            elif args.experiment == "schur":
                H, Q = sep.hessenberg(A)
                S, Q, er, ei, info = sep.schur(H, Q)
                out.update(S=S, Q=Q, er=er, ei=ei, info=info)
            else:
                S, Q, er, ei, nsel, info = sep.reduce(A)
                if args.experiment in ("reorder", "full-chain"):
                    sub = np.concatenate([np.diagonal(np.asarray(S), -1), [0.0]])
                    sel_in = hk.selection_bitmap(
                        np.asarray(er), np.asarray(ei), sub,
                        args.select_ratio, args.select_distr, rng_seed)
                    out["pre_eig"] = np.asarray(er)[sel_in] + \
                        1j * np.asarray(ei)[sel_in]
                    out["sel_in"] = sel_in
                    S, Q, nsel, info = sep.reorder_schur(S, Q, sel_in)
                    er, ei = sep.eigenvalues(S)
                out.update(S=S, Q=Q, er=er, ei=ei, info=info, nsel=nsel)
                if args.experiment in ("eigenvectors", "full-chain"):
                    sel = np.zeros(n, bool)
                    sel[:max(1, int(nsel) or int(n * args.select_ratio))] = True
                    X, xinfo = sep.eigenvectors(S, Q, sel)
                    out.update(X=X, sel=sel)
        np.asarray(out["S"])  # block
        out["time_ms"] = (time.time() - t0) * 1e3
        return out

    for _ in range(args.warmup):
        run_once()
    out = None
    for r in range(args.repeat):
        out = run_once()
        results["times_ms"].append(round(out["time_ms"], 1))
        print(f"EXPERIMENT TIME = {out['time_ms']:.1f} ms")
    # repeat statistics (reference hook_experiment.c:1923-1935)
    ts = np.asarray(results["times_ms"], float)
    results["time_stats"] = {
        "avg_ms": round(float(ts.mean()), 1),
        "cv": round(float(ts.std() / ts.mean()) if ts.mean() else 0.0, 4),
        "min_ms": round(float(ts.min()), 1),
        "max_ms": round(float(ts.max()), 1),
    }
    if args.repeat > 1:
        st = results["time_stats"]
        print(f"EXPERIMENT TIME = avg {st['avg_ms']} ms, cv {st['cv']}, "
              f"min {st['min_ms']} ms, max {st['max_ms']} ms")

    # ---------------- hooks ----------------
    S = np.asarray(out["S"])
    Q = np.asarray(out["Q"])
    checks = {}
    if "residual" in hooks:
        if args.generalized:
            ra, rb = hk.residual_gep(A, B, S, np.asarray(out["T"]), Q,
                                     np.asarray(out["Z"]))
            checks["residual_a_u"] = ra
            checks["residual_b_u"] = rb
            worst = max(ra, rb)
        else:
            worst = hk.residual_sep(A, S, Q)
            checks["residual_u"] = worst
        ok &= worst < args.residual_fail_threshold
        tag = ("FAIL" if worst >= args.residual_fail_threshold else
               "warn" if worst >= args.residual_warn_threshold else "ok")
        print(f"RESIDUAL = {worst:.1f} u [{tag}]")
    if "orthogonality" in hooks:
        o1 = hk.orthogonality(Q)
        checks["orthogonality_q_u"] = o1
        worst = o1
        if args.generalized:
            o2 = hk.orthogonality(np.asarray(out["Z"]))
            checks["orthogonality_z_u"] = o2
            worst = max(o1, o2)
        ok &= worst < args.residual_fail_threshold
        print(f"ORTHOGONALITY = {worst:.1f} u")
    if "structure" in hooks:
        if args.experiment == "hessenberg":
            e = hk.hessenberg_structure_error(S)
        else:
            e = hk.schur_structure_error(S)
        checks["structure_error"] = e
        ok &= e == 0.0
        print(f"STRUCTURE ERROR = {e:.2e}")
    if ("eigenvalues" in hooks or "known-eigenvalues" in hooks) \
            and "eig" in supplement:
        er = np.asarray(out["er"])
        ei = np.asarray(out["ei"])
        err = hk.eigenvalue_error(er + 1j * ei, supplement["eig"])
        checks["eigenvalue_err_u"] = err
        ok &= err < args.known_eigenvalues_fail_threshold
        tag = ("FAIL" if err >= args.known_eigenvalues_fail_threshold else
               "warn" if err >= args.known_eigenvalues_warn_threshold else "ok")
        print(f"EIGENVALUE ERROR = {err:.1f} u [{tag}]")
    if "known-eigenvalues" in hooks and "alpha" in supplement:
        # GEP known-spectrum check via the chordal metric (hooks.c:1344).
        # The gate runs over the finite planted eigenvalues: orthogonal
        # scrambling smears exact B-singularity below detection (LAPACK
        # behaves identically); the analysis hook reports recovered infs.
        fin = np.abs(supplement["beta"]) > 0
        err = hk.chordal_eigenvalue_error(
            np.asarray(out["ar"]), np.asarray(out["ai"]),
            np.asarray(out["bt"]), supplement["alpha"][fin],
            supplement["beta"][fin])
        checks["chordal_eigenvalue_err_u"] = err
        ok &= err < args.known_eigenvalues_fail_threshold
        print(f"KNOWN EIGENVALUES (chordal, finite) = {err:.1f} u")
    if "analysis" in hooks:
        ana = hk.spectrum_analysis(
            np.asarray(out["er" if not args.generalized else "ar"]),
            np.asarray(out["ei" if not args.generalized else "ai"]),
            np.asarray(out["bt"]) if args.generalized else None)
        checks.update({f"analysis_{k}": v for k, v in ana.items()})
        print(f"ANALYSIS = {ana['zero']} zero, {ana['infinite']} infinite, "
              f"{ana['indefinite']} indefinite of {ana['total']}")
    if "reordering" in hooks and "sel_in" in out:
        # selected eigenvalues landed in the leading block, values intact
        # (the reorder-module hook; per-eigenvalue perturbation mean/max as
        # in docs/_7_test_driver.md:148)
        nsel = int(out["nsel"])
        if args.generalized:
            # (alpha, beta) pairs are only defined up to per-eigenvalue
            # scaling — compare via the chordal metric, which is scaling
            # invariant (raw alpha distance would FAIL on a rescaled pair)
            err = hk.chordal_eigenvalue_error(
                np.asarray(out["ar"])[:nsel], np.asarray(out["ai"])[:nsel],
                np.asarray(out["bt"])[:nsel],
                out["pre_alpha"], out["pre_beta"]) if nsel else 0.0
        else:
            lead = (np.asarray(out["er"]) + 1j * np.asarray(out["ei"]))[:nsel]
            err = hk.eigenvalue_error(lead, out["pre_eig"]) if nsel else 0.0
        nsel_in = int(np.asarray(out["sel_in"]).sum())
        checks["reordering_err_u"] = err
        checks["reordering_selected"] = nsel
        ok &= err < args.eigenvalues_fail_threshold
        ok &= (nsel == nsel_in) or out["info"] == 6  # PARTIAL_REORDERING
        print(f"REORDERING = {nsel}/{nsel_in} in leading block, "
              f"max perturbation {err:.1f} u")
    if "print" in hooks:
        print(S)
    if args.output:
        save = {"A": A, "S": S, "Q": Q}
        if args.generalized:
            save.update(B=B, T=np.asarray(out["T"]), Z=np.asarray(out["Z"]))
        np.savez(args.output, **save)

    results["checks"] = {k: float(v) for k, v in checks.items()}
    results["ok"] = bool(ok)
    if args.json:
        print(json.dumps(results))
    if not ok and not args.keep_going:
        sys.exit(1)
    return results


if __name__ == "__main__":
    main()
