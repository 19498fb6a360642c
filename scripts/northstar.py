"""North-star workload runner (BASELINE.md): chordally decomposed 10k-node
SDP solved to 1e-5 residual on the TPU.

Runs the decomposed banded / maxcut SDP family at a given size through the
full Model pipeline with the f32 default configuration (compensated df32
KKT refinement + block-diagonal direct KKT + AA stagnation toggle), using
``time_limit`` so every device dispatch stays ~250 iterations (the dev
tunnel kills long single dispatches — CLAUDE.md).

Usage:
    python scripts/northstar.py [--problem banded|maxcut] [--nodes 10000]
        [--bandwidth 8] [--time-limit 1800] [--eps 1e-5] [--f64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="banded", choices=["banded", "maxcut"])
    ap.add_argument("--nodes", type=int, default=10_000)
    ap.add_argument("--bandwidth", type=int, default=8)
    ap.add_argument("--density", type=float, default=-1.0)
    ap.add_argument("--time-limit", type=float, default=1800.0)
    ap.add_argument("--eps", type=float, default=1e-5)
    ap.add_argument("--max-iter", type=int, default=20_000)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    # ADMM+AA iteration counts are chaotic across tiny numeric changes
    # (BASELINE.md documents +-75% swings); a single run cannot separate a
    # real regression from the noise band. --seeds N solves N problem
    # instances and reports the median/min/max warm statistics.
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--rho-overlap-scale", type=float, default=-1.0,
                    help="override Settings.rho_overlap_scale (-1 = default)")
    ap.add_argument("--rho-tol", type=float, default=-1.0,
                    help="override Settings.adaptive_rho_tolerance "
                         "(the rho deadband; -1 = default)")
    ap.add_argument("--eigh", default="",
                    help="override Settings.eigh_backend (experiments)")
    ap.add_argument("--accel", default="default",
                    help="'none' disables the accelerator (experiments)")
    ap.add_argument("--seed-start", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        import cosmo_tpu

        cosmo_tpu.enable_x64()
    import cosmo_tpu as ct
    from cosmo_tpu import problems

    def run_seed(seed: int):
        t0 = time.perf_counter()
        if args.problem == "banded":
            P, q, A, b, sets, _ = problems.banded_sdp(
                n_nodes=args.nodes, bandwidth=args.bandwidth, seed=seed,
                sparse=True,
            )
        else:
            density = args.density if args.density > 0 else 4.0 / args.nodes
            P, q, A, b, sets, _ = problems.maxcut(
                n_nodes=args.nodes, density=density, seed=seed, sparse=True
            )
        t_gen = time.perf_counter() - t0

        dtype = np.float64 if args.f64 else np.float32
        overrides = {}
        if args.rho_overlap_scale > 0:
            overrides["rho_overlap_scale"] = args.rho_overlap_scale
        if args.rho_tol > 0:
            overrides["adaptive_rho_tolerance"] = args.rho_tol
        if args.eigh:
            overrides["eigh_backend"] = args.eigh
        if args.accel == "none":
            overrides["accelerator"] = None
        model = ct.Model(
            ct.Settings(
                **overrides,
                eps_abs=args.eps,
                eps_rel=args.eps,
                max_iter=args.max_iter,
                time_limit=args.time_limit,
                decompose=True,
                dtype=dtype,
                verbose=args.seeds == 1,
            )
        )
        model.set(P, q, A, b, sets)
        r = model.optimize()
        # second solve: decomposition + compiled program cached
        r2 = model.optimize()
        return {
            "seed": seed,
            "m_pre_decomposition": int(A.shape[0]),
            "status": r.status,
            "iter": r.iter,
            "r_prim": r.info.r_prim,
            "r_dual": r.info.r_dual,
            "obj": r.obj_val,
            "gen_s": round(t_gen, 2),
            "setup_s": round(r.times.setup_time, 2),
            "iter_s_cold": round(r.times.iter_time, 2),
            "solver_s_cold": round(r.times.solver_time, 2),
            "warm": {
                "status": r2.status,
                "iter": r2.iter,
                "iter_s": round(r2.times.iter_time, 2),
                "solver_s": round(r2.times.solver_time, 2),
                "iters_per_s": round(r2.iter / max(r2.times.iter_time, 1e-9), 1),
            },
        }

    runs = [run_seed(s)
            for s in range(args.seed_start, args.seed_start + args.seeds)]
    out = {"problem": args.problem, "nodes": args.nodes, "runs": runs}
    if args.seeds > 1:
        med = lambda xs: float(np.median(np.asarray(xs, float)))
        w_iters = [r["warm"]["iter"] for r in runs]
        w_times = [r["warm"]["solver_s"] for r in runs]
        out["warm_median"] = {
            "iter": med(w_iters), "iter_min": min(w_iters),
            "iter_max": max(w_iters),
            "solver_s": med(w_times), "solver_s_min": min(w_times),
            "solver_s_max": max(w_times),
            "all_solved": all(r["warm"]["status"] == "Solved" for r in runs),
        }
    else:
        out.update(runs[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
