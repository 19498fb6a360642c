"""Sweep Anderson-acceleration hyperparameters on the decomposed banded SDP
(VERDICT r2 #3: attack the north-star iteration count, with statistics).

Each grid point is (mem, memory mode, type); seeds × medians because the
iteration counts are chaotic (BASELINE.md). ``accelerator_mem`` is a static
(shape-changing) setting, so every mem value costs one compile; the
persistent TPU compile cache amortizes repeats across processes.

Usage: python scripts/sweep_aa.py [--nodes 2000] [--seeds 6]
           [--mems 10,15,20,30] [--modes restarted] [--types type2]
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
    ap.add_argument("--nodes", type=int, default=2000)
    ap.add_argument("--bandwidth", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--mems", default="10,15,20,30")
    ap.add_argument("--modes", default="restarted")
    ap.add_argument("--types", default="type2")
    ap.add_argument("--rho-overlap-scale", type=float, default=1.0)
    ap.add_argument("--eps", type=float, default=1e-5)
    ap.add_argument("--max-iter", type=int, default=20_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cosmo_tpu as ct
    from cosmo_tpu import problems

    probs = {}
    for seed in range(args.seeds):
        if args.problem == "banded":
            probs[seed] = problems.banded_sdp(
                n_nodes=args.nodes, bandwidth=args.bandwidth, seed=seed,
                sparse=True,
            )[:5]
        else:
            probs[seed] = problems.maxcut(
                n_nodes=args.nodes, density=4.0 / args.nodes, seed=seed,
                sparse=True,
            )[:5]

    grid = [
        (int(mem), mode, typ)
        for mem in args.mems.split(",")
        for mode in args.modes.split(",")
        for typ in args.types.split(",")
    ]
    results = []
    for mem, mode, typ in grid:
        iters, statuses, times_s = [], [], []
        for seed in range(args.seeds):
            P, q, A, b, sets = probs[seed]
            model = ct.Model(
                ct.Settings(
                    eps_abs=args.eps, eps_rel=args.eps,
                    max_iter=args.max_iter, decompose=True,
                    dtype=np.float32, verbose=False,
                    accelerator_mem=mem, accelerator_memory=mode,
                    accelerator_type=typ,
                    rho_overlap_scale=args.rho_overlap_scale,
                )
            )
            model.set(P, q, A, b, sets)
            t0 = time.perf_counter()
            r = model.optimize()
            iters.append(r.iter)
            statuses.append(r.status)
            times_s.append(round(time.perf_counter() - t0, 1))
        row = {
            "mem": mem, "mode": mode, "type": typ,
            "iter_median": float(np.median(iters)),
            "iters": iters, "statuses": statuses, "wall_s": times_s,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["iter_median"])
    print(json.dumps({"best": [best["mem"], best["mode"], best["type"]],
                      "best_iter_median": best["iter_median"]}))


if __name__ == "__main__":
    main()
