"""Sweep Settings.rho_overlap_scale (per-clique-block rho weighting) on the
decomposed banded SDP, reporting iteration counts per (scale, seed).

Separator conditioning is the decomposed dual's bottleneck (VERDICT r2 #3);
this measures whether down/up-weighting overlap-heavy blocks' rho tames the
iteration count. Iteration counts are chaotic (+-75% across tiny numeric
changes, BASELINE.md) so every scale runs multiple seeds and the median is
the decision metric. rho_row_scale is a dynamic (non-recompiling) input, so
the whole sweep shares one compiled program per problem shape.

Usage: python scripts/sweep_rho.py [--nodes 2000] [--seeds 3]
           [--scales 0.25,0.5,1,2,4] [--eps 1e-5] [--cpu]
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
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--scales", default="0.25,0.5,1,2,4")
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

    scales = [float(s) for s in args.scales.split(",")]
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

    results = []
    for scale in scales:
        iters, statuses, times_s = [], [], []
        for seed in range(args.seeds):
            P, q, A, b, sets = probs[seed]
            model = ct.Model(
                ct.Settings(
                    eps_abs=args.eps, eps_rel=args.eps,
                    max_iter=args.max_iter, decompose=True,
                    dtype=np.float32, verbose=False,
                    rho_overlap_scale=scale,
                )
            )
            model.set(P, q, A, b, sets)
            t0 = time.perf_counter()
            r = model.optimize()
            dt = time.perf_counter() - t0
            iters.append(r.iter)
            statuses.append(r.status)
            times_s.append(round(dt, 1))
        row = {
            "scale": scale,
            "iter_median": float(np.median(iters)),
            "iters": iters,
            "statuses": statuses,
            "wall_s": times_s,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["iter_median"])
    print(json.dumps({"best_scale": best["scale"],
                      "best_iter_median": best["iter_median"]}))


if __name__ == "__main__":
    main()
