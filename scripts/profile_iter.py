"""Per-iteration cost breakdown of the decomposed banded SDP on the TPU,
by feature toggles (each variant recompiles; run on a mid-size problem).

Usage: python scripts/profile_iter.py [--nodes 2000] [--iters 800]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(nodes, iters, label, **kw):
    import numpy as np
    import cosmo_tpu as ct
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(
        n_nodes=nodes, bandwidth=8, seed=0, sparse=True
    )
    base = dict(
        eps_abs=0.0, eps_rel=0.0,               # never terminate: fixed work
        max_iter=iters, check_termination=25, check_infeasibility=40,
        decompose=True, dtype=np.float32,
    )
    base.update(kw)
    settings = ct.Settings(**base)
    m = ct.Model(settings)
    m.set(P, q, A, b, sets)
    r = m.optimize()                            # compile + warmup
    t0 = time.perf_counter()
    r = m.optimize()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "label": label, "iters": int(r.iter), "s": round(dt, 2),
        "iters_per_s": round(r.iter / dt, 1),
        "ms_per_iter": round(1e3 * dt / max(int(r.iter), 1), 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=800)
    a = ap.parse_args()
    run(a.nodes, a.iters, "default")
    run(a.nodes, a.iters, "no_accel", accelerator=None)
    run(a.nodes, a.iters, "no_refine", kkt_refine_steps=0)
    run(a.nodes, a.iters, "no_checks", check_termination=10**6,
        check_infeasibility=2**30)
    run(a.nodes, a.iters, "no_accel_no_refine_no_checks", accelerator=None,
        kkt_refine_steps=0, check_termination=10**6, check_infeasibility=2**30)
    run(a.nodes, a.iters, "polar", eigh_backend="polar")
    run(a.nodes, a.iters, "no_scaling", scaling=0)


if __name__ == "__main__":
    main()
