"""Certificate overhead at the north-star scale (VERDICT r3 #5).

Measures the infeasibility-certificate machinery's share of fixed-work
throughput: eps_prim_inf = eps_dual_inf = 0 statically removes the shadow
windows + membership batteries from the compiled program (solver.py
infeas_enabled), so the delta is exactly the certificate cost.

Usage: python scripts/measure_cert_overhead.py [--nodes 10000] [--iters 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(nodes, iters, label, **kw):
    import numpy as np

    import cosmo_tpu as ct
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(
        n_nodes=nodes, bandwidth=8, seed=0, sparse=True
    )
    base = dict(
        eps_abs=0.0, eps_rel=0.0, max_iter=iters, decompose=True,
        dtype=np.float32,
    )
    base.update(kw)
    m = ct.Model(ct.Settings(**base))
    m.set(P, q, A, b, sets)
    m.optimize()
    best = 1e9
    for _ in range(2):
        r = m.optimize()
        best = min(best, r.times.iter_time)
    out = dict(label=label, iters=int(r.iter),
               iters_per_s=round(int(r.iter) / best, 1))
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=2000)
    a = ap.parse_args()
    with_c = run(a.nodes, a.iters, "certificates_on")          # defaults
    no_c = run(a.nodes, a.iters, "certificates_off",
               eps_prim_inf=0.0, eps_dual_inf=0.0)
    share = 1.0 - with_c["iters_per_s"] / no_c["iters_per_s"]
    print(json.dumps({"certificate_overhead_share": round(share, 4)}))


if __name__ == "__main__":
    main()
