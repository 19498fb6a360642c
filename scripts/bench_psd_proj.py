"""Microbenchmark of the PSD projection backends at merged-clique sizes
(VERDICT r2 weak #5: the Pallas kernels were only ever measured at k=16;
k=24-48 — the sides the conedata geometric ladder produces after merging —
always take the polar path; re-evaluate the round-parallel variant there,
where its op-count advantage should grow).

Times, per [B, k, k] f32 stack on the real TPU:
  - Pallas Jacobi, serial pair chain (the shipped kernel)
  - Pallas Jacobi, round-parallel (COSMO_TPU_PALLAS_RR)
  - Newton-Schulz polar (ops/eigh.psd_project_polar)
  - XLA eigh reference

Each timing chains REPS projections inside one jit (the axon tunnel RTT
~50 ms dwarfs single-kernel times) and forces a host transfer before
reading the clock.

Usage: python scripts/bench_psd_proj.py [--shapes 512x16,1250x32,640x48]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPS = 50


def time_fn(fn, X):
    import jax

    out = fn(X)
    float(out.ravel()[0])   # force transfer: block_until_ready lies on axon
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(X)
        float(out.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="512x16,1250x32,640x48")
    ap.add_argument("--sweeps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cosmo_tpu.ops import eigh as eigh_ops
    from cosmo_tpu.ops import pallas_eigh

    rng = np.random.default_rng(0)
    rows = []
    for shp in args.shapes.split(","):
        B, k = (int(v) for v in shp.split("x"))
        M = rng.standard_normal((B, k, k)).astype(np.float32)
        M = (M + np.transpose(M, (0, 2, 1))) / 2
        X = jnp.asarray(M)

        def chain(proj):
            @jax.jit
            def run(X):
                def body(i, Y):
                    # re-symmetrize + small perturbation so XLA can't CSE
                    Y = 0.5 * (Y + jnp.swapaxes(Y, 1, 2))
                    return proj(Y + 1e-6 * i)
                from jax import lax
                return lax.fori_loop(0, REPS, body, X)
            return run

        def attempt(entry, key, fn):
            try:
                entry[key] = round(1e6 * time_fn(chain(fn), X))
            except Exception as e:  # VMEM OOM at large k is a finding
                entry[key] = f"FAIL: {str(e)[:120]}"

        with jax.default_matmul_precision("highest"):
            entry = {"shape": f"{B}x{k}"}
            os.environ.pop("COSMO_TPU_PALLAS_RR", None)
            attempt(entry, "pallas_serial_us",
                    lambda Y: pallas_eigh.psd_project_pallas(Y, args.sweeps))
            os.environ["COSMO_TPU_PALLAS_RR"] = "1"
            attempt(entry, "pallas_rr_us",
                    lambda Y: pallas_eigh.psd_project_pallas(Y, args.sweeps))
            os.environ.pop("COSMO_TPU_PALLAS_RR", None)
            attempt(entry, "polar_us", eigh_ops.psd_project_polar)

            def xla_proj(Y):
                w, V = jnp.linalg.eigh(Y)
                return jnp.einsum("bik,bk,bjk->bij", V, jnp.maximum(w, 0.0), V)

            attempt(entry, "xla_eigh_us", xla_proj)
        rows.append(entry)
        print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
