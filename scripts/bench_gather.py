"""Gather/scatter variant shoot-out on the REAL blockkkt index data.

The round-5 split measured the fused blockkkt solve as ~100% index
movement (gathers 6.0 ms + scatters 4.4 ms of the 10.3 ms solve at the 10k
north-star; einsums 5.5 us). This benchmarks formulations of the SAME
movement so the winner can be wired into ops/blockkkt.py.

Usage: python scripts/bench_gather.py [--nodes 10000] [--reps 300]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _loop_timed(body, carry0, reps_lo, reps_hi):
    import jax
    from jax import lax
    import numpy as np

    @jax.jit
    def run(c, nreps):
        return lax.fori_loop(0, nreps, lambda _, c: body(c), c, unroll=False)

    def once(nreps):
        with jax.default_matmul_precision("highest"):
            out = run(carry0, nreps)
        leaves = jax.tree_util.tree_leaves(out)
        return float(np.asarray(leaves[0].ravel()[0]))

    once(reps_lo)
    once(reps_hi)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        once(reps_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        once(reps_hi)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (reps_hi - reps_lo))
    return best * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10000)
    ap.add_argument("--reps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import scipy.sparse as sp
    import jax
    import jax.numpy as jnp
    from jax import lax

    import cosmo_tpu as ct
    from cosmo_tpu import chordal, problems
    from cosmo_tpu.ops import blockkkt

    P, q, A, b, sets, _ = problems.maxcut(
        n_nodes=a.nodes, density=4.0 / a.nodes, seed=0, sparse=True)
    st_ = ct.Settings(decompose=True, accelerator=None, adaptive_rho=False)
    ci = chordal.decompose(P, q, A, b, sets, st_, pad_batch=1)
    P2, q2, A2, b2, sets2 = ci.problem
    m, n = A2.shape
    meta = blockkkt.analyze(sp.csr_matrix(P2), sp.csr_matrix(A2),
                            max_block=64)
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal(m + 1), dtype)
    rl, rh = max(a.reps // 4, 10), a.reps
    out = {}

    rows_list = [np.asarray(bkt.row_ids).reshape(-1) for bkt in meta.buckets]
    rows_flat = np.concatenate(rows_list)
    nR = rows_flat.size
    print(json.dumps({"m": int(m), "n": int(n), "total_idx": int(nR)}),
          flush=True)
    rows_dev = [jnp.asarray(r) for r in rows_list]
    rows_flat_d = jnp.asarray(rows_flat)
    # sorted variant: host-side sort (the slot order is ours to choose)
    sort_perm = np.argsort(rows_flat, kind="stable")
    rows_sorted_d = jnp.asarray(rows_flat[sort_perm])
    vals0 = jnp.asarray(rng.standard_normal(nR), dtype)

    def emit(k, v):
        out[k] = round(v, 1)
        print(json.dumps({k: out[k], "ns_per_elem": round(1e3 * v / nR, 2)}),
              flush=True)

    # ---- gathers ----
    def g_perbucket(w):
        acc = jnp.zeros((), dtype)
        for r in rows_dev:
            acc = acc + jnp.sum(w[r])
        return w * 0.9999 + 1e-30 * acc
    emit("gather_6x_flat", _loop_timed(g_perbucket, w0, rl, rh))

    def g_perbucket_2d(w):
        acc = jnp.zeros((), dtype)
        for bkt in meta.buckets:
            acc = acc + jnp.sum(w[jnp.asarray(bkt.row_ids)])
        return w * 0.9999 + 1e-30 * acc
    emit("gather_6x_NR", _loop_timed(g_perbucket_2d, w0, rl, rh))

    def g_one(w):
        return w * 0.9999 + 1e-30 * jnp.sum(w[rows_flat_d])
    emit("gather_1x_flat", _loop_timed(g_one, w0, rl, rh))

    def g_one_sorted(w):
        y = lax.gather(
            w, rows_sorted_d[:, None],
            lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1,), indices_are_sorted=True, unique_indices=False,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return w * 0.9999 + 1e-30 * jnp.sum(y)
    emit("gather_1x_sorted", _loop_timed(g_one_sorted, w0, rl, rh))

    def g_take(w):
        return w * 0.9999 + 1e-30 * jnp.sum(
            jnp.take(w, rows_flat_d, mode="clip"))
    emit("gather_take_clip", _loop_timed(g_take, w0, rl, rh))

    # ---- scatters (targets are unique across all buckets) ----
    def s_perbucket(w):
        o = jnp.zeros(m + 1, dtype)
        for i, r in enumerate(rows_dev):
            o = o.at[r].set(vals0[:r.shape[0]] * w[0])
        return 0.999 * w + 0.001 * o
    emit("scatter_6x_set", _loop_timed(s_perbucket, w0, rl, rh))

    def s_one(w):
        o = jnp.zeros(m + 1, dtype).at[rows_flat_d].set(vals0 * w[0])
        return 0.999 * w + 0.001 * o
    emit("scatter_1x_set", _loop_timed(s_one, w0, rl, rh))

    def s_one_unique(w):
        o = jnp.zeros(m + 1, dtype).at[rows_flat_d].set(
            vals0 * w[0], unique_indices=True,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return 0.999 * w + 0.001 * o
    emit("scatter_1x_unique", _loop_timed(s_one_unique, w0, rl, rh))

    def s_one_add(w):
        o = jnp.zeros(m + 1, dtype).at[rows_flat_d].add(
            vals0 * w[0], mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return 0.999 * w + 0.001 * o
    emit("scatter_1x_add", _loop_timed(s_one_add, w0, rl, rh))

    def s_sorted_unique(w):
        o = jnp.zeros(m + 1, dtype).at[rows_sorted_d].set(
            vals0 * w[0], unique_indices=True, indices_are_sorted=True,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return 0.999 * w + 0.001 * o
    emit("scatter_sorted_unique", _loop_timed(s_sorted_unique, w0, rl, rh))

    # scatter expressed as gather: o = vals_ext[inv] over the full m
    inv = np.full(m + 2, nR, np.int64)
    inv[rows_flat] = np.arange(nR)
    inv_d = jnp.asarray(inv[:m + 1])
    vals_ext = jnp.concatenate([vals0, jnp.zeros(1, dtype)])

    def s_as_gather(w):
        o = (vals_ext * w[0])[inv_d]
        return 0.999 * w + 0.001 * o
    emit("scatter_as_m_gather", _loop_timed(s_as_gather, w0, rl, rh))

    # ---- f64 pack: gather two f32 streams with one f64-indexed gather ----
    if dtype == np.float32:
        w2 = jnp.stack([w0, 0.5 * w0], axis=1)  # [m+1, 2] adjacent pair
        pair = w2.reshape(-1).view(jnp.float64) if False else None
        # simpler: gather rows from a [m+1, 2] table (slice size 2)
        def g_pair(w):
            tbl = jnp.stack([w, 0.5 * w], axis=1)
            y = tbl[rows_flat_d]          # [nR, 2]
            return w * 0.9999 + 1e-30 * jnp.sum(y)
        emit("gather_pair_rows", _loop_timed(g_pair, w0, rl, rh))

    print(json.dumps({"shape": f"maxcut_{a.nodes}", "us": out}), flush=True)


if __name__ == "__main__":
    main()
