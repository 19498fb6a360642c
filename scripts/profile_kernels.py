"""Kernel-level latency breakdown of one ADMM iteration (VERDICT r3 #1).

Times each per-iteration component of the headline shape (512 PSD blocks of
side 16, dense Cholesky KKT) and of the decomposed maxcut-2000 layout in
isolation, by chaining N data-dependent repetitions inside ONE jitted
dispatch and differencing two rep counts (cancels the axon tunnel RTT and
dispatch overhead; CLAUDE.md: block_until_ready does not sync through the
relay, so a host transfer closes every timing).

Usage:
    python scripts/profile_kernels.py [--shape 1|3|all] [--reps 400]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _timed(fn, x, reps_lo, reps_hi):
    """Per-call microseconds of fn by rep differencing inside one jit."""
    import jax
    from jax import lax

    @jax.jit
    def run(x, n):
        def body(_, x):
            return fn(x)
        return lax.fori_loop(0, n, body, x, unroll=False)

    import numpy as np

    def once(n):
        with jax.default_matmul_precision("highest"):
            out = run(x, n)
        # force the host transfer that actually synchronizes the tunnel
        leaves = jax.tree_util.tree_leaves(out)
        return float(np.asarray(leaves[0]).ravel()[0])

    once(reps_lo)  # compile both shapes
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


def profile_shape1(reps):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cosmo_tpu import problems
    from cosmo_tpu.ops import conedata, eigh as eigh_mod, kkt as kkt_ops
    from cosmo_tpu.ops import pallas_eigh, projections
    from cosmo_tpu.ops.linops import matvec, rmatvec

    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    P, q, A, b, sets = problems.block_sdp(n_blocks=512, side=16, n=512, seed=0)
    m, n = A.shape
    cones = conedata.compile_cones(sets, dtype=dtype, psd_pad_to=8,
                                   eigh_backend="pallas", jacobi_sweeps=6,
                                   accel_on=False)
    Pd, Ad, qd, bd = (jnp.asarray(v, dtype) for v in (P, A, q, b))
    rho = jnp.full(m, 0.1, dtype)
    w2 = jnp.asarray(np.random.default_rng(0).standard_normal(m), dtype) * 0.1
    xv = jnp.asarray(np.random.default_rng(1).standard_normal(n), dtype) * 0.1
    kst = jax.jit(kkt_ops.dense_factor)(Pd, Ad, 1e-6, rho)
    bkt = cones.psd_buckets[0]
    B, k = bkt.gather_idx.shape[0], bkt.side
    X = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, k, k)), dtype)
    X = 0.5 * (X + jnp.swapaxes(X, -1, -2))

    rl, rh = max(reps // 4, 10), reps
    out = {}

    # --- the full projection: gather + eigh + scatter ---
    def proj(w2):
        s, _ = projections.project(w2, cones, ())
        return 0.999 * s + 0.001 * w2      # keep spectra mixed-sign
    out["proj_full_pallas"] = _timed(proj, w2, rl, rh)

    # --- gather / scatter only (selection matmuls) ---
    def gather_only(w2):
        Xb = projections._psd_gather(projections._ext(w2), bkt)
        return Xb.reshape(B, k * k)[:, :bkt.tri_len].reshape(-1)[:m] * 0.999
    out["psd_gather"] = _timed(gather_only, w2, rl, rh)

    # --- eigh backends on the bucket stack ---
    def keep(Y, X):
        return 0.999 * Y + 0.001 * X

    out["eigh_pallas_6sw"] = _timed(
        lambda X: keep(pallas_eigh.psd_project_pallas(X, 6), X), X, rl, rh)
    out["eigh_polar"] = _timed(
        lambda X: keep(eigh_mod.psd_project_polar(X), X), X, rl, rh)
    out["eigh_jacobi_vec6"] = _timed(
        lambda X: keep(eigh_mod.psd_project_jacobi(X, 6, "vec"), X), X, rl, rh)
    def amort(args):
        X, V = args
        Y, Vn = eigh_mod.psd_project_amortized(X, V, 2, 6)
        return keep(Y, X), Vn
    V0 = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (B, k, k))
    out["eigh_amortized_warm2"] = _timed(amort, (X, V0), rl, rh)

    # --- KKT pieces ---
    def mv_pair(x):
        y = matvec(Ad, x)
        return 0.999 * rmatvec(Ad, rho * y) + 0.001 * x
    out["A_matvec_pair"] = _timed(mv_pair, xv, rl, rh)

    def chol(t):
        return 0.999 * kkt_ops._chol_solve(kst.L, t) + 0.001 * t
    out["chol_solve"] = _timed(chol, xv, rl, rh)

    def inv_apply(t):
        return 0.999 * kkt_ops._kkt_apply(kst, t) + 0.001 * t
    out["kkt_inv_apply"] = _timed(inv_apply, xv, rl, rh)

    # --- O(m+n) vector chain of one iteration (no A, no proj) ---
    w_full = jnp.concatenate([xv, w2])
    def vec_chain(w):
        x1, w2l = w[:n], w[n:]
        s = jnp.clip(w2l, cones.lb, cones.ub)
        r1 = 1e-6 * x1 - qd
        r2 = bd - 2.0 * s + w2l
        s_tl = 2.0 * s - w2l - r2
        w1 = x1 + 1.6 * (r1 - x1)
        w2n = w2l + 1.6 * (s_tl - s)
        return 0.999 * jnp.concatenate([w1, w2n]) + 0.001 * w
    out["vector_chain"] = _timed(vec_chain, w_full, rl, rh)

    # --- termination-check reductions (amortize over check_termination) ---
    from cosmo_tpu.ops import residuals as res_ops
    from cosmo_tpu.ops import scaling as scaling_ops
    sm = scaling_ops.identity_scale(m, n, dtype)
    def resid(x):
        mu = rho * (w2 - jnp.clip(w2, cones.lb, cones.ub))
        info = res_ops.result_info(Pd, Ad, qd, bd, x, w2, mu, sm)
        return 0.999 * x + 1e-12 * info.r_prim
    out["residual_check"] = _timed(resid, xv, max(rl // 4, 5), max(rh // 4, 20))

    # --- one bare fused iteration: projection + KKT + vector updates, no
    # cond gating / loop bookkeeping — the gap to the measured full solve
    # is the while_loop + periodic-check overhead ---
    def iter_fused(w):
        x1, w2l = w[:n], w[n:]
        s, _ = projections.project(w2l, cones, ())
        r1 = 1e-6 * x1 - qd
        r2 = bd - 2.0 * s + w2l
        t = r1 + rmatvec(Ad, rho * r2)
        xt = kkt_ops._kkt_apply(kst, t)
        nu = rho * (matvec(Ad, xt) - r2)
        s_tl = 2.0 * s - w2l - nu / rho
        w1 = x1 + 1.6 * (xt - x1)
        w2n = w2l + 1.6 * (s_tl - s)
        return jnp.concatenate([w1, w2n])
    out["iter_fused"] = _timed(iter_fused, w_full, rl, rh)

    return {"shape": "block_sdp_512x16", "m": m, "n": n,
            "B": B, "k": k, "us": {kk: round(v, 1) for kk, v in out.items()}}


def profile_maxcut(reps, nodes=2000, problem="maxcut"):
    import numpy as np
    import jax
    import jax.numpy as jnp

    import cosmo_tpu as ct
    from cosmo_tpu import problems
    from cosmo_tpu.ops import blockkkt, conedata, projections
    from cosmo_tpu.ops.linops import matvec, rmatvec

    if problem == "banded":
        P, q, A, b, sets, _ = problems.banded_sdp(
            n_nodes=nodes, bandwidth=8, seed=0, sparse=True)
    else:
        P, q, A, b, sets, _ = problems.maxcut(
            n_nodes=nodes, density=4.0 / nodes, seed=0, sparse=True)
    model = ct.Model(ct.Settings(
        max_iter=10, eps_abs=0.0, eps_rel=0.0, eps_prim_inf=0.0,
        eps_dual_inf=0.0, accelerator=None, adaptive_rho=False,
        decompose=True))
    model.set(P, q, A, b, sets)
    model.optimize()
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64

    cache = model._dev_cache
    cones = cache["cones"]
    Pdev, Adev = cache["Pd"], cache["Ad"]
    meta = cache["kkt_block"]
    prob = model._chordal_info.problem
    m, n = prob[2].shape
    rl, rh = max(reps // 4, 10), reps
    out = {}

    w2 = jnp.asarray(np.random.default_rng(0).standard_normal(m), dtype) * 0.1
    rho = jnp.full(m, 0.1, dtype)
    def proj(w2):
        s, _ = projections.project(w2, cones, ())
        return 0.999 * s + 0.001 * w2
    out["proj_full"] = _timed(proj, w2, rl, rh)

    # per-bucket projection cost (gather + polar/eigh + scatter, one bucket)
    from cosmo_tpu.ops import eigh as eigh_mod
    for i, bkt in enumerate(cones.psd_buckets):
        Bb, kb = int(bkt.gather_idx.shape[0]), int(bkt.side)
        Xb = jnp.asarray(np.random.default_rng(i).standard_normal(
            (Bb, kb, kb)), dtype)
        Xb = 0.5 * (Xb + jnp.swapaxes(Xb, -1, -2))
        out[f"eigh_polar_b{Bb}k{kb}"] = _timed(
            lambda X: 0.999 * eigh_mod.psd_project_polar(X) + 0.001 * X,
            Xb, rl, rh)

    if meta is not None:
        st = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho)
        # the carried value must feed BOTH r1 and r2 — with a fixed r2 the
        # whole rhs half of the chain is loop-invariant and XLA hoists it
        # out of the rep loop (measured: this very harness reported
        # 1.45 ms for a solve whose true in-loop cost is 5.65 ms)
        wv = jnp.asarray(
            np.random.default_rng(1).standard_normal(n + m), dtype)
        def bsolve(w):
            xt, nu = blockkkt.solve(meta, st, Pdev, Adev, 1e-6, rho,
                                    w[:n], w[n:], 0)
            return 0.999 * w + 0.001 * jnp.concatenate([xt, nu])
        out["blockkkt_solve"] = _timed(bsolve, wv, rl, rh)
        try:
            st_pair = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho,
                                      build_pair=True)
            def bsolve_r(w):
                xt, nu = blockkkt.solve(meta, st_pair, Pdev, Adev, 1e-6,
                                        rho, w[:n], w[n:], 1)
                return 0.999 * w + 0.001 * jnp.concatenate([xt, nu])
            out["blockkkt_solve_refine1"] = _timed(bsolve_r, wv, rl, rh)
        except Exception as e:  # pragma: no cover - informational
            out["blockkkt_solve_refine1"] = -1.0
        xv = jnp.asarray(np.random.default_rng(1).standard_normal(n), dtype)
        def spmv_pair(x):
            y = matvec(Adev, x)
            return 0.999 * rmatvec(Adev, rho * y) + 0.001 * x
        out["coo_spmv_pair"] = _timed(spmv_pair, xv, rl, rh)

    # O(m+n) vector chain (iteration bookkeeping)
    qd = jnp.asarray(np.asarray(prob[1]).ravel(), dtype)
    bd = jnp.asarray(np.asarray(prob[3]).ravel(), dtype)
    w_full = jnp.concatenate([jnp.zeros(n, dtype), w2])
    def vec_chain(w):
        x1, w2l = w[:n], w[n:]
        s = jnp.clip(w2l, cones.lb, cones.ub)
        r1 = 1e-6 * x1 - qd
        r2l = bd - 2.0 * s + w2l
        s_tl = 2.0 * s - w2l - r2l
        w1 = x1 + 1.6 * (r1 - x1)
        w2n = w2l + 1.6 * (s_tl - s)
        return 0.999 * jnp.concatenate([w1, w2n]) + 0.001 * w
    out["vector_chain"] = _timed(vec_chain, w_full, rl, rh)

    # Anderson update + accelerate at this scale (the north-star default
    # runs AA mem=15 over d = n+m vectors: dF/dG HBM traffic per iter)
    from cosmo_tpu import accel
    aa0 = accel.update(
        accel.init_accel(n + m, 15, dtype)._replace(
            active=jnp.asarray(True)),
        w_full, 0.9 * w_full)

    def aa_step(w):
        aa = accel.update(aa0, w, 0.99 * w)
        w_new, aa2 = accel.accelerate(aa, w)
        return 0.999 * w_new + 0.001 * w
    out["aa_update_accelerate"] = _timed(aa_step, w_full, rl, rh)

    # termination-check reductions
    from cosmo_tpu.ops import residuals as res_ops
    from cosmo_tpu.ops import scaling as scaling_ops
    sm = scaling_ops.identity_scale(m, n, dtype)
    xv2 = jnp.asarray(np.random.default_rng(4).standard_normal(n), dtype)
    def resid(x):
        mu = rho * (w2 - jnp.clip(w2, cones.lb, cones.ub))
        info = res_ops.result_info(Pdev, Adev, qd, bd, x, w2, mu, sm)
        return 0.999 * x + 1e-12 * info.r_prim
    out["residual_check"] = _timed(resid, xv2, max(rl // 4, 5),
                                   max(rh // 4, 20))

    info = {"shape": f"{problem}_{nodes}", "m": int(m), "n": int(n),
            "buckets": [(int(bk.gather_idx.shape[0]), int(bk.side),
                         bk.fastpath) for bk in cones.psd_buckets],
            "us": {kk: round(v, 1) for kk, v in out.items()}}
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="all")
    ap.add_argument("--reps", type=int, default=400)
    ap.add_argument("--nodes", type=int, default=2000)
    a = ap.parse_args()
    if a.shape in ("1", "all"):
        print(json.dumps(profile_shape1(a.reps)), flush=True)
    if a.shape in ("3", "all"):
        print(json.dumps(profile_maxcut(a.reps, nodes=a.nodes)), flush=True)
    if a.shape == "banded":
        print(json.dumps(profile_maxcut(a.reps, nodes=a.nodes,
                                        problem="banded")), flush=True)


if __name__ == "__main__":
    main()
