"""In-loop per-component latency split for the decomposed maxcut family.

VERDICT r4 #2: attribute the ~13 ms/iter unattributed floor at the 10k
north-star. Each component runs as the body of its own lax.while_loop /
fori_loop over the REAL problem data (profile_kernels.py chains components
with rep differencing inside one dispatch, but XLA hoists loop-invariant
halves out of that harness — a while_loop with the component consuming and
producing the carried iterate is the honest measurement; see the round-4
blockkkt 4x under-measurement note in ROADMAP.md).

Every body mixes the component output back into the carry so nothing is
loop-invariant; per-iteration time comes from differencing two rep counts
(cancels dispatch + host-transfer overhead through the axon tunnel).

Usage:
    python scripts/profile_split.py [--nodes 10000] [--reps 500]
        [--parts core,proj,kkt,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _loop_timed(body, carry0, reps_lo, reps_hi, fetch=None):
    """Per-iteration microseconds of `body` inside a fori_loop, by rep
    differencing. `fetch`: maps the final carry to one scalar (forces the
    host transfer that synchronizes the axon tunnel)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    @jax.jit
    def run(c, nreps):
        return lax.fori_loop(0, nreps, lambda _, c: body(c), c, unroll=False)

    if fetch is None:
        def fetch(c):
            leaves = jax.tree_util.tree_leaves(c)
            return leaves[0].ravel()[0]

    def once(nreps):
        with jax.default_matmul_precision("highest"):
            out = run(carry0, nreps)
        return float(np.asarray(fetch(out)))

    once(reps_lo)   # compile
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
    ap.add_argument("--reps", type=int, default=500)
    ap.add_argument("--parts", default="all")
    ap.add_argument("--problem", default="maxcut")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        # the env var alone is not enough on this image (CLAUDE.md): pin
        # the platform before jax initializes
        import jax
        jax.config.update("jax_platforms", "cpu")
    parts = a.parts.split(",") if a.parts != "all" else None

    def want(name):
        return parts is None or any(name.startswith(p) for p in parts)

    import numpy as np
    import scipy.sparse as sp
    import jax
    import jax.numpy as jnp
    from jax import lax

    import cosmo_tpu as ct
    from cosmo_tpu import chordal, problems
    from cosmo_tpu.ops import blockkkt, conedata, linops, projections
    from cosmo_tpu.ops import eigh as eigh_mod

    if a.problem == "banded":
        P, q, A, b, sets, _ = problems.banded_sdp(
            n_nodes=a.nodes, bandwidth=8, seed=0, sparse=True)
    else:
        P, q, A, b, sets, _ = problems.maxcut(
            n_nodes=a.nodes, density=4.0 / a.nodes, seed=0, sparse=True)
    dtype = np.float32 if jax.devices()[0].platform != "cpu" else np.float64
    # build the decomposed problem + cone/kkt structures directly (the Model
    # path would compile the full solve program just to fill _dev_cache)
    st_ = ct.Settings(decompose=True, accelerator=None, adaptive_rho=False)
    ci = chordal.decompose(P, q, A, b, sets, st_, pad_batch=1)
    P2, q2, A2, b2, sets2 = ci.problem
    prob = (P2, q2, A2, b2, sets2)
    m, n = A2.shape
    cones = conedata.compile_cones(
        sets2, dtype=dtype, psd_pad_to=8, eigh_backend="auto",
        jacobi_sweeps=6, accel_on=False, decomposed=True)
    cones = jax.tree_util.tree_map(jnp.asarray, cones)
    Pdev = linops.coo_from_scipy(sp.csr_matrix(P2), dtype)
    Adev = linops.coo_from_scipy(sp.csr_matrix(A2), dtype)
    meta = blockkkt.analyze(sp.csr_matrix(P2), sp.csr_matrix(A2),
                            max_block=64)
    rl, rh = max(a.reps // 4, 10), a.reps
    out = {}
    rng = np.random.default_rng(0)
    w2_0 = jnp.asarray(rng.standard_normal(m), dtype) * 0.1
    rho = jnp.full(m, 0.1, dtype)
    qd = jnp.asarray(np.asarray(prob[1]).ravel(), dtype)
    bd = jnp.asarray(np.asarray(prob[3]).ravel(), dtype)

    def emit(k, v):
        out[k] = round(v, 1)
        print(json.dumps({k: out[k]}), flush=True)

    # ---- full projection in-loop ----
    if want("proj"):
        def proj_body(w2):
            s, _ = projections.project(w2, cones, ())
            return 0.999 * s + 0.001 * w2
        emit("proj_full", _loop_timed(proj_body, w2_0, rl, rh))

    # ---- per-bucket projection in-loop: gather + eig + scatter of ONE
    # bucket, the rest of the m-vector rides along untouched ----
    if want("pbkt"):
        for i, bkt in enumerate(cones.psd_buckets):
            B, k = int(bkt.gather_idx.shape[0]), int(bkt.side)

            def one_bucket(w2, bkt=bkt):
                v_ext = projections._ext(w2)
                X = projections._psd_gather(v_ext, bkt)
                Y = projections._psd_project_bucket(X, cones, None, bkt)
                if bkt.fastpath == "matmul":
                    Bb = bkt.gather_idx.shape[0]
                    T = (Y.reshape(Bb, bkt.side * bkt.side) @ bkt.compress)
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                elif bkt.fastpath == "colpad":
                    T = jnp.swapaxes(Y, -1, -2) * bkt.cp_csc[None]
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                elif bkt.fastpath == "shear":
                    Bb = bkt.gather_idx.shape[0]
                    r0 = bkt.r0
                    Yc = Y[:, :r0, :r0]
                    T = (Yc.reshape(Bb, r0 * r0)[:, bkt.sh_flat]
                         * bkt.sh_csc[None])
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                else:
                    s = projections._ext(w2).at[bkt.scatter_idx].set(
                        Y * bkt.scatter_scale)[:-1]
                return 0.999 * s + 0.001 * w2
            emit(f"proj_bkt{i}_B{B}k{k}", _loop_timed(one_bucket, w2_0, rl, rh))

            # gather+scatter only (skip the eig: Y = X)
            def gs_only(w2, bkt=bkt):
                v_ext = projections._ext(w2)
                X = projections._psd_gather(v_ext, bkt)
                Y = X
                if bkt.fastpath == "matmul":
                    Bb = bkt.gather_idx.shape[0]
                    T = (Y.reshape(Bb, bkt.side * bkt.side) @ bkt.compress)
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                elif bkt.fastpath == "colpad":
                    T = jnp.swapaxes(Y, -1, -2) * bkt.cp_csc[None]
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                elif bkt.fastpath == "shear":
                    Bb = bkt.gather_idx.shape[0]
                    r0 = bkt.r0
                    Yc = Y[:, :r0, :r0]
                    T = (Yc.reshape(Bb, r0 * r0)[:, bkt.sh_flat]
                         * bkt.sh_csc[None])
                    s = lax.dynamic_update_slice(
                        w2, T.reshape(-1), (bkt.contig_start,))
                else:
                    s = projections._ext(w2).at[bkt.scatter_idx].set(
                        Y * bkt.scatter_scale)[:-1]
                return 0.999 * s + 0.001 * w2
            emit(f"proj_bkt{i}_B{B}k{k}_gs", _loop_timed(gs_only, w2_0, rl, rh))

    # ---- eig only, per bucket, in-loop on the block stacks ----
    if want("eig"):
        for i, bkt in enumerate(cones.psd_buckets):
            B, k = int(bkt.gather_idx.shape[0]), int(bkt.side)
            X0 = jnp.asarray(rng.standard_normal((B, k, k)), dtype)
            X0 = 0.5 * (X0 + jnp.swapaxes(X0, -1, -2))

            def eig_body(X, bkt=bkt):
                Y = projections._psd_project_bucket(X, cones, None, bkt)
                return 0.999 * Y + 0.001 * X
            emit(f"eig_bkt{i}_B{B}k{k}", _loop_timed(eig_body, X0, rl, rh))

    # ---- blockkkt fused solve in-loop ----
    if meta is not None and want("kkt"):
        st = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho)
        w0 = jnp.asarray(rng.standard_normal(n + m), dtype) * 0.1

        def kkt_body(w):
            xt, nu = blockkkt.solve(meta, st, Pdev, Adev, 1e-6, rho,
                                    w[:n], w[n:], 0)
            return 0.999 * w + 0.001 * jnp.concatenate([xt, nu])
        emit("kkt_fused", _loop_timed(kkt_body, w0, rl, rh))

        # block-space x carry (the in-solve path when it applies): no cols
        # gather / x scatter — only the m-side row movement remains
        if blockkkt.supports_blockspace(meta):
            nb = blockkkt.blockspace_dim(meta)
            wb0 = jnp.asarray(rng.standard_normal(nb + m), dtype) * 0.1

            def kkt_bspace(w):
                xg, nu = blockkkt.solve_blockspace(meta, st, rho,
                                                   w[:nb], w[nb:], 0)
                return 0.999 * w + 0.001 * jnp.concatenate([xg, nu])
            emit("kkt_bspace", _loop_timed(kkt_bspace, wb0, rl, rh))

        # refined (endgame) bspace solve — the in-solve endgame path
        if blockkkt.supports_blockspace(meta):
            st_pair_b = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho,
                                        build_pair=True)
            nb2 = blockkkt.blockspace_dim(meta)
            wb02 = jnp.asarray(rng.standard_normal(nb2 + m), dtype) * 0.1

            def kkt_bspace_ref(w):
                xg, nu = blockkkt.solve_blockspace(meta, st_pair_b, rho,
                                                   w[:nb2], w[nb2:], 1)
                return 0.999 * w + 0.001 * jnp.concatenate([xg, nu])
            emit("kkt_bspace_ref1", _loop_timed(kkt_bspace_ref, wb02, rl, rh))

        # bspace residuals: rows gather only / nu scatter only — the two
        # m-side movements that remain after the block-space x carry
        if blockkkt.supports_blockspace(meta):
            def kkt_rows_gather(w):
                r2p = jnp.concatenate([w[n:], jnp.zeros(1, dtype)])
                acc = jnp.zeros((), dtype)
                for bkt in meta.buckets:
                    acc = acc + jnp.sum(r2p[jnp.asarray(bkt.row_ids)])
                return w * 0.9999 + 1e-30 * acc
            emit("kkt_rows_gather", _loop_timed(kkt_rows_gather, w0, rl, rh))

            nubs0 = [jnp.asarray(rng.standard_normal((bkt.N, bkt.R)), dtype)
                     for bkt in meta.buckets]

            def kkt_nu_scatter(w):
                nu_out = jnp.concatenate([rho * (0.0 - w[n:]),
                                          jnp.zeros(1, dtype)])
                c0 = w[0]
                for i2, bkt in enumerate(meta.buckets):
                    nu_out = nu_out.at[
                        jnp.asarray(bkt.row_ids).reshape(-1)
                    ].set((nubs0[i2] * c0).reshape(-1))
                return 0.999 * w + 0.001 * jnp.concatenate(
                    [w[:n], nu_out[:-1]])
            emit("kkt_nu_scatter", _loop_timed(kkt_nu_scatter, w0, rl, rh))

        # gathers only: all bucket input gathers, reduced to a scalar
        def kkt_gathers(w):
            r1p = jnp.concatenate([w[:n], jnp.zeros(1, dtype)])
            r2p = jnp.concatenate([w[n:], jnp.zeros(1, dtype)])
            acc = jnp.zeros((), dtype)
            for bkt, s in zip(meta.buckets, st):
                rows = jnp.asarray(bkt.row_ids)
                acc = acc + jnp.sum(r2p[rows]) + jnp.sum(r1p[bkt.cols])
            return w * 0.9999 + 1e-30 * acc
        emit("kkt_gathers", _loop_timed(kkt_gathers, w0, rl, rh))

        # einsums only on fixed gathered blocks
        tbs = []
        r2gs = []
        for bkt, s in zip(meta.buckets, st):
            tbs.append(jnp.asarray(
                rng.standard_normal((bkt.N, bkt.k)), dtype))
            r2gs.append(jnp.asarray(
                rng.standard_normal((bkt.N, bkt.R)), dtype))

        def kkt_einsums(carry):
            acc = jnp.zeros((), dtype)
            for i2, (bkt, s) in enumerate(zip(meta.buckets, st)):
                Minv, Ad, rhog = s[0], s[-2], s[-1]
                tb = tbs[i2] * carry[0]
                r2g = r2gs[i2]
                tb = tb + jnp.einsum("nrk,nr->nk", Ad, rhog * r2g)
                xb = jnp.einsum("nij,nj->ni", Minv, tb)
                nub = rhog * (jnp.einsum("nrk,nk->nr", Ad, xb) - r2g)
                acc = acc + jnp.sum(xb) + jnp.sum(nub)
            return carry * 0.9999 + 1e-30 * acc
        emit("kkt_einsums", _loop_timed(
            kkt_einsums, jnp.ones(8, dtype), rl, rh))

        # scatters only
        xbs = [jnp.asarray(rng.standard_normal((bkt.N, bkt.k)), dtype)
               for bkt in meta.buckets]
        nubs = [jnp.asarray(rng.standard_normal((bkt.N, bkt.R)), dtype)
                for bkt in meta.buckets]

        def kkt_scatters(w):
            x_out = jnp.zeros(meta.n + 1, dtype)
            nu_out = jnp.concatenate([rho * (0.0 - w[n:]),
                                      jnp.zeros(1, dtype)])
            c0 = w[0]
            for i2, bkt in enumerate(meta.buckets):
                x_out = x_out.at[jnp.asarray(bkt.cols).reshape(-1)].set(
                    (xbs[i2] * c0).reshape(-1))
                nu_out = nu_out.at[jnp.asarray(bkt.row_ids).reshape(-1)].set(
                    (nubs[i2] * c0).reshape(-1))
            return 0.999 * w + 0.001 * jnp.concatenate(
                [x_out[:-1], nu_out[:-1]])
        emit("kkt_scatters", _loop_timed(kkt_scatters, w0, rl, rh))

        # refined (endgame) solve in-loop
        st_pair = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho,
                                  build_pair=True)

        def kkt_refined(w):
            xt, nu = blockkkt.solve(meta, st_pair, Pdev, Adev, 1e-6, rho,
                                    w[:n], w[n:], 1)
            return 0.999 * w + 0.001 * jnp.concatenate([xt, nu])
        emit("kkt_refined1", _loop_timed(kkt_refined, w0, rl, rh))

    # ---- termination-check residual passes (plain / compensated Coo) ----
    if want("res"):
        from cosmo_tpu.ops import residuals as res_ops
        from cosmo_tpu.ops import scaling as scaling_mod

        sm_id = scaling_mod.identity_scale(m, n, dtype)
        xs0 = jnp.asarray(rng.standard_normal(n), dtype) * 0.01
        mu0m = jnp.asarray(rng.standard_normal(m), dtype) * 0.01
        sv0 = jnp.asarray(rng.standard_normal(m), dtype) * 0.01

        def mk(comp):
            def body(carry):
                xv, muv, sv = carry
                info = res_ops.result_info(Pdev, Adev, qd, bd, xv, sv, muv,
                                           sm_id, compensated=comp)
                f = 0.999 + 1e-6 * jnp.tanh(info.r_prim + info.r_dual)
                return (xv * f, muv * f, sv * f)
            return body
        emit("check_plain", _loop_timed(mk(False), (xs0, mu0m, sv0),
                                        max(a.reps // 16, 5), a.reps // 4))
        emit("check_comp", _loop_timed(mk(True), (xs0, mu0m, sv0),
                                       max(a.reps // 16, 5), a.reps // 4))

    # ---- O(m+n) vector chain ----
    if want("vec"):
        w0 = jnp.concatenate([jnp.zeros(n, dtype), w2_0])

        def vec_chain(w):
            x1, w2l = w[:n], w[n:]
            s = jnp.clip(w2l, cones.lb, cones.ub)
            r1 = 1e-6 * x1 - qd
            r2l = bd - 2.0 * s + w2l
            s_tl = 2.0 * s - w2l - r2l
            w1 = x1 + 1.6 * (r1 - x1)
            w2n = w2l + 1.6 * (s_tl - s)
            return 0.999 * jnp.concatenate([w1, w2n]) + 0.001 * w
        emit("vector_chain", _loop_timed(vec_chain, w0, rl, rh))

    # ---- core iteration: projection + fused kkt + vector updates ----
    if meta is not None and want("core"):
        st = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho)
        w0 = jnp.asarray(rng.standard_normal(n + m), dtype) * 0.1

        def core(w):
            x1, w2l = w[:n], w[n:]
            s, _ = projections.project(w2l, cones, ())
            r1 = 1e-6 * x1 - qd
            r2 = bd - 2.0 * s + w2l
            xt, nu = blockkkt.solve(meta, st, Pdev, Adev, 1e-6, rho,
                                    r1, r2, 0)
            s_tl = 2.0 * s - w2l - nu / rho
            w1 = x1 + 1.6 * (xt - x1)
            w2n = w2l + 1.6 * (s_tl - s)
            return jnp.concatenate([w1, w2n])
        emit("core_iter", _loop_timed(core, w0, rl, rh))

        if blockkkt.supports_blockspace(meta):
            nb = blockkkt.blockspace_dim(meta)
            qg = jnp.concatenate([qd, jnp.zeros(1, dtype)])[
                blockkkt.blockspace_cols(meta)]
            wb0 = jnp.asarray(rng.standard_normal(nb + m), dtype) * 0.1

            def core_b(w):
                x1, w2l = w[:nb], w[nb:]
                s, _ = projections.project(w2l, cones, ())
                r1 = 1e-6 * x1 - qg
                r2 = bd - 2.0 * s + w2l
                xg, nu = blockkkt.solve_blockspace(meta, st, rho, r1, r2, 0)
                s_tl = 2.0 * s - w2l - nu / rho
                w1 = x1 + 1.6 * (xg - x1)
                w2n = w2l + 1.6 * (s_tl - s)
                return jnp.concatenate([w1, w2n])
            emit("core_bspace", _loop_timed(core_b, wb0, rl, rh))

    print(json.dumps({
        "shape": f"{a.problem}_{a.nodes}", "m": int(m), "n": int(n),
        "buckets": [(int(bk.gather_idx.shape[0]), int(bk.side),
                     bk.fastpath, bk.backend) for bk in cones.psd_buckets],
        "us": out}), flush=True)


if __name__ == "__main__":
    main()
