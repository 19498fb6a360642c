"""Benchmark: ADMM throughput + roofline accounting on three shapes.

Shapes (the decomposed-SDP spectrum, SURVEY.md §2.14-2.17 / BASELINE.md):

1. ``block_sdp_512x16``  — 512 PSD blocks of side 16, n=512 (many small
   cliques; cached dense-KKT inverse apply; the auto-resolved projection
   backend, plus a Pallas-kernel variant as its own shape).  This is the
   headline metric; the problem is identical to round 1.  From round 4 A is
   stored block-dense (ops/linops.Bde — the TPU-native layout of this
   block-structured matrix; a ``_denseA`` row keeps the old storage for
   cross-round comparability) and the fixed solve is 1000 iterations
   (round <= 3 used 200, where the ~50-90 ms axon dispatch overhead was
   ~40% of the measurement).
2. ``block_sdp_8x256``   — 8 PSD blocks of side 256, n=256 (large blocks;
   Newton-Schulz polar projection path on the MXU).
3. ``maxcut_2000_sparse``— chordally decomposed 2000-node maxcut (sparse
   Coo data, matrix-free CG KKT with compensated restarts) through the full
   Model pipeline — the north-star layout.

For each shape the bench reports iterations/s, algorithmic FLOPs/iteration
of the executed kernels (projection backend + KKT solve), achieved TFLOP/s,
and MFU vs the TPU v5e bf16 matmul peak (197 TFLOP/s; f32 'highest'
precision runs 6 bf16 passes per matmul, so f32 speed-of-light is ~1/6 of
that — both ratios are reported).

Baseline: a NumPy/LAPACK implementation of the identical iteration for
shape 1 (per-block ``numpy.linalg.eigh`` loop + cached dense Cholesky),
mirroring the reference's CPU execution model (sequential per-cone
projection fan-out, src/convexset.jl:885-891). ``vs_baseline`` = TPU
iter/s over CPU iter/s on shape 1.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

N_BLOCKS = 512
SIDE = 16
NVAR = 512
ITERS = 1000       # fixed solve length: long enough that the ~50-90 ms
                   # axon dispatch+fetch overhead is <10% of the measurement
                   # (round <= 3 used 200, where it was ~40%: same slope,
                   # lower reported iter/s)
BASE_ITERS = 200   # CPU baseline length (per-iteration cost is flat there)
RHO = 0.1
SIGMA = 1e-6
ALPHA = 1.6

V5E_BF16_PEAK = 197e12     # TPU v5e MXU peak, bf16 FLOP/s
PASSES_F32_HIGHEST = 6     # bf16 passes per f32 'highest' matmul


def _numpy_baseline(P, q, A, b, n_blocks, side, iters):
    """Reference-style CPU ADMM iteration (float64, sequential block eigs)."""
    from cosmo_tpu.problems import tri_dim

    m, n = A.shape
    d = tri_dim(side)
    j = np.repeat(np.arange(side), np.arange(1, side + 1))
    i = np.arange(d) - j * (j + 1) // 2
    unscale = np.where(i == j, 1.0, 1.0 / np.sqrt(2.0))
    rescale = np.where(i == j, 1.0, np.sqrt(2.0))

    import scipy.linalg as sla

    M = P + SIGMA * np.eye(n) + A.T @ (RHO * A)
    cho = sla.cho_factor(M)

    w = np.zeros(n + m)
    s = np.zeros(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        w2 = w[n:]
        for blk in range(n_blocks):
            v = w2[blk * d : (blk + 1) * d]
            X = np.zeros((side, side))
            X[i, j] = v * unscale
            X[j, i] = v * unscale
            lam, V = np.linalg.eigh(X)
            lp = np.maximum(lam, 0.0)
            Y = (V * lp) @ V.T
            s[blk * d : (blk + 1) * d] = Y[i, j] * rescale
        r1 = SIGMA * w[:n] - q
        r2 = b - 2.0 * s + w2
        rhs = r1 + A.T @ (RHO * r2)
        x = sla.cho_solve(cho, rhs)
        nu = RHO * (A @ x - r2)
        s_tl = 2.0 * s - w2 - nu / RHO
        w[:n] += ALPHA * (x - w[:n])
        w[n:] += ALPHA * (s_tl - s)
    t = time.perf_counter() - t0
    return iters / t


def _proj_flops_per_iter(cones):
    """Algorithmic FLOPs of one composite projection with the backend that
    compile_cones resolved."""
    total = 0.0
    for bkt in cones.psd_buckets:
        B = bkt.gather_idx.shape[0]
        k = bkt.side
        backend = getattr(bkt, "backend", "") or cones.eigh_backend
        if backend == "polar":
            # quintic-phase Newton-Schulz: ~40 [k,k]@[k,k] matmuls/block
            total += B * 40 * 2 * k**3
        elif cones.eigh_backend == "pallas":
            # Jacobi: sweeps x (k-1) rounds x k/2 rotations x ~12k flops
            # + V accumulation, + reconstruction V diag(w+) V'
            total += B * (cones.jacobi_sweeps * 12 * k**3 + 4 * k**3)
        else:
            total += B * 11 * k**3  # LAPACK-style eigh + reconstruction
    return total


def _kkt_flops_per_iter(m, n, refine_steps, bde=None):
    """Cached dense-KKT apply (one [n,n] inverse matvec = 2n^2) +
    A matvec/rmatvec; each refinement step adds the compensated
    matvec (~8x a plain one in VPU flops) and another apply.
    For block-dense A the matvec pair is the batched slab products plus the
    two selection matmuls (ops/linops.Bde)."""
    if bde is not None:
        G, rb, cmax = bde.G, bde.rb, bde.cmax
        mv_pair = 2 * (2 * G * rb * cmax) + 2 * (2 * G * cmax * n)
    else:
        mv_pair = 2 * 2 * m * n
    base = 2 * n * n + mv_pair
    per_refine = 2 * n * n + 8 * (mv_pair + 2 * n * n)
    return base + refine_steps * per_refine


def _bench_block_sdp(n_blocks, side, nvar, label, eigh_backend="auto",
                     refine_steps=-1, mixed_precision=False,
                     a_format="bde"):
    import jax
    import jax.numpy as jnp

    from cosmo_tpu import problems, solver as solver_mod
    from cosmo_tpu.ops import conedata
    from cosmo_tpu.settings import Settings, split_settings

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform != "cpu" else np.float64

    P, q, A, b, sets = problems.block_sdp(
        n_blocks=n_blocks, side=side, n=nvar, seed=0
    )
    m, n = A.shape

    settings = Settings(
        max_iter=ITERS, eps_abs=0.0, eps_rel=0.0,
        eps_prim_inf=0.0, eps_dual_inf=0.0,     # static infeasibility off
        accelerator=None, adaptive_rho=False,
        check_termination=25, scaling=10,
        kkt_refine_steps=refine_steps,
        # the fixed-work residuals never cross the endgame gate, so the
        # refined shape must disable it to measure always-refined cost
        kkt_refine_switch=0.0,
        mixed_precision=mixed_precision,
    )
    cones = conedata.compile_cones(
        sets, dtype=dtype, psd_pad_to=8, eigh_backend=eigh_backend,
        jacobi_sweeps=6, accel_on=False,   # bench runs plain ADMM
    )
    # block_sdp has no rho_eq-amplified rows, so auto refinement is off
    static, dyn = split_settings(settings, m, n, dtype, refine_hint=False)

    Pd, qd, bd = (jnp.asarray(v, dtype) for v in (P, q, b))
    if a_format == "bde":
        # block-dense rows + selection matmuls (ops/linops.Bde): the
        # TPU-native storage of this block-structured A — the dense [m, n]
        # HBM panel read was the top per-iteration cost (414 us of 673)
        import scipy.sparse as sp

        from cosmo_tpu.ops import linops
        from cosmo_tpu.problems import tri_dim

        Ad = linops.bde_from_scipy(sp.csr_matrix(A), rb=tri_dim(side))
        assert Ad is not None
        Ad = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, dtype)
            if np.issubdtype(np.asarray(v).dtype, np.floating)
            else jnp.asarray(v), Ad)
    else:
        Ad = jnp.asarray(A, dtype)
    x0 = jnp.zeros(n, dtype)
    s0 = jnp.zeros(m, dtype)
    mu0 = jnp.zeros(m, dtype)

    def run():
        with jax.default_matmul_precision("highest"):
            # chunked entry: auto-bounds dispatch length on the axon relay
            # (a no-op at bench iteration counts)
            out = solver_mod.solve_chunked(
                Pd, Ad, qd, bd, cones, x0, s0, mu0, dyn, static
            )
        # int() forces a host transfer: through the remote-TPU tunnel,
        # block_until_ready alone does not reliably synchronize
        return int(out["iter"]), float(out["r_prim"])

    run()  # compile + warm caches
    rep_ips = []
    for _ in range(3):
        t0 = time.perf_counter()
        iters, _rp = run()
        rep_ips.append(iters / (time.perf_counter() - t0))
    ips = max(rep_ips)

    from cosmo_tpu.ops.linops import Bde as _Bde

    flops = _proj_flops_per_iter(cones) + _kkt_flops_per_iter(
        m, n, static.kkt_refine_steps,
        bde=Ad if isinstance(Ad, _Bde) else None,
    )
    return dict(
        label=label, iters_per_s=round(ips, 2),
        # noise band across reps: median and min expose tunnel/container
        # drift that a best-of headline hides (VERDICT r3 weak #6)
        iters_per_s_median=round(float(np.median(rep_ips)), 2),
        iters_per_s_min=round(min(rep_ips), 2),
        flops_per_iter=int(flops),
        tflops=round(ips * flops / 1e12, 3),
        mfu_bf16=round(ips * flops / V5E_BF16_PEAK, 4),
        mfu_f32_highest=round(ips * flops * PASSES_F32_HIGHEST / V5E_BF16_PEAK, 4),
        eigh_backend=cones.eigh_backend,
        problem=(P, q, A, b, sets),
    )


def _bench_maxcut_sparse(n_nodes=2000):
    """The north-star layout through the full Model pipeline."""
    import cosmo_tpu as cosmo
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.maxcut(
        n_nodes=n_nodes, density=4.0 / n_nodes, seed=0, sparse=True
    )
    model = cosmo.Model(cosmo.Settings(
        max_iter=ITERS, eps_abs=0.0, eps_rel=0.0,
        eps_prim_inf=0.0, eps_dual_inf=0.0,
        accelerator=None, adaptive_rho=False, decompose=True,
    ))
    model.set(P, q, A, b, sets)
    model.optimize()          # compile + decomposition warm-up
    rep_ips = []
    for _ in range(3):
        r = model.optimize()  # decomposition cached; measure iter phase
        rep_ips.append(r.iter / r.times.iter_time)
    ips = max(rep_ips)
    nnz = model._chordal_info.problem[2].nnz
    kkt_iters = int(r.info.kkt_solver_iters)
    from cosmo_tpu.ops import conedata as cd

    dtype = np.float32
    cones = cd.compile_cones(model._chordal_info.problem[4], dtype=dtype)
    bk = getattr(model, "_blockkkt_cache", None)
    bk_meta = bk[1] if bk is not None else None
    if kkt_iters == 0 and bk_meta is not None:
        # block-diagonal direct KKT (ops/blockkkt.py): per iteration one
        # batched [N,k,k]@[N,k] apply + the rhs/nu SpMMs
        kkt = sum(2 * b.N * b.k * b.k for b in bk_meta.buckets) + 2 * 2 * nnz
        kkt_kind = "blockdiag"
    else:
        # CG: inner iters x 2 SpMM per ADMM iteration
        kkt = (max(kkt_iters, 1) / max(r.iter, 1)) * 2 * 2 * nnz
        kkt_kind = "cg"
    flops = _proj_flops_per_iter(cones) + kkt
    return dict(
        label="maxcut_2000_sparse_decomposed", iters_per_s=round(ips, 2),
        iters_per_s_median=round(float(np.median(rep_ips)), 2),
        iters_per_s_min=round(min(rep_ips), 2),
        flops_per_iter=int(flops),
        tflops=round(ips * flops / 1e12, 3),
        kkt_solver=kkt_kind,
        cg_iters_per_admm_iter=round(kkt_iters / max(r.iter, 1), 1),
        n_clique_blocks=len(model._chordal_info.problem[4]),
    )


def _bench_maxcut_default(n_nodes=2000):
    """maxcut-2000 solved to 1e-5 with DEFAULT machinery (Anderson +
    adaptive rho + infeasibility certificates all on) — makes the 15-30%
    control-machinery overhead driver-visible so regressions in the
    AA/rho/cert paths show up in BENCH json (VERDICT r4 #4). Warm solve:
    the second optimize() isolates the iteration phase. ADMM+AA iteration
    counts are chaotic across numeric changes, so the load-bearing numbers
    are iters_per_s and solver_s, not the count."""
    import cosmo_tpu as cosmo
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.maxcut(
        n_nodes=n_nodes, density=4.0 / n_nodes, seed=0, sparse=True
    )
    model = cosmo.Model(cosmo.Settings(
        eps_abs=1e-5, eps_rel=1e-5, max_iter=20_000, decompose=True,
        dtype=np.float32,
    ))
    model.set(P, q, A, b, sets)
    model.optimize()          # cold: compile + decomposition
    rep = []
    for _ in range(2):
        r = model.optimize()  # warm
        rep.append(r)
    r = rep[-1]
    return dict(
        label=f"maxcut_{n_nodes}_default_settings",
        status=r.status, iter=int(r.iter),
        solver_s=round(r.times.solver_time, 2),
        iters_per_s=round(
            max(rr.iter / max(rr.times.iter_time, 1e-9) for rr in rep), 2),
        n_rho_adapt=int(len(np.atleast_1d(r.info.rho_updates)) - 1),
    )


def _bench_maxcut10k(seeds=3, time_budget_s=900.0):
    """The literal BASELINE.json north-star: 10k-node maxcut SDP solved to
    1e-5 with f32 defaults, warm, over up to ``seeds`` random graphs.
    Captured as a bench shape so BENCH_r*.json records the target verbatim
    (VERDICT r4 #1). ``time_budget_s`` bounds total cost: seeds beyond the
    budget are skipped (seeds_run reports how many ran)."""
    import cosmo_tpu as cosmo
    from cosmo_tpu import problems

    t_start = time.perf_counter()
    runs = []
    for seed in range(seeds):
        if runs and time.perf_counter() - t_start > time_budget_s:
            break
        P, q, A, b, sets, _ = problems.maxcut(
            n_nodes=10_000, density=4.0 / 10_000, seed=seed, sparse=True
        )
        model = cosmo.Model(cosmo.Settings(
            eps_abs=1e-5, eps_rel=1e-5, max_iter=20_000,
            time_limit=600.0, decompose=True, dtype=np.float32,
        ))
        model.set(P, q, A, b, sets)
        model.optimize()                # cold: compile + decomposition
        r = model.optimize()            # warm: the measured phase
        runs.append(dict(
            seed=seed, status=r.status, iter=int(r.iter),
            solver_s=round(r.times.solver_time, 1),
            iters_per_s=round(r.iter / max(r.times.iter_time, 1e-9), 1),
        ))
    times = [r["solver_s"] for r in runs]
    return dict(
        label="maxcut_10000_northstar_literal",
        iters_per_s=round(float(np.median(
            [r["iters_per_s"] for r in runs])), 2),
        seeds_run=len(runs),
        solver_s_median=float(np.median(times)),
        solver_s_max=max(times),
        all_solved=all(r["status"] == "Solved" for r in runs),
        target_s=100.0,     # VERDICT r4 #1 done-bar: warm solve <= 100 s
        runs=runs,
    )


def _bench_northstar(seeds=3, nodes=10_000, time_budget_s=1200.0):
    """The north-star metric itself (BASELINE.md): median warm solve of the
    chordally decomposed banded 10k-node SDP to 1e-5, over >= 3 seeds —
    captured driver-side so BENCH_r*.json records the number that matters
    (VERDICT r3 weak #6). Each seed is a fresh problem instance with the
    same shapes, so the compiled program and the persistent compile cache
    are shared; the warm (second) solve isolates the iteration phase.
    ``time_budget_s`` bounds the total cost: seeds beyond the budget are
    skipped and reported.
    """
    import cosmo_tpu as cosmo
    from cosmo_tpu import problems

    t_start = time.perf_counter()
    runs = []
    for seed in range(seeds):
        if runs and time.perf_counter() - t_start > time_budget_s:
            break
        P, q, A, b, sets, _ = problems.banded_sdp(
            n_nodes=nodes, bandwidth=8, seed=seed, sparse=True
        )
        model = cosmo.Model(cosmo.Settings(
            eps_abs=1e-5, eps_rel=1e-5, max_iter=20_000,
            time_limit=600.0, decompose=True, dtype=np.float32,
        ))
        model.set(P, q, A, b, sets)
        model.optimize()                # cold: compile + decomposition
        r = model.optimize()            # warm: the measured phase
        runs.append(dict(
            seed=seed, status=r.status, iter=int(r.iter),
            solver_s=round(r.times.solver_time, 1),
            iters_per_s=round(r.iter / max(r.times.iter_time, 1e-9), 1),
        ))
    iters = [r["iter"] for r in runs]
    times = [r["solver_s"] for r in runs]
    med_it = float(np.median(iters))
    return dict(
        label=f"northstar_banded_{nodes}_median",
        iters_per_s=round(float(np.median([r["iters_per_s"] for r in runs])), 2),
        seeds_run=len(runs),
        iter_median=med_it, iter_min=min(iters), iter_max=max(iters),
        tail_ratio=round(max(iters) / max(med_it, 1.0), 2),
        solver_s_median=float(np.median(times)),
        all_solved=all(r["status"] == "Solved" for r in runs),
        runs=runs,
    )


def main():
    s1 = _bench_block_sdp(N_BLOCKS, SIDE, NVAR, "block_sdp_512x16")
    s1d = _bench_block_sdp(N_BLOCKS, SIDE, NVAR, "block_sdp_512x16_denseA",
                           a_format="dense")
    s1d.pop("problem")
    P, q, A, b, sets = s1.pop("problem")
    base_ips = _numpy_baseline(P, q, A, b, N_BLOCKS, SIDE, BASE_ITERS)

    s1r = _bench_block_sdp(N_BLOCKS, SIDE, NVAR, "block_sdp_512x16_refined",
                           refine_steps=1)
    s1r.pop("problem")
    # explicit Pallas Jacobi kernel row ("auto" already resolves to pallas
    # for this single-small-bucket plain-ADMM shape — the row pins the
    # backend so a change in the auto rule stays visible cross-round)
    s1p = _bench_block_sdp(N_BLOCKS, SIDE, NVAR, "block_sdp_512x16_pallas",
                           eigh_backend="pallas")
    s1p.pop("problem")
    s2 = _bench_block_sdp(8, 256, 256, "block_sdp_8x256")
    s2.pop("problem")
    # loose-phase throughput of the mixed-precision mode (eps=0 keeps the
    # phase flag latched loose): polar matmuls at bf16x3 ("high")
    s2m = _bench_block_sdp(8, 256, 256, "block_sdp_8x256_mixed_loose",
                           eigh_backend="polar", mixed_precision=True)
    s2m.pop("problem")
    s2m.pop("mfu_f32_highest")    # loose phase runs 3 bf16 passes, not 6
    s3 = _bench_maxcut_sparse()
    # the CPU baseline lives in the shape row too, so cross-round container
    # drift is visible next to the TPU number it normalizes
    s1["cpu_baseline_iters_per_s"] = round(base_ips, 2)
    s1["vs_baseline"] = round(s1["iters_per_s"] / base_ips, 3)

    s3d = _bench_maxcut_default()

    shapes = [s1, s1d, s1r, s1p, s2, s2m, s3, s3d]
    if os.environ.get("COSMO_BENCH_NORTHSTAR", "1") != "0":
        shapes.append(_bench_northstar())
        shapes.append(_bench_maxcut10k())

    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_block_sdp_512x16",
                "value": s1["iters_per_s"],
                "unit": "iter/s",
                "vs_baseline": round(s1["iters_per_s"] / base_ips, 3),
                "shapes": shapes,
                "cpu_baseline_iters_per_s": round(base_ips, 2),
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    try:
        main()
    except Exception:
        if os.environ.get("COSMO_BENCH_RETRY"):
            raise
        # one retry in a fresh process: the TPU tunnel/worker occasionally
        # crashes mid-run and a stale backend cannot recover in-process
        import time as _t

        _t.sleep(60)
        os.environ["COSMO_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
