"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

The production layout for decomposed SDPs: A/b row-sharded, PSD block
stacks sharded along the batch (clique) dimension, x-space replicated;
GSPMD inserts the collectives (SURVEY.md §5.8).
"""
import numpy as np

import jax
import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems, solver as solver_mod
from cosmo_tpu.ops import conedata
from cosmo_tpu.parallel import make_mesh, shard_problem
from cosmo_tpu.settings import Settings, split_settings


def _prepare(n_blocks=8, side=4, n=16):
    P, q, A, b, sets = problems.block_sdp(
        n_blocks=n_blocks, side=side, n=n, seed=3
    )
    dtype = np.float64
    settings = Settings(
        max_iter=200, accelerator=None, adaptive_rho=False,
        eps_abs=1e-6, eps_rel=1e-6,
    )
    cones = conedata.compile_cones(sets, dtype=dtype, psd_pad_to=4)
    static, dyn = split_settings(settings, b.shape[0], n, dtype)
    arrs = tuple(jnp.asarray(v, dtype) for v in (P, A, q, b))
    z = (jnp.zeros(n, dtype), jnp.zeros(b.shape[0], dtype), jnp.zeros(b.shape[0], dtype))
    return arrs, cones, z, dyn, static


def test_sharded_solve_matches_single_device():
    assert jax.device_count() >= 8
    (P, A, q, b), cones, (x0, s0, mu0), dyn, static = _prepare()

    out1 = solver_mod.solve_jit(P, A, q, b, cones, x0, s0, mu0, dyn, static=static)

    mesh = make_mesh(8)
    Ps, As, qs, bs, cones_s = shard_problem(mesh, P, A, q, b, cones)
    out8 = solver_mod.solve_jit(Ps, As, qs, bs, cones_s, x0, s0, mu0, dyn, static=static)

    assert int(out8["iter"]) == int(out1["iter"])
    np.testing.assert_allclose(
        np.asarray(out8["x"]), np.asarray(out1["x"]), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out8["s"]), np.asarray(out1["s"]), rtol=1e-6, atol=1e-8
    )


def test_sharded_sparse_decomposed_maxcut_through_model():
    """The north-star layout: a chordally decomposed sparse maxcut solved
    through Model over the 8-device mesh (Coo triplets sharded along nnz,
    auto-selected sharded block-diagonal direct KKT) — same solution as the
    single-device solve. Reference anchor: the reduced system,
    kktsolver_indirect.jl:36-88 / kktsolver.jl:285-320."""
    assert jax.device_count() >= 8
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=40, density=0.12, seed=7,
                                          sparse=True)

    def run(mesh):
        m = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7, decompose=True,
                                 max_iter=3000))
        m.set(P, q, A, b, sets)
        return m.optimize(mesh=mesh), m

    r1, m1 = run(None)
    r8, m8 = run(make_mesh(8))
    assert m8.is_decomposed
    assert r1.status == "Solved" and r8.status == "Solved"
    # trajectories can differ in the last bits (GSPMD reorders the CG dot
    # reductions) which Anderson chaos amplifies into different iteration
    # counts — but both must land on the same solution to the requested
    # tolerance
    assert abs(r8.obj_val - r1.obj_val) < 1e-6 * max(1.0, abs(r1.obj_val))
    np.testing.assert_allclose(r8.x, r1.x, rtol=1e-5, atol=1e-6)
    # re-running on the same mesh is deterministic
    r8b, _ = run(make_mesh(8))
    assert r8b.iter == r8.iter
    np.testing.assert_array_equal(r8b.x, r8.x)


def test_sharded_decomposed_fastpath_survives():
    """Regression guard for mesh.py's keep_fast logic (VERDICT r3 weak #3):
    the compact transform pads every decomposed PSD bucket's block count to
    a multiple of the device count (pad_batch=n_devices), so the
    selection-matmul/shear fast paths — the biggest single-chip win — must
    stay active on EVERY bucket after shard_cones. A regression in the
    transform's pad logic would otherwise silently degrade to index-map
    gathers with bit-identical results."""
    from cosmo_tpu.parallel import mesh as mesh_mod

    assert jax.device_count() >= 8
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=60, density=0.1, seed=3,
                                          sparse=True)
    m = ct.Model(ct.Settings(decompose=True, max_iter=5, accelerator=None))
    m.set(P, q, A, b, sets)
    m.optimize(mesh=make_mesh(8))
    assert m.is_decomposed
    cones_s = m._dev_cache["cones"]
    assert len(cones_s.psd_buckets) > 0
    for bkt in cones_s.psd_buckets:
        assert bkt.fastpath != "none", (
            f"bucket k={bkt.side} lost its fast path under sharding "
            f"(B={bkt.gather_idx.shape[0]} % 8 != 0?)"
        )
        B = bkt.gather_idx.shape[0]
        if B >= 8:
            assert B % 8 == 0
            assert bkt.spec is None
        else:
            # small-batch buckets are batch-replicated with the projection
            # sharded over the matrix dim — NOT n_dev-fold dummy-padded
            assert bkt.spec is not None
    # the cost accounting is computed (not assumed): every bucket splits
    # evenly under this layout, so the per-device spread must come out 1.0,
    # and padding waste only tops sharded buckets off to n_dev
    rep = mesh_mod.LAST_SHARD_REPORT
    assert rep is not None and rep["imbalance"] == 1.0
    assert rep["pad_waste"] >= 1.0
    for bk in rep["buckets"]:
        if bk["layout"] == "batch_sharded":
            assert bk["B_padded"] % 8 == 0
            assert bk["local_per_device"] == bk["B_padded"] // 8


def test_pad_waste_bounded_10k_maxcut_layout():
    """VERDICT r4 #3: the 10k maxcut north-star layout must not replicate
    its giant clique n_dev-fold — pad_waste (wall-clock inflation of the
    per-device projection cost vs a perfect split of the real work) stays
    <= 1.2 over 8 devices. Host-side only: the report is computed from the
    pre-sharding ConeData."""
    from cosmo_tpu import chordal
    from cosmo_tpu.ops import conedata
    from cosmo_tpu.parallel import mesh as mesh_mod

    P, q, A, b, sets, _ = problems.maxcut(
        n_nodes=10_000, density=4.0 / 10_000, seed=0, sparse=True)
    ci = chordal.decompose(P, q, A, b, sets,
                           ct.Settings(decompose=True), pad_batch=8)
    cones = conedata.compile_cones(ci.problem[4], dtype=np.float32,
                                   psd_pad_to=8)
    rep = mesh_mod.psd_cost_report(cones, 8)
    assert rep["imbalance"] == 1.0
    assert rep["pad_waste"] <= 1.2, rep
    # the giant clique bucket must be matrix-sharded, not dummy-padded
    giant = [bk for bk in rep["buckets"] if bk["k"] >= 512]
    assert giant and all(bk["layout"] == "matrix_sharded" for bk in giant)


def test_sharded_coo_matvec_bitexact():
    """Row/column-aligned nnz chunking makes the sharded segment-sum matvec
    bit-identical to single device: every output entry is computed on one
    device and the all-reduce only adds exact zeros."""
    import scipy.sparse as sp
    from cosmo_tpu.ops import linops
    from cosmo_tpu.parallel import shard_coo

    rng = np.random.default_rng(11)
    m, n = 103, 57   # not divisible by 8
    A = sp.random(m, n, density=0.15, random_state=11, format="csr")
    coo = linops.coo_from_scipy(A, np.float64)
    x = jnp.asarray(rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(m))
    ref_mv = np.asarray(linops.matvec(coo, x))
    ref_rmv = np.asarray(linops.rmatvec(coo, y))

    mesh = make_mesh(8)
    coo_s = shard_coo(mesh, coo)
    got_mv = np.asarray(jax.jit(linops.matvec)(coo_s, x))
    got_rmv = np.asarray(jax.jit(linops.rmatvec)(coo_s, y))
    np.testing.assert_array_equal(got_mv, ref_mv)
    np.testing.assert_array_equal(got_rmv, ref_rmv)


def test_sharded_uneven_blocks():
    """B = 11 blocks over 8 devices (not divisible) and odd sizes: GSPMD
    pads the last shard; results stay bit-identical."""
    assert jax.device_count() >= 8
    (Pm, Am, qm, bm), cones, (x0, s0, mu0), dyn, static = _prepare(
        n_blocks=11, side=3, n=13
    )
    out1 = solver_mod.solve_jit(Pm, Am, qm, bm, cones, x0, s0, mu0, dyn,
                                static=static)
    mesh = make_mesh(8)
    Ps, As, qs, bs, cones_s = shard_problem(mesh, Pm, Am, qm, bm, cones)
    out8 = solver_mod.solve_jit(Ps, As, qs, bs, cones_s, x0, s0, mu0, dyn,
                                static=static)
    assert int(out8["iter"]) == int(out1["iter"])
    np.testing.assert_array_equal(np.asarray(out8["x"]), np.asarray(out1["x"]))


def test_graft_dryrun():
    """Run the driver's multichip dryrun in a fresh process, exactly as the
    driver does (and because XLA:CPU's compiler can abort when asked to
    compile the large sharded program inside a process that already
    compiled the whole suite)."""
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_sharded_blockkkt_factor_solve_bitexact():
    """The block-diagonal direct KKT over the mesh (parallel.shard_blockkkt):
    pair-list assembly replicated, batched Cholesky/apply sharded over the
    component dim, a_pi/a_pj remapped through coo_shard_remap to the padded
    triplet layout of shard_coo. Per-block math is local to one device;
    factor + solve must match the single-device path to a few ULPs (XLA
    may vectorize the batched Cholesky differently per local batch size,
    so exact bit-identity is not guaranteed)."""
    import scipy.sparse as sp

    from cosmo_tpu.ops import blockkkt, linops
    from cosmo_tpu.parallel import shard_blockkkt
    from cosmo_tpu.parallel.mesh import shard_coo

    assert jax.device_count() >= 8
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=40, density=0.12, seed=7,
                                          sparse=True)
    m0 = ct.Model(ct.Settings(decompose=True, max_iter=1, accelerator=None))
    m0.set(P, q, A, b, sets)
    m0.optimize()  # runs the host decomposition
    Pc, qc, Ac, bc, _sets = m0._chordal_info.problem
    Pc, Ac = sp.csr_matrix(Pc), sp.csr_matrix(Ac)
    meta = blockkkt.analyze(Pc, Ac, max_block=64)
    assert meta is not None

    dtype = np.float64
    Pd = linops.coo_from_scipy(Pc, dtype)
    Ad = linops.coo_from_scipy(Ac, dtype)
    rng = np.random.default_rng(0)
    mdim, n = Ac.shape
    rho_vec = jnp.asarray(np.abs(rng.standard_normal(mdim)) + 0.1, dtype)
    r1 = jnp.asarray(rng.standard_normal(n), dtype)
    r2 = jnp.asarray(rng.standard_normal(mdim), dtype)
    sigma = jnp.asarray(1e-6, dtype)

    st1 = blockkkt.factor(meta, Pd, Ad, sigma, rho_vec)
    x1, nu1 = blockkkt.solve(meta, st1, Pd, Ad, sigma, rho_vec, r1, r2)

    mesh = make_mesh(8)
    meta8 = shard_blockkkt(mesh, meta, Ad)
    Ad8 = shard_coo(mesh, Ad)
    st8 = blockkkt.factor(meta8, Pd, Ad8, sigma, rho_vec)
    x8, nu8 = blockkkt.solve(meta8, st8, Pd, Ad8, sigma, rho_vec, r1, r2)

    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(nu8), np.asarray(nu1),
                               rtol=1e-12, atol=1e-12)
