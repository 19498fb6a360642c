"""Block-dense row storage (linops.Bde): the TPU-native representation of
constraint matrices whose rows come in per-cone blocks over small column
subsets (ops/linops.py; the dense-A HBM panel read was the measured top
per-iteration cost of the headline shape).

Reference anchor: the CSC storage + SuiteSparse products these replace,
src/kktsolver.jl:285-320 / algebra.jl.
"""
import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from cosmo_tpu import problems, solver as solver_mod
from cosmo_tpu.ops import conedata, df32, linops
from cosmo_tpu.settings import Settings, split_settings


def _block_matrix(G=13, rb=7, n=40, nnz_cols=5, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((G * rb, n))
    for g in range(G):
        cols = rng.choice(n, size=nnz_cols, replace=False)
        A[g * rb : (g + 1) * rb, cols] = rng.standard_normal((rb, nnz_cols))
    return A


def test_bde_matvec_ops_match_dense():
    A = _block_matrix()
    m, n = A.shape
    B = linops.bde_from_scipy(sp.csr_matrix(A), rb=7)
    assert B is not None and B.shape == (m, n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(m))
    rho = jnp.asarray(np.abs(rng.standard_normal(m)) + 0.1)
    Ad = jnp.asarray(A)

    np.testing.assert_allclose(
        np.asarray(linops.matvec(B, x)), np.asarray(Ad @ x), rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(linops.rmatvec(B, y)), np.asarray(Ad.T @ y), rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(linops.colmax_abs(B)), np.max(np.abs(A), axis=0), atol=0)
    np.testing.assert_allclose(
        np.asarray(linops.rowmax_abs(B)), np.max(np.abs(A), axis=1), atol=0)
    np.testing.assert_allclose(
        np.asarray(linops.diag_AtRhoA(B, rho)),
        np.asarray(jnp.sum(rho[:, None] * Ad * Ad, axis=0)),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(linops.AtRhoA(B, rho)),
        np.asarray(Ad.T @ (rho[:, None] * Ad)), rtol=1e-12, atol=1e-12)

    ew = jnp.asarray(rng.random(m) + 0.5)
    dw = jnp.asarray(rng.random(n) + 0.5)
    Bs = linops.scale_rows_cols(B, ew, dw)
    np.testing.assert_allclose(
        np.asarray(linops.matvec(Bs, x)),
        np.asarray((ew[:, None] * Ad * dw[None, :]) @ x), rtol=1e-12, atol=1e-12)
    Br = linops.scale_rows(B, ew)
    np.testing.assert_allclose(
        np.asarray(linops.rmatvec(Br, y)),
        np.asarray((ew[:, None] * Ad).T @ y), rtol=1e-12, atol=1e-12)


def test_bde_builder_rejects_bad_structure():
    A = _block_matrix()
    assert linops.bde_from_scipy(sp.csr_matrix(A), rb=6) is None  # 91 % 6 != 0
    dense = sp.csr_matrix(np.random.default_rng(0).standard_normal((20, 10)))
    assert linops.bde_from_scipy(dense, rb=5, max_cmax=4) is None  # too dense


def test_bde_compensated_matvec_pair():
    """df32.matvec2/rmatvec2 on Bde: f32 data, compensated result must match
    the f64 product to ~f32 representation error of the output."""
    A = _block_matrix(G=9, rb=11, n=30, seed=3).astype(np.float32)
    B = linops.bde_from_scipy(sp.csr_matrix(A), rb=11)
    B = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32)
        if np.issubdtype(np.asarray(v).dtype, np.floating) else jnp.asarray(v),
        B)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    y = rng.standard_normal(A.shape[0]).astype(np.float32)
    ref_mv = A.astype(np.float64) @ x.astype(np.float64)
    ref_rmv = A.astype(np.float64).T @ y.astype(np.float64)
    hi, lo = df32.matvec2(B, df32.promote(jnp.asarray(x)))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    np.testing.assert_allclose(got, ref_mv, rtol=2e-7, atol=2e-7)
    hi, lo = df32.rmatvec2(B, df32.promote(jnp.asarray(y)))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    np.testing.assert_allclose(got, ref_rmv, rtol=2e-7, atol=2e-7)


def test_model_auto_bde_for_coupled_sparse():
    """Model representation choice: a sparse block-structured problem whose
    reduced system does NOT decouple (blockkkt.analyze -> None) and whose
    cones have uniform dims takes Bde + the dense-KKT inverse apply instead
    of matrix-free CG — same solution as the dense-input solve, and re-solve
    after update() reuses the cached device structures."""
    import cosmo_tpu as ct

    # n = 200 > kkt_block_max: the column-intersection graph is one coupled
    # component too large for blockkkt, which previously forced CG
    P, q, A, b, sets = problems.block_sdp(n_blocks=20, side=6, n=200, seed=2,
                                          density=0.1)
    s = ct.Settings(eps_abs=1e-8, eps_rel=1e-8, max_iter=2000)

    m_dense = ct.Model(s)
    m_dense.set(P, q, A, b, sets)
    r_dense = m_dense.optimize()

    m_bde = ct.Model(s)
    m_bde.set(P, q, sp.csr_matrix(A), b, sets)
    r_bde = m_bde.optimize()
    assert isinstance(m_bde._dev_cache["Ad"], linops.Bde), (
        "expected the block-dense representation for coupled sparse input")
    assert r_bde.status == "Solved" == r_dense.status
    np.testing.assert_allclose(r_bde.x, r_dense.x, rtol=1e-5, atol=1e-7)

    # q update + warm re-solve through the cached Bde structures
    m_bde.update(q=1.1 * np.asarray(q))
    r2 = m_bde.optimize()
    assert r2.status == "Solved"
    m_dense.update(q=1.1 * np.asarray(q))
    r2d = m_dense.optimize()
    np.testing.assert_allclose(r2.x, r2d.x, rtol=1e-5, atol=1e-7)


def test_bde_solve_matches_dense():
    """Full dense-Cholesky-KKT solve with A stored block-dense: same
    solution as the dense-array solve (identical math through Ruiz scaling,
    factor, matvecs; tiny float differences from reassociated reductions)."""
    from cosmo_tpu.problems import tri_dim

    P, q, A, b, sets = problems.block_sdp(n_blocks=12, side=6, n=24, seed=5)
    m, n = A.shape
    dtype = np.float64
    settings = Settings(max_iter=500, eps_abs=1e-8, eps_rel=1e-8,
                        accelerator=None, adaptive_rho=True)
    cones = conedata.compile_cones(sets, dtype=dtype, psd_pad_to=4)
    static, dyn = split_settings(settings, m, n, dtype)
    x0 = jnp.zeros(n, dtype); s0 = jnp.zeros(m, dtype); mu0 = jnp.zeros(m, dtype)
    Pd, qd, bd = (jnp.asarray(v, dtype) for v in (P, q, b))

    out_d = solver_mod.solve_jit(Pd, jnp.asarray(A, dtype), qd, bd, cones,
                                 x0, s0, mu0, dyn, static=static)
    Bde_A = linops.bde_from_scipy(sp.csr_matrix(A), rb=tri_dim(6))
    assert Bde_A is not None
    out_b = solver_mod.solve_jit(Pd, Bde_A, qd, bd, cones,
                                 x0, s0, mu0, dyn, static=static)
    assert int(out_b["status"]) == int(out_d["status"])
    np.testing.assert_allclose(np.asarray(out_b["x"]), np.asarray(out_d["x"]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_b["s"]), np.asarray(out_d["s"]),
                               rtol=1e-6, atol=1e-8)
