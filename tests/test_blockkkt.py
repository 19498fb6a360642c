"""Block-diagonal direct KKT solver (ops/blockkkt.py).

The reduced system M = P + sigma I + A' diag(rho) A is exactly block
diagonal under the connected components of the column-intersection graph;
the solver caches batched dense inverses of the components and replaces
the CG inner loop for decomposed sparse problems (the reference's analog
is the QDLDL sparse factorization, kktsolver.jl:285-320).
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import cosmo_tpu as cosmo
from cosmo_tpu import problems
from cosmo_tpu.ops import blockkkt, linops


def _decomposed_problem(n_nodes=40, bandwidth=4, seed=1):
    from cosmo_tpu import chordal

    P, q, A, b, sets, _ = problems.banded_sdp(
        n_nodes=n_nodes, bandwidth=bandwidth, seed=seed, sparse=True
    )
    info = chordal.decompose(P, q, A, b, sets, cosmo.Settings())
    Pd, qd, Ad, bd, sets_d = info.problem
    return sp.csr_matrix(Pd), sp.csr_matrix(Ad)


def test_solve_matches_dense_ground_truth():
    rng = np.random.default_rng(0)
    Pc, Ac = _decomposed_problem()
    meta = blockkkt.analyze(Pc, Ac, max_block=64)
    assert meta is not None

    m, n = Ac.shape
    rho = np.abs(rng.normal(1.0, 0.3, m)) + 0.1
    sigma = 1e-6
    Pj = linops.coo_from_scipy(Pc, np.float64)
    Aj = linops.coo_from_scipy(Ac, np.float64)
    state = blockkkt.factor(meta, Pj, Aj, sigma, jnp.asarray(rho))
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=m)
    x, nu = blockkkt.solve(
        meta, state, Pj, Aj, sigma, jnp.asarray(rho),
        jnp.asarray(r1), jnp.asarray(r2),
    )

    M = Pc.toarray() + sigma * np.eye(n) + (Ac.T @ sp.diags(rho) @ Ac).toarray()
    t = r1 + Ac.T @ (rho * r2)
    x_ref = np.linalg.solve(M, t)
    assert np.abs(np.asarray(x) - x_ref).max() <= 1e-9 * np.abs(x_ref).max()
    nu_ref = rho * (Ac @ x_ref - r2)
    assert np.abs(np.asarray(nu) - nu_ref).max() <= 1e-8 * max(np.abs(nu_ref).max(), 1.0)


def test_component_partition_covers_all_columns():
    Pc, Ac = _decomposed_problem(n_nodes=30, bandwidth=3, seed=2)
    meta = blockkkt.analyze(Pc, Ac, max_block=64)
    n = Ac.shape[1]
    cols = np.concatenate([np.asarray(b.cols).ravel() for b in meta.buckets])
    cols = cols[cols < n]
    assert np.array_equal(np.sort(cols), np.arange(n))


def test_analyze_rejects_coupled_problems():
    rng = np.random.default_rng(0)
    A = sp.csr_matrix(rng.normal(size=(30, 20)))  # fully coupled
    P = sp.csr_matrix((20, 20))
    assert blockkkt.analyze(P, A, max_block=16) is None


def test_model_auto_selects_blockdiag_and_matches_cg():
    gen = lambda: problems.banded_sdp(n_nodes=60, bandwidth=5, seed=3, sparse=True)
    objs = {}
    for ks in ("dense", "cg"):  # "dense" auto-upgrades to blockdiag for sparse
        m = cosmo.Model(cosmo.Settings(eps_abs=1e-6, eps_rel=1e-6,
                                       decompose=True, kkt_solver=ks))
        m.set(*gen()[:5])
        r = m.optimize()
        assert r.status == "Solved"
        objs[ks] = float(r.obj_val)
        if ks == "dense":
            # the exact solves must not report inner-iteration counts
            assert int(r.info.kkt_solver_iters) == 0
        else:
            assert int(r.info.kkt_solver_iters) > 0
    assert objs["dense"] == pytest.approx(objs["cg"], abs=2e-4)


def test_blockdiag_explicit_selection_nondecomposed():
    # undecomposed sparse maxcut: diag(y) - L/4 has one A-nonzero per
    # diagonal row, so every column is its own component
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=30, density=0.1, seed=0,
                                          sparse=True)
    m = cosmo.Model(cosmo.Settings(eps_abs=1e-7, eps_rel=1e-7,
                                   decompose=False, kkt_solver="blockdiag"))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    assert r.status == "Solved"

    m2 = cosmo.Model(cosmo.Settings(eps_abs=1e-7, eps_rel=1e-7,
                                    decompose=False, kkt_solver="cg"))
    m2.set(P, q, A, b, sets)
    r2 = m2.optimize()
    assert float(r.obj_val) == pytest.approx(float(r2.obj_val), abs=1e-4)


def test_blockdiag_f32_refinement_reaches_tolerance():
    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=60, bandwidth=5,
                                              seed=3, sparse=True)
    m = cosmo.Model(cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                   decompose=True, dtype=np.float32,
                                   max_iter=8000))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    assert r.status == "Solved"


def test_blockdiag_time_limit_chunked():
    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=60, bandwidth=5,
                                              seed=3, sparse=True)
    m = cosmo.Model(cosmo.Settings(eps_abs=1e-6, eps_rel=1e-6,
                                   decompose=True, time_limit=600.0))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    assert r.status == "Solved"


def test_compensated_residuals_match_coo_path():
    """blockkkt.compensated_residuals (the block-dense df32 check path,
    solver._bspace_comp_res) reproduces the global COO compensated
    residuals — scaled and unscaled — on a real decomposed problem.
    (Reduction orders differ, so agreement is to f64-roundoff here, not
    bitwise; the COO pass measured 407 ms/check at the 10k north-star vs
    ~9 ms through the cached Ad tensors.)"""
    from cosmo_tpu.ops import df32, residuals as res_ops, scaling

    Pd, Ad = _decomposed_problem()
    meta = blockkkt.analyze(Pd, Ad, max_block=64)
    assert meta is not None and blockkkt.supports_blockspace(meta)
    m, n = Ad.shape
    Pdev = linops.coo_from_scipy(Pd, np.float64)
    Adev = linops.coo_from_scipy(Ad, np.float64)
    rng = np.random.default_rng(5)
    rho = jnp.asarray(rng.uniform(0.05, 2.0, m))
    st = blockkkt.factor(meta, Pdev, Adev, 1e-6, rho)

    x = jnp.asarray(rng.standard_normal(n))
    s = jnp.asarray(rng.standard_normal(m))
    mu = jnp.asarray(rng.standard_normal(m))
    q = jnp.asarray(rng.standard_normal(n))
    b = jnp.asarray(rng.standard_normal(m))
    cols = blockkkt.blockspace_cols(meta)
    xg = jnp.concatenate([x, jnp.zeros(1)])[cols]
    qg = jnp.concatenate([q, jnp.zeros(1)])[cols]

    for scaled in (False, True):
        if scaled:
            E = jnp.asarray(rng.uniform(0.5, 2.0, m))
            D = jnp.asarray(rng.uniform(0.5, 2.0, n))
            c = 1.7
            sm = scaling.ScaleMats(D=1.0 / D, E=1.0 / E, c=1.0 / c,
                                   Dinv=D, Einv=E, cinv=c)
        else:
            sm = scaling.identity_scale(m, n, jnp.zeros(0).dtype)
        rp0, rd0 = res_ops.calculate_residuals(
            Pdev, Adev, q, b, x, s, mu, sm, compensated=True)
        mp0, md0 = res_ops.max_res_component_norm(
            Pdev, Adev, q, b, x, s, mu, sm, compensated=True)
        Dg = jnp.concatenate([sm.Dinv, jnp.zeros(1)])[cols]
        pxh, pxl = df32.matvec2(Pdev, df32.promote(x))
        px_g = (jnp.concatenate([pxh, jnp.zeros(1)])[cols],
                jnp.concatenate([pxl, jnp.zeros(1)])[cols])
        rp1, rd1, mp1, md1 = blockkkt.compensated_residuals(
            meta, st, xg, s, mu, b, qg, sm.Einv, Dg, sm.cinv, px_g)
        for a0, a1 in [(rp0, rp1), (rd0, rd1), (mp0, mp1), (md0, md1)]:
            np.testing.assert_allclose(float(a0), float(a1),
                                       rtol=1e-12, atol=1e-13)
