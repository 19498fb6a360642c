"""Model state-machine / warm-start / update tests (reference:
test/UnitTests/model_modifications.jl, interface.jl warm-start semantics).
"""
import numpy as np
import pytest

import cosmo_tpu as ct


def _qp():
    rng = np.random.default_rng(0)
    n, m = 8, 12
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    return P, q, A, b, [ct.Nonnegatives(m)]


def test_update_q_b_and_resolve():
    P, q, A, b, sets = _qp()
    model = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    model.set(P, q, A, b, sets)
    r1 = model.optimize()
    assert r1.status == "Solved"

    q2 = q + 0.1
    b2 = b + 0.05
    model.update(q=q2, b=b2)
    r2 = model.optimize()
    assert r2.status == "Solved"

    fresh = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    fresh.set(P, q2, A, b2, sets)
    r3 = fresh.optimize()
    assert np.allclose(r2.x, r3.x, atol=1e-6)


def test_update_dimension_checks():
    P, q, A, b, sets = _qp()
    model = ct.Model()
    model.set(P, q, A, b, sets)
    with pytest.raises(ValueError):
        model.update(q=np.zeros(3))
    with pytest.raises(ValueError):
        model.update(b=np.zeros(3))
    unassembled = ct.Model()
    with pytest.raises(RuntimeError):
        unassembled.update(q=q)


def test_warm_start_reduces_iterations():
    P, q, A, b, sets = _qp()
    model = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    model.set(P, q, A, b, sets)
    r1 = model.optimize()

    warm = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    warm.set(P, q, A, b, sets)
    warm.warm_start(x0=r1.x, y0=r1.y, s0=r1.s)
    r2 = warm.optimize()
    assert r2.status == "Solved"
    assert r2.iter <= r1.iter


def test_warm_start_partial_indices():
    P, q, A, b, sets = _qp()
    model = ct.Model()
    model.set(P, q, A, b, sets)
    model.warm_start_primal(np.array([1.0, 2.0]), ind=[0, 1])
    assert model.x0[0] == 1.0 and model.x0[1] == 2.0
    # dual warm start stores mu = -y (reference: interface.jl:161-169)
    model.warm_start_dual(np.array([3.0]), ind=[2])
    assert model.mu0[2] == -3.0


def test_empty_model_reuse():
    P, q, A, b, sets = _qp()
    model = ct.Model()
    model.set(P, q, A, b, sets)
    r1 = model.optimize()
    model.empty()
    assert not model.is_assembled
    with pytest.raises(RuntimeError):
        model.optimize()
    model.set(P, q, A, b, sets)
    r2 = model.optimize()
    assert abs(r1.obj_val - r2.obj_val) < 1e-8


def test_time_limit_status():
    rng = np.random.default_rng(1)
    # a slow problem with a tiny time budget
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=25, bandwidth=4, seed=2)
    model = ct.Model(
        ct.Settings(time_limit=1e-4, eps_abs=1e-12, eps_rel=1e-12,
                    max_iter=100000)
    )
    model.set(P, q, A, b, sets)
    res = model.optimize()
    assert res.status in ("Time_limit_reached", "Solved")


def test_chunked_solve_matches_unchunked_trajectory():
    """A chunked (time-limited) solve re-enters with the full loop carry, so
    it must land on the same iterate trajectory — identical x/iteration count
    — as one uninterrupted solve (reference: solver.jl:303-321)."""
    P, q, A, b, sets = _qp()
    plain = ct.Model(ct.Settings(eps_abs=1e-9, eps_rel=1e-9, check_termination=5))
    plain.set(P, q, A, b, sets)
    r_plain = plain.optimize()

    chunked = ct.Model(
        # check_termination=5 -> tiny 50-iteration chunks force several
        # re-entries; the huge budget means the limit itself never triggers
        ct.Settings(eps_abs=1e-9, eps_rel=1e-9, time_limit=3600.0,
                    check_termination=5)
    )
    chunked.set(P, q, A, b, sets)
    r_chunked = chunked.optimize()

    assert r_chunked.status == "Solved"
    assert r_chunked.iter == r_plain.iter
    assert np.array_equal(r_chunked.x, r_plain.x)
    # inner KKT iterations must accumulate across chunks, not reset
    assert r_chunked.info.kkt_solver_iters == r_plain.info.kkt_solver_iters


def test_nonconvex_P_flagged_unsolved():
    """Indefinite P breaks the Cholesky factor; the solver must surface
    Unsolved instead of returning NaNs (reference analog: the QDLDL inertia
    check errors with 'not convex', kktsolver.jl:304)."""
    rng = np.random.default_rng(0)
    n, m = 4, 6
    P = -np.eye(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    model = ct.Model(ct.Settings(max_iter=100))
    model.set(P, np.zeros(n), A, b, [ct.Nonnegatives(m)])
    res = model.optimize()
    assert res.status in ("Unsolved", "Dual_infeasible", "Max_iter_reached")
    assert res.status != "Solved"


def test_assemble_with_sparse_constraints():
    """assemble keeps sparse constraint matrices sparse end-to-end."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n, m = 10, 14
    A = sp.random(m, n, density=0.3, random_state=3, format="csr")
    b = np.asarray(A @ rng.standard_normal(n)) + rng.random(m)
    con = ct.Constraint(-A, b, ct.Nonnegatives(m))  # -A x + b >= 0
    P = sp.identity(n, format="csr")
    q = rng.standard_normal(n)
    model = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    model.assemble(P, q, [con])
    assert sp.issparse(model.A) and sp.issparse(model.P)
    r1 = model.optimize()

    dense = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    dense.assemble(P.toarray(), q, [ct.Constraint(-A.toarray(), b, ct.Nonnegatives(m))])
    r0 = dense.optimize()
    assert r1.status == "Solved"
    assert np.allclose(r1.x, r0.x, atol=1e-5)


def test_decomposition_cached_across_solves():
    """The chordal analysis is cached on the Model: a q/b update re-solve
    must not redo graph analysis (reference: States flags, types.jl:330-337)
    and must produce the same answer as a fresh decomposition."""
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=20, bandwidth=3, seed=6)
    model = ct.Model(ct.Settings(decompose=True, eps_abs=1e-7, eps_rel=1e-7))
    model.set(P, q, A, b, sets)
    r1 = model.optimize()
    info1 = model._chordal_info
    assert model.is_decomposed and info1 is not None

    model.update(q=q * 1.2)
    r2 = model.optimize()
    assert model._chordal_info is info1          # same cached analysis
    assert r2.times.graph_time < 0.05            # no re-analysis

    fresh = ct.Model(ct.Settings(decompose=True, eps_abs=1e-7, eps_rel=1e-7))
    fresh.set(P, q * 1.2, A, b, sets)
    r3 = fresh.optimize()
    assert abs(r2.obj_val - r3.obj_val) < 1e-5


def test_warm_start_composes_with_decomposition():
    """Warm starts lift into the decomposed space (round 1 silently zeroed
    them): restarting from the solution must cut iterations."""
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=20, bandwidth=3, seed=8)
    cold = ct.Model(ct.Settings(decompose=True, eps_abs=1e-7, eps_rel=1e-7))
    cold.set(P, q, A, b, sets)
    r1 = cold.optimize()
    assert cold.is_decomposed and r1.status == "Solved"

    warm = ct.Model(ct.Settings(decompose=True, eps_abs=1e-7, eps_rel=1e-7))
    warm.set(P, q, A, b, sets)
    warm.warm_start(x0=r1.x, y0=r1.y, s0=r1.s)
    r2 = warm.optimize()
    assert r2.status == "Solved"
    assert r2.iter < r1.iter


def test_warm_start_composes_with_standard_transform():
    """Warm-start lifting for the standard (Agler) decomposition mode."""
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=15, bandwidth=3, seed=8)
    settings = ct.Settings(decompose=True, compact_transformation=False,
                           eps_abs=1e-7, eps_rel=1e-7)
    cold = ct.Model(settings)
    cold.set(P, q, A, b, sets)
    r1 = cold.optimize()
    assert cold.is_decomposed and r1.status == "Solved"
    assert cold._chordal_info.mode == "standard"

    warm = ct.Model(settings)
    warm.set(P, q, A, b, sets)
    warm.warm_start(x0=r1.x, y0=r1.y, s0=r1.s)
    r2 = warm.optimize()
    assert r2.status == "Solved"
    assert r2.iter <= r1.iter
    assert abs(r2.obj_val - r1.obj_val) < 1e-5


def test_update_after_decomposed_solve():
    """Updates stay legal after a decomposed solve (the decomposition is
    re-derived from the original data each optimize)."""
    from cosmo_tpu import problems

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=15, bandwidth=3, seed=4)
    model = ct.Model(ct.Settings(decompose=True, eps_abs=1e-6, eps_rel=1e-6))
    model.set(P, q, A, b, sets)
    r1 = model.optimize()
    assert model.is_decomposed and r1.status == "Solved"
    model.update(q=q * 1.1)
    r2 = model.optimize()
    assert r2.status == "Solved"
    fresh = ct.Model(ct.Settings(decompose=True, eps_abs=1e-6, eps_rel=1e-6))
    fresh.set(P, q * 1.1, A, b, sets)
    r3 = fresh.optimize()
    assert abs(r2.obj_val - r3.obj_val) < 1e-4


def test_dispatch_chunk_matches_unchunked_trajectory():
    """Bounding device-call length (Settings.dispatch_chunk) re-enters the
    same compiled program through the full carry, so iterate trajectory and
    iteration count are identical to one unchunked dispatch."""
    P, q, A, b, sets = _qp()
    plain = ct.Model(ct.Settings(eps_abs=1e-9, eps_rel=1e-9,
                                 check_termination=5, dispatch_chunk=-1))
    plain.set(P, q, A, b, sets)
    r_plain = plain.optimize()
    chunked = ct.Model(ct.Settings(eps_abs=1e-9, eps_rel=1e-9,
                                   check_termination=5, dispatch_chunk=15))
    chunked.set(P, q, A, b, sets)
    r_chunked = chunked.optimize()
    assert r_chunked.status == r_plain.status == "Solved"
    assert r_chunked.iter == r_plain.iter
    np.testing.assert_array_equal(r_chunked.x, r_plain.x)


def test_set_dimension_mismatches_raise():
    """set() must reject inconsistent P/q/A/b/cone dims (reference:
    interface.jl:35-38 DimensionMismatch battery)."""
    P = np.eye(2); q = np.ones(2)
    A = np.eye(2); b = np.zeros(2)
    sets = [ct.Nonnegatives(2)]
    bad = [
        (P, np.ones(3), A, b, sets),
        (np.eye(3), q, A, b, sets),
        (P, q, np.ones((2, 3)), b, sets),
        (P, q, A, np.zeros(3), sets),
        (P, q, A, b, [ct.Nonnegatives(1)]),
    ]
    for args in bad:
        m = ct.Model()
        with pytest.raises(ValueError):
            m.set(*args)


def test_assemble_scalar_and_vector_P():
    """assemble() accepts scalar / 1-D P forms (reference:
    interface.jl:65-88: P given as scalar, 1x1 matrix, vector)."""
    con = ct.Constraint(np.ones((1, 1)), np.zeros(1), ct.ZeroSet)
    for P in (np.float64(1.0), np.ones((1, 1)), np.ones(1)):
        m = ct.Model()
        m.assemble(P, np.ones(1), [con])
        assert m.P.shape == (1, 1) and m.P[0, 0] == 1.0
    # diagonal vector P for n > 1
    con2 = ct.Constraint(np.eye(2), np.zeros(2), ct.Nonnegatives)
    m = ct.Model()
    m.assemble(np.array([2.0, 3.0]), np.ones(2), [con2])
    np.testing.assert_array_equal(m.P, np.diag([2.0, 3.0]))
