"""Infeasibility detection tests
(reference: test/UnitTests/InfeasibilityTests/)."""
import numpy as np

import cosmo_tpu as cosmo


def test_primal_infeasible_lp():
    """x >= 1 and x <= 0 simultaneously."""
    n = 2
    c1 = cosmo.Constraint(np.eye(n), -np.ones(n), cosmo.Nonnegatives)  # x >= 1
    c2 = cosmo.Constraint(-np.eye(n), np.zeros(n), cosmo.Nonnegatives)  # -x >= 0
    model = cosmo.Model()
    model.assemble(np.zeros((n, n)), np.ones(n), [c1, c2])
    res = model.optimize()
    assert res.status == "Primal_infeasible"


def test_primal_infeasible_eq():
    """Contradictory equalities: x1 = 0 and x1 = 1."""
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    b = np.array([0.0, -1.0])
    con = cosmo.Constraint(A, b, cosmo.ZeroSet)
    model = cosmo.Model()
    model.assemble(np.eye(2), np.zeros(2), [con])
    res = model.optimize()
    assert res.status == "Primal_infeasible"


def test_dual_infeasible_unbounded_lp():
    """min -x1 s.t. x >= 0: unbounded below -> dual infeasible."""
    n = 2
    con = cosmo.Constraint(np.eye(n), np.zeros(n), cosmo.Nonnegatives)
    model = cosmo.Model()
    model.assemble(np.zeros((n, n)), np.array([-1.0, 0.0]), [con])
    res = model.optimize()
    assert res.status == "Dual_infeasible"


def test_dual_infeasible_box_direction():
    """min -x2 with x1 in [0,1] and x2 free above -> unbounded."""
    A = np.array([[1.0, 0.0]])
    con_box = cosmo.Constraint(A, np.zeros(1), cosmo.Box([0.0], [1.0]))
    con_nn = cosmo.Constraint(np.array([[0.0, 1.0]]), np.zeros(1), cosmo.Nonnegatives)
    model = cosmo.Model()
    model.assemble(np.zeros((2, 2)), np.array([0.0, -1.0]), [con_box, con_nn])
    res = model.optimize()
    assert res.status == "Dual_infeasible"


# ---------------------------------------------------------------------------
# Randomized batteries following the reference's construction recipes
# (test/UnitTests/InfeasibilityTests/primal_infeasible_{1,2,3}.jl,
# dual_infeasible_{1,2}.jl): build a certificate-carrying random problem,
# then assert the solver detects the status.
# ---------------------------------------------------------------------------

def _pos_def(rng, n, lo=0.1, hi=5.0):
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    return Q @ np.diag(rng.uniform(lo, hi, n)) @ Q.T


def test_primal_infeasible_random_qp_battery():
    """Random QPs with A x + s = b, s >= 0, x >= 0 where every entry of the
    inequality rhs is negative while A >= 0 -- primal infeasible by
    construction; q chosen dual-feasible (q = -P x* - A' y*) so only the
    primal certificate can fire (reference:
    InfeasibilityTests/primal_infeasible_1.jl)."""
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 30))
        m = 2 * n
        A = rng.random((m, n)) * (rng.random((m, n)) < 0.8)
        b = -rng.random(m)
        A_full = np.vstack([A, -np.eye(n)])
        b_full = np.concatenate([b, np.zeros(n)])
        P = _pos_def(rng, n)
        q = -(P @ rng.random(n)) - A_full.T @ rng.random(m + n)
        con = cosmo.Constraint(-A_full, b_full, cosmo.Nonnegatives)
        model = cosmo.Model()
        model.assemble(P, q, [con],
                       settings=cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                               max_iter=10000))
        res = model.optimize()
        assert res.status == "Primal_infeasible", seed


def test_primal_infeasible_random_mixed_cones():
    """Zero + SOC + PSD-square problem whose SOC t-component is forced
    negative (t < 0 is infeasible for ||x|| <= t); q built dual-feasible
    from a strictly-interior y* (reference:
    InfeasibilityTests/primal_infeasible_3.jl)."""
    from cosmo_tpu.problems import svec

    for seed in (4, 5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 25))
        m1 = int(rng.integers(2, 8))
        m2 = int(rng.integers(3, 8))
        r = int(rng.integers(4, 8))
        m3 = r * r
        m = m1 + m2 + m3
        A = rng.random((m, n)) * 50 * (rng.random((m, n)) < 0.8)
        xtrue = rng.random(n) * 50
        s = np.concatenate([
            np.zeros(m1), rng.random(m2), _pos_def(rng, r).ravel(order="F")
        ])
        b = A @ xtrue + s
        # force the SOC t-row to be identically -1: t >= ||x|| can't hold
        A[m1] = 0.0
        b[m1] = -1.0
        P = _pos_def(rng, n)
        y2 = rng.random(m2 - 1) * 50
        ytrue = np.concatenate([
            rng.random(m1) * 50,
            np.concatenate([[np.linalg.norm(y2) + 1.0], y2]),
            _pos_def(rng, r).ravel(order="F"),
        ])
        q = -(P @ xtrue) - A.T @ ytrue
        cons = [
            cosmo.Constraint(-A[:m1], b[:m1], cosmo.ZeroSet),
            cosmo.Constraint(-A[m1:m1 + m2], b[m1:m1 + m2],
                             cosmo.SecondOrderCone),
            cosmo.Constraint(-A[m1 + m2:], b[m1 + m2:], cosmo.PsdCone),
        ]
        model = cosmo.Model()
        model.assemble(P, q, cons,
                       settings=cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                               max_iter=10000,
                                               decompose=False))
        res = model.optimize()
        assert res.status == "Primal_infeasible", seed


def test_dual_infeasible_random_lp_battery():
    """P = 0 with one column of A identically zero and a negative cost on
    that variable: unbounded below along e_k (reference:
    InfeasibilityTests/dual_infeasible_1.jl)."""
    for seed in (6, 7, 8):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 30))
        m = 2 * n
        A = rng.random((m, n)) * 50 * (rng.random((m, n)) < 0.7)
        A[:, -1] = 0.0
        q = rng.random(n) * 50
        q[-1] = -1.0
        b = A @ (rng.random(n) * 50) + rng.random(m) * 50
        con = cosmo.Constraint(-A, b, cosmo.Nonnegatives)
        model = cosmo.Model()
        model.assemble(np.zeros((n, n)), q, [con],
                       settings=cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                               max_iter=10000))
        res = model.optimize()
        assert res.status == "Dual_infeasible", seed


def test_dual_infeasible_random_mixed_cones():
    """Unbounded direction through Zero + Nonnegatives + SOC + PSD rows:
    x1 appears only in the cost (negative) and in a redundant inequality
    (reference: InfeasibilityTests/dual_infeasible_2.jl)."""
    for seed in (9, 11):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 25))
        m1 = int(rng.integers(2, 8))
        m2 = 1
        m3 = int(rng.integers(3, 8))
        r = int(rng.integers(4, 8))
        m4 = r * r
        m = m1 + m2 + m3 + m4
        A = rng.random((m, n)) * 50 * (rng.random((m, n)) < 0.8)
        xtrue = rng.random(n) * 50
        s3 = rng.random(m3 - 1)
        s = np.concatenate([
            np.zeros(m1), [rng.random()],
            np.concatenate([[np.linalg.norm(s3) + 1.0], s3]),
            _pos_def(rng, r).ravel(order="F"),
        ])
        A[:, 0] = 0.0
        A[m1] = np.concatenate([[-1.0], np.zeros(n - 1)])
        b = A @ xtrue + s
        b[m1] = 0.0
        q = np.concatenate([[-1.0], rng.random(n - 1)])
        cons = [
            cosmo.Constraint(-A[:m1], b[:m1], cosmo.ZeroSet),
            cosmo.Constraint(-A[m1:m1 + m2], b[m1:m1 + m2],
                             cosmo.Nonnegatives),
            cosmo.Constraint(-A[m1 + m2:m1 + m2 + m3], b[m1 + m2:m1 + m2 + m3],
                             cosmo.SecondOrderCone),
            cosmo.Constraint(-A[m1 + m2 + m3:], b[m1 + m2 + m3:],
                             cosmo.PsdCone),
        ]
        model = cosmo.Model()
        model.assemble(np.zeros((n, n)), q, cons,
                       settings=cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                               max_iter=10000,
                                               decompose=False))
        res = model.optimize()
        assert res.status == "Dual_infeasible", seed


def test_primal_infeasible_under_decomposition():
    """The shadow-trajectory certificates must fire through the chordal
    decomposition pipeline too (the decomposed problem inherits the
    infeasibility; reference: decomposition composes with the Banjac
    conditions transparently)."""
    import scipy.sparse as sp
    from cosmo_tpu.problems import banded_sdp

    P, q, A, b, sets, _ = banded_sdp(n_nodes=60, bandwidth=4, seed=0,
                                     sparse=True)
    n = A.shape[1]
    # contradictory equalities on the first variable: x0 = 0 and x0 = 1
    e = sp.csr_matrix((np.array([1.0, 1.0]),
                       (np.array([0, 1]), np.array([0, 0]))), shape=(2, n))
    A2 = sp.vstack([e, A], format="csr")
    b2 = np.concatenate([[0.0, 1.0], b])
    m = cosmo.Model(cosmo.Settings(eps_abs=1e-5, eps_rel=1e-5,
                                   decompose=True, max_iter=10000))
    m.set(P, q, A2, b2, [cosmo.ZeroSet(2)] + sets)
    r = m.optimize()
    assert r.status == "Primal_infeasible"
