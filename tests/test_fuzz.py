"""Randomized cross-checks.

LPs are verified against scipy.optimize.linprog (HiGHS); QPs/SOCPs against
their KKT conditions. Mirrors the reference's strategy of solving randomly
generated problems with known structure (SURVEY.md §4).
"""
import numpy as np
import pytest

import cosmo_tpu as ct


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_lp_vs_highs(seed):
    from scipy.optimize import linprog

    rng = np.random.default_rng(seed)
    n, m = 12, 20
    c = rng.standard_normal(n)
    A_ub = rng.standard_normal((m, n))
    x_feas = rng.random(n)
    b_ub = A_ub @ x_feas + rng.random(m)

    ref = linprog(c, A_ub=A_ub, b_ub=b_ub, bounds=[(0, 10.0)] * n,
                  method="highs")
    assert ref.status == 0

    # cosmo form: A_ub x <= b_ub -> s = b_ub - A_ub x in Nonneg; 0 <= x <= 10
    A = np.vstack([A_ub, -np.eye(n), np.eye(n)])
    b = np.concatenate([b_ub, np.zeros(n), np.full(n, 10.0)])
    res = ct.solve(None, c, A, b, {"l": m + 2 * n}, eps_abs=1e-8, eps_rel=1e-8)
    assert res.status == "Solved"
    assert abs(res.obj_val - ref.fun) < 1e-5 * max(1.0, abs(ref.fun))


@pytest.mark.parametrize("seed", [10, 11])
def test_random_qp_kkt(seed):
    rng = np.random.default_rng(seed)
    n, m = 10, 16
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)

    res = ct.solve(P, q, A, b, {"l": m}, eps_abs=1e-9, eps_rel=1e-9)
    assert res.status == "Solved"
    x, y, s = res.x, res.y, res.s
    # stationarity: Px + q + A'y = 0  (y is the dual of Ax + s = b, s >= 0)
    assert np.abs(P @ x + q + A.T @ y).max() < 1e-5
    # primal feasibility
    assert np.abs(A @ x + s - b).max() < 1e-6
    assert s.min() > -1e-7
    # dual feasibility + complementarity for the nonnegative cone
    assert y.min() > -1e-7
    assert np.abs(y * s).max() < 1e-5


def test_random_socp_kkt():
    rng = np.random.default_rng(42)
    n = 6
    # min c'x s.t. ||x_2:|| <= x_1 + 1  and  Gx <= h
    c = np.concatenate([[1.0], rng.standard_normal(n - 1) * 0.1])
    Asoc = -np.eye(n)
    bsoc = np.zeros(n)
    bsoc[0] = 1.0  # s = b - Ax = (x1 + 1, x2...) in SOC
    G = rng.standard_normal((4, n))
    h = G @ np.zeros(n) + np.ones(4)
    A = np.vstack([Asoc, G])
    b = np.concatenate([bsoc, h])
    # SOC rows come first here -> use an explicit set list
    model = ct.Model(ct.Settings(eps_abs=1e-9, eps_rel=1e-9))
    model.set(np.zeros((n, n)), c, A, b,
              [ct.SecondOrderCone(n), ct.Nonnegatives(4)])
    res = model.optimize()
    assert res.status == "Solved"
    x, s = res.x, res.s
    t, v = s[0], s[1:n]
    assert np.linalg.norm(v) <= t + 1e-6
    assert (b[n:] - A[n:] @ x).min() > -1e-6


def test_infeasible_lp_detected():
    # x >= 1 and x <= 0 simultaneously
    n = 4
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.concatenate([np.zeros(n), -np.ones(n)])  # -x >= 0 and x - 1 >= 0
    res = ct.solve(None, np.ones(n), -A, -b + 0 * b, {"l": 2 * n},
                   max_iter=4000)
    # s = b - Ax with our sign flip; just assert the solver flags it
    model = ct.Model(ct.Settings(max_iter=4000))
    # s1 = -x in Nonneg -> x <= 0 ; s2 = x - 1 in Nonneg -> x >= 1
    Araw = np.vstack([np.eye(n), -np.eye(n)])
    braw = np.concatenate([np.zeros(n), -np.ones(n)])
    model.set(np.zeros((n, n)), np.ones(n), Araw, braw,
              [ct.Nonnegatives(2 * n)])
    r = model.optimize()
    assert r.status == "Primal_infeasible"


def test_unbounded_lp_detected():
    # min -x, x >= 0 (unbounded below) -> dual infeasible
    n = 3
    model = ct.Model(ct.Settings(max_iter=4000))
    model.set(np.zeros((n, n)), -np.ones(n), -np.eye(n), np.zeros(n),
              [ct.Nonnegatives(n)])
    r = model.optimize()
    assert r.status == "Dual_infeasible"
