"""Ports of the reference's remaining problem test suites:
nuclear_norm_minimization.jl (max-singular-value chordal LMI),
socp-lasso.jl, and qp-box.jl.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import cosmo_tpu as ct


def test_max_singular_value_chordal_lmi():
    """Maximum-singular-value SDP that stressed the reference's compact
    transformation (reference: nuclear_norm_minimization.jl):

        min t  s.t.  [t I  Y; Y' t I] >= 0,  Y[2,1] <= 4, Y[2,2] >= 3,
                     sum(Y) >= 12,   x := [t; vec(Y)] in R^10.
    """
    q = np.concatenate([[1.0], np.zeros(9)])
    con1 = ct.Constraint(
        np.concatenate([[0, 0, -1.0], np.zeros(7)]).reshape(1, -1),
        np.array([4.0]), ct.Nonnegatives(1))
    con2 = ct.Constraint(
        np.concatenate([[0, 0, 0, 0, 0, 1.0], np.zeros(4)]).reshape(1, -1),
        np.array([-3.0]), ct.Nonnegatives(1))
    con3 = ct.Constraint(
        np.concatenate([[0.0], np.ones(9)]).reshape(1, -1),
        np.array([-12.0]), ct.Nonnegatives(1))

    A_lmi1 = np.array([-1.0, 0, -1, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, 0, -1,
                       0, 0, 0, 0, 0, -1])
    A_lmi2 = np.zeros((21, 9))
    s2 = np.sqrt(2.0)
    for r, c in ((6, 0), (7, 1), (8, 2), (10, 3), (11, 4), (12, 5),
                 (15, 6), (16, 7), (17, 8)):
        A_lmi2[r, c] = -s2
    A_lmi = np.concatenate([A_lmi1[:, None], A_lmi2], axis=1)
    con4 = ct.Constraint(-A_lmi, np.zeros(21), ct.PsdConeTriangle(21))

    model = ct.Model()
    model.assemble(
        np.zeros((10, 10)), q, [con1, con2, con3, con4],
        settings=ct.Settings(compact_transformation=True, decompose=True,
                             eps_abs=1e-6, eps_rel=1e-6),
    )
    res = model.optimize()
    assert res.status == "Solved"
    Y = res.x[1:].reshape(3, 3, order="F")
    t = res.x[0]
    assert Y[1, 0] <= 4 + 1e-4
    assert Y[1, 1] >= 3 - 1e-4
    assert Y.sum() - 12.0 >= -1e-3
    sigma_max = np.linalg.svd(Y, compute_uv=False)[0]
    assert abs(sigma_max - t) <= 1e-3


def _ista_lasso(F, b, mu, iters=2000):
    """Ground truth for min ||Fv - b||^2 + mu ||v||_1 (proximal gradient)."""
    L = 2.0 * np.linalg.norm(F, 2) ** 2
    v = np.zeros(F.shape[1])
    for _ in range(iters):
        g = 2.0 * F.T @ (F @ v - b)
        w = v - g / L
        v = np.sign(w) * np.maximum(np.abs(w) - mu / L, 0.0)
    return np.sum((F @ v - b) ** 2) + mu * np.abs(v).sum()


def test_socp_lasso():
    """SOCP formulation of the lasso (reference: socp-lasso.jl); the
    optimal value must match an independent proximal-gradient solve."""
    rng = np.random.default_rng(12345)
    n = 8
    m = 50 * n
    F = rng.random((m, n))
    vtrue = np.where(rng.random(n) < 0.1, rng.random(n), 0.0)
    noise = 0.1 * rng.random(m)
    b = F @ vtrue + noise
    mu = 0.1 * np.linalg.norm(F.T @ b, np.inf)

    # variables z = [t; v(n); u(n); w(m+2)]
    A1 = -np.block([
        [np.ones((1, 1)), np.zeros((1, 2 * n + 1)), np.ones((1, 1)), np.zeros((1, m))],
        [-np.ones((1, 1)), np.zeros((1, 2 * n)), np.ones((1, 1)), np.zeros((1, m + 1))],
        [np.zeros((m, 1)), -2 * F, np.zeros((m, n + 2)), np.eye(m)],
    ])
    A2 = -np.block([
        [np.zeros((n, 1)), np.eye(n), -np.eye(n), np.zeros((n, m + 2))],
        [np.zeros((n, 1)), -np.eye(n), -np.eye(n), np.zeros((n, m + 2))],
    ])
    A3 = -np.block([
        [np.zeros((1, 2 * n + 1)), -np.ones((1, 1)), np.zeros((1, m + 1))],
        [np.zeros((1, 2 * n + 2)), -np.ones((1, 1)), np.zeros((1, m))],
        [np.zeros((m, 2 * n + 3)), -np.eye(m)],
    ])
    b1 = np.concatenate([[1.0, 1.0], -2 * b])
    b2 = np.zeros(2 * n)
    b3 = np.zeros(m + 2)
    q = np.concatenate([[1.0], np.zeros(n), mu * np.ones(n), np.zeros(m + 2)])
    P = np.zeros((len(q), len(q)))

    model = ct.Model()
    model.assemble(P, q, [
        ct.Constraint(A1, b1, ct.ZeroSet(A1.shape[0])),
        ct.Constraint(A2, b2, ct.Nonnegatives(A2.shape[0])),
        ct.Constraint(A3, b3, ct.SecondOrderCone(A3.shape[0])),
    ], settings=ct.Settings(eps_abs=1e-6, eps_rel=1e-6))
    res = model.optimize()
    assert res.status == "Solved"
    ref_obj = _ista_lasso(F, b, mu)
    assert abs(res.obj_val - ref_obj) < 1e-2 * max(1.0, abs(ref_obj))


def test_qp_box_feasible():
    """(reference: qp-box.jl feasible case; obj* = -0.5)."""
    A = sp.csr_matrix(np.eye(2))
    b = np.zeros(2)
    P = np.eye(2)
    q = np.array([1.0, -1.0])
    model = ct.Model()
    model.assemble(P, q, [ct.Constraint(A, b, ct.Box([0.0, 0], [1.0, 1]))],
                   settings=ct.Settings(eps_abs=1e-7, eps_rel=1e-7))
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(res.obj_val - (-0.5)) < 1e-5


def test_qp_box_primal_infeasible():
    """(reference: qp-box.jl primal-infeasible case: rows 1 and 2 force
    x1 = -2 and x1 in [0, 1])."""
    A = sp.csr_matrix(np.array([[1.0, 0.0], [1.0, 0.0]]))
    b = np.array([2.0, 0.0])
    P = np.eye(2)
    q = np.array([1.0, -1.0])
    model = ct.Model()
    model.assemble(P, q, [ct.Constraint(A, b, ct.Box([0.0, 0], [1.0, 1]))])
    res = model.optimize()
    assert res.status == "Primal_infeasible"


@pytest.mark.parametrize("scaling", [0, 10])
def test_qp_box_dual_infeasible(scaling):
    """x2 unbounded below inside a half-open box (reference: qp-box.jl
    dual-infeasible cases, unscaled + scaled)."""
    A = sp.csr_matrix(np.eye(2))
    b = np.array([1.0, 1.0])
    P = np.zeros((2, 2))
    q = np.array([1.0, 1.0])
    l = np.array([0.0, -np.inf])
    u = np.array([1.0, 3.0])
    model = ct.Model()
    model.assemble(P, q, [ct.Constraint(A, b, ct.Box(l, u))],
                   settings=ct.Settings(check_infeasibility=20,
                                        scaling=scaling))
    res = model.optimize()
    assert res.status == "Dual_infeasible"


def test_nuclear_norm_matrix_completion():
    """Nuclear-norm minimization (the suite's namesake problem):

        min ||X||_*  s.t.  X_ij = M_ij  on observed entries,

    via the SDP  min (tr U + tr V)/2  s.t. [U X; X' V] >= 0. For M = a b'
    rank-1 with enough observations, the minimizer recovers M and
    ||X||_* = sigma_1 = ||a|| ||b||.
    """
    rng = np.random.default_rng(7)
    p = r = 4
    a = rng.standard_normal(p)
    bb = rng.standard_normal(r)
    M = np.outer(a, bb)
    sigma1 = np.linalg.norm(a) * np.linalg.norm(bb)
    # variables: svec of the (2p)x(2p) symmetric block matrix Z
    d2 = 2 * p
    nvar = d2 * (d2 + 1) // 2
    from cosmo_tpu.problems import svec, smat, tri_dim

    def tri_index(i, j):
        i, j = min(i, j), max(i, j)
        return j * (j + 1) // 2 + i

    # objective: (tr U + tr V)/2 = sum of diagonal entries of Z / 2
    q = np.zeros(nvar)
    for i in range(d2):
        q[tri_index(i, i)] = 0.5
    # equality constraints: X[i, j] = M[i, j] for every entry (full
    # observation keeps the test deterministic); X lives at Z[i, p+j],
    # whose svec entry carries sqrt(2)
    rows = []
    rhs = []
    for i in range(p):
        for j in range(r):
            row = np.zeros(nvar)
            row[tri_index(i, p + j)] = 1.0 / np.sqrt(2.0)
            rows.append(row)
            rhs.append(M[i, j])
    A_eq = np.asarray(rows)
    b_eq = np.asarray(rhs)
    con_eq = ct.Constraint(A_eq, -b_eq, ct.ZeroSet(A_eq.shape[0]))
    con_psd = ct.Constraint(np.eye(nvar), np.zeros(nvar),
                            ct.PsdConeTriangle(nvar))
    model = ct.Model()
    model.assemble(np.zeros((nvar, nvar)), q, [con_eq, con_psd],
                   settings=ct.Settings(eps_abs=1e-7, eps_rel=1e-7,
                                        decompose=False))
    res = model.optimize()
    assert res.status == "Solved"
    Z = smat(res.x)
    X = Z[:p, p:] 
    np.testing.assert_allclose(X, M, atol=5e-4)
    assert abs(res.obj_val - sigma1) < 1e-3
