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
