"""End-to-end QP / LP tests against the reference's known solutions
(reference: examples/qp.jl, examples/lp.jl, test/UnitTests/simple.jl)."""
import numpy as np
import pytest

import cosmo_tpu as cosmo


def _qp_data():
    q = np.array([1.0, 1.0])
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    return P, q, A, l, u


@pytest.mark.parametrize("accel", [None, "anderson"])
def test_qp_nonnegatives(accel):
    P, q, A, l, u = _qp_data()
    Aa = np.vstack([-A, A])
    ba = np.concatenate([u, -l])
    con = cosmo.Constraint(Aa, ba, cosmo.Nonnegatives)
    model = cosmo.Model()
    model.assemble(P, q, [con], settings=cosmo.Settings(accelerator=accel))
    res = model.optimize()
    assert res.status == "Solved"
    assert np.linalg.norm(res.x - [0.3, 0.7], np.inf) < 1e-3
    assert abs(res.obj_val - 1.88) < 1e-3


def test_qp_box():
    P, q, A, l, u = _qp_data()
    con = cosmo.Constraint(A, np.zeros(3), cosmo.Box(l, u))
    model = cosmo.Model()
    model.assemble(P, q, [con])
    res = model.optimize()
    assert res.status == "Solved"
    assert np.linalg.norm(res.x - [0.3, 0.7], np.inf) < 1e-3
    assert abs(res.obj_val - 1.88) < 1e-3


def test_lp():
    n = 4
    c = np.array([1.0, 2.0, 3.0, 4.0])
    A = np.eye(n)
    b = np.full(n, 10.0)
    c1 = cosmo.Constraint(-A, b, cosmo.Nonnegatives)           # Ax <= b
    c2 = cosmo.Constraint(np.eye(n), -np.ones(n), cosmo.Nonnegatives)  # x >= 1
    c3 = cosmo.Constraint([[1.0]], [-5.0], cosmo.Nonnegatives, n, [1])  # x2 >= 5
    c4 = cosmo.Constraint([[1.0, 0.0, 1.0, 0.0]], [-4.0], cosmo.Nonnegatives)
    model = cosmo.Model()
    model.assemble(
        np.zeros((n, n)), c, [c1, c2, c3, c4],
        settings=cosmo.Settings(eps_abs=1e-4, eps_rel=1e-5),
    )
    res = model.optimize()
    assert res.status == "Solved"
    assert np.linalg.norm(res.x - [3, 5, 1, 1], np.inf) < 1e-2
    assert abs(res.obj_val - 20.0) < 1e-2


def test_qp_warm_start():
    P, q, A, l, u = _qp_data()
    con = cosmo.Constraint(A, np.zeros(3), cosmo.Box(l, u))
    model = cosmo.Model()
    model.assemble(P, q, [con])
    res1 = model.optimize()
    # warm start at the solution: should converge in very few iterations
    model.warm_start(x0=res1.x, y0=res1.y)
    res2 = model.optimize()
    assert res2.status == "Solved"
    assert res2.iter <= max(res1.iter // 2, 2)


def test_update_b_resolve():
    P, q, A, l, u = _qp_data()
    con = cosmo.Constraint(A, np.zeros(3), cosmo.Box(l, u))
    model = cosmo.Model()
    model.assemble(P, q, [con])
    res1 = model.optimize()
    assert res1.status == "Solved"
    # loosen the box: b enters through the Box bounds here, so update q only
    model.update(q=np.array([2.0, 2.0]))
    res2 = model.optimize()
    assert res2.status == "Solved"
    assert res2.obj_val > res1.obj_val  # larger linear cost


def test_kkt_cg_matches_dense():
    P, q, A, l, u = _qp_data()
    con = cosmo.Constraint(A, np.zeros(3), cosmo.Box(l, u))
    model = cosmo.Model()
    model.assemble(P, q, [con], settings=cosmo.Settings(kkt_solver="cg"))
    res = model.optimize()
    assert res.status == "Solved"
    assert np.linalg.norm(res.x - [0.3, 0.7], np.inf) < 1e-3


def test_float32():
    P, q, A, l, u = _qp_data()
    con = cosmo.Constraint(A, np.zeros(3), cosmo.Box(l, u))
    model = cosmo.Model()
    model.assemble(
        P, q, [con],
        settings=cosmo.Settings(dtype=np.float32, eps_abs=1e-4, eps_rel=1e-4),
    )
    res = model.optimize()
    assert res.status == "Solved"
    assert np.linalg.norm(res.x - [0.3, 0.7], np.inf) < 1e-2


def test_functional_solve_entry():
    """One-call SCS-style entry (cosmo_tpu.solve)."""
    import numpy as np

    import cosmo_tpu as ct

    # min 1/2 x'Px + q'x s.t. x >= 0 (A = -I, b = 0, s = x in Nonneg)
    P = np.array([[2.0, 0.0], [0.0, 2.0]])
    q = np.array([-2.0, 1.0])
    A = -np.eye(2)
    b = np.zeros(2)
    res = ct.solve(P, q, A, b, {"l": 2}, eps_abs=1e-8, eps_rel=1e-8)
    assert res.status == "Solved"
    assert np.allclose(res.x, [1.0, 0.0], atol=1e-6)

    # P=None LP path
    res2 = ct.solve(None, np.array([1.0, 1.0]), -np.eye(2), -np.ones(2) * -1.0,
                    {"l": 2}, eps_abs=1e-7, eps_rel=1e-7)
    assert res2.status == "Solved"
