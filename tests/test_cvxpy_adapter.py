"""CVXPY adapter (the MOI-wrapper equivalent, reference:
MOI_wrapper.jl:135-234, :520-595).

The data-path (`solve_conic_data`) is tested directly against hand-built
CVXPY-canonical conic data; the full `prob.solve(solver=CosmoTpuSolver())`
round trip runs whenever cvxpy is installed (skipped otherwise — it is not
in this image).
"""
import types

import numpy as np
import pytest
import scipy.sparse as sp

from cosmo_tpu import Settings
from cosmo_tpu.cvxpy_solver import solve_conic_data, _cone_dict_from_dims
from cosmo_tpu.problems import svec


def _dims(**kw):
    d = types.SimpleNamespace(zero=0, nonneg=0, soc=[], psd=[], exp=0, p3d=[])
    for k, v in kw.items():
        setattr(d, k, v)
    return d


def test_solve_conic_data_lp():
    # min c'x  s.t. x >= 1 elementwise   (b - Ax in nonneg, A = -I, b = -1)
    c = np.array([1.0, 2.0])
    A = -sp.identity(2, format="csc")
    b = -np.ones(2)
    out = solve_conic_data(
        dict(A=A, b=b, c=c, dims=_dims(nonneg=2)),
        settings=Settings(eps_abs=1e-8, eps_rel=1e-8),
    )
    assert out["info"]["status_val"] == 1
    np.testing.assert_allclose(out["x"], [1.0, 1.0], atol=1e-5)
    assert abs(out["info"]["pobj"] - 3.0) < 1e-5


def test_solve_conic_data_socp():
    # min t  s.t. ||x||_2 <= t, x = [3, 4]  -> t* = 5
    # vars z = (t, x1, x2); rows: 2 zero rows fix x, then an SOC block
    A = sp.csc_matrix(np.vstack([
        np.array([[0.0, 1, 0], [0, 0, 1]]),     # zero rows: x = [3,4]
        -np.eye(3),                               # SOC: s = (t, x)
    ]))
    b = np.array([3.0, 4.0, 0.0, 0.0, 0.0])
    c = np.array([1.0, 0.0, 0.0])
    out = solve_conic_data(
        dict(A=A, b=b, c=c, dims=_dims(zero=2, soc=[3])),
        settings=Settings(eps_abs=1e-8, eps_rel=1e-8),
    )
    assert out["info"]["status"] == "Solved"
    assert abs(out["info"]["pobj"] - 5.0) < 1e-4


def test_solve_conic_data_sdp_min_eig():
    rng = np.random.default_rng(0)
    C = rng.standard_normal((4, 4))
    C = (C + C.T) / 2
    d = 10
    Atr = svec(np.eye(4)).reshape(1, -1)
    A = sp.csc_matrix(np.vstack([Atr, -np.eye(d)]))
    b = np.concatenate([[1.0], np.zeros(d)])
    out = solve_conic_data(
        dict(A=A, b=b, c=svec(C), dims=_dims(zero=1, psd=[4])),
        settings=Settings(eps_abs=1e-7, eps_rel=1e-7),
    )
    lam = np.linalg.eigvalsh(C)[0]
    assert out["info"]["status"] == "Solved"
    assert abs(out["info"]["pobj"] - lam) < 1e-4


def test_solve_conic_data_infeasible_maps_to_scs_code():
    # x >= 1 and x <= 0 -> primal infeasible -> SCS code -2
    A = sp.csc_matrix(np.array([[-1.0], [1.0]]))
    b = np.array([-1.0, 0.0])
    out = solve_conic_data(dict(A=A, b=b, c=np.ones(1), dims=_dims(nonneg=2)))
    assert out["info"]["status"] == "Primal_infeasible"
    assert out["info"]["status_val"] == -2


def test_cone_dict_from_dims():
    cone = _cone_dict_from_dims(
        _dims(zero=2, nonneg=3, soc=[3, 4], psd=[5], exp=2, p3d=[0.3])
    )
    assert cone == {"f": 2, "l": 3, "q": [3, 4], "s": [15], "ep": 2, "p": [0.3]}


def test_solver_class_surface_with_mocked_cvxpy():
    """Drive the ConicSolver subclass itself — name/import_solver/
    solve_via_data incl. solver_opts plumbing and the warm-start
    solver_cache protocol — against a mocked ``scs_conif`` module, so the
    adapter's cvxpy-facing surface executes even without cvxpy in the image
    (the real round trip below still runs whenever cvxpy exists).
    ``solve_via_data`` never calls into the base class, so a bare stub is a
    faithful harness for everything on our side of the boundary."""
    import sys

    from cosmo_tpu import cvxpy_solver as cs

    created = []
    mods = {}
    for name in ("cvxpy", "cvxpy.reductions", "cvxpy.reductions.solvers",
                 "cvxpy.reductions.solvers.conic_solvers",
                 "cvxpy.reductions.solvers.conic_solvers.scs_conif"):
        if name not in sys.modules:
            mods[name] = types.ModuleType(name)
            created.append(name)
    if created:  # only mock when cvxpy is genuinely absent
        class _StubSCS:  # the base class surface solve_via_data relies on
            pass

        mods["cvxpy.reductions.solvers.conic_solvers.scs_conif"].SCS = _StubSCS
        sys.modules.update(mods)
    old_cls = cs._CosmoTpuSolverFactory._cls
    cs._CosmoTpuSolverFactory._cls = None
    try:
        solver = cs.CosmoTpuSolver()
        assert solver.name() == "COSMO_TPU"
        solver.import_solver()

        c = np.array([1.0, 2.0])
        A = -sp.identity(2, format="csc")
        b = -np.ones(2)
        data = dict(A=A, b=b, c=c, dims=_dims(nonneg=2))
        cache = {}
        sol = solver.solve_via_data(
            data, warm_start=False, verbose=False,
            solver_opts={"eps_abs": 1e-8, "eps_rel": 1e-8, "max_iter": 2000},
            solver_cache=cache,
        )
        assert sol["info"]["status_val"] == 1
        np.testing.assert_allclose(sol["x"], [1.0, 1.0], atol=1e-5)
        assert "COSMO_TPU" in cache  # warm-start protocol populated
        # second solve consumes the cached warm start
        sol2 = solver.solve_via_data(
            data, warm_start=True, verbose=False,
            solver_opts={"eps_abs": 1e-8, "eps_rel": 1e-8},
            solver_cache=cache,
        )
        assert sol2["info"]["status_val"] == 1
        assert sol2["info"]["iter"] <= sol["info"]["iter"]
        # unknown keys are ignored, cosmo_settings object wins
        sol3 = solver.solve_via_data(
            data, warm_start=False, verbose=True,
            solver_opts={"cosmo_settings":
                         Settings(eps_abs=1e-6, eps_rel=1e-6, verbose=False)},
            solver_cache=None,
        )
        assert sol3["info"]["status_val"] == 1
    finally:
        cs._CosmoTpuSolverFactory._cls = old_cls
        for name in created:
            sys.modules.pop(name, None)


def test_cvxpy_roundtrip():
    cp = pytest.importorskip("cvxpy")
    from cosmo_tpu.cvxpy_solver import CosmoTpuSolver

    x = cp.Variable(2)
    prob = cp.Problem(
        cp.Minimize(cp.sum_squares(x) + x[0]),
        [x >= 1, cp.norm(x, 2) <= 5],
    )
    prob.solve(solver=CosmoTpuSolver())
    assert prob.status in ("optimal", "optimal_inaccurate")
    assert np.all(np.asarray(x.value) >= 1 - 1e-5)
