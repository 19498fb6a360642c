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
