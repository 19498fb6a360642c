"""End-to-end conic problems with known solutions
(reference: test/UnitTests/{closestcorr,exp_cone,pow_cone}.jl and the docs
examples)."""
import numpy as np
import pytest

import cosmo_tpu as cosmo

RNG = np.random.default_rng(12345)


def test_socp():
    """min x3  s.t.  ||(x1,x2)||_2 <= x3, x1 + x2 = 2  ->  x = (1,1,sqrt(2))."""
    n = 3
    P = np.zeros((n, n))
    q = np.array([0.0, 0.0, 1.0])
    # x1 + x2 = 2  ->  A x + b in {0}
    c_eq = cosmo.Constraint([[1.0, 1.0, 0.0]], [-2.0], cosmo.ZeroSet)
    # (x3, x1, x2) in SOC
    A_soc = np.array([[0.0, 0, 1], [1, 0, 0], [0, 1, 0]])
    c_soc = cosmo.Constraint(A_soc, np.zeros(3), cosmo.SecondOrderCone)
    model = cosmo.Model()
    model.assemble(P, q, [c_eq, c_soc])
    res = model.optimize()
    assert res.status == "Solved"
    np.testing.assert_allclose(res.x, [1.0, 1.0, np.sqrt(2.0)], atol=1e-3)
    assert abs(res.obj_val - np.sqrt(2.0)) < 1e-3


def _svec(X):
    r = X.shape[0]
    out = []
    for j in range(r):
        for i in range(j + 1):
            out.append(X[i, j] * (1.0 if i == j else np.sqrt(2.0)))
    return np.array(out)


def _svec_mat(r):
    """Matrix S with svec(X) = S @ vec_sym(X) identities: build the linear map
    from x (the svec vector, n = r(r+1)/2) to itself — we only need index
    helpers here, so return the list of (i, j) per svec entry."""
    idx = []
    for j in range(r):
        for i in range(j + 1):
            idx.append((i, j))
    return idx


def test_min_eigenvalue_sdp():
    """min tr(CX) s.t. tr(X) = 1, X psd  ->  obj = lambda_min(C)
    (reference analog: test/UnitTests/least_eigenvalue.jl)."""
    r = 5
    nsv = r * (r + 1) // 2
    Cs = RNG.normal(size=(r, r))
    Cm = 0.5 * (Cs + Cs.T)
    lam_min = np.linalg.eigvalsh(Cm).min()

    # variable x = svec(X)
    q = _svec(Cm)  # tr(CX) = <svec(C), svec(X)>
    P = np.zeros((nsv, nsv))
    # tr(X) = 1: sum of diagonal entries of X
    tr_row = np.zeros(nsv)
    for k, (i, j) in enumerate(_svec_mat(r)):
        if i == j:
            tr_row[k] = 1.0
    c_eq = cosmo.Constraint(tr_row.reshape(1, -1), [-1.0], cosmo.ZeroSet)
    c_psd = cosmo.Constraint(np.eye(nsv), np.zeros(nsv), cosmo.PsdConeTriangle(nsv))
    model = cosmo.Model()
    model.assemble(P, q, [c_eq, c_psd], settings=cosmo.Settings(decompose=False))
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(res.obj_val - lam_min) < 1e-3


def test_closest_correlation_matrix():
    """min ||X - C||_F^2 s.t. diag(X) = 1, X psd
    (reference: test/UnitTests/closestcorr.jl)."""
    r = 8
    nsv = r * (r + 1) // 2
    Cs = RNG.normal(size=(r, r))
    Cm = 0.5 * (Cs + Cs.T)

    # x = svec(X); ||X - C||_F^2 = ||svec(X) - svec(C)||^2  (svec is isometric)
    P = 2.0 * np.eye(nsv)
    q = -2.0 * _svec(Cm)
    diag_rows = np.zeros((r, nsv))
    for k, (i, j) in enumerate(_svec_mat(r)):
        if i == j:
            diag_rows[i, k] = 1.0
    c_eq = cosmo.Constraint(diag_rows, -np.ones(r), cosmo.ZeroSet)
    c_psd = cosmo.Constraint(np.eye(nsv), np.zeros(nsv), cosmo.PsdConeTriangle(nsv))
    model = cosmo.Model()
    model.assemble(P, q, [c_eq, c_psd], settings=cosmo.Settings(decompose=False))
    res = model.optimize()
    assert res.status == "Solved"
    X = np.zeros((r, r))
    for k, (i, j) in enumerate(_svec_mat(r)):
        X[i, j] = res.x[k] * (1.0 if i == j else 1 / np.sqrt(2))
        X[j, i] = X[i, j]
    np.testing.assert_allclose(np.diag(X), np.ones(r), atol=1e-4)
    assert np.linalg.eigvalsh(X).min() > -1e-5
    # compare against Higham's alternating projections with Dykstra correction
    Y = Cm.copy()
    S = np.zeros_like(Y)
    for _ in range(2000):
        R = Y - S
        w, V = np.linalg.eigh(R)
        Xp = (V * np.maximum(w, 0)) @ V.T
        S = Xp - R
        Y = Xp.copy()
        np.fill_diagonal(Y, 1.0)
    assert np.linalg.norm(X - Y, np.inf) < 5e-3


def test_exp_cone():
    """max x s.t. (x, 1, e^5) in K_exp  ->  x* = 5
    (reference: test/UnitTests/exp_cone.jl style)."""
    # variables: x in R; constraint rows: (x, 1, e^5) in K_exp
    P = np.zeros((1, 1))
    q = np.array([-1.0])  # maximize x
    A = np.array([[1.0], [0.0], [0.0]])
    b = np.array([0.0, 1.0, np.exp(5.0)])
    con = cosmo.Constraint(A, b, cosmo.ExponentialCone())
    model = cosmo.Model()
    # b contains e^5, so the relative tolerance needs tightening for 1e-3 in x
    model.assemble(P, q, [con], settings=cosmo.Settings(eps_abs=1e-6, eps_rel=1e-6))
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(res.x[0] - 5.0) < 1e-3


def test_dual_exp_cone():
    """max y s.t. (-e, y, z) in K_exp^*, z = 1.

    (u,v,w) in Kexp* with u<0: -u e^{v/u} <= e w  ->  with u=-e, w=1:
    e^{1 - v/e} <= 1  ->  v >= e... wait: -u e^{v/u} = e * e^{-v/e} <= e*1
    -> e^{-v/e} <= 1 -> v >= 0. So max -(-y)... simpler: min -y gives
    unbounded; instead check feasibility: minimize y s.t. cone -> y* = 0."""
    P = np.zeros((1, 1))
    q = np.array([1.0])  # minimize y
    A = np.array([[0.0], [1.0], [0.0]])
    b = np.array([-np.e, 0.0, 1.0])
    con = cosmo.Constraint(A, b, cosmo.DualExponentialCone())
    model = cosmo.Model()
    model.assemble(P, q, [con])
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(res.x[0] - 0.0) < 1e-3


@pytest.mark.parametrize("alpha", [0.3, 0.6])
def test_pow_cone(alpha):
    """max z s.t. (2, 3, z) in K_pow(alpha)  ->  z* = 2^a 3^(1-a)."""
    P = np.zeros((1, 1))
    q = np.array([-1.0])
    A = np.array([[0.0], [0.0], [1.0]])
    b = np.array([2.0, 3.0, 0.0])
    con = cosmo.Constraint(A, b, cosmo.PowerCone(alpha))
    model = cosmo.Model()
    model.assemble(P, q, [con])
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(res.x[0] - 2.0**alpha * 3.0 ** (1 - alpha)) < 1e-3


def test_mixed_cones():
    """A problem touching Zero + Nonneg + Box + SOC + PSD at once."""
    n = 4
    Ps = RNG.normal(size=(n, n))
    P = Ps @ Ps.T + 0.1 * np.eye(n)
    q = RNG.normal(size=n)
    cons = [
        cosmo.Constraint(np.ones((1, n)), [-1.0], cosmo.ZeroSet),       # sum x = 1
        cosmo.Constraint(np.eye(n), np.ones(n), cosmo.Nonnegatives),    # x >= -1
        cosmo.Constraint(np.eye(n), np.zeros(n), cosmo.Box(-2 * np.ones(n), 2 * np.ones(n))),
        cosmo.Constraint(
            np.vstack([np.zeros((1, n)), np.eye(n)]),
            np.concatenate([[10.0], np.zeros(n)]),
            cosmo.SecondOrderCone,
        ),  # ||x|| <= 10
    ]
    model = cosmo.Model()
    model.assemble(P, q, cons)
    res = model.optimize()
    assert res.status == "Solved"
    assert abs(np.sum(res.x) - 1.0) < 1e-4
    assert np.all(res.x >= -1 - 1e-4)
