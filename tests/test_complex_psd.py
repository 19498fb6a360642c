"""Complex Hermitian PSD cone tests (real 2r x 2r embedding).

Reference behavior: src/convexset.jl:344-360, :446-490 (packed storage:
svec of real parts followed by sqrt(2)-scaled strict-upper imaginary parts).
"""
import numpy as np

import cosmo_tpu as ct


def pack_hermitian(H: np.ndarray) -> np.ndarray:
    r = H.shape[0]
    out = []
    for j in range(r):
        for i in range(j + 1):
            out.append(H[i, j].real * (1.0 if i == j else np.sqrt(2.0)))
    for j in range(r):
        for i in range(j):
            out.append(H[i, j].imag * np.sqrt(2.0))
    return np.array(out)


def _proj_ref(H):
    w, V = np.linalg.eigh(H)
    return (V * np.maximum(w, 0.0)) @ V.conj().T


def test_hermitian_projection_through_solver():
    rng = np.random.default_rng(0)
    r = 5
    dim = r * r
    G = rng.standard_normal((r, r)) + 1j * rng.standard_normal((r, r))
    H = (G + G.conj().T) / 2
    v = pack_hermitian(H)
    # min 1/2 ||x - v||^2  s.t.  x in HermPSD  ->  x* = pack(proj(H))
    m = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8, decompose=False))
    m.set(np.eye(dim), -v, -np.eye(dim), np.zeros(dim),
          [ct.PsdConeTriangleComplex(dim)])
    res = m.optimize()
    assert res.status == "Solved"
    assert np.abs(res.x - pack_hermitian(_proj_ref(H))).max() < 1e-6


def test_hermitian_1x1_reduces_to_nonneg():
    m = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    # min 1/2 (x + 2)^2 s.t. x >= 0 -> x = 0
    m.set(np.eye(1), np.array([2.0]), -np.eye(1), np.zeros(1),
          [ct.PsdConeTriangleComplex(1)])
    res = m.optimize()
    assert res.status == "Solved"
    assert abs(res.x[0]) < 1e-6


def test_hermitian_mixed_with_real_cones():
    rng = np.random.default_rng(1)
    r = 3
    dim = r * r
    G = rng.standard_normal((r, r)) + 1j * rng.standard_normal((r, r))
    H = (G + G.conj().T) / 2
    v = pack_hermitian(H)
    n = dim
    # same projection problem plus a redundant nonnegativity on the diagonal
    diag_rows = [j * (j + 1) // 2 + j for j in range(r)]
    A2 = np.zeros((r, n))
    for k, d in enumerate(diag_rows):
        A2[k, d] = -1.0  # s = b - A x = x_diag in Nonnegatives
    A = np.vstack([-np.eye(dim), A2])
    b = np.zeros(dim + r)
    sets = [ct.PsdConeTriangleComplex(dim), ct.Nonnegatives(r)]
    m = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m.set(np.eye(n), -v, A, b, sets)
    res = m.optimize()
    assert res.status == "Solved"
    assert np.abs(res.x - pack_hermitian(_proj_ref(H))).max() < 1e-5
