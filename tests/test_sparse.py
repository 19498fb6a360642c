"""Sparse (COO segment-sum) problem-matrix path tests."""
import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems
from cosmo_tpu.ops import linops


def test_coo_matvec_matches_dense():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((17, 9))
    A[rng.random((17, 9)) < 0.6] = 0.0
    coo = linops.coo_from_scipy(sp.csr_matrix(A), np.float64)
    x = rng.standard_normal(9)
    y = rng.standard_normal(17)
    assert np.allclose(linops.matvec(coo, jnp.asarray(x)), A @ x)
    assert np.allclose(linops.rmatvec(coo, jnp.asarray(y)), A.T @ y)
    assert np.allclose(linops.colmax_abs(coo), np.max(np.abs(A), axis=0))
    assert np.allclose(linops.rowmax_abs(coo), np.max(np.abs(A), axis=1))
    rho = rng.random(17) + 0.5
    assert np.allclose(
        linops.diag_AtRhoA(coo, jnp.asarray(rho)),
        np.diag(A.T @ (rho[:, None] * A)),
    )
    ew = rng.random(17) + 0.5
    dw = rng.random(9) + 0.5
    scaled = linops.scale_rows_cols(coo, jnp.asarray(ew), jnp.asarray(dw))
    assert np.allclose(
        linops.matvec(scaled, jnp.asarray(x)), (ew[:, None] * A * dw[None, :]) @ x
    )


def test_sparse_dense_solve_parity_qp():
    """Same QP through the dense-Cholesky and sparse-CG paths."""
    rng = np.random.default_rng(1)
    n, m = 12, 20
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    sets = [ct.Nonnegatives(m)]

    m0 = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()

    m1 = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7))
    m1.set(sp.csr_matrix(P), q, sp.csr_matrix(A), b, sets)
    r1 = m1.optimize()

    assert r0.status == "Solved" and r1.status == "Solved"
    assert abs(r0.obj_val - r1.obj_val) < 1e-4
    assert np.allclose(r0.x, r1.x, atol=1e-4)


def test_sparse_decomposed_sdp():
    """Sparse maxcut end-to-end through decomposition + CG KKT."""
    P, q, A, b, sets, L = problems.maxcut(n_nodes=30, density=0.1, seed=4, sparse=True)
    m1 = ct.Model(ct.Settings(decompose=True, eps_abs=1e-5, eps_rel=1e-5))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed
    assert r1.status == "Solved"

    Pd, qd, Ad, bd, setsd = problems._dual_form_sdp(L, np.float64, sparse=False)
    m0 = ct.Model(ct.Settings(decompose=True, eps_abs=1e-5, eps_rel=1e-5))
    m0.set(Pd, qd, Ad, bd, setsd)
    r0 = m0.optimize()
    assert abs(r1.obj_val - r0.obj_val) / max(1.0, abs(r0.obj_val)) < 1e-3
