"""Batched Jacobi eigensolver tests (ops/eigh.py)."""
import numpy as np

import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems
from cosmo_tpu.ops import eigh as eigh_mod


def _sym_stack(B, k, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((B, k, k))
    return jnp.asarray((G + G.swapaxes(1, 2)) / 2)


def test_jacobi_eigh_reconstructs():
    for B, k in [(32, 8), (16, 16), (4, 32)]:
        X = _sym_stack(B, k, seed=k)
        w, V = eigh_mod.jacobi_eigh(X, sweeps=10)
        R = jnp.einsum("bik,bk,bjk->bij", V, w, V)
        assert float(jnp.abs(R - X).max()) < 1e-10
        orth = jnp.einsum("bki,bkj->bij", V, V) - jnp.eye(k)
        assert float(jnp.abs(orth).max()) < 1e-10
        w_ref = np.linalg.eigvalsh(np.asarray(X))
        assert np.abs(np.sort(np.asarray(w), axis=1) - w_ref).max() < 1e-10


def test_jacobi_psd_projection_matches_xla():
    X = _sym_stack(24, 16, seed=3)
    Y1 = eigh_mod.psd_project_jacobi(X, sweeps=10)
    w, V = jnp.linalg.eigh(X)
    Y2 = jnp.einsum("bik,bk,bjk->bij", V, jnp.maximum(w, 0.0), V)
    assert float(jnp.abs(Y1 - Y2).max()) < 1e-9


def test_solver_with_jacobi_backend():
    """Full SDP solve with the Jacobi projection backend."""
    P, q, A, b, sets, _ = problems.closest_correlation(n=10, seed=0)
    m0 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, eigh_backend="xla"))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    m1 = ct.Model(
        ct.Settings(eps_abs=1e-6, eps_rel=1e-6, eigh_backend="jacobi")
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert r0.status == "Solved" and r1.status == "Solved"
    assert abs(r0.obj_val - r1.obj_val) < 1e-4
    assert np.allclose(r0.x, r1.x, atol=1e-4)
