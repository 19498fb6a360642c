"""KKT-system solvers for the ADMM x-update.

The reference factors the quasi-definite matrix
``K = [P + sigma I, A'; A, -diag(1/rho)]`` with a sparse LDL^T (QDLDL,
reference: src/linear_solver/kktsolver.jl:285-320) or runs CG/MINRES on the
reduced system (kktsolver_indirect.jl:36-88).  On TPU we solve the
*reduced* SPD system

    M x = r1 + A' (rho .* r2),     M = P + sigma I + A' diag(rho) A
    nu  = rho .* (A x - r2)

which has the identical solution, by either

* a cached dense Cholesky factor of M (refactored on rho updates inside the
  jitted loop via ``lax.cond``) — MXU-friendly: the per-iteration solve is
  two triangular solves; or
* matrix-free (preconditioned) CG with the reference's decreasing tolerance
  schedule tol = c / iter^e (kktsolver_indirect.jl:168-170) — no factor, so
  rho updates are free; this is the path that shards over a device mesh
  (matvec = local SpMM + psum).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .linops import diag_AtRhoA, diag_part, matvec, rmatvec


class DenseKKTState(NamedTuple):
    L: jnp.ndarray  # [n, n] lower Cholesky factor of M


def dense_factor(P, A, sigma, rho_vec) -> DenseKKTState:
    n = P.shape[0]
    M = P + sigma * jnp.eye(n, dtype=P.dtype) + A.T @ (rho_vec[:, None] * A)
    return DenseKKTState(L=jnp.linalg.cholesky(M))


def dense_solve(state: DenseKKTState, A, rho_vec, r1, r2):
    """Solve the KKT system via the cached factor. Returns (x_tilde, nu)."""
    t = r1 + A.T @ (rho_vec * r2)
    y = jax.scipy.linalg.solve_triangular(state.L, t, lower=True)
    x = jax.scipy.linalg.solve_triangular(state.L.T, y, lower=False)
    nu = rho_vec * (A @ x - r2)
    return x, nu


# ----------------------------------------------------------------------
# Matrix-free CG on the reduced system
# ----------------------------------------------------------------------

def _reduced_matvec(P, A, sigma, rho_vec, v):
    return matvec(P, v) + sigma * v + rmatvec(A, rho_vec * matvec(A, v))


def cg_solve(P, A, sigma, rho_vec, r1, r2, x0, tol, max_iter: int):
    """Preconditioned CG on M x = r1 + A'(rho r2), warm-started at x0.

    Jacobi preconditioner diag(M); fixed-shape lax.while_loop with early
    exit on the residual norm. Returns (x_tilde, nu, cg_iters).
    """
    t = r1 + rmatvec(A, rho_vec * r2)
    dinv = 1.0 / (diag_part(P) + sigma + diag_AtRhoA(A, rho_vec))

    def mv(v):
        return _reduced_matvec(P, A, sigma, rho_vec, v)

    r = t - mv(x0)
    z = dinv * r
    p = r * 0.0 + z
    rz = jnp.dot(r, z)
    # absolute tolerance relative to ||t||, as in IterativeSolvers' reltol
    target = tol * jnp.maximum(jnp.linalg.norm(t), 1e-30)

    def cond(st):
        k, x, r, p, rz = st
        return (jnp.linalg.norm(r) > target) & (k < max_iter)

    def body(st):
        k, x, r, p, rz = st
        Ap = mv(p)
        alpha = rz / jnp.dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return k + 1, x, r, p, rz_new

    k, x, _, _, _ = lax.while_loop(cond, body, (0, x0, r, p, rz))
    nu = rho_vec * (matvec(A, x) - r2)
    return x, nu, k


def cg_tolerance(admm_iter, res_min, dyn):
    """Adaptive decreasing tolerance: the reference schedule c/iter^e
    (kktsolver_indirect.jl:168-170) additionally tightened to a tenth of the
    current ADMM residual and floored at a tenth of the target tolerance —
    inexact solves then track the outer iteration instead of stalling it.
    """
    it = jnp.maximum(admm_iter, 1).astype(dyn.kkt_cg_tol_constant.dtype)
    sched = dyn.kkt_cg_tol_constant / (it ** dyn.kkt_cg_tol_exponent)
    floor = jnp.maximum(0.1 * jnp.minimum(dyn.eps_abs, dyn.eps_rel), 1e-10)
    return jnp.maximum(jnp.minimum(sched, 0.1 * res_min), floor)
