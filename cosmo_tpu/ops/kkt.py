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


def minres_solve(P, A, sigma, rho_vec, r1, r2, x0, tol, max_iter: int):
    """MINRES on the reduced system M x = r1 + A'(rho r2), warm-started at
    x0 (reference: IndirectKKTSolver / MINRESIndirectKKTSolver,
    kktsolver_indirect.jl:123-189). Jittable Lanczos + Givens recurrence
    with a fixed-shape while_loop. Returns (x_tilde, nu, iters)."""
    t = r1 + rmatvec(A, rho_vec * r2)

    def mv(v):
        return _reduced_matvec(P, A, sigma, rho_vec, v)

    r0 = t - mv(x0)
    beta1 = jnp.linalg.norm(r0)
    safe_beta1 = jnp.maximum(beta1, 1e-30)
    target = tol * jnp.maximum(jnp.linalg.norm(t), 1e-30)

    # state: (k, x, v_prev, v, beta, eta, gamma in two stages, w_prev, w_pprev, resid)
    v = r0 / safe_beta1
    vp = jnp.zeros_like(v)
    w = jnp.zeros_like(v)
    wp = jnp.zeros_like(v)
    state = (
        jnp.asarray(0, jnp.int32), x0, vp, v, safe_beta1,
        safe_beta1,                      # eta (rhs of the rotated system)
        jnp.ones((), t.dtype), jnp.zeros((), t.dtype),   # c_old, s_old
        jnp.ones((), t.dtype), jnp.zeros((), t.dtype),   # c, s
        wp, w, beta1,
    )

    def cond(st):
        k, x, *_, resid = st
        return (resid > target) & (k < max_iter)

    def body(st):
        (k, x, vp, v, beta, eta, c_old, s_old, c, s, wp, w, resid) = st
        pvec = mv(v) - beta * vp
        alpha = jnp.dot(v, pvec)
        pvec = pvec - alpha * v
        beta_new = jnp.linalg.norm(pvec)
        v_new = pvec / jnp.maximum(beta_new, 1e-30)

        # apply previous rotations to the new column of T
        delta = c * alpha - c_old * s * beta
        gamma1 = s * alpha + c_old * c * beta
        epsilon = s_old * beta
        # new rotation to zero beta_new
        gamma2 = jnp.sqrt(delta * delta + beta_new * beta_new)
        gamma2 = jnp.maximum(gamma2, 1e-30)
        c_new = delta / gamma2
        s_new = beta_new / gamma2

        w_new = (v - gamma1 * w - epsilon * wp) / gamma2
        x = x + c_new * eta * w_new
        eta_new = -s_new * eta

        return (
            k + 1, x, v, v_new, beta_new, eta_new,
            c, s, c_new, s_new, w, w_new, jnp.abs(eta_new),
        )

    st = lax.while_loop(cond, body, state)
    k, x = st[0], st[1]
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
