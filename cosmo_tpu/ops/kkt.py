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

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import dataclasses

from . import df32
from .linops import AtRhoA, diag_AtRhoA, diag_part, matvec, rmatvec
from ..utils.pytrees import register_pytree_dataclass, static_field


class DenseKKTState(NamedTuple):
    L: jnp.ndarray  # [n, n] lower Cholesky factor of M
    Minv: Any       # [n, n] explicit M^-1 = L^-T L^-1 (f32 only), or ()


def dense_factor(P, A, sigma, rho_vec, use_inverse: bool = False) -> DenseKKTState:
    n = P.shape[0]
    M = P + sigma * jnp.eye(n, dtype=P.dtype) + AtRhoA(A, rho_vec)
    L = jnp.linalg.cholesky(M)
    if M.dtype != jnp.float32 or not use_inverse:
        # backward-stable triangular solves — the default, and always the
        # choice in f64 (the CPU/reference-parity mode): the explicit
        # inverse's kappa*eps forward error measurably shifts Anderson
        # trajectories (banded-40 dense SDP went 4k -> 7k iters in f64),
        # and f64 has no per-iteration-latency case.
        return DenseKKTState(L=L, Minv=())
    # f32 + plain ADMM (the fixed-iteration TPU throughput path):
    # apply-by-inverse — the per-iteration solve is ONE [n,n] matvec on the
    # MXU instead of two sequential triangular solves (measured 80 us ->
    # ~8 us at n=512; triangular solves serialize on the diagonal). The
    # inverse is formed from the Cholesky factor (L^-T L^-1, SPD-stable).
    # Callers must pass use_inverse=True ONLY when the Anderson accelerator
    # is off: the inverse apply's deterministic ~1e-5-relative error floor
    # destabilizes safeguarded AA the same way the Pallas Jacobi kernel's
    # floor does (conedata.resolve_eigh_backend) — measured: a 36-var
    # min-eig SDP with a rho_eq row pins at rp ~ 0.13 under AA+inverse
    # (safeguard toggles forever, never strikes) yet solves in 102 iters
    # with triangular solves and in 325 with inverse+plain-ADMM.
    eye = jnp.eye(n, dtype=P.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Minv = Linv.T @ Linv
    return DenseKKTState(L=L, Minv=0.5 * (Minv + Minv.T))


def _chol_solve(L, t):
    y = jax.scipy.linalg.solve_triangular(L, t, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def _kkt_apply(state: DenseKKTState, t):
    if isinstance(state.Minv, tuple):
        return _chol_solve(state.L, t)
    return state.Minv @ t


def dense_solve(state: DenseKKTState, P, A, sigma, rho_vec, r1, r2,
                refine_steps: int = 0):
    """Solve the KKT system via the cached factor. Returns (x_tilde, nu).

    ``refine_steps`` > 0 runs that many iterative-refinement corrections
    with the residual computed in compensated double-f32 arithmetic against
    the exact P/A/rho data (ops/df32.py): the forward error drops from
    kappa(M)*eps — a hard ~1e-3..1e-4 ADMM floor in f32 — to the f32
    representation floor.  In f64 the plain solve is already accurate
    (refine_steps=0, reference parity: QDLDL runs in f64).
    """
    if refine_steps <= 0:
        t = r1 + rmatvec(A, rho_vec * r2)
        x = _kkt_apply(state, t)
    else:
        t_pair = df32.kkt_rhs2(A, rho_vec, r1, r2)
        x_pair = df32.promote(_kkt_apply(state, t_pair[0]))
        for _ in range(refine_steps):
            r = df32.kkt_residual_pair(P, A, sigma, rho_vec, t_pair, x_pair)
            x_pair = df32.add(x_pair, df32.promote(_kkt_apply(state, r)))
        x = df32.to_f32(x_pair)
    nu = rho_vec * (matvec(A, x) - r2)
    return x, nu


# ----------------------------------------------------------------------
# Matrix-free CG on the reduced system
# ----------------------------------------------------------------------

def _reduced_matvec(P, A, sigma, rho_vec, v):
    return matvec(P, v) + sigma * v + rmatvec(A, rho_vec * matvec(A, v))


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class OverlapPrecond:
    """Structure metadata for the compact decomposition's overlap block.

    The reduced KKT matrix over the overlap variables (the +-1 consistency
    columns the compact transform introduces, chordal/transform.py) is

        M22 = diag(sigma + rho_child) + sum_p rho_p 1_Gp 1_Gp'

    — diagonal plus one rank-1 term per parent row p over the group Gp of
    overlap variables sharing it (each variable belongs to exactly one
    group), so M22 is block-diagonal with closed-form Sherman-Morrison
    inverses.  Preconditioning CG with [Jacobi on the original columns;
    exact M22^-1 on the overlap columns] targets the round-1 bottleneck of
    ~24 CG iterations per ADMM iteration on decomposed problems.
    """

    n0: int = static_field()        # number of original (non-overlap) columns
    n_groups: int = static_field()
    child_rows: Any = None          # int32 [K] decomposed row of each +1 entry
    group: Any = None               # int32 [K] densified parent-row group id
    group_parent_row: Any = None    # int32 [G] row of each group's parent


def make_overlap_precond(n0: int, child_rows, parent_rows) -> OverlapPrecond:
    """Build the metadata host-side from the transform's overlap row lists."""
    uniq, inverse = np.unique(np.asarray(parent_rows), return_inverse=True)
    return OverlapPrecond(
        n0=int(n0),
        n_groups=int(uniq.size),
        child_rows=np.asarray(child_rows, np.int32),
        group=np.asarray(inverse, np.int32),
        group_parent_row=np.asarray(uniq, np.int32),
    )


def _make_precond_apply(P, A, sigma, rho_vec, precond):
    """Return the preconditioner application closure z = Minv_hat r."""
    dinv = 1.0 / (diag_part(P) + sigma + diag_AtRhoA(A, rho_vec))
    if precond is None:
        return lambda r: dinv * r

    n0 = precond.n0
    G = precond.n_groups
    d2 = sigma + rho_vec[precond.child_rows]
    rho_p = rho_vec[precond.group_parent_row]
    sd = jax.ops.segment_sum(1.0 / d2, precond.group, num_segments=G)
    denom = 1.0 + rho_p * sd

    def apply(r):
        z1 = dinv[:n0] * r[:n0]
        w = r[n0:] / d2
        sw = jax.ops.segment_sum(w, precond.group, num_segments=G)
        coef = rho_p * sw / denom
        z2 = w - coef[precond.group] / d2
        return jnp.concatenate([z1, z2])

    return apply


def _cg_target(t, sched, res_min):
    """Absolute CG/MINRES residual target.

    Reference semantics (kktsolver_indirect.jl:70 — ``abstol =
    get_tolerance(S)/norm(y1)``): the absolute target *shrinks* as the rhs
    norm grows, because the x-error that matters to ADMM is ~||M^-1|| times
    the absolute KKT residual and rho_eq-weighted rows inflate ||t|| by 1e3.
    (Round 1 multiplied by ||t|| instead — that single sign-of-scaling flip
    stalled every adaptive-rho CG solve around 5e-5, in f64 too.)

    Additionally tightened to a tenth of the current ADMM residual so inexact
    solves track the outer iteration, and floored at the finite-precision
    attainable level ~eps*||t|| (with compensated restarts the true residual
    reaches a small multiple of it).
    """
    eps_m = jnp.asarray(jnp.finfo(t.dtype).eps, t.dtype)
    tnorm = jnp.linalg.norm(t)
    tgt = jnp.minimum(sched / jnp.maximum(tnorm, 1e-30), 0.1 * res_min)
    # 0.25*eps*||t||: slightly below the single-sweep stagnation level, so
    # the compensated restarts keep polishing the small-eigenspace error
    # instead of exiting on a floored fresh residual (measured: 1.0*eps
    # stalls the outer ADMM at ~1e-5; 0.25 solves to 1e-6 at ~2 CG
    # iterations per ADMM iteration)
    return jnp.maximum(tgt, 0.25 * eps_m * tnorm)


def cg_solve(P, A, sigma, rho_vec, r1, r2, x0, sched, res_min, max_iter: int,
             refine_steps: int = 0, precond: OverlapPrecond | None = None):
    """Preconditioned CG on M x = r1 + A'(rho r2), warm-started at x0.

    Jacobi preconditioner diag(M); fixed-shape lax.while_loop with early
    exit on the residual norm. Returns (x_tilde, nu, cg_iters).

    ``refine_steps`` > 0 adds that many compensated-residual restarts
    (ops/df32.py): finite-precision CG's *true* residual stagnates at
    ~kappa(M)*eps*||t|| however far the recursive residual drops; restarting
    from a double-f32 residual of the exact P/A/rho data resets the drift,
    so f32 solves reach targets the plain recurrence cannot.  All sweeps
    share one ``max_iter`` budget, and a restart whose fresh residual
    already meets the target costs no iterations.
    """
    if refine_steps > 0:
        t_pair = df32.kkt_rhs2(A, rho_vec, r1, r2)
        t = df32.to_f32(t_pair)
    else:
        t = r1 + rmatvec(A, rho_vec * r2)
    prec = _make_precond_apply(P, A, sigma, rho_vec, precond)

    def mv(v):
        return _reduced_matvec(P, A, sigma, rho_vec, v)

    target = _cg_target(t, sched, res_min)

    def sweep(x, r, k):
        z = prec(r)
        p = z
        rz = jnp.dot(r, z)

        def cond(st):
            k, x, r, p, rz = st
            return (jnp.linalg.norm(r) > target) & (k < max_iter)

        def body(st):
            k, x, r, p, rz = st
            Ap = mv(p)
            alpha = rz / jnp.dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = jnp.dot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return k + 1, x, r, p, rz_new

        k, x, r, _, _ = lax.while_loop(cond, body, (k, x, r, p, rz))
        return x, k

    if refine_steps > 0:
        # true iterative refinement with CG as the inner solver: the
        # accumulated solution lives in a double-f32 pair, so each restart
        # measures the residual of the *exact* accumulated x and the final
        # error is representation-level (benign to the outer ADMM) instead
        # of kappa-amplified
        x_pair = df32.promote(x0)
        k = 0
        zero = jnp.zeros_like(x0)
        for _ in range(refine_steps + 1):
            r = df32.kkt_residual_pair(P, A, sigma, rho_vec, t_pair, x_pair)
            d, k = sweep(zero, r, k)
            x_pair = df32.add(x_pair, df32.promote(d))
        x = df32.to_f32(x_pair)
    else:
        x, k = sweep(x0, t - mv(x0), 0)
    nu = rho_vec * (matvec(A, x) - r2)
    return x, nu, k


def minres_solve(P, A, sigma, rho_vec, r1, r2, x0, sched, res_min, max_iter: int,
                 refine_steps: int = 0):
    """MINRES on the reduced system M x = r1 + A'(rho r2), warm-started at
    x0 (reference: IndirectKKTSolver / MINRESIndirectKKTSolver,
    kktsolver_indirect.jl:123-189). Jittable Lanczos + Givens recurrence
    with a fixed-shape while_loop. Returns (x_tilde, nu, iters).

    Deliberately unpreconditioned: the reduced system is SPD, so
    preconditioned CG spans the same Krylov space with a cheaper recurrence
    and carries the overlap/Jacobi preconditioner (:func:`cg_solve`) — the
    decomposed path auto-selects the block-diagonal direct solver or CG,
    never MINRES. MINRES exists for reference parity (user-selectable
    ``kkt_solver="minres"``); preconditioning it would require the
    Minv-inner-product Lanczos variant for no workload we route here.

    ``refine_steps`` > 0: compensated-residual restarts, as in
    :func:`cg_solve`."""
    if refine_steps > 0:
        t_pair = df32.kkt_rhs2(A, rho_vec, r1, r2)
        t = df32.to_f32(t_pair)
    else:
        t = r1 + rmatvec(A, rho_vec * r2)

    def mv(v):
        return _reduced_matvec(P, A, sigma, rho_vec, v)

    target = _cg_target(t, sched, res_min)

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

    def sweep(x, r0, k):
        beta1 = jnp.linalg.norm(r0)
        safe_beta1 = jnp.maximum(beta1, 1e-30)
        v = r0 / safe_beta1
        vp = jnp.zeros_like(v)
        w = jnp.zeros_like(v)
        wp = jnp.zeros_like(v)
        state = (
            jnp.asarray(k, jnp.int32), x, vp, v, safe_beta1,
            safe_beta1,                      # eta (rhs of the rotated system)
            jnp.ones((), t.dtype), jnp.zeros((), t.dtype),   # c_old, s_old
            jnp.ones((), t.dtype), jnp.zeros((), t.dtype),   # c, s
            wp, w, beta1,
        )
        st = lax.while_loop(cond, body, state)
        return st[1], st[0]

    if refine_steps > 0:
        # pair-accumulated iterative refinement, as in cg_solve
        x_pair = df32.promote(x0)
        k = 0
        zero = jnp.zeros_like(x0)
        for _ in range(refine_steps + 1):
            r0 = df32.kkt_residual_pair(P, A, sigma, rho_vec, t_pair, x_pair)
            d, k = sweep(zero, r0, k)
            x_pair = df32.add(x_pair, df32.promote(d))
        x = df32.to_f32(x_pair)
    else:
        x, k = sweep(x0, t - mv(x0), 0)
    nu = rho_vec * (matvec(A, x) - r2)
    return x, nu, k


def cg_tolerance(admm_iter, dyn):
    """The reference's decreasing tolerance schedule c/iter^e
    (kktsolver_indirect.jl:168-170); combined with the rhs norm and the
    current ADMM residual into an absolute target by :func:`_cg_target`.
    """
    it = jnp.maximum(admm_iter, 1).astype(dyn.kkt_cg_tol_constant.dtype)
    return dyn.kkt_cg_tol_constant / (it ** dyn.kkt_cg_tol_exponent)
