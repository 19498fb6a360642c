"""The ADMM core: one jitted XLA program per solve.

Reference call stack: src/solver.jl:78-203 (optimize!), :7-65 (admm_z!/
admm_x!/admm_w!), :242-292 (rho adaptation), :303-356 (termination).

TPU-first redesign: setup (Ruiz scaling, constraint classification, rho
rules, KKT factorization), the over-relaxed ADMM iteration, residual /
infeasibility / termination reductions and safeguarded Anderson acceleration
are traced into a single ``jax.jit`` with the main loop as a
``lax.while_loop``; nothing leaves the device until the loop terminates.
Periodic work (termination every ``check_termination`` iters, infeasibility
every ``check_infeasibility`` iters, rho adaptation) runs under ``lax.cond``
so the common iteration stays a handful of fused kernels: the batched cone
projection, the cached-factor triangular solves (or matrix-free CG), and
O(m+n) vector updates.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import accel, results
from .ops import blockkkt
from .ops import infeasibility as infeas
from .ops import kkt as kkt_ops
from .ops import projections
from .ops import residuals as res_ops
from .ops import scaling as scaling_ops
from .settings import DynConfig, StaticConfig, KKT_BLOCK, KKT_DENSE, KKT_MINRES

RHO_LOG_LEN = 64

# Base number of plain ADMM steps an infeasibility-certificate window spans
# on the SHADOW trajectory (the main trajectory and its accelerator are
# never touched — the shadow forks from the last genuine plain-ADMM iterate
# when a window arms and advances with plain steps while armed). 1 is the
# reference's cadence (one non-accelerated iteration per check,
# solver.jl:323-349); stagnant far-from-convergence solves escalate the
# window x4 per fruitless check up to 512 — the certificates need the plain
# operator's divergence ray, which Anderson masks entirely, and from an
# AA orbit point the ray takes O(100) plain iterations to emerge (measured
# on the PSD mixed-cone infeasible battery). Converging solves improve
# their residual score between checks, so they never escalate and keep the
# reference cadence.
INFEAS_PLAIN_WINDOW = 1

# --------------------------------------------------------------------------
# Control-lattice constants (trace-time). Each was tuned on measured repros
# (see the comments at the use sites) and swept across the full battery by
# scripts/sweep_constants.py — module-level so the sweep can vary one per
# process; they are read at trace time, so changing them after a solve has
# compiled in the same process has no effect on the cached program.
# --------------------------------------------------------------------------
# refined-endgame latch: stagnation fallback fires after this many checks
# without a 5% residual-score improvement, but only within
# REFINE_NEAR_SWITCH x of the switch; REFINE_STALL_LAST_RESORT is the
# far-from-switch escape for extreme-kappa floors.
REFINE_STALL_CHECKS = 4
REFINE_NEAR_SWITCH = 50.0
REFINE_STALL_LAST_RESORT = 16
# Anderson safeguard: a trip with score > AA_STRIKE_FACTOR x best is a
# "strike" (divergence evidence); AA_STRIKE_KILL strikes disable AA for the
# rest of the solve; a suspended accelerator only re-arms while score is
# within AA_REARM_FACTOR x of best.
AA_STRIKE_FACTOR = 100.0
AA_STRIKE_KILL = 2
AA_REARM_FACTOR = 10.0
# forced deadband-free rho re-adaptations per solve, fired on an AA trip
# while residuals are far from termination.
FORCED_RHO_BUDGET = 2
# consecutive stagnant+evidence checks before the certificate shadow
# window escalates.
ESCALATE_STAG_CHECKS = 2

# rho row classes (reference: src/parameters.jl:17-49)
_RHO_NORMAL = 0
_RHO_EQ = 1
_RHO_LOOSE = 2


class SetupState(NamedTuple):
    """Device-resident outputs of the in-jit setup phase (scaled problem
    data + row classification). A chunked solve re-enters the SAME compiled
    program through the loop carry; passing the setup back in skips the
    Ruiz fori-loop and classification on every re-entry (measured ~1.2 s
    per chunk at the 10k north-star — 21 chunks under a time limit)."""

    P: Any
    A: Any
    q: Any
    b: Any
    lb: Any
    ub: Any
    sm: Any                # ScaleMats
    rho_class: Any


class LoopCarry(NamedTuple):
    w: Any
    w_prev: Any
    s: Any
    iter: Any
    sg_iter: Any
    status: Any
    cost: Any
    res: Any               # ResInfo
    rho: Any
    rho_vec: Any
    kkt: Any               # DenseKKTState or () for CG
    sol: Any               # [n+m] last KKT solution (CG warm start / views)
    dx: Any                # certificate base x (set by the first shadow step)
    dy: Any                # certificate base mu (set by the first shadow step)
    gx: Any                # [n] main-trajectory x at the previous infeas check
    gy: Any                # [m] main-trajectory mu at the previous infeas check
    w_sh: Any              # [n+m] certificate shadow iterate (plain ADMM)
    mu_sh: Any             # [m] shadow mu of the last shadow step
    infeas_due: Any
    rho_due: Any
    rho_force: Any         # bool: stall-triggered deadband-free rho update
    n_forced: Any          # int32: forced rho updates fired (hard budget 2)
    due_age: Any           # int32: iterations a deferred rho update starved
    dy_age: Any            # int32: plain iterations since the infeasibility
                           # deltas were armed (-1 = not armed)
    inf_win: Any           # int32: current certificate plain-window length
    chk_best: Any          # best residual score seen at a certificate check
    stag_chks: Any         # int32: consecutive stagnant certificate checks
    loose: Any             # bool: mixed-precision loose phase still active
    refine_on: Any         # bool: df32 KKT refinement latched on (endgame)
    ref_stall: Any         # int32: stagnant checks while refinement is off
    ref_best: Any          # best residual score seen while refinement is off
    redo: Any              # bool: this pass redoes a safeguard-rejected step
    kkt_iters: Any         # int32: accumulated inner CG/MINRES iterations
    n_rho_adapt: Any
    rho_log: Any           # [RHO_LOG_LEN]
    hist: Any              # [res_hist, 6] residual-history ring or ()
    hist_n: Any            # int32: rows ever written to the ring
    aa: Any                # AccelState or ()
    eig: Any               # per-PSD-bucket eigenbasis carry (amortized) or ()


def _make_rho_vec(rho, rho_class, dyn, row_scale=None):
    """rho per row from the row class (reference: parameters.jl:17-49),
    optionally multiplied by a static per-row scale (e.g. the
    decomposition-overlap weighting, Settings.rho_overlap_scale)."""
    rv = jnp.where(
        rho_class == _RHO_EQ,
        rho * dyn.rho_eq_over_rho_ineq,
        jnp.where(rho_class == _RHO_LOOSE, dyn.rho_min, rho),
    )
    if row_scale is not None:
        rv = jnp.clip(rv * row_scale, dyn.rho_min, dyn.rho_max)
    return rv


def _classify_rows(cones, b, lb, ub, dyn):
    """Constraint classification on scaled data (reference: setup.jl:75-85,
    convexset.jl:62-69 and :831-842)."""
    thresh = dyn.infty * dyn.min_scaling
    cls = jnp.zeros(b.shape[0], jnp.int32)
    cls = jnp.where(cones.eq_mask, _RHO_EQ, cls)
    cls = jnp.where(cones.nonneg_mask & (b > thresh), _RHO_LOOSE, cls)
    box_loose = cones.box_mask & (lb < -thresh) & (ub > thresh)
    box_eq = cones.box_mask & ((ub - lb) < dyn.rho_tol)
    cls = jnp.where(box_loose, _RHO_LOOSE, jnp.where(box_eq, _RHO_EQ, cls))
    return cls


def solve(P, A, q, b, cones, x0, s0, mu0, dyn: DynConfig, static: StaticConfig,
          carry_in=None, return_carry: bool = False, kkt_precond=None,
          kkt_block=None, rho_row_scale=None, setup_in=None):
    """Full solve on device. All inputs are device arrays / pytrees; `static`
    is hashable config. Wrap with jax.jit(static_argnums=(..,)) upstream.

    ``carry_in``: a :class:`LoopCarry` from a previous ``return_carry=True``
    solve of the *same program* — the loop resumes with the full solver state
    (iterates, rho, accelerator history, CG warm start, iteration counters),
    so a chunked time-limited solve follows the identical iterate trajectory
    as one uninterrupted solve (reference behavior: solver.jl:303-321).
    ``x0``/``s0``/``mu0`` are ignored on resume. ``setup_in``: the
    :class:`SetupState` from the previous chunk — skips the in-jit Ruiz
    scaling/classification on re-entry.
    """
    m, n = static.m, static.n
    dtype = q.dtype

    # ------------------------------------------------------------------
    # Setup (reference: solver.jl:96-138, setup.jl)
    # ------------------------------------------------------------------
    if setup_in is not None:
        P, A, q, b = setup_in.P, setup_in.A, setup_in.q, setup_in.b
        lb, ub, sm = setup_in.lb, setup_in.ub, setup_in.sm
        rho_class = setup_in.rho_class
        setup_state = setup_in
    else:
        if static.scaling_iters > 0:
            P, A, q, b, lb, ub, sm = scaling_ops.ruiz_scale(
                P, A, q, b, cones, static.scaling_iters, dyn
            )
        else:
            sm = scaling_ops.identity_scale(m, n, dtype)
            lb, ub = cones.lb, cones.ub
        rho_class = None  # filled below (needs the scaled cone bounds)
    cones = dataclasses.replace(cones, lb=lb, ub=ub)

    x, mu, s0v = scaling_ops.scale_variables(x0, mu0, s0, sm)

    if rho_class is None:
        rho_class = _classify_rows(cones, b, lb, ub, dyn)
        setup_state = SetupState(P=P, A=A, q=q, b=b, lb=lb, ub=ub, sm=sm,
                                 rho_class=rho_class)
    rho = dyn.rho
    rho_vec = _make_rho_vec(rho, rho_class, dyn, rho_row_scale)
    rho_log = jnp.zeros(RHO_LOG_LEN, dtype).at[0].set(rho)

    # periodic residual measurements ride the compensated matvecs whenever
    # the KKT refinement is active: in f32 the plain measurement noise feeds
    # the rho adaptation and can drive a limit cycle near convergence.
    # They follow the RUNTIME refine latch (lax.cond below), not the static
    # config: before the endgame latch trips, plain-f32 measurements are
    # exactly as meaningful (the same reasoning that gates the refinement
    # itself), and a compensated residual pass over a 100k-row decomposed
    # problem measured ~26 ms per check — 1.06 ms/iter at check interval 25,
    # 30% of maxcut-2000 throughput — for precision the pre-endgame rho
    # adaptation cannot use
    compensated_res = static.kkt_refine_steps > 0
    # endgame gate: KKT solves run plain f32 while relative residuals sit
    # above kkt_refine_switch (inexact-ADMM tolerates solve error below the
    # iterate error), and the refinement latches on one-way at the first
    # termination check under the switch — or after 4 stagnant checks, in
    # case the plain-f32 forward-error floor for this problem lies ABOVE
    # the switch and the latch would otherwise never trip
    refine_gated = static.kkt_refine_gated and static.kkt_refine_steps > 0

    custom_kkt = not isinstance(static.kkt_solver, str)
    use_dense = (not custom_kkt) and static.kkt_solver == KKT_DENSE
    use_block = (not custom_kkt) and static.kkt_solver == KKT_BLOCK
    if use_block and kkt_block is None:
        raise ValueError("kkt_solver='blockdiag' needs the BlockKKTMeta "
                         "structure (pass kkt_block=blockkkt.analyze(P, A))")

    # Block-space x carry (blockkkt.solve_blockspace): when the fused
    # block-diagonal KKT applies, the x half of the operator variable w is
    # kept PERMANENTLY in the concatenated component layout — the
    # per-iteration cols gather and x scatter (measured 1.7 + 1.5 ms at the
    # 10k north-star; XLA TPU's gather engine runs ~6.6 ns/element) become
    # static slices. Components partition the columns, so the layout is a
    # padded permutation of x: pad slots stay exactly 0 (q/x0 pads are 0
    # and the padded KKT blocks solve them to 0), norms and AA secants are
    # unchanged. n-space x is materialized only at the periodic checks and
    # at exit (x_from_block, one scatter amortized over check_termination).
    use_bspace = use_block and blockkkt.supports_blockspace(kkt_block)
    if use_bspace:
        cols_map = blockkkt.blockspace_cols(kkt_block)
        nx = blockkkt.blockspace_dim(kkt_block)

        def x_to_block(xv):
            return jnp.concatenate([xv, jnp.zeros(1, dtype)])[cols_map]

        def x_from_block(xg):
            return jnp.zeros(n + 1, dtype).at[cols_map].set(xg)[:n]
    else:
        nx = n

        def x_to_block(xv):
            return xv

        def x_from_block(xg):
            return xg
    qx = x_to_block(q)

    # Compensated residual checks through the block-dense A: the global
    # df32 COO pass is an [m, width] ELL gather + pairwise tree — measured
    # 407 ms per compensated check at the 10k north-star (m = 1.44M), i.e.
    # ~16 ms/iter amortized at the default check interval, vs ~9 ms per
    # check through the cached [N, R, k] Ad tensors (blockkkt.
    # compensated_residuals). Applies whenever the block-space carry does.
    from .ops import df32 as df32_ops
    from .ops.linops import Coo as _Coo

    use_bspace_res = use_bspace and isinstance(P, _Coo)
    if use_bspace_res:
        _res_covered = blockkkt.covered_rows_mask(kkt_block, m)
        _p_has_nnz = int(P.vals.shape[0]) > 0

    def _bspace_comp_res(c, x_k, s_k, mu_k, sm, scaled: bool):
        """(rp, rd, mp, md) in double-f32 via the block-dense A. ``sm`` is
        closed over by the callers' scope; pass it explicitly so this can
        be defined before setup runs."""
        if scaled:
            Einv_v, Dv, cinv_v = sm.Einv, sm.Dinv, sm.cinv
        else:
            Einv_v = jnp.ones(m, dtype)
            Dv = jnp.ones(n, dtype)
            cinv_v = jnp.ones((), dtype)
        Dg = x_to_block(Dv)
        Px_pair_g = None
        if _p_has_nnz:
            pxh, pxl = df32_ops.matvec2(P, df32_ops.promote(x_k))
            Px_pair_g = (x_to_block(pxh), x_to_block(pxl))
        return blockkkt.compensated_residuals(
            kkt_block, c.kkt, c.w_prev[:nx], s_k, mu_k, b, qx,
            Einv_v, Dg, cinv_v, Px_pair_g, covered=_res_covered,
        )
    if custom_kkt:
        # user plug-in (reference: AbstractKKTSolver, kktsolver.jl:5-11)
        kkt_state = static.kkt_solver.setup(P, A, dyn.sigma, rho_vec)
    elif use_dense:
        # the explicit-inverse apply is plain-ADMM-only (see dense_factor:
        # its deterministic apply-error floor destabilizes safeguarded AA)
        kkt_state = kkt_ops.dense_factor(P, A, dyn.sigma, rho_vec,
                                         use_inverse=static.accel_mem == 0)
    elif use_block:
        kkt_state = blockkkt.factor(kkt_block, P, A, dyn.sigma, rho_vec,
                                    build_pair=static.kkt_refine_steps > 0)
    else:
        kkt_state = ()

    def kkt_setup(rho_vec):
        if custom_kkt:
            return static.kkt_solver.setup(P, A, dyn.sigma, rho_vec)
        if use_dense:
            return kkt_ops.dense_factor(P, A, dyn.sigma, rho_vec,
                                        use_inverse=static.accel_mem == 0)
        if use_block:
            return blockkkt.factor(kkt_block, P, A, dyn.sigma, rho_vec,
                                    build_pair=static.kkt_refine_steps > 0)
        return ()

    # ------------------------------------------------------------------
    # ADMM operator pieces (reference: solver.jl:7-65)
    # ------------------------------------------------------------------
    def kkt_solve(kkt_state, rho_vec, r1, r2, sol_prev, admm_iter, res_min,
                  refine_on):
        def _refine_steps_solve(steps: int):
            if custom_kkt:
                xt, nu = static.kkt_solver.solve(
                    kkt_state, P, A, dyn.sigma, rho_vec, r1, r2
                )
                return xt, nu, jnp.zeros((), jnp.int32)
            if use_dense:
                xt, nu = kkt_ops.dense_solve(
                    kkt_state, P, A, dyn.sigma, rho_vec, r1, r2, steps,
                )
                return xt, nu, jnp.zeros((), jnp.int32)
            if use_bspace:
                xt, nu = blockkkt.solve_blockspace(
                    kkt_block, kkt_state, rho_vec, r1, r2, steps,
                )
                return xt, nu, jnp.zeros((), jnp.int32)
            if use_block:
                xt, nu = blockkkt.solve(
                    kkt_block, kkt_state, P, A, dyn.sigma, rho_vec, r1, r2,
                    steps,
                )
                return xt, nu, jnp.zeros((), jnp.int32)
            sched = kkt_ops.cg_tolerance(admm_iter, dyn)
            solve_fn = (
                kkt_ops.minres_solve
                if static.kkt_solver == KKT_MINRES
                else kkt_ops.cg_solve
            )
            extra = (
                {"precond": kkt_precond}
                if static.kkt_solver != KKT_MINRES
                else {}
            )
            xt, nu, k = solve_fn(
                P, A, dyn.sigma, rho_vec, r1, r2, sol_prev[:n], sched,
                res_min, static.kkt_cg_max_iter, steps, **extra,
            )
            return xt, nu, jnp.asarray(k, jnp.int32)

        if refine_gated and not custom_kkt:
            return lax.cond(
                refine_on,
                lambda _: _refine_steps_solve(static.kkt_refine_steps),
                lambda _: _refine_steps_solve(0),
                operand=None,
            )
        return _refine_steps_solve(static.kkt_refine_steps)

    def admm_x_w(w, s, kkt_state, rho_vec, sol_prev, admm_iter, res_min,
                 refine_on):
        """admm_x! then admm_w! (solver.jl:32-65). Returns (w_new, sol).
        The x half of w (and of sol) lives in block space when
        ``use_bspace`` — q rides along as ``qx`` in the same layout."""
        r1 = dyn.sigma * w[:nx] - qx
        r2 = b - 2.0 * s + w[nx:]
        xt, nu, k = kkt_solve(kkt_state, rho_vec, r1, r2, sol_prev, admm_iter,
                              res_min, refine_on)
        s_tl = 2.0 * s - w[nx:] - nu / rho_vec
        w1 = w[:nx] + dyn.alpha * (xt - w[:nx])
        w2 = w[nx:] + dyn.alpha * (s_tl - s)
        return jnp.concatenate([w1, w2]), jnp.concatenate([xt, nu]), k

    def recover_mu(w_prev, s, rho_vec):
        """Moreau: mu = rho (w - Pi(w)) (solver.jl:23-26)."""
        return rho_vec * (w_prev[nx:] - s)

    # identity eigenbasis carry for the certificate shadow projections: the
    # amortized backend's staleness guard then always runs full sweeps —
    # the shadow must never reuse the MAIN iterate's basis (ADVICE r2)
    eig_fresh = projections.init_eig_state(cones, dtype)

    # ------------------------------------------------------------------
    # Initial state (solver.jl:125-138)
    # ------------------------------------------------------------------
    if carry_in is not None:
        # resume a chunked solve with the full solver state; only the status
        # flag is reset so the loop re-enters
        carry0 = carry_in._replace(
            status=jnp.asarray(results.UNDETERMINED, jnp.int32)
        )
    else:
        w0 = jnp.concatenate([x_to_block(x), s0v + mu / rho_vec])
        sol0 = jnp.zeros(nx + m, dtype)
        refine_on0 = jnp.asarray(not refine_gated)
        # initialisation half-step so iterates agree with standard ADMM
        w0, sol0, kkt_it0 = admm_x_w(
            w0, s0v, kkt_state, rho_vec, sol0, jnp.asarray(1, jnp.int32),
            jnp.asarray(jnp.inf, dtype), refine_on0,
        )

        big = jnp.asarray(jnp.inf, dtype)
        res0 = res_ops.ResInfo(big, big, jnp.zeros((), dtype), jnp.zeros((), dtype))

        if static.accel_mem > 0:
            aa0 = accel.init_accel(nx + m, static.accel_mem, dtype)
        else:
            aa0 = ()
        eig0 = eig_fresh

        carry0 = LoopCarry(
            w=w0, w_prev=w0, s=s0v,
            iter=jnp.zeros((), jnp.int32),
            sg_iter=jnp.zeros((), jnp.int32),
            status=jnp.asarray(results.UNDETERMINED, jnp.int32),
            cost=big,
            res=res0,
            rho=rho,
            rho_vec=rho_vec,
            kkt=kkt_state,
            sol=sol0,
            dx=jnp.zeros(nx, dtype),
            dy=jnp.zeros(m, dtype),
            gx=jnp.zeros(n, dtype),
            gy=jnp.zeros(m, dtype),
            w_sh=w0,
            mu_sh=jnp.zeros(m, dtype),
            infeas_due=jnp.asarray(False),
            rho_due=jnp.asarray(False),
            rho_force=jnp.asarray(False),
            n_forced=jnp.zeros((), jnp.int32),
            due_age=jnp.zeros((), jnp.int32),
            dy_age=jnp.asarray(-1, jnp.int32),
            inf_win=jnp.asarray(INFEAS_PLAIN_WINDOW, jnp.int32),
            chk_best=jnp.asarray(jnp.inf, dtype),
            stag_chks=jnp.zeros((), jnp.int32),
            loose=jnp.asarray(bool(static.mixed_precision)),
            refine_on=refine_on0,
            ref_stall=jnp.zeros((), jnp.int32),
            ref_best=jnp.asarray(jnp.inf, dtype),
            redo=jnp.asarray(False),
            kkt_iters=kkt_it0,
            n_rho_adapt=jnp.zeros((), jnp.int32),
            rho_log=rho_log,
            hist=(jnp.zeros((static.res_hist, 6), dtype)
                  if static.res_hist > 0 else ()),
            hist_n=jnp.zeros((), jnp.int32),
            aa=aa0,
            eig=eig0,
        )

    # ------------------------------------------------------------------
    # rho adaptation (reference: solver.jl:242-282, parameters.jl:53-92)
    # ------------------------------------------------------------------
    def _rho_residuals(c, x_k, mu_k, comp: bool):
        rp, rd = res_ops.calculate_residuals(
            P, A, q, b, x_k, c.s, mu_k, sm, ignore_scaling=True,
            compensated=comp,
        )
        mp, md = res_ops.max_res_component_norm(
            P, A, q, b, x_k, c.s, mu_k, sm, ignore_scaling=True,
            compensated=comp,
        )
        return rp, rd, mp, md

    def adapt_rho(c: LoopCarry) -> LoopCarry:
        mu_k = recover_mu(c.w_prev, c.s, c.rho_vec)
        x_k = x_from_block(c.w_prev[:nx])
        if compensated_res:
            comp_fn = (
                (lambda _: _bspace_comp_res(c, x_k, c.s, mu_k, sm, False))
                if use_bspace_res
                else (lambda _: _rho_residuals(c, x_k, mu_k, True))
            )
            rp, rd, mp, md = lax.cond(
                c.refine_on,
                comp_fn,
                lambda _: _rho_residuals(c, x_k, mu_k, False),
                None,
            )
        else:
            rp, rd, mp, md = _rho_residuals(c, x_k, mu_k, False)
        rp = rp / (mp + 1e-10)
        rd = rd / (md + 1e-10)
        new_rho = c.rho * jnp.sqrt(rp / (rd + 1e-10))
        new_rho = jnp.clip(new_rho, dyn.rho_min, dyn.rho_max)
        # rho_force (set by a stall-detector trip): bypass the 5x deadband —
        # a stalled solve whose rho sits inside the deadband is otherwise
        # permanently frozen (the update also re-expresses w from (mu, s)
        # and restarts the accelerator, a genuine operator reset)
        changed = (new_rho > dyn.adaptive_rho_tolerance * c.rho) | (
            new_rho < c.rho / dyn.adaptive_rho_tolerance
        ) | c.rho_force

        def apply(c: LoopCarry) -> LoopCarry:
            rho_vec = _make_rho_vec(new_rho, rho_class, dyn, rho_row_scale)
            kkt_new = kkt_setup(rho_vec)
            # re-express w in the new scaling (solver.jl:278)
            w2 = mu_k / rho_vec + c.s
            w = jnp.concatenate([c.w[:nx], w2])
            idx = jnp.minimum(c.n_rho_adapt + 1, RHO_LOG_LEN - 1)
            aa = accel.restart(c.aa) if static.accel_mem > 0 else ()
            return c._replace(
                rho=new_rho, rho_vec=rho_vec, kkt=kkt_new, w=w,
                n_rho_adapt=c.n_rho_adapt + 1,
                rho_log=c.rho_log.at[idx].set(new_rho),
                aa=aa,
            )

        return lax.cond(changed, apply, lambda c: c, c)

    def nonaccel_iter(c: LoopCarry):
        """True when this iteration's base point is a plain ADMM iterate, so
        deferred rho/infeasibility updates may run
        (reference: solver.jl:284-292). Evaluated once per iteration, right
        after acceleration_pre, so the top/bottom delta_y bookkeeping stays
        consistent even if the safeguard later rejects the candidate."""
        if static.accel_mem > 0:
            return ~c.aa.success
        return jnp.asarray(True)

    # ------------------------------------------------------------------
    # termination / infeasibility checks (solver.jl:303-356)
    # ------------------------------------------------------------------
    def _result_info_rt(c: LoopCarry, x_k, s, mu_k):
        """result_info with the compensated matvecs gated on the RUNTIME
        refine latch (see the compensated_res comment above)."""
        if not compensated_res:
            return res_ops.result_info(P, A, q, b, x_k, s, mu_k, sm,
                                       compensated=False)
        if use_bspace_res:
            def _comp(_):
                rp, rd, mp, md = _bspace_comp_res(c, x_k, s, mu_k, sm, True)
                return res_ops.ResInfo(rp, rd, mp, md)
        else:
            def _comp(_):
                return res_ops.result_info(P, A, q, b, x_k, s, mu_k, sm,
                                           compensated=True)
        return lax.cond(
            c.refine_on,
            _comp,
            lambda _: res_ops.result_info(P, A, q, b, x_k, s, mu_k, sm,
                                          compensated=False),
            None,
        )

    def check_termination(c: LoopCarry) -> LoopCarry:
        mu_k = recover_mu(c.w_prev, c.s, c.rho_vec)
        x_k = x_from_block(c.w_prev[:nx])
        info = _result_info_rt(c, x_k, c.s, mu_k)
        cost = res_ops.calculate_cost(P, q, x_k, sm.cinv)

        status = c.status
        status = jnp.where(jnp.abs(cost) > 1e20, results.UNSOLVED, status)

        conv = res_ops.has_converged(info, dyn.eps_abs, dyn.eps_rel)
        conv_plain = conv
        if refine_gated:
            # Never declare SOLVED off an uncompensated measurement: a solve
            # that jumps from rel > kkt_refine_switch to below tolerance
            # within one check interval would otherwise terminate on a
            # plain-f32 residual that can sit at the noise floor (ADVICE r4).
            # `conv_plain` feeds the latch trip below, so a plain-converged
            # solve latches THIS check and the next check confirms
            # compensated — at most one extra interval even when eps is
            # looser than the switch (where rel never crosses it and a
            # still-improving plain solve would defer the stall fallback
            # check after check).
            conv &= c.refine_on
        if static.check_obj_true:
            conv &= jnp.abs(dyn.obj_true - cost) <= dyn.obj_true_tol
        status = jnp.where(
            (status == results.UNDETERMINED) & conv, results.SOLVED, status
        )

        c = c._replace(cost=cost, res=info, status=status)
        rel = jnp.maximum(
            info.r_prim / (info.max_norm_prim + 1e-10),
            info.r_dual / (info.max_norm_dual + 1e-10),
        )
        if refine_gated:
            # one-way latch into the refined endgame; the stagnation
            # fallback (4 checks without a 5% residual-score improvement)
            # covers problems whose plain-f32 floor sits above the switch.
            # The fallback only fires NEAR the switch (rel < 50x): a
            # plain-f32 forward-error floor sits a small factor above it
            # (~kappa*eps relative), while a transient plateau at rel ~ 0.1
            # is ordinary ADMM dynamics — tripping there latched entire
            # solves into ~3x-cost refined iterations (measured: north-star
            # seed 0 ran 9,150 iters at 23 iter/s vs the 56 of its siblings,
            # a 4.3x time tail from one early 4-check plateau)
            score = rel
            stall = jnp.where(
                score < 0.95 * c.ref_best, 0, c.ref_stall + 1
            )
            near_switch = rel < REFINE_NEAR_SWITCH * dyn.kkt_refine_switch
            # Last-resort escape (ADVICE r4): a problem whose plain-f32
            # residual floor sits MORE than 50x above the switch (extreme
            # kappa) would otherwise never engage refinement and run to
            # max_iter. 16 stagnant checks (~400 iterations without a 5%
            # improvement) separates that from the early transient plateaus
            # the near-switch gate exists for (those resolved within 4-8
            # checks on every measured repro).
            trip = (
                (rel < dyn.kkt_refine_switch)
                | conv_plain
                | ((stall >= REFINE_STALL_CHECKS) & near_switch)
                | (stall >= REFINE_STALL_LAST_RESORT)
            ) & ~c.refine_on
            c = c._replace(
                refine_on=c.refine_on | trip,
                ref_stall=jnp.where(c.refine_on, 0, stall),
                ref_best=jnp.minimum(c.ref_best, score),
            )
            if static.accel_mem > 0:
                # the accelerator's secant history spans the UNREFINED
                # operator (its fixed point differs by the plain-f32 KKT
                # forward error); carrying it across the latch poisons the
                # endgame basin — restart it at the switch
                c = lax.cond(
                    trip,
                    lambda c: c._replace(aa=accel.restart(c.aa)),
                    lambda c: c, c,
                )
        if static.res_hist > 0:
            # device-side residual history (the on-TPU observability path —
            # host callbacks abort on the axon relay, so verbose rows print
            # host-side from this ring after each dispatch chunk;
            # reference rows: printing.jl:38-48). The 6th column records the
            # endgame-refine latch so latch timing is observable post-hoc.
            slot = jnp.mod(c.hist_n, static.res_hist)
            row = jnp.stack([
                c.iter.astype(cost.dtype), cost, info.r_prim, info.r_dual,
                c.rho, c.refine_on.astype(cost.dtype),
            ])
            c = c._replace(hist=c.hist.at[slot].set(row), hist_n=c.hist_n + 1)
        if static.mixed_precision:
            # one-way latch: once relative residuals cross the switch
            # threshold, the endgame runs at full matmul precision (no
            # flip-flopping near the boundary)
            c = c._replace(loose=c.loose & (rel > dyn.mixed_precision_switch))
        if static.verbose:
            jax.debug.print(
                "{it}\t{cost}\t{rp}\t{rd}\t{rho}",
                it=c.iter, cost=cost, rp=info.r_prim, rd=info.r_dual, rho=c.rho,
            )
        # AccuracyActivation (reference: accelerator_interface.jl:38-46)
        if static.accel_mem > 0 and static.accel_activation == "accuracy":
            tol = dyn.accel_activation_accuracy
            near = (info.r_prim < tol + tol * info.max_norm_prim) & (
                info.r_dual < tol + tol * info.max_norm_dual
            )
            c = c._replace(
                aa=c.aa._replace(active=(c.aa.active | near) & ~c.aa.disabled)
            )
        # Accelerator stagnation toggle (see accel.AccelState.disabled):
        # count termination checks with <5% improvement of the normalized
        # residual score; a trip flips the accelerator's suspension state
        # (AA-noise-limited problems converge with it off; f32-floor-limited
        # problems need it back on). Counting starts once activation has
        # been reached, so the pre-activation phase can't trip it.
        if static.accel_mem > 0 and static.accel_stall_checks > 0:
            aa = c.aa
            score = info.r_prim / (info.max_norm_prim + 1e-10) + info.r_dual / (
                info.max_norm_dual + 1e-10
            )
            improved = score < 0.95 * aa.best_score
            counting = aa.active | aa.disabled
            stall = jnp.where(
                improved, 0, aa.stall_checks + counting.astype(jnp.int32)
            )
            trip = stall >= static.accel_stall_checks
            # A "strike" is a trip that fires while AA is driving and the
            # score sits far above the best seen — direct evidence the
            # accelerated dynamics diverged (measured on chip: AA+f32 walks
            # the min-eig SDP from rp~1e-5 to rp~0.3, >1e4x). 100x separates
            # that from the ~10-50x transient AA-noise excursions a healthy
            # toggling run shows (minres min-eig on CPU). Two strikes kill the
            # accelerator PERMANENTLY: the f32 AA dynamics are bistable, and
            # once divergence has been proven twice, only an uninterrupted
            # plain-ADMM tail (globally convergent) can finish the job.
            # Strikes never reset — plain ADMM's repair of the blow-up looks
            # like "improvement" and must not launder the evidence. A slow
            # honest crawl (score ~ best) trips without striking, so the
            # suspension TOGGLE keeps working there (minres min-eig: toggling
            # converges 3.5k iters, a stagnation-count kill never converges).
            strike = trip & ~aa.disabled & (
                score > AA_STRIKE_FACTOR * aa.best_score)
            n_trips = aa.n_trips + strike.astype(jnp.int32)
            dead = n_trips >= AA_STRIKE_KILL
            # never re-enable a suspended accelerator while the residuals
            # sit far above the best seen (that state means AA divergence
            # is being repaired by plain ADMM — rearming AA there just
            # restarts the blow-up/repair cycle)
            trip &= (~aa.disabled
                     | (score <= AA_REARM_FACTOR * aa.best_score)) & ~dead
            c = c._replace(aa=aa._replace(
                best_score=jnp.minimum(aa.best_score, score),
                stall_checks=jnp.where(trip, 0, stall),
                disabled=(aa.disabled ^ trip) | dead,
                active=aa.active & ~trip & ~dead,
                n_trips=n_trips,
                # the history is stale after a suspension window — restart
                count=jnp.where(trip, 0, aa.count),
                have_last=aa.have_last & ~trip,
            ))
            if static.adaptive_rho:
                # a trip means neither regime is progressing — also force a
                # deadband-free rho re-adaptation (re-expresses w from
                # (mu, s): an operator reset that unfreezes solves whose
                # rho is pinned inside the 5x deadband). Only when the
                # residuals are genuinely FAR from termination: near the
                # tolerance boundary the <5% improvement counter trips on
                # the normal endgame crawl, and the forced reset's residual
                # bump then keeps the solve hovering just above the line
                # forever (measured: min-eig SDP at rd~6e-6 vs eps=1e-6 for
                # 20000 iters; without the gate it solves in ~800).
                far = (info.r_prim > 10.0 * (dyn.eps_abs + dyn.eps_rel * info.max_norm_prim)) | (
                    info.r_dual > 10.0 * (dyn.eps_abs + dyn.eps_rel * info.max_norm_dual)
                )
                # hard per-solve budget (no reset): a forced update that
                # helps shows up as score improvement and normal adaptation
                # takes over; repeated forcing just drives a rho limit cycle
                # (measured on the minres min-eig SDP: rho oscillates
                # 0.09<->0.58 forever, each re-expression killing the plain-
                # ADMM crawl that otherwise converges)
                fire = trip & far & (c.n_forced < FORCED_RHO_BUDGET)
                c = c._replace(rho_force=c.rho_force | fire,
                               n_forced=c.n_forced + fire.astype(jnp.int32))
        return c

    def check_infeasibility(c: LoopCarry) -> LoopCarry:
        # deltas span the shadow trajectory's plain window (c.dy/c.dx hold
        # the Moreau/x base the first shadow step captured, c.mu_sh/c.w_sh
        # the shadow's current state) — every endpoint is a plain-operator
        # iterate, so the certified direction never spans an Anderson jump
        dy = c.dy - c.mu_sh
        dx = c.w_sh[:nx] - c.dx          # block space (carry layout)
        dx_n = x_from_block(dx)          # n-space for the certificates
        # strict + 100x-loose certificates from ONE pass (the loose ones
        # gate the window escalation below; the expensive batched PSD
        # eigendecompositions are shared — XLA does not CSE eigh calls)
        prim_inf, prim_loose = infeas.is_primal_infeasible_multi(
            dy, P, A, b, cones, sm,
            (dyn.eps_prim_inf, 100.0 * dyn.eps_prim_inf),
        )
        dual_inf, dual_loose = infeas.is_dual_infeasible_multi(
            dx_n, P, A, q, cones, sm,
            (dyn.eps_dual_inf, 100.0 * dyn.eps_dual_inf),
        )
        # Escalation-gate evidence from the MAIN trajectory's check-to-check
        # deltas (~check_infeasibility iterations apart): an AA orbit on an
        # infeasible problem keeps the divergence-ray energy in these long-
        # baseline deltas even though its short shadow deltas look clean —
        # a 1-plain-step window from an orbit point shows no ray at all
        # (measured: the PSD mixed-cone battery never escalates without
        # this). Gating only — the certified status always comes from the
        # clean shadow deltas above. The `norm > tol` requirement inside
        # the certificates keeps converging feasible solves (tiny deltas)
        # from firing the gate. The two gate passes run only on checks
        # whose residual score is already stagnant: converging solves skip
        # them entirely (they cost two extra batched-PSD membership
        # batteries, ~12% of banded-2000 throughput when run every check).
        mu_now = recover_mu(c.w_prev, c.s, c.rho_vec)
        x_now = x_from_block(c.w_prev[:nx])
        score = c.res.r_prim / (c.res.max_norm_prim + 1e-10) + c.res.r_dual / (
            c.res.max_norm_dual + 1e-10
        )
        stag_score = score >= 0.95 * c.chk_best

        def gate_certs(_):
            pg = infeas.is_primal_infeasible(
                c.gy - mu_now, P, A, b, cones, sm, 100.0 * dyn.eps_prim_inf
            )
            dg = infeas.is_dual_infeasible(
                x_now - c.gx, P, A, q, cones, sm, 100.0 * dyn.eps_dual_inf
            )
            return pg, dg

        prim_gate, dual_gate = lax.cond(
            stag_score, gate_certs,
            lambda _: (jnp.asarray(False), jnp.asarray(False)), None,
        )
        prim_loose |= prim_gate
        dual_loose |= dual_gate
        status = c.status
        cost = c.cost
        status = jnp.where(
            (status == results.UNDETERMINED) & prim_inf,
            results.PRIMAL_INFEASIBLE, status,
        )
        cost = jnp.where(prim_inf, jnp.asarray(jnp.inf, dtype), cost)
        status = jnp.where(
            (status == results.UNDETERMINED) & dual_inf,
            results.DUAL_INFEASIBLE, status,
        )
        cost = jnp.where(dual_inf & ~prim_inf, jnp.asarray(-jnp.inf, dtype), cost)
        # Escalating window: a check that certifies nothing while the solve
        # is BOTH stagnant (score >= 0.95x the best seen at any check, i.e.
        # no 5% improvement) and showing loose-certificate evidence grows
        # the next plain window x4 — an infeasible orbit needs a sustained
        # plain stretch for the ray to emerge (the PSD mixed-cone battery
        # detects only after ~250 plain iterations from an AA orbit point).
        # Slow feasible crawls (~0.3%/check) do NOT beat the 5% bar, so the
        # `near` loose-certificate gate below is the sole guard that keeps
        # feasible solves out of escalated 2x-cost windows; infeasible
        # orbits oscillate around a frozen best (magnitude is NOT a
        # separator: a large-norm infeasible problem can sit at relative
        # score 7e-5 forever).
        # Escalate only on EVIDENCE: (a) the solve is stagnant — the floor
        # is the monotone running min; an infeasible orbit oscillates above
        # a near-frozen floor while a converging solve keeps setting >=5%
        # lower minima — AND (b) a 100x-loose certificate fires on the
        # current deltas (measured: the loose certificate fires at 1-step
        # windows within the first few checks on every infeasible battery
        # problem, and never on the feasible benchmarks). Without (b),
        # slow-improving feasible tails sit in escalated windows forever
        # and the duplicated shadow steps cost ~2x per iteration (measured
        # on the 10k banded SDP: 22 -> 14 iter/s). Escalation additionally
        # waits for a SECOND consecutive stagnant+evidence check: infeasible
        # orbits satisfy both persistently, while a feasible solve's
        # transient AA plateaus fire them once and recover — single-check
        # escalation measured 39% of north-star throughput in armed
        # shadow windows.
        near = prim_loose | dual_loose
        stagnant = stag_score & near
        stag_chks = jnp.where(stagnant, c.stag_chks + 1, 0)
        win = jnp.where(
            stag_chks >= ESCALATE_STAG_CHECKS,
            jnp.clip(c.inf_win * 4, 8, 512),
            jnp.asarray(INFEAS_PLAIN_WINDOW, jnp.int32),
        )
        chk_best = jnp.minimum(c.chk_best, score)
        c = c._replace(
            dy=dy, dx=dx, gx=x_now, gy=mu_now, status=status, cost=cost,
            infeas_due=jnp.asarray(False), dy_age=jnp.asarray(-1, jnp.int32),
            inf_win=win, chk_best=chk_best,
            stag_chks=stag_chks,
        )
        return c

    # ------------------------------------------------------------------
    # main loop body (solver.jl:140-165)
    # ------------------------------------------------------------------
    def body(c: LoopCarry) -> LoopCarry:
        # a redo pass repeats a safeguard-rejected step as a plain ADMM step
        # from the rolled-back iterate; it counts as a safeguarding
        # iteration (reference: accelerator_interface.jl:96-109)
        is_redo = c.redo
        it = c.iter + jnp.where(is_redo, 0, 1)
        c = c._replace(
            iter=it,
            sg_iter=c.sg_iter + is_redo.astype(jnp.int32),
            redo=jnp.asarray(False),
        )

        # --- acceleration_pre (accelerator_interface.jl:58-75) ---
        if static.accel_mem > 0:
            aa = c.aa
            if static.accel_activation == "immediate":
                aa = aa._replace(active=(aa.active | (it >= 2)) & ~aa.disabled)
            elif static.accel_activation == "iter":
                aa = aa._replace(
                    active=(aa.active | (it >= dyn.accel_activation_iter))
                    & ~aa.disabled
                )

            # Deferred rho updates only run on non-accelerated iterations
            # (reference: solver.jl:284-292 update_suggested). The restarted
            # memory yields one of those per memory window, but a rolling-
            # memory accelerator can accelerate every iteration forever —
            # once a deferred update has starved longer than one memory
            # window, force one plain ADMM iteration so it can run
            # (starved: keep recording history — these are genuine
            # plain-ADMM pairs, the best possible secants — but do not
            # accelerate. Freezing the history instead would make the first
            # post-window update push a secant spanning the whole window,
            # which measurably wrecks the accelerator: minres min-eig 1.5k
            # iters without windows, never converges with frozen-history
            # windows).
            #
            # Both calls run UNCONDITIONALLY with value gates instead of
            # under lax.cond: a taken cond branch copies every [mem, d]
            # history buffer it writes in and out of the conditional
            # (toy-measured +0.46 ms per 26 MB buffer per iteration on
            # v5e — 2.5 ms/iter of AA overhead at the 10k north-star),
            # while the gated no-op path costs one 15x15 Gram + solve.
            starved = c.due_age >= static.accel_mem
            gate_upd = aa.active & ~is_redo
            gate_acc = gate_upd & ~starved
            aa = accel.update(aa, c.w, c.w_prev, static.accel_memory,
                              gate=gate_upd)
            w, aa = accel.accelerate(
                aa, c.w, static.accel_type, static.accel_regularizer,
                gate=gate_acc,
            )
            c = c._replace(aa=aa, w=w)

        # snapshot the deferred-update predicate for this whole iteration
        deferred_ok = nonaccel_iter(c)
        if static.accel_mem > 0:
            pending = c.rho_due | c.rho_force
            c = c._replace(due_age=jnp.where(
                deferred_ok, 0,
                jnp.where(pending, c.due_age + 1, c.due_age),
            ))

        # --- certificate shadow trajectory (replaces solver.jl:145-148's
        # delta bookkeeping) --- The infeasibility certificates measure the
        # divergence ray of the PLAIN ADMM operator, which Anderson —
        # solving the secant system of a divergent affine iteration — turns
        # into a bounded chaotic orbit (measured: random primal-infeasible
        # QPs run 10000+ iters undetected with AA on; plain detects in
        # ~200). Rather than perturbing the main trajectory with forced
        # plain stretches (tried: every gating variant traded detection
        # robustness against the basin-sensitive f32 endgames), a SHADOW
        # iterate forks from the main one when a check arms and advances
        # with plain steps — same rho/KKT state, zero effect on the main
        # dynamics, 2x step cost only while a window is armed. The window
        # escalates x4 per stagnant fruitless check (up to 512): the ray
        # takes O(100) plain steps to emerge from an AA orbit point.
        if static.infeas_enabled:
            def arm(c: LoopCarry) -> LoopCarry:
                # Fork from a PLAIN-operator iterate: when this iteration
                # accelerated, c.w is the (possibly safeguard-rejected)
                # Anderson candidate — aa.g_last holds the last genuine
                # ADMM output, so the shadow starts there instead. The
                # delta base (dy/dx) is captured by the first shadow step
                # below from the shadow's own Moreau point, so BOTH window
                # endpoints are plain-operator iterates and window-1
                # evidence never spans an AA jump.
                w_fork = c.w
                if static.accel_mem > 0:
                    w_fork = jnp.where(c.aa.success, c.aa.g_last, c.w)
                return c._replace(
                    w_sh=w_fork, dy_age=jnp.zeros((), jnp.int32),
                )

            c = lax.cond(
                c.infeas_due & (c.dy_age < 0), arm, lambda c: c, c
            )

            def shadow_step(c: LoopCarry) -> LoopCarry:
                # The shadow projection never uses the amortized eigenbasis
                # carry (c.eig belongs to the MAIN iterate; over a long
                # window the shadow diverges from it, degrading a
                # warm-started fixed-sweep projection): the identity carry
                # trips the staleness guard, which falls back to full
                # sweeps — a fresh projection.
                s_sh, _ = projections.project(
                    c.w_sh[nx:], cones, eig_fresh,
                    loose=c.loose if static.mixed_precision else None,
                )
                mu_sh = c.rho_vec * (c.w_sh[nx:] - s_sh)
                # base capture on the first step after arm: mu_sh is the
                # Moreau image of the fork point itself
                is_base = c.dy_age == 0
                dy = jnp.where(is_base, mu_sh, c.dy)
                dx = jnp.where(is_base, c.w_sh[:nx], c.dx)
                res_min_sh = jnp.minimum(c.res.r_prim, c.res.r_dual)
                w_sh, _, k_sh = admm_x_w(
                    c.w_sh, s_sh, c.kkt, c.rho_vec, c.sol, it, res_min_sh,
                    c.refine_on,
                )
                return c._replace(
                    w_sh=w_sh, mu_sh=mu_sh, dy=dy, dx=dx,
                    dy_age=c.dy_age + 1,
                    kkt_iters=c.kkt_iters + k_sh,
                )

            c = lax.cond(
                c.infeas_due & (c.dy_age >= 0), shadow_step, lambda c: c, c
            )

        # --- ADMM step ---
        c = c._replace(w_prev=c.w)
        s, eig = projections.project(
            c.w[nx:], cones, c.eig,
            loose=c.loose if static.mixed_precision else None,
        )
        c = c._replace(s=s, eig=eig)

        # --- rho adaptation rules (solver.jl:242-282) ---
        if static.adaptive_rho:
            # dynamic interval (device scalar). 0 means "auto, not yet
            # resolved" — the Model resolves it from a timed probe chunk
            # before the main solve (reference: solver.jl:242-256); direct
            # solver callers passing 0 get the reference's round-number 40
            interval = jnp.where(
                dyn.adaptive_rho_interval > 0, dyn.adaptive_rho_interval, 40
            )
            due = c.rho_due | (
                (jnp.mod(it, interval) == 0)
                & (c.n_rho_adapt < static.adaptive_rho_max_adaptions)
            )
            c = c._replace(rho_due=due)
            # a long armed certificate window holds the rho update
            # pending (it fires right after the check): the adaptation
            # re-expresses w and refactors the KKT mid-window, which both
            # corrupts the shadow deltas and — since updates can fire more
            # often than a long window completes — starves the checks
            # forever. Base 1-iteration windows tolerate the collision
            # (reference parity, solver.jl:268).
            win_open = jnp.asarray(False)
            if static.infeas_enabled:
                win_open = c.infeas_due & (c.inf_win > 1)
            do_it = (c.rho_due | c.rho_force) & deferred_ok & ~win_open
            c = lax.cond(
                do_it,
                # a rho update changes the shadow's operator and mu scale —
                # reset its window (it re-arms next iteration while due)
                lambda c: adapt_rho(c)._replace(
                    rho_due=jnp.asarray(False), rho_force=jnp.asarray(False),
                    dy_age=jnp.asarray(-1, jnp.int32),
                ),
                lambda c: c,
                c,
            )

        res_min = jnp.minimum(c.res.r_prim, c.res.r_dual)
        w_new, sol, k_in = admm_x_w(c.w, c.s, c.kkt, c.rho_vec, c.sol, it,
                                    res_min, c.refine_on)
        c = c._replace(w=w_new, sol=sol, kkt_iters=c.kkt_iters + k_in)

        # --- acceleration_post: safeguarding (accelerator_interface.jl:85-114)
        # On rejection, roll back to the last genuine ADMM output g and set
        # the redo flag: the next loop pass repeats the step as plain ADMM
        # (identical math to the reference's inline extra step, but the
        # projection/KKT subgraphs are instantiated only once)
        if static.accel_mem > 0 and static.safeguard:
            def safeguard(c: LoopCarry) -> LoopCarry:
                nrm_f = jnp.linalg.norm(c.aa.f_last)
                nrm_f_acc = jnp.linalg.norm(c.w_prev - c.w)
                best = jnp.minimum(c.aa.best_nrm_f, nrm_f)
                c = c._replace(aa=c.aa._replace(best_nrm_f=best))

                def decline(c: LoopCarry) -> LoopCarry:
                    aa = c.aa._replace(
                        n_declined=c.aa.n_declined + 1,
                        success=jnp.asarray(False),
                    )
                    return c._replace(
                        w=c.aa.g_last, redo=jnp.asarray(True), aa=aa
                    )

                # per-step growth bound (reference semantics,
                # accelerator_interface.jl:96-109) plus the divergence
                # anchor: repeated tol-passing noise steps must not
                # compound away from the best residual seen (accel.py
                # AccelState.best_nrm_f)
                bad = (nrm_f_acc > dyn.safeguard_tol * nrm_f) | (
                    nrm_f_acc > dyn.safeguard_anchor * best
                )
                return lax.cond(bad, decline, lambda c: c, c)

            c = lax.cond(c.aa.success, safeguard, lambda c: c, c)

        just_declined = c.redo

        # --- termination check (solver.jl:303-321) ---
        check_now = ((jnp.mod(it, static.check_termination) == 0) | (it == 1)) & ~just_declined
        c = lax.cond(check_now, check_termination, lambda c: c, c)

        # --- infeasibility flag logic (solver.jl:323-349) ---
        if static.infeas_enabled:
            set_due = (jnp.mod(it, static.check_infeasibility) == 0) & ~just_declined
            # +1: the first shadow step only captures the delta base (both
            # endpoints plain-operator iterates), so a window of length L
            # needs L+1 shadow steps before its deltas span L plain steps
            do_check = c.infeas_due & (c.dy_age >= c.inf_win + 1)
            c = c._replace(infeas_due=c.infeas_due | set_due)
            c = lax.cond(do_check, check_infeasibility, lambda c: c, c)

        return c

    def cond(c: LoopCarry):
        # `| c.redo`: a safeguard-declined step always gets its plain-ADMM
        # replay before the loop can exit, so the returned iterate is never
        # the rejected accelerated candidate (at most one extra pass — the
        # replay itself clears the flag and cannot re-set it)
        return (c.status == results.UNDETERMINED) & (
            (c.iter + c.sg_iter < dyn.max_iter) | c.redo
        )

    c = lax.while_loop(cond, body, carry0)

    # ------------------------------------------------------------------
    # post-processing (solver.jl:167-201)
    # ------------------------------------------------------------------
    mu_final = recover_mu(c.w_prev, c.s, c.rho_vec)
    x_final = x_from_block(c.w_prev[:nx])

    def finalize_maxiter(c: LoopCarry) -> LoopCarry:
        info = _result_info_rt(c, x_final, c.s, mu_final)
        return c._replace(res=info, status=jnp.asarray(results.MAX_ITER_REACHED, jnp.int32))

    c = lax.cond(
        c.status == results.UNDETERMINED, finalize_maxiter, lambda c: c, c
    )

    # numerical guard (reference analog: inertia checks / cost-blowup abort,
    # SURVEY.md §5.2): a diverged or non-factorizable solve surfaces as
    # Unsolved instead of returning NaNs with a success status
    bad = ~(jnp.all(jnp.isfinite(x_final)) & jnp.all(jnp.isfinite(c.s)))
    keep = (c.status == results.PRIMAL_INFEASIBLE) | (
        c.status == results.DUAL_INFEASIBLE
    )
    c = c._replace(
        status=jnp.where(bad & ~keep, jnp.asarray(results.UNSOLVED, jnp.int32), c.status)
    )

    x_out, mu_out, s_out = scaling_ops.unscale_variables(x_final, mu_final, c.s, sm)
    y_out = -mu_out

    out = dict(
        x=x_out,
        y=y_out,
        s=s_out,
        cost=c.cost,
        status=c.status,
        iter=c.iter,
        safeguarding_iter=c.sg_iter,
        r_prim=c.res.r_prim,
        r_dual=c.res.r_dual,
        max_norm_prim=c.res.max_norm_prim,
        max_norm_dual=c.res.max_norm_dual,
        n_rho_adapt=c.n_rho_adapt,
        kkt_solver_iters=c.kkt_iters,
        rho_log=c.rho_log,
        n_accelerated=(c.aa.n_accelerated if static.accel_mem > 0 else jnp.zeros((), jnp.int32)),
    )
    if static.res_hist > 0:
        out["res_hist"] = c.hist
        out["res_hist_n"] = c.hist_n
    if return_carry:
        out["carry"] = c
        out["setup"] = setup_state
    return out


# jitted entry: cones is a pytree arg; static config is hashable
solve_jit = jax.jit(solve, static_argnames=("static", "return_carry"))


# scalar outputs packed into one device vector for the host fetch (each
# separate device->host transfer pays a full ~50-90 ms RTT through the axon
# tunnel; fetching the raw 17-leaf out dict measured ~1.5 s per solve)
_PACK_SCALARS = (
    "cost", "status", "iter", "safeguarding_iter", "r_prim", "r_dual",
    "max_norm_prim", "max_norm_dual", "n_rho_adapt", "kkt_solver_iters",
    "n_accelerated",
)
_PACK_INTS = frozenset((
    "status", "iter", "safeguarding_iter", "n_rho_adapt",
    "kkt_solver_iters", "n_accelerated", "res_hist_n",
))


@jax.jit
def _pack_for_host(out):
    dt = out["x"].dtype
    parts = [out["x"], out["y"], out["s"], out["rho_log"].astype(dt),
             jnp.stack([jnp.asarray(out[k]).astype(dt)
                        for k in _PACK_SCALARS])]
    if "res_hist" in out:
        parts.append(out["res_hist"].reshape(-1))
        parts.append(out["res_hist_n"].astype(dt)[None])
    return jnp.concatenate(parts)


def fetch_out(out) -> dict:
    """Move a solve's output dict to host NumPy with ONE device transfer.

    All int-valued entries round-trip exactly through the float packing
    (iteration and status counts stay far below 2^24). The packing dispatch
    plus the single fetch cost two tunnel RTTs instead of one per leaf.
    """
    import numpy as np

    n = out["x"].shape[0]
    m = out["y"].shape[0]
    flat = np.asarray(_pack_for_host(out))
    res = {}
    o = 0
    for key, ln in (("x", n), ("y", m), ("s", m),
                    ("rho_log", out["rho_log"].shape[0])):
        res[key] = flat[o:o + ln]
        o += ln
    for key in _PACK_SCALARS:
        res[key] = flat[o]
        o += 1
    if "res_hist" in out:
        H = out["res_hist"].shape[0]
        res["res_hist"] = flat[o:o + 6 * H].reshape(H, 6)
        o += 6 * H
        res["res_hist_n"] = flat[o]
        o += 1
    for key in _PACK_INTS:
        if key in res:
            res[key] = np.int64(np.rint(res[key]))
    return res


def solve_chunked(P, A, q, b, cones, x0, s0, mu0, dyn, static,
                  chunk: int = 0, kkt_precond=None, kkt_block=None,
                  rho_row_scale=None):
    """Chunked direct-solver entry: identical trajectory to one
    :func:`solve_jit` call, but no single device dispatch runs more than
    ``chunk`` iterations — the loop re-enters the SAME compiled program
    through the full resumable carry between dispatches (one host RTT per
    chunk, no recompile since ``max_iter`` is a device scalar).

    This is the safety the Model layer already has
    (``Settings.dispatch_chunk``), exposed at the lowest public layer:
    the axon TPU relay's worker reliably dies on multi-thousand-iteration
    single dispatches of ANY program, and direct ``solve_jit`` callers with
    large ``max_iter`` were exposed. ``chunk=0`` resolves automatically
    (2000 on the axon relay, unchunked elsewhere); ``chunk=-1`` never
    chunks.
    """
    import numpy as np

    if chunk == 0:
        from .settings import _is_axon_backend

        chunk = 2000 if _is_axon_backend() else -1
    max_iter = int(np.asarray(dyn.max_iter))
    if chunk <= 0 or max_iter <= chunk:
        return solve_jit(P, A, q, b, cones, x0, s0, mu0, dyn, static=static,
                         kkt_precond=kkt_precond, kkt_block=kkt_block,
                         rho_row_scale=rho_row_scale)
    carry = None
    setup = None
    limit = 0
    while True:
        limit = min(limit + chunk, max_iter)
        out = dict(solve_jit(
            P, A, q, b, cones, x0, s0, mu0,
            dyn._replace(max_iter=np.asarray(limit, np.int32)),
            static=static, carry_in=carry, return_carry=True,
            kkt_precond=kkt_precond, kkt_block=kkt_block,
            rho_row_scale=rho_row_scale, setup_in=setup,
        ))
        carry = out.pop("carry")
        setup = out.pop("setup")
        if int(out["status"]) != results.MAX_ITER_REACHED or limit >= max_iter:
            return out
