"""Safeguarded Anderson acceleration (Type-II, restarted memory).

Functional re-design of the reference's accelerator stack
(COSMOAccelerators.jl driven through src/accelerator_interface.jl): the
history ring buffers live in the jitted loop carry as fixed-size ``[mem, d]``
arrays, the update/accelerate/safeguard steps are pure functions, and the
small least-squares solve is a ``mem x mem`` normal-equation solve (mem=15 by
default) — negligible next to the KKT solve and fully on device.

Matches the reference default
``AndersonAccelerator{T, Type2{QRDecomp}, RestartedMemory, NoRegularizer}``
(src/settings.jl:136): Type-II multi-secant update with fully emptied
(restarted) memory, no explicit regularizer (we add a tiny diagonal jitter
for the normal equations; the reference achieves the same robustness via QR).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AccelState(NamedTuple):
    x_last: jnp.ndarray   # [d]
    g_last: jnp.ndarray   # [d]
    f_last: jnp.ndarray   # [d]  f = x - g at the last genuine ADMM step
    dF: jnp.ndarray       # [mem, d] residual differences
    dG: jnp.ndarray       # [mem, d] map-output differences
    count: jnp.ndarray    # int32: valid history pairs
    have_last: jnp.ndarray  # bool
    active: jnp.ndarray     # bool: activation reached
    success: jnp.ndarray    # bool: produced an accelerated candidate this iter
    n_accelerated: jnp.ndarray  # int32
    n_declined: jnp.ndarray     # int32 safeguard rejections
    # Stagnation toggle (no reference analog — f32 robustness): when the
    # termination checks see no residual progress for a while, flip the
    # accelerator's suspension state. In f32 the secant differences dF lose
    # all significant bits as the iterates converge (catastrophic
    # cancellation), so on some problems the accelerated candidates degrade
    # into noise the safeguard (growth-bounded, tol=2) keeps accepting —
    # measured: the decomposed banded-400 SDP stalls at rp~3e-4 with AA on
    # but follows the f64 trajectory (solved in ~1800 iters) with AA off.
    # On others (min-eig SDP, kappa~6e3) AA is what cuts through the plain
    # f32 floor, so suspension must not be permanent: a stall with AA off
    # re-enables it. Each regime gets retried; the converging one keeps
    # producing improvements and therefore keeps its state.
    disabled: jnp.ndarray       # bool: accelerator currently suspended
    stall_checks: jnp.ndarray   # int32 consecutive no-progress checks
    n_trips: jnp.ndarray        # int32 divergence strikes (never reset; 2 = dead)
    best_score: jnp.ndarray     # best normalized residual score seen
    # Divergence anchor for the safeguard (no reference analog — f32/TPU
    # robustness): smallest fixed-point residual norm ||f|| at any genuine
    # ADMM base point since the last restart. The reference safeguard only
    # bounds per-step growth (tol=2), so a run of noise-driven accelerated
    # steps that each pass the check can compound into full divergence
    # (measured: min-eig SDP with the polar/pallas projections on chip
    # walks from rp~1e-5 to rp~0.3 and never recovers). Candidates with
    # ||f_acc|| > safeguard_anchor * best_nrm_f are declined regardless.
    best_nrm_f: jnp.ndarray     # f dtype scalar


def init_accel(d: int, mem: int, dtype) -> AccelState:
    z = jnp.zeros(d, dtype)
    return AccelState(
        x_last=z,
        g_last=z,
        f_last=z,
        dF=jnp.zeros((mem, d), dtype),
        dG=jnp.zeros((mem, d), dtype),
        count=jnp.zeros((), jnp.int32),
        have_last=jnp.asarray(False),
        active=jnp.asarray(False),
        success=jnp.asarray(False),
        n_accelerated=jnp.zeros((), jnp.int32),
        n_declined=jnp.zeros((), jnp.int32),
        disabled=jnp.asarray(False),
        stall_checks=jnp.zeros((), jnp.int32),
        n_trips=jnp.zeros((), jnp.int32),
        best_score=jnp.asarray(jnp.inf, dtype),
        best_nrm_f=jnp.asarray(jnp.inf, dtype),
    )


def restart(aa: AccelState) -> AccelState:
    """Empty the history (reference: CA.restart! on rho adaptation,
    solver.jl:274)."""
    return aa._replace(
        count=jnp.zeros((), jnp.int32),
        have_last=jnp.asarray(False),
        success=jnp.asarray(False),
        # the anchor norm lives in the rho-scaled space — stale after a
        # rho adaptation re-expresses w
        best_nrm_f=jnp.asarray(jnp.inf, aa.best_nrm_f.dtype),
    )


def update(aa: AccelState, g, x, memory: str = "restarted",
           gate=None) -> AccelState:
    """Push the pair (x, g = T(x)) into the history (CA.update! semantics;
    f = x - g). ``memory``: "restarted" empties a full history and refills
    (reference RestartedMemory); "rolling" overwrites the oldest pair
    (RollingMemory).

    ``gate`` (traced bool or None): when given, a False gate makes the call
    an exact no-op by VALUE selection — the caller can then run update
    unconditionally instead of under a ``lax.cond``, whose taken branch
    copies every [mem, d] history buffer it writes in and out of the
    conditional (measured: +0.46 ms per 26 MB buffer per iteration on v5e;
    the scalar selects here are free)."""
    mem = aa.dF.shape[0]
    f = x - g

    if memory == "rolling":
        slot = jnp.mod(aa.count, mem)
        # saturating counter that keeps the write phase
        count_next = jnp.where(aa.count >= 2 * mem, mem + jnp.mod(aa.count, mem) + 1, aa.count + 1)
        full = jnp.asarray(False)
    else:
        # restarted memory: when full, empty completely and skip this
        # iteration's push — the following accelerate() then has no history
        # and the iteration runs plain ADMM, exactly the reference's
        # RestartedMemory cadence (one plain iteration per memory window).
        # Those plain windows are what let the deferred rho/infeasibility
        # updates run (solver.jl:284-292) and what settle the divergence
        # ray fast enough for certificate detection on infeasible problems
        # (measured: the random primal-infeasible cone battery detects in
        # ~300 iters with the plain windows vs ~17000 without).
        full = aa.count >= mem
        slot = jnp.where(full, 0, aa.count)
        count_next = slot + 1

    # Value-gated row write: the straightforward
    # ``where(push, dF.at[slot].set(row), dF)`` keeps BOTH the original
    # buffer and the written copy alive through the select, forcing XLA to
    # materialize ~3x the history size in HBM every iteration (measured
    # 2.5 ms/iter of AA overhead at the 10k north-star, where dF/dG are
    # 26 MB each). Selecting the VALUE and writing unconditionally keeps
    # the update in-place (one row read + one row write) and is bitwise
    # identical: the written row equals the old row when push is false.
    push = aa.have_last & ~full
    if gate is not None:
        push = push & gate
    # Sanitize the written rows: a non-finite secant (overflow episode on a
    # divergent trajectory) must never enter the history — once stored, it
    # poisons w_acc even after the row goes inactive (gamma is zeroed on
    # inactive rows but 0 * inf = NaN through the unmasked `gamma @ dG`),
    # silently suppressing acceleration until the slot is overwritten. A
    # zero row is the safe encoding: the Gram's rank test then fails and the
    # candidate is declined, exactly like the old masked-history behavior.
    df_new = f - aa.f_last
    dg_new = g - aa.g_last
    row_ok = jnp.all(jnp.isfinite(df_new)) & jnp.all(jnp.isfinite(dg_new))
    df_row = jnp.where(push & row_ok, df_new, jnp.where(push, 0.0, aa.dF[slot]))
    dg_row = jnp.where(push & row_ok, dg_new, jnp.where(push, 0.0, aa.dG[slot]))
    dF = aa.dF.at[slot].set(df_row)
    dG = aa.dG.at[slot].set(dg_row)
    count = jnp.where(
        push, count_next, jnp.where(aa.have_last & full, 0, aa.count)
    )
    if gate is not None:
        count = jnp.where(gate, count, aa.count)
        x = jnp.where(gate, x, aa.x_last)
        g = jnp.where(gate, g, aa.g_last)
        f = jnp.where(gate, f, aa.f_last)
        have_last = aa.have_last | gate
    else:
        have_last = jnp.asarray(True)

    return aa._replace(
        x_last=x, g_last=g, f_last=f, dF=dF, dG=dG, count=count,
        have_last=have_last,
    )


def accelerate(aa: AccelState, w, aa_type: str = "type2",
               regularizer: str = "none", gate=None):
    """Compute the accelerated candidate w_acc = g - dG' gamma.

    ``aa_type``:

    * ``"type2"`` — gamma = argmin ||f - dF' gamma|| via the normal
      equations on dF dF' (reference: Type2{NormalEquations});
    * ``"type2_qr"`` — the same least-squares via a QR factorization of
      dF' (reference default: Type2{QRDecomp}, settings.jl:136) — more
      robust when the secant matrix is ill-conditioned;
    * ``"type1"`` — Fang & Saad / Zhang-O'Donoghue-Boyd multisecant form:
      gamma solves (dX dF') gamma = dX f with dX = dG + dF.

    ``regularizer`` (normal-equation paths; reference: COSMOAccelerators'
    NoRegularizer / TikonovRegularizer / FrobeniusNormRegularizer):
    ``"none"`` adds only the tiny jitter that keeps the solve finite,
    ``"tikhonov"`` adds lambda*I with lambda = 1e-8 * ||G||_F,
    ``"frobenius"`` adds lambda*I with lambda = 1e-10 * ||dF||_F^2 (scales
    with the squared data norm).  The QR path ignores the regularizer, like
    the reference's QRDecomp variant.

    Returns (w_new, aa)."""
    mem = aa.dF.shape[0]
    dtype = w.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    rows = jnp.arange(mem)
    n_active = jnp.minimum(aa.count, mem)
    active_row = rows < n_active  # [mem]

    if aa_type == "type2_qr":
        # least squares via QR of dF' [d, mem]; inactive history rows are
        # zero columns -> zero R diagonal -> masked out of the solve
        Fm = jnp.where(active_row[:, None], aa.dF, 0.0)
        Q, R = jnp.linalg.qr(Fm.T, mode="reduced")   # Q [d, mem], R [mem, mem]
        rhs = Q.T @ aa.f_last
        diag = jnp.abs(jnp.diagonal(R))
        dmax = jnp.maximum(jnp.max(diag), 1e-30)
        good = diag > (eps * mem) * dmax
        R_safe = R + jnp.diag(jnp.where(good, 0.0, 1.0))
        import jax.scipy.linalg as jsl

        gamma = jsl.solve_triangular(
            R_safe, jnp.where(good, rhs, 0.0), lower=False
        )
        gamma = jnp.where(good, gamma, 0.0)
        # fail like the reference's QR solve: any degenerate *active* column
        well_cond = jnp.all(good | ~active_row)
    else:
        # mem x mem secant system; inactive rows get an identity diagonal
        # and zero rhs so their gamma is exactly 0.
        # Gram-level masking: zeroing history ROWS of dF/dG before the
        # products equals zeroing the corresponding rows/columns of the
        # [mem, mem] Gram and rhs entries — so the masks move off the
        # [mem, d] buffers (two ~26 MB materialized copies per iteration at
        # the 10k north-star scale) onto [mem, mem]/[mem] scalars. The Gram
        # values that survive the mask are the same dot products, bitwise.
        mask2 = active_row[:, None] & active_row[None, :]
        if aa_type == "type1":
            Xm = aa.dG + aa.dF                 # dX = dG + dF
            G_raw = jnp.where(mask2, Xm @ aa.dF.T, 0.0)
            rhs = jnp.where(active_row, Xm @ aa.f_last, 0.0)
        else:
            G_raw = jnp.where(mask2, aa.dF @ aa.dF.T, 0.0)
            rhs = jnp.where(active_row, aa.dF @ aa.f_last, 0.0)
        if regularizer == "tikhonov":
            lam = 1e-8 * jnp.linalg.norm(G_raw)
        elif regularizer == "frobenius":
            if aa_type == "type1":
                row_ss = jnp.einsum("md,md->m", aa.dF, aa.dF)
                lam = 1e-10 * jnp.sum(jnp.where(active_row, row_ss, 0.0))
            else:
                # sum of squares over active rows = trace of the masked Gram
                lam = 1e-10 * jnp.trace(G_raw)
        else:
            lam = 1e-13 * jnp.maximum(jnp.abs(jnp.trace(G_raw)), 1.0)
        diag_fix = jnp.where(active_row, lam, 1.0)
        G = G_raw + jnp.diag(diag_fix)
        gamma = jnp.linalg.solve(G, rhs)
        # Declare failure when the secant system is numerically rank
        # deficient — the reference's QR-based Type-II solve fails there
        # too, which is what lets deferred rho/infeasibility updates run on
        # such iterations. rank test: the count-th largest eigenvalue of the
        # *unregularized* Gram must clear eps * mem relative to the largest
        # (Gram ratios are squared conditioning of the secant matrix).
        sv = jnp.linalg.svd(G_raw, compute_uv=False)  # descending
        kth = sv[jnp.clip(n_active - 1, 0, mem - 1)]
        well_cond = kth > (eps * mem) * sv[0]

    # gamma is exactly 0 on inactive/degenerate rows (identity diagonal +
    # zero rhs in the normal-equation solve; the `good` mask in the QR
    # path), so the combination can read the UNMASKED history: inactive
    # rows contribute gamma_r * dG_r = 0 — no [mem, d] masked copy of dG.
    gamma = jnp.where(active_row, gamma, 0.0)
    w_acc = aa.g_last - gamma @ aa.dG
    ok = jnp.all(jnp.isfinite(w_acc)) & (aa.count > 0) & well_cond
    if gate is not None:
        # see update(): lets the caller run accelerate unconditionally —
        # a False gate discards the candidate exactly
        ok = ok & gate

    w_new = jnp.where(ok, w_acc, w)
    aa = aa._replace(
        success=ok,
        n_accelerated=aa.n_accelerated + ok.astype(jnp.int32),
    )
    return w_new.astype(dtype), aa
