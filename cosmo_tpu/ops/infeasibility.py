"""Infeasibility certificates (Banjac et al.), reference: src/infeasibility.jl.

Both checks are pure device reductions over the iterate differences
accumulated in the loop carry (reference: solver.jl:145-148, :326-348).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import projections
from .conedata import ConeData
from .linops import matvec, rmatvec


def is_primal_infeasible_multi(dy, P, A, b, cones: ConeData, sm, tols):
    """delta_y certificate (reference: infeasibility.jl:1-29), evaluated at
    every tolerance in ``tols`` from one pass over the expensive reductions
    (the strict certificate and its loose escalation gate share the batched
    PSD eigendecompositions).

    The batched-eig support-function pass runs under a ``lax.cond`` gated
    on the cheap scalar preconditions (norm_dy, A'dy): each certificate
    CONJOINS them, so when they fail at every tolerance the eig battery
    cannot change the result — and on a converging trajectory they fail at
    essentially every check (A'dy ~ 0 relative to |dy| only holds near a
    genuine certificate ray). Measured: the full certificate machinery cost
    8.9% of north-star-10k throughput, almost all of it this battery."""
    norm_dy = jnp.max(jnp.abs(sm.E * dy))
    min_tol = tols[0]
    for t in tols[1:]:
        min_tol = jnp.minimum(min_tol, t)   # tols may be traced scalars
    safe_norm = jnp.where(norm_dy > min_tol, norm_dy, 1.0)
    A_dy_max = jnp.max(jnp.abs(sm.Dinv * rmatvec(A, dy)))

    dy_unit = dy * (-1.0 / safe_norm)
    dyt_b = jnp.dot(dy_unit, b)

    gate = jnp.asarray(False)
    for tol in tols:
        gate |= (norm_dy > tol) & (A_dy_max <= tol * norm_dy)
    inf = jnp.asarray(jnp.inf, dy.dtype)
    sFs = lax.cond(
        gate,
        lambda _: projections.support_function_multi(dy_unit, cones, tols),
        lambda _: tuple(inf for _ in tols),
        None,
    )

    return tuple(
        (norm_dy > tol) & (A_dy_max <= tol * norm_dy) & (sF - dyt_b <= tol)
        for tol, sF in zip(tols, sFs)
    )


def is_primal_infeasible(dy, P, A, b, cones: ConeData, sm, eps_prim_inf):
    """delta_y certificate (reference: infeasibility.jl:1-29)."""
    return is_primal_infeasible_multi(
        dy, P, A, b, cones, sm, (eps_prim_inf,)
    )[0]


def is_dual_infeasible_multi(dx, P, A, q, cones: ConeData, sm, tols):
    """delta_x certificate (reference: infeasibility.jl:32-68), multi-tol
    (see :func:`is_primal_infeasible_multi`)."""
    norm_dx = jnp.max(jnp.abs(sm.D * dx))
    min_tol = tols[0]
    for t in tols[1:]:
        min_tol = jnp.minimum(min_tol, t)   # tols may be traced scalars
    safe_norm = jnp.where(norm_dx > min_tol, norm_dx, 1.0)

    qt_dx = jnp.dot(q, dx) / (safe_norm * sm.c)
    P_dx_max = jnp.max(jnp.abs(sm.Dinv * matvec(P, dx))) / (safe_norm * sm.c)

    A_dx = (sm.Einv * matvec(A, dx)) / safe_norm
    # recession-cone eig battery gated on the cheap scalar preconditions —
    # see is_primal_infeasible_multi (identical conjunction argument)
    gate = jnp.asarray(False)
    for tol in tols:
        gate |= (norm_dx > tol) & (qt_dx < -tol) & (P_dx_max <= tol)
    cond_Ks = lax.cond(
        gate,
        lambda _: projections.in_pol_recc_multi(A_dx, cones, tols),
        lambda _: tuple(jnp.asarray(False) for _ in tols),
        None,
    )

    return tuple(
        (norm_dx > tol) & (qt_dx < -tol) & (P_dx_max <= tol) & cond_K
        for tol, cond_K in zip(tols, cond_Ks)
    )


def is_dual_infeasible(dx, P, A, q, cones: ConeData, sm, eps_dual_inf):
    """delta_x certificate (reference: infeasibility.jl:32-68)."""
    return is_dual_infeasible_multi(dx, P, A, q, cones, sm, (eps_dual_inf,))[0]
