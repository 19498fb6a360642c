"""Infeasibility certificates (Banjac et al.), reference: src/infeasibility.jl.

Both checks are pure device reductions over the iterate differences
accumulated in the loop carry (reference: solver.jl:145-148, :326-348).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import projections
from .conedata import ConeData
from .linops import matvec, rmatvec


def is_primal_infeasible(dy, P, A, b, cones: ConeData, sm, eps_prim_inf):
    """delta_y certificate (reference: infeasibility.jl:1-29)."""
    norm_dy = jnp.max(jnp.abs(sm.E * dy))
    big_enough = norm_dy > eps_prim_inf

    safe_norm = jnp.where(big_enough, norm_dy, 1.0)
    A_dy = sm.Dinv * rmatvec(A, dy)
    cond_At = jnp.max(jnp.abs(A_dy)) <= eps_prim_inf * norm_dy

    dy_unit = dy * (-1.0 / safe_norm)
    dyt_b = jnp.dot(dy_unit, b)
    sF = projections.support_function(dy_unit, cones, eps_prim_inf) - dyt_b

    return big_enough & cond_At & (sF <= eps_prim_inf)


def is_dual_infeasible(dx, P, A, q, cones: ConeData, sm, eps_dual_inf):
    """delta_x certificate (reference: infeasibility.jl:32-68)."""
    norm_dx = jnp.max(jnp.abs(sm.D * dx))
    big_enough = norm_dx > eps_dual_inf
    safe_norm = jnp.where(big_enough, norm_dx, 1.0)

    cond_q = jnp.dot(q, dx) / (safe_norm * sm.c) < -eps_dual_inf

    P_dx = sm.Dinv * matvec(P, dx)
    cond_P = jnp.max(jnp.abs(P_dx)) / (safe_norm * sm.c) <= eps_dual_inf

    A_dx = (sm.Einv * matvec(A, dx)) / safe_norm
    cond_K = projections.in_pol_recc(A_dx, cones, eps_dual_inf)

    return big_enough & cond_q & cond_P & cond_K
