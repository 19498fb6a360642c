"""Residuals, convergence and cost (reference: src/residuals.jl).

All reductions stay on device and fuse into the jitted loop; when the
problem is sharded over a mesh, these inf-norms become the psum/pmax
collectives of the SPMD program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .linops import matvec, rmatvec


class ResInfo(NamedTuple):
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    max_norm_prim: jnp.ndarray
    max_norm_dual: jnp.ndarray


def _inf(v):
    return jnp.max(jnp.abs(v)) if v.shape[0] > 0 else jnp.zeros((), v.dtype)


def calculate_residuals(P, A, q, b, x, s, mu, sm, ignore_scaling: bool = False):
    """||E^-1 (Ax + s - b)||_inf and ||c^-1 D^-1 (Px + q - A'mu)||_inf
    (reference: residuals.jl:30-53)."""
    r_prim = matvec(A, x) + s - b
    r_dual = matvec(P, x) + q - rmatvec(A, mu)
    if not ignore_scaling:
        r_prim = sm.Einv * r_prim
        r_dual = sm.cinv * (sm.Dinv * r_dual)
    return _inf(r_prim), _inf(r_dual)


def max_res_component_norm(P, A, q, b, x, s, mu, sm, ignore_scaling: bool = False):
    """Denominators of the relative convergence criterion
    (reference: residuals.jl:56-96)."""
    if ignore_scaling:
        e = d = 1.0
        ci = 1.0
    else:
        e, d, ci = sm.Einv, sm.Dinv, sm.cinv
    mp = jnp.maximum(_inf(e * matvec(A, x)), jnp.maximum(_inf(e * s), _inf(e * b)))
    md = jnp.maximum(
        _inf(ci * (d * matvec(P, x))),
        jnp.maximum(_inf(ci * (d * q)), _inf(ci * (d * rmatvec(A, mu)))),
    )
    return mp, md


def result_info(P, A, q, b, x, s, mu, sm) -> ResInfo:
    rp, rd = calculate_residuals(P, A, q, b, x, s, mu, sm)
    mp, md = max_res_component_norm(P, A, q, b, x, s, mu, sm)
    return ResInfo(rp, rd, mp, md)


def has_converged(info: ResInfo, eps_abs, eps_rel):
    """residual < eps_abs + eps_rel * max_norm for both (residuals.jl:98-117)."""
    prim_ok = info.r_prim < eps_abs + eps_rel * info.max_norm_prim
    dual_ok = info.r_dual < eps_abs + eps_rel * info.max_norm_dual
    return prim_ok & dual_ok


def calculate_cost(P, q, x, cinv):
    """cost = cinv (0.5 x'Px + q'x) on scaled data (residuals.jl:143-147)."""
    return cinv * (0.5 * jnp.dot(x, matvec(P, x)) + jnp.dot(q, x))
