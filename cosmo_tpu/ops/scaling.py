"""Ruiz equilibration on device (reference: src/scaling.jl:21-116).

The reference mutates sparse CSC matrices in place on the CPU; here the
whole equilibration is a jitted ``lax.fori_loop`` over dense device arrays
(elementwise max-reductions and rank-1 scalings — pure VPU work, fused by
XLA).  Cone rectification (non-separable cones must be scaled by a scalar;
reference: src/scaling.jl:129-142, convexset.jl:953-958) uses a segment-mean
over the precomputed cone-row segments.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import linops
from .conedata import ConeData


class ScaleMats(NamedTuple):
    """Diagonal scaling state (reference ScaleMatrices, src/types.jl)."""

    D: jnp.ndarray      # [n]
    E: jnp.ndarray      # [m]
    c: jnp.ndarray      # scalar cost scaling
    Dinv: jnp.ndarray
    Einv: jnp.ndarray
    cinv: jnp.ndarray


def identity_scale(m: int, n: int, dtype) -> ScaleMats:
    one = jnp.ones((), dtype)
    return ScaleMats(
        D=jnp.ones(n, dtype), E=jnp.ones(m, dtype), c=one,
        Dinv=jnp.ones(n, dtype), Einv=jnp.ones(m, dtype), cinv=one,
    )


def _limit_scaling(s, dyn):
    """clip(s, MIN_SCALING, MAX_SCALING, min_new=1) — values below MIN map to
    1 so zero norms don't blow up (reference: scaling.jl:10-18, algebra.jl:5-7)."""
    return jnp.where(s < dyn.min_scaling, 1.0, jnp.minimum(s, dyn.max_scaling))


def ruiz_scale(P, A, q, b, cones: ConeData, iters: int, dyn):
    """Equilibrate (P, q, A, b); returns scaled data, scaled cone bounds and
    the ScaleMats. One jitted fori_loop, no host round trips."""
    n = q.shape[0]
    m = b.shape[0]
    dtype = q.dtype

    def body(_, carry):
        P, A, q, b, D, E, c = carry
        # KKT column norms (reference: scaling.jl:3-8)
        d_norm = jnp.maximum(linops.colmax_abs(P), linops.colmax_abs(A))
        e_norm = linops.rowmax_abs(A)
        dw = 1.0 / jnp.sqrt(_limit_scaling(d_norm, dyn))
        ew = 1.0 / jnp.sqrt(_limit_scaling(e_norm, dyn))

        P = linops.scale_rows_cols(P, dw, dw)
        A = linops.scale_rows_cols(A, ew, dw)
        q = dw * q
        b = ew * b
        D = D * dw
        E = E * ew

        # cost scaling (reference: scaling.jl:66-83)
        mean_col_norm_P = jnp.mean(linops.colmax_abs(P))
        inf_norm_q = jnp.max(jnp.abs(q)) if n > 0 else jnp.zeros((), dtype)
        do_cost = (mean_col_norm_P != 0.0) & (inf_norm_q != 0.0)
        scale_cost = _limit_scaling(
            jnp.maximum(_limit_scaling(inf_norm_q, dyn), mean_col_norm_P), dyn
        )
        ctmp = jnp.where(do_cost, 1.0 / scale_cost, 1.0)
        P = linops.scale_all(P, ctmp)
        q = q * ctmp
        c = c * ctmp
        return P, A, q, b, D, E, c

    init = (P, A, q, b, jnp.ones(n, dtype), jnp.ones(m, dtype), jnp.ones((), dtype))
    P, A, q, b, D, E, c = lax.fori_loop(0, iters, body, init)

    # --- rectify cones that only admit scalar scaling (scaling.jl:87-97) ---
    if cones.n_rect_segments > 0:
        nseg = cones.n_rect_segments + 1  # + dump segment
        seg_sum = jax.ops.segment_sum(jnp.where(cones.rect_mask, E, 0.0),
                                      cones.rect_seg, num_segments=nseg)
        seg_cnt = jax.ops.segment_sum(cones.rect_mask.astype(dtype),
                                      cones.rect_seg, num_segments=nseg)
        seg_mean = seg_sum / jnp.maximum(seg_cnt, 1.0)
        ework = jnp.where(cones.rect_mask, seg_mean[cones.rect_seg] / E, 1.0)
        A = linops.scale_rows(A, ework)
        b = ework * b
        E = E * ework

    # symmetrize P (reference: scaling.jl:99)
    P = linops.symmetrize(P)

    # scale the set bounds (Box rows; 0 and +/-inf rows are invariant)
    lb = cones.lb * E
    ub = cones.ub * E

    sm = ScaleMats(D=D, E=E, c=c, Dinv=1.0 / D, Einv=1.0 / E, cinv=1.0 / c)
    return P, A, q, b, lb, ub, sm


def scale_variables(x, mu, s, sm: ScaleMats):
    """Move warm-started variables into scaled space
    (reference: scaling.jl:118-123)."""
    return sm.Dinv * x, sm.c * (sm.Einv * mu), sm.E * s


def unscale_variables(x, mu, s, sm: ScaleMats):
    """reverse_scaling! (reference: scaling.jl:170-179)."""
    return sm.D * x, sm.cinv * (sm.E * mu), sm.Einv * s
