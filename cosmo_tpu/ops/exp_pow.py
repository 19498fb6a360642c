"""Vectorized exponential- and power-cone projections.

The reference projects these cones one scalar vector at a time with Python
loops (src/convexset.jl:497-618 for K_exp — an SCS-derived dual bisection
with an inner Newton solve — and :626-742 for K_pow, Newton on the Hien
(2015) optimality condition).  Here each family is a single batched kernel:
``vmap`` over the cone instances with ``lax.while_loop``/``fori_loop`` inner
iterations, so all cones of a family project in lockstep on the VPU.

Dual cones use the Moreau identity Pi_{K*}(v) = v + Pi_K(-v)
(reference: src/convexset.jl:784-789).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


# ----------------------------------------------------------------------
# Exponential cone
# ----------------------------------------------------------------------

def _exp_safe(t):
    # exp with clipped argument to avoid inf/NaN poisoning inactive lanes
    return jnp.exp(jnp.clip(t, -708.0, 708.0))


def exp_in_cone(v, tol):
    """(x,y,z) in K_exp (reference: convexset.jl:602-607)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    ys = jnp.where(y > 0, y, 1.0)
    interior = (y > 0) & (y * _exp_safe(x / ys) <= z + tol)
    boundary = (x <= tol) & (y == 0.0) & (z >= -tol)
    return interior | boundary


def exp_in_dual(v, tol):
    """(x,y,z) in K_exp^* (reference: convexset.jl:609-614)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    xs = jnp.where(x < 0, x, -1.0)
    c1 = (x < 0) & (-x * _exp_safe(y / xs) - jnp.e * z <= tol)
    c2 = (jnp.abs(x) <= tol) & (y >= -tol) & (z >= -tol)
    return c1 | c2


def _find_min_t(lam, s0, t0, tol, max_newton=150):
    """Inner Newton for t* given lambda (reference: convexset.jl:582-600)."""
    dt0 = jnp.maximum(-t0, tol)

    def cond(st):
        k, dt, done = st
        return (~done) & (k < max_newton)

    def body(st):
        k, dt, done = st
        dts = jnp.maximum(dt, 1e-300)
        f = dt * (dt + t0) / lam**2 - s0 / lam + jnp.log(dts / lam) + 1.0
        gf = (2.0 * dt + t0) / lam**2 + 1.0 / dts
        dtn = dt - f / gf
        hit_low = dtn <= -t0
        hit_zero = dtn <= 0.0
        conv = jnp.abs(f) < tol
        dtn = jnp.where(hit_low, -t0, jnp.where(hit_zero, 0.0, dtn))
        return k + 1, dtn, done | hit_low | hit_zero | conv

    _, dt, _ = lax.while_loop(cond, body, (0, dt0, False))
    return dt + t0


def _exp_grad_dual(lam, v0, tol):
    """g(lambda) and the associated minimizers (reference: convexset.jl:565-577)."""
    r0, s0, t0 = v0[0], v0[1], v0[2]
    t = _find_min_t(lam, s0, t0, tol)
    s = (t - t0) * t / lam
    r = r0 - lam
    ts = jnp.maximum(t, 1e-300)
    ss = jnp.maximum(s, 1e-300)
    g = jnp.where(s == 0.0, r, r + s * jnp.log(ss / ts))
    return g, jnp.stack([r, s, t])


def _project_exp_case4(v0, tol, max_iter):
    """Bisection on the dual variable lambda (reference: convexset.jl:539-563)."""

    # exponential search for the upper bound (get_bisection_bounds)
    def bcond(st):
        k, l, lam, g = st
        return (g > 0) & (k < 90)

    def bbody(st):
        k, l, lam, g = st
        l_new = lam
        lam_new = lam * 2.0
        g_new, _ = _exp_grad_dual(lam_new, v0, tol)
        return k + 1, l_new, lam_new, g_new

    g0, _ = _exp_grad_dual(0.125, v0, tol)
    _, l, u, _ = lax.while_loop(bcond, bbody, (0, 0.0, 0.125, g0))

    def cond(st):
        k, l, u, sol = st
        return (u - l >= tol) & (k < max_iter)

    def body(st):
        k, l, u, sol = st
        lam = (u + l) / 2.0
        g, s = _exp_grad_dual(lam, v0, tol)
        l = jnp.where(g > 0, lam, l)
        u = jnp.where(g > 0, u, lam)
        return k + 1, l, u, s

    # the reference loop always evaluates at least once and breaks *after*
    # updating (convexset.jl:544-549)
    st = body((0, l, u, jnp.zeros(3, v0.dtype)))
    _, _, _, sol = lax.while_loop(cond, body, st)
    return sol


def _project_exp_one(v, tol, max_iter=100):
    """Project a single vector onto K_exp (reference: convexset.jl:510-534)."""
    case1 = exp_in_cone(v, 0.0)
    case2 = exp_in_dual(-v, 0.0)
    case3 = (v[0] < 0) & (v[1] < 0)
    v3 = jnp.stack([v[0], 0.0 * v[1], jnp.maximum(v[2], 0.0)])
    v4 = _project_exp_case4(v, tol, max_iter)
    out = jnp.where(case1, v, jnp.where(case2, jnp.zeros_like(v), jnp.where(case3, v3, v4)))
    return out


def project_exp(V, is_dual, tol=None, max_iter: int = 100):
    """Project rows of V [N,3] onto K_exp (or K_exp^* where is_dual).
    ``tol`` may be a per-row array (per-cone tolerances, reference:
    ExponentialCone MAX_ITERS/EXP_TOL fields, convexset.jl:497-505)."""
    if V.shape[0] == 0:
        return V
    if tol is None:
        tol = jnp.full(V.shape[0], 1e-8, V.dtype)
    U = jnp.where(is_dual[:, None], -V, V)
    P = jax.vmap(partial(_project_exp_one, max_iter=max_iter))(U, tol)
    return jnp.where(is_dual[:, None], V + P, P)


# ----------------------------------------------------------------------
# Power cone
# ----------------------------------------------------------------------

def pow_in_cone(v, alpha, tol):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    xp = jnp.maximum(x, 0.0)
    yp = jnp.maximum(y, 0.0)
    return (x >= 0) & (y >= 0) & (xp**alpha * yp ** (1 - alpha) >= jnp.abs(z) - tol)


def pow_in_dual(v, alpha, tol):
    """K_pow^* membership (reference: convexset.jl:732-738)."""
    s, t, w = v[..., 0], v[..., 1], v[..., 2]
    sp = jnp.maximum(s, 0.0)
    tp = jnp.maximum(t, 0.0)
    lhs = sp**alpha * tp ** (1 - alpha)
    rhs = jnp.abs(w) * alpha**alpha * (1 - alpha) ** (1 - alpha) - tol
    return (s >= -tol) & (t >= -tol) & (lhs >= rhs)


def _phic(x0, z0, r, a):
    return jnp.maximum(0.5 * (x0 + jnp.sqrt(x0**2 + 4.0 * a * r * (jnp.abs(z0) - r))), 1e-10)


def _project_pow_case4(v, alpha, tol, max_iter):
    """Newton iteration for r (reference: convexset.jl:676-704)."""
    x0, y0, z0 = v[0], v[1], v[2]
    az0 = jnp.abs(z0)
    r0 = az0 / 2.0

    def body(st):
        k, r, px, py, done = st
        px = _phic(x0, z0, r, alpha)
        py = _phic(y0, z0, r, 1.0 - alpha)
        phi = px**alpha * py ** (1.0 - alpha) - r
        conv = jnp.abs(phi) < tol
        dpx = alpha / (2.0 * px - x0) * (az0 - 2.0 * r)
        dpy = (1.0 - alpha) / (2.0 * py - y0) * (az0 - 2.0 * r)
        dphi = px**alpha * py ** (1.0 - alpha) * (alpha * dpx / px + (1.0 - alpha) * dpy / py) - 1.0
        r_new = jnp.clip(r - phi / dphi, 0.0, az0)
        r_new = jnp.where(conv | done, r, r_new)
        return k + 1, r_new, px, py, done | conv

    def cond(st):
        k, r, px, py, done = st
        return (~done) & (k < max_iter)

    _, r, px, py, _ = lax.while_loop(
        cond, body, (0, r0, jnp.zeros_like(r0), jnp.zeros_like(r0), False)
    )
    # one more phi evaluation so (px, py) correspond to the final r
    px = _phic(x0, z0, r, alpha)
    py = _phic(y0, z0, r, 1.0 - alpha)
    z_out = z0 * r / jnp.maximum(az0, 1e-300)
    return jnp.stack([px, py, z_out])


def _project_pow_one(v, alpha, tol, max_iter=20):
    case1 = pow_in_cone(v, alpha, 0.0)
    case2 = pow_in_dual(-v, alpha, 0.0)
    case3 = jnp.abs(v[2]) <= tol
    v3 = jnp.stack([jnp.maximum(v[0], 0.0), jnp.maximum(v[1], 0.0), v[2]])
    v4 = _project_pow_case4(v, alpha, tol, max_iter)
    return jnp.where(case1, v, jnp.where(case2, jnp.zeros_like(v), jnp.where(case3, v3, v4)))


def project_pow(V, alpha, is_dual, tol=None, max_iter: int = 20):
    """Project rows of V [N,3] onto K_pow(alpha) (or its dual where is_dual).
    ``tol`` may be a per-row array (reference: PowerCone fields,
    convexset.jl:626-640)."""
    if V.shape[0] == 0:
        return V
    if tol is None:
        tol = jnp.full(V.shape[0], 1e-8, V.dtype)
    U = jnp.where(is_dual[:, None], -V, V)
    P = jax.vmap(partial(_project_pow_one, max_iter=max_iter))(U, alpha, tol)
    return jnp.where(is_dual[:, None], V + P, P)
