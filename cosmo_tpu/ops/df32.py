"""Compensated (double-word) float arithmetic for accuracy-critical paths.

TPUs have no float64 ALUs, but the conic ADMM iteration must reach 1e-5
residuals in float32 — and the attainable accuracy of the x-update is
bounded by the *forward* error of the KKT solve, ~ kappa(M) * eps.  With
kappa around 1e4 (rho_eq = 1e3 * rho equality weighting) that is a 1e-3
floor: measured on the min-eigenvalue SDP, a plain f32 solve stalls at
5e-4 forever while the identical iteration with an accurate KKT solve
converges in 75 iterations (see tests/test_refinement.py).

The cure is classical mixed-precision iterative refinement, with the high
precision emulated by error-free transformations (Dekker/Knuth two_sum /
two_prod — "double-float" arithmetic, the same device-level trick XLA uses
to build f32 matmuls out of bf16 passes): the KKT residual is computed
against the *exact* problem data (P, A, sigma, rho — never against the
rounded assembled matrix M) carrying a (hi, lo) compensation term through
every product and reduction, giving residuals accurate to ~eps^2.  A
refinement step against such a residual drops the solve's forward error to
the f32 representation floor, which the ADMM fixed-point contraction then
tolerates like any input rounding.

Everything here is branch-free elementwise/reduction work (VPU-friendly,
jit/vmap/shard-compatible); the pair reductions use explicit pairwise trees
so the compensation survives XLA's reduction lowering.

No reference equivalent (the reference runs LAPACK in native f64,
SURVEY.md L0); this module is what makes f32-on-TPU match it.
"""
from __future__ import annotations

import jax.numpy as jnp

from .linops import Bde, Coo

# Dekker splitting constant for binary32 (24-bit significand): 2^12 + 1.
_SPLIT_F32 = 4097.0
# for binary64 (53-bit significand): 2^27 + 1 (used when the pipeline runs
# in f64 on CPU so the same code path stays exact-ish there too)
_SPLIT_F64 = 134217729.0


def _split_const(dtype):
    return _SPLIT_F32 if jnp.dtype(dtype) == jnp.float32 else _SPLIT_F64


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker split; no FMA assumed)."""
    p = a * b
    c = jnp.asarray(_split_const(p.dtype), p.dtype)
    a1 = c * a
    ah = a1 - (a1 - a)
    al = a - ah
    b1 = c * b
    bh = b1 - (b1 - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """(hi, lo) + (hi, lo) -> (hi, lo)."""
    s, e = two_sum(x[0], y[0])
    return s, e + x[1] + y[1]


def scale(r, x):
    """elementwise r * (hi, lo) with an f32 vector r."""
    p, e = two_prod(r, x[0])
    return p, e + r * x[1]


def to_f32(x):
    """Collapse a pair to its closest single float."""
    return x[0] + x[1]


def _pairwise_sum(p, e, axis):
    """Compensated reduction along ``axis``: explicit pairwise two_sum tree
    so the error channel captures every rounding the reduction makes."""
    p = jnp.moveaxis(p, axis, -1)
    e = jnp.moveaxis(e, axis, -1)
    n = p.shape[-1]
    if n == 0:
        return jnp.zeros(p.shape[:-1], p.dtype), jnp.zeros(p.shape[:-1], p.dtype)
    # pad to a power of two with exact zeros
    m = 1 << max(0, (n - 1).bit_length())
    if m != n:
        pad = [(0, 0)] * (p.ndim - 1) + [(0, m - n)]
        p = jnp.pad(p, pad)
        e = jnp.pad(e, pad)
    while p.shape[-1] > 1:
        h = p.shape[-1] // 2
        s, err = two_sum(p[..., :h], p[..., h:])
        p = s
        e = e[..., :h] + e[..., h:] + err
    return p[..., 0], e[..., 0]


def dot2(a, b):
    """Compensated dot(a, b) -> (hi, lo)."""
    p, e = two_prod(a, b)
    return _pairwise_sum(p, e, axis=-1)


# ----------------------------------------------------------------------
# Matvecs against the exact stored problem data
# ----------------------------------------------------------------------

def _segment_sum_df32(p, e, ptr, width: int):
    """Compensated sorted-segment sum via a static-shape ELL gather.

    ``ptr`` is the CSR-style [num_segments+1] pointer into the sorted
    triplet arrays and ``width`` the static maximum segment length: each
    segment's entries are gathered into a [num_segments, width] tile (out-of
    -range lanes contribute exact zeros) and reduced with the pairwise
    two_sum tree — every rounding lands in the error channel, with no scan
    over nnz (large-nnz ``associative_scan`` triggered TPU kernel faults)
    and no data-dependent shapes.
    """
    num_segments = ptr.shape[0] - 1
    if width == 0 or p.shape[0] == 0:
        z = jnp.zeros(num_segments, p.dtype)
        return z, z
    starts = ptr[:-1]
    lens = ptr[1:] - starts
    lane = jnp.arange(width, dtype=starts.dtype)
    idx = starts[:, None] + lane[None, :]
    valid = lane[None, :] < lens[:, None]
    idx = jnp.clip(idx, 0, p.shape[0] - 1)
    pe = jnp.where(valid, p[idx], 0.0)
    ee = jnp.where(valid, e[idx], 0.0)
    return _pairwise_sum(pe, ee, axis=1)


def matvec2(A, x_pair):
    """Compensated A @ x for dense or Coo A and a (hi, lo) input pair.
    Returns (hi, lo)."""
    xh, xl = x_pair
    if isinstance(A, Coo):
        p, e = two_prod(A.vals, xh[A.cols])
        e = e + A.vals * xl[A.cols]
        return _segment_sum_df32(p, e, A.row_ptr, A.max_row_nnz)
    if isinstance(A, Bde):
        from .linops import _ext0

        xg = _ext0(xh)[A.cols][:, None, :]          # [G, 1, cmax]
        p, e = two_prod(A.vals, xg)
        e = e + A.vals * _ext0(xl)[A.cols][:, None, :]
        hi, lo = _pairwise_sum(p, e, axis=2)        # [G, rb] pairs
        return hi.reshape(A.m), lo.reshape(A.m)
    p, e = two_prod(A, xh[None, :])
    e = e + A * xl[None, :]
    return _pairwise_sum(p, e, axis=1)


def rmatvec2(A, y_pair):
    """Compensated A.T @ y for dense or Coo A and a (hi, lo) input pair."""
    yh, yl = y_pair
    if isinstance(A, Coo):
        p, e = two_prod(A.cvals, yh[A.crows])
        e = e + A.cvals * yl[A.crows]
        return _segment_sum_df32(p, e, A.col_ptr, A.max_col_nnz)
    if isinstance(A, Bde):
        # per-group compensated row reductions, then a compensated sorted
        # segment sum over the column-sorted (group, lane) entries
        p, e = two_prod(A.vals, yh.reshape(A.G, A.rb, 1))
        e = e + A.vals * yl.reshape(A.G, A.rb, 1)
        hi, lo = _pairwise_sum(
            jnp.swapaxes(p, 1, 2), jnp.swapaxes(e, 1, 2), axis=2
        )                                            # [G, cmax] pairs
        ph = hi.reshape(-1)[A.csort_perm]
        pl = lo.reshape(-1)[A.csort_perm]
        sh, sl = _segment_sum_df32(ph, pl, A.col_ptr, A.max_col_nnz)
        return sh[: A.n], sl[: A.n]
    p, e = two_prod(A.T, yh[None, :])
    e = e + A.T * yl[None, :]
    return _pairwise_sum(p, e, axis=1)


def promote(x):
    """Lift an f32 vector to a (hi, 0) pair."""
    return x, jnp.zeros_like(x)


def kkt_matvec2(P, A, sigma, rho_vec, x):
    """Compensated reduced-KKT matvec (P + sigma I + A' diag(rho) A) @ x
    against the exact stored P / A / rho (the rounded assembled M is never
    formed). ``x`` is a plain f32 vector; returns (hi, lo)."""
    return kkt_matvec2_pair(P, A, sigma, rho_vec, promote(x))


def kkt_matvec2_pair(P, A, sigma, rho_vec, x_pair):
    """As :func:`kkt_matvec2` but for a (hi, lo) input pair — lets iterative
    refinement keep its accumulated solution in double-f32, so the residual
    it measures is not floored by the f32 representation of x."""
    ax = matvec2(A, x_pair)
    rax = scale(rho_vec, ax)
    atrax = rmatvec2(A, rax)
    px = matvec2(P, x_pair)
    p, e = two_prod(sigma, x_pair[0])
    sx = (p, e + sigma * x_pair[1])
    return add(add(px, sx), atrax)


def kkt_rhs2(A, rho_vec, r1, r2):
    """Compensated t = r1 + A' (rho .* r2) -> (hi, lo)."""
    rr2 = scale(rho_vec, promote(r2))
    t = rmatvec2(A, rr2)
    return add(promote(r1), t)


def kkt_residual(P, A, sigma, rho_vec, t_pair, x):
    """Compensated residual t - M x of the reduced KKT system, collapsed to
    f32 (the residual is small, so the pair collapse loses nothing)."""
    mx = kkt_matvec2(P, A, sigma, rho_vec, x)
    return to_f32(add(t_pair, (-mx[0], -mx[1])))


def kkt_residual_pair(P, A, sigma, rho_vec, t_pair, x_pair):
    """Compensated residual t - M x for a pair-valued x, collapsed to f32."""
    mx = kkt_matvec2_pair(P, A, sigma, rho_vec, x_pair)
    return to_f32(add(t_pair, (-mx[0], -mx[1])))
