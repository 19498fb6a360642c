"""Pallas TPU kernel: batched parallel-Jacobi PSD projection.

The XLA implementation of the same algorithm (ops/eigh.py) issues ~1k small
VPU ops per projection through HBM; at [512, 16, 16] that is ~2 ms, purely
latency-bound. This kernel keeps the whole stack (X and the rotation
accumulator V) resident in VMEM for the entire sweep loop:

* layout is transposed — X is [k, k, B] with the batch riding the 128-lane
  dimension, so rotations index *leading* axes (tile selects, no lane
  shuffles);
* the round-robin pair schedule is passed through SMEM and indexed with
  ``pl.ds`` inside a fori_loop, keeping the compiled body to a single
  rotation (a fully unrolled schedule blows up Mosaic compile time);
* a ROUND-PARALLEL variant (`_proj_kernel_rr`, COSMO_TPU_PALLAS_RR=1)
  applies each round's k/2 disjoint rotations (they commute exactly) as
  ~20 full-width [k, k, TB] vector ops, using the circle-method schedule
  (pairs at rows (2t, 2t+1), fixed static slot permutation between rounds)
  — measured slower than the serial chain at k=16 (754 vs 434 us/proj for
  [512, 16, 16] on v5e): the masked angle extraction + permute copies cost
  more than the op-count reduction saves. Kept for larger-k re-evaluation;
* output is the PSD projection V max(diag, 0) V' directly (fused).

Falls back to the jnp implementation on non-TPU backends.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .eigh import _round_robin_rounds


def _pairswap(M, axis: int):
    """Swap the two members of each adjacent pair along ``axis`` (size 2H)."""
    k = M.shape[axis]
    H = k // 2
    shp = M.shape[:axis] + (H, 2) + M.shape[axis + 1:]
    Mr = M.reshape(shp)
    idx0 = (slice(None),) * axis + (slice(None), 0)
    idx1 = (slice(None),) * axis + (slice(None), 1)
    return jnp.stack([Mr[idx1], Mr[idx0]], axis=axis + 1).reshape(M.shape)


def _slot_rotate(M, axis: int):
    """The circle-method slot rotation along ``axis``: slot layout
    [t0, b0, t1, b1, ...] with pairs (t_i, b_i) = (2i, 2i+1); the fixed
    permutation new_top = [t0, b0, t1..t_{H-2}], new_bot = [b1..b_{H-1},
    t_{H-1}] enumerates every pair over k-1 rounds and has period k-1
    (validated in tests against the eigh projection)."""
    k = M.shape[axis]
    H = k // 2
    shp = M.shape[:axis] + (H, 2) + M.shape[axis + 1:]
    Mr = M.reshape(shp)
    pre = (slice(None),) * axis
    top = Mr[pre + (slice(None), 0)]
    bot = Mr[pre + (slice(None), 1)]
    cat = lambda parts: jnp.concatenate(parts, axis=axis)
    sl = lambda a, b: pre + (slice(a, b),)
    new_top = cat([top[sl(0, 1)], bot[sl(0, 1)], top[sl(1, H - 1)]])
    new_bot = cat([bot[sl(1, H)], top[sl(H - 1, H)]])
    return jnp.stack([new_top, new_bot], axis=axis + 1).reshape(M.shape)


def _proj_kernel_rr(x_ref, out_ref, X_s, V_s, *, k: int, sweeps: int):
    """Round-parallel Jacobi: each round applies its k/2 disjoint rotations
    as full-width [k, k, TB] vector ops (the rotations commute exactly —
    disjoint index support), so the compiled body is ~20 large VPU ops
    instead of k/2 serial [1, 1, TB] slice updates. The pair schedule is
    the circle method with pairs always at rows (2t, 2t+1) and a fixed
    static slot rotation between rounds — no gathers, no SMEM schedule."""
    dtype = x_ref.dtype
    tiny = float(np.finfo(np.dtype(dtype)).tiny * 16)
    TB = x_ref.shape[2]
    H = k // 2

    X_s[:] = x_ref[:]
    V_s[:] = jnp.broadcast_to(jnp.eye(k, dtype=dtype)[:, :, None], (k, k, TB))

    ii = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    jj = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    eye = (ii == jj).astype(dtype)[:, :, None]
    # mask of the (2t, 2t+1) entries whose rotation each round computes
    modd = ((jj == ii + 1) & (ii % 2 == 0)).astype(dtype)[:, :, None]

    def round_body(_, carry):
        X = X_s[:]
        D = jnp.sum(X * eye, axis=1)                      # [k, TB] diagonal
        apq = jnp.sum(X * modd, axis=1).reshape(H, 2, TB)[:, 0]
        Dr = D.reshape(H, 2, TB)
        app, aqq = Dr[:, 0], Dr[:, 1]
        small = jnp.abs(apq) <= tiny
        safe_apq = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        t_ = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t_ = jnp.where(tau == 0.0, 1.0, t_)
        c = 1.0 / jnp.sqrt(1.0 + t_ * t_)
        s = t_ * c
        c = jnp.where(small, 1.0, c)                      # [H, TB]
        s = jnp.where(small, 0.0, s)
        Cf = jnp.stack([c, c], axis=1).reshape(k, TB)
        Sf = jnp.stack([-s, s], axis=1).reshape(k, TB)

        X = Cf[:, None, :] * X + Sf[:, None, :] * _pairswap(X, 0)
        X = Cf[None, :, :] * X + Sf[None, :, :] * _pairswap(X, 1)
        V = V_s[:]
        V = Cf[None, :, :] * V + Sf[None, :, :] * _pairswap(V, 1)
        X_s[:] = _slot_rotate(_slot_rotate(X, 0), 1)
        V_s[:] = _slot_rotate(V, 1)
        return carry

    def sweep_body(_, carry):
        lax.fori_loop(0, k - 1, round_body, 0)
        Xv = X_s[:]
        X_s[:] = 0.5 * (Xv + jnp.swapaxes(Xv, 0, 1))      # counter drift
        return carry

    lax.fori_loop(0, sweeps, sweep_body, 0)

    out = jnp.zeros((k, k, TB), dtype)
    for l in range(k):
        wl = jnp.maximum(X_s[l, l, :], 0.0)               # [TB]
        Vl = V_s[:, l, :]                                 # [k, TB]
        out = out + Vl[:, None, :] * (wl[None, :] * Vl)[None, :, :]
    out_ref[:] = out


def _proj_kernel(pairs_ref, x_ref, out_ref, X_s, V_s, *, k: int, sweeps: int,
                 n_pairs: int):
    from jax.experimental import pallas as pl

    dtype = x_ref.dtype
    tiny = float(np.finfo(np.dtype(dtype)).tiny * 16)
    TB = x_ref.shape[2]

    X_s[:] = x_ref[:]
    V_s[:] = jnp.broadcast_to(jnp.eye(k, dtype=dtype)[:, :, None], (k, k, TB))

    def pair_body(t, carry):
        p = pairs_ref[2 * t]
        q = pairs_ref[2 * t + 1]
        app = X_s[pl.ds(p, 1), pl.ds(p, 1), :]        # [1, 1, TB]
        aqq = X_s[pl.ds(q, 1), pl.ds(q, 1), :]
        apq = X_s[pl.ds(p, 1), pl.ds(q, 1), :]
        small = jnp.abs(apq) <= tiny
        safe_apq = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        t_ = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t_ = jnp.where(tau == 0.0, 1.0, t_)
        c = 1.0 / jnp.sqrt(1.0 + t_ * t_)
        s = t_ * c
        c = jnp.where(small, 1.0, c)                  # [1, 1, TB]
        s = jnp.where(small, 0.0, s)

        Xp = X_s[pl.ds(p, 1), :, :]                   # [1, k, TB]
        Xq = X_s[pl.ds(q, 1), :, :]
        X_s[pl.ds(p, 1), :, :] = c * Xp - s * Xq
        X_s[pl.ds(q, 1), :, :] = s * Xp + c * Xq
        Xp = X_s[:, pl.ds(p, 1), :]                   # [k, 1, TB]
        Xq = X_s[:, pl.ds(q, 1), :]
        X_s[:, pl.ds(p, 1), :] = c * Xp - s * Xq
        X_s[:, pl.ds(q, 1), :] = s * Xp + c * Xq
        Vp = V_s[:, pl.ds(p, 1), :]
        Vq = V_s[:, pl.ds(q, 1), :]
        V_s[:, pl.ds(p, 1), :] = c * Vp - s * Vq
        V_s[:, pl.ds(q, 1), :] = s * Vp + c * Vq
        return carry

    def sweep_body(_, carry):
        lax.fori_loop(0, n_pairs, pair_body, 0)
        Xv = X_s[:]
        X_s[:] = 0.5 * (Xv + jnp.swapaxes(Xv, 0, 1))  # counter rounding drift
        return carry

    lax.fori_loop(0, sweeps, sweep_body, 0)

    # PSD projection: out[i,j,b] = sum_l V[i,l,b] max(X[l,l,b], 0) V[j,l,b]
    out = jnp.zeros((k, k, TB), dtype)
    for l in range(k):
        wl = jnp.maximum(X_s[l, l, :], 0.0)           # [TB]
        Vl = V_s[:, l, :]                             # [k, TB]
        out = out + Vl[:, None, :] * (wl[None, :] * Vl)[None, :, :]
    out_ref[:] = out


def _pair_schedule(k: int) -> np.ndarray:
    flat = []
    for p_arr, q_arr in _round_robin_rounds(k):
        for p, q in zip(p_arr, q_arr):
            flat.extend((int(p), int(q)))
    return np.asarray(flat, dtype=np.int32)


@lru_cache(maxsize=None)
def _build_proj_rr(k: int, B: int, TB: int, sweeps: int, dtype_name: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os

    dtype = jnp.dtype(dtype_name)
    kern = partial(_proj_kernel_rr, k=k, sweeps=sweeps)
    grid = (B // TB,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, k, B), dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((k, k, TB), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((k, k, TB), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((k, k, TB), dtype),
            pltpu.VMEM((k, k, TB), dtype),
        ],
        interpret=bool(os.environ.get("COSMO_TPU_PALLAS_INTERPRET")),
    )


@lru_cache(maxsize=None)
def _build_proj(k: int, B: int, TB: int, sweeps: int, dtype_name: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    n_pairs = (k - 1) * (k // 2)
    kern = partial(_proj_kernel, k=k, sweeps=sweeps, n_pairs=n_pairs)
    grid = (B // TB,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, k, B), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, k, TB), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((k, k, TB), lambda i: (0, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((k, k, TB), dtype),
            pltpu.VMEM((k, k, TB), dtype),
        ],
    )


def psd_project_pallas(X, sweeps: int = 6):
    """PSD-project a stack [B, k, k] with the Pallas Jacobi kernel.

    Pads B up to a multiple of the slab width (VMEM-aware: the two
    [k, k, TB] scratch buffers must fit). Falls back to XLA eigh off-TPU
    and for blocks too large for the kernel.
    """
    import os

    B, k, _ = X.shape
    if (
        os.environ.get("COSMO_TPU_DISABLE_PALLAS")
        or jax.default_backend() != "tpu"
        or k % 2 != 0
        or k < 4
        or k > 48
    ):
        w, V = jnp.linalg.eigh(X)
        wp = jnp.maximum(w, 0.0)
        return jnp.einsum("bik,bk,bjk->bij", V, wp, V)
    # VMEM budget: ~6 live [k, k, TB] f32 buffers (pipelined in/out + 2
    # scratch) must stay well under the 16 MB core budget
    budget = 4 * 1024 * 1024
    TB = (budget // (6 * k * k * 4)) // 128 * 128
    TB = max(128, min(512, TB))
    TB = min(TB, max(128, -(-B // 128) * 128))
    Bp = -(-B // TB) * TB
    Xt = jnp.transpose(X, (1, 2, 0))
    if Bp != B:
        Xt = jnp.pad(Xt, ((0, 0), (0, 0), (0, Bp - B)))
    if os.environ.get("COSMO_TPU_PALLAS_RR"):
        # round-parallel variant: measured SLOWER than the serial kernel at
        # k=16 ([512,16,16]: 754 vs 434 us/proj on v5e) — the full-matrix
        # masked angle extraction plus 6 permute copies per round cost more
        # than the serial chain's small VMEM-resident slice ops. Kept for
        # re-evaluation at larger k.
        Yt = _build_proj_rr(k, Bp, TB, sweeps, jnp.dtype(X.dtype).name)(Xt)
    else:
        pairs = jnp.asarray(_pair_schedule(k))
        Yt = _build_proj(k, Bp, TB, sweeps, jnp.dtype(X.dtype).name)(pairs, Xt)
    return jnp.transpose(Yt[:, :, :B], (2, 0, 1))
