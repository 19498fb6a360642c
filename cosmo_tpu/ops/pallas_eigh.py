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
    pairs = jnp.asarray(_pair_schedule(k))
    Yt = _build_proj(k, Bp, TB, sweeps, jnp.dtype(X.dtype).name)(pairs, Xt)
    return jnp.transpose(Yt[:, :, :B], (2, 0, 1))
