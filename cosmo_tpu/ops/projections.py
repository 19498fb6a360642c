"""Batched cone projections and membership tests.

The composite projection (reference: src/convexset.jl:885-891 fans out over
cones with dynamic dispatch) is here a fixed sequence of fused vectorized
ops over the batched cone representation:

1. one elementwise clip covering Zero/Nonnegatives/Box rows,
2. one vectorized SOC projection per SOC bucket,
3. one batched eigendecomposition + rank-k reconstruction per PSD bucket
   (reference hot kernel: LAPACK syevr + syrk, convexset.jl:219-263),
4. one vectorized Newton/bisection kernel for all exp / pow cones.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import eigh as eigh_mod
from . import exp_pow
from .conedata import ConeData, PsdBucket


def _ext(v):
    """Append the dump slot (value 0) used by padded gathers/scatters."""
    return jnp.concatenate([v, jnp.zeros((1,), v.dtype)])


def _soc_project_bucket(x):
    """Project rows of x [B, d] onto the second-order cone
    (reference: convexset.jl:100-114). Zero-padding is exact."""
    t = x[:, 0]
    xt = x[:, 1:]
    nx = jnp.linalg.norm(xt, axis=1)
    in_cone = nx <= t
    in_polar = nx <= -t
    scale = (nx + t) / 2.0
    safe_nx = jnp.where(nx > 0, nx, 1.0)
    t_new = jnp.where(in_cone, t, jnp.where(in_polar, 0.0, scale))
    xt_new = jnp.where(
        in_cone[:, None],
        xt,
        jnp.where(in_polar[:, None], 0.0, (scale / safe_nx)[:, None] * xt),
    )
    return jnp.concatenate([t_new[:, None], xt_new], axis=1)


def _psd_gather(v_ext, bucket: PsdBucket):
    if bucket.fastpath == "matmul":
        # uniform contiguous triangle bucket, small k: contiguous slice +
        # one small selection matmul (svec->full with the 1/sqrt2 folded
        # in) on the MXU — the arbitrary-index [B,k,k] gather was the
        # single largest per-iteration cost on chip
        B = bucket.gather_idx.shape[0]
        V = lax.dynamic_slice(
            v_ext, (bucket.contig_start,), (B * bucket.tri_len,)
        ).reshape(B, bucket.tri_len)
        return (V @ bucket.expand).reshape(B, bucket.side, bucket.side)
    if bucket.fastpath == "colpad":
        # column-padded svec storage (PsdConeTriangleColPad): the stored
        # region IS a [r0, r0] matrix with columns as rows — expansion is
        # one contiguous reshape + mask/scale + symmetrize, zero gathers
        # (measured r0=896 on v5e: 3.70 ms shear -> 0.018 ms round trip)
        B = bucket.gather_idx.shape[0]
        r0 = bucket.r0
        V = lax.dynamic_slice(
            v_ext, (bucket.contig_start,), (B * r0 * r0,)
        ).reshape(B, r0, r0)
        U = V * bucket.sh_scale[None]                 # [B, j, i] masked
        Ut = jnp.swapaxes(U, -1, -2)                  # upper triangular
        d = jnp.einsum("bjj->bj", Ut)
        return Ut + jnp.swapaxes(Ut, -1, -2) - jnp.einsum(
            "bj,jk->bjk", d, jnp.eye(r0, dtype=U.dtype)
        )
    if bucket.fastpath == "shear":
        # large k: svec columns are contiguous runs, so the expansion is
        # r0 slice-gathers (one structured gather) + mask/scale +
        # symmetrize — ~10x the scalar-index gather at [8,256,256]
        B = bucket.gather_idx.shape[0]
        r0, k = bucket.r0, bucket.side
        V = lax.dynamic_slice(
            v_ext, (bucket.contig_start,), (B * bucket.tri_len,)
        ).reshape(B, bucket.tri_len)
        Vp = jnp.pad(V, ((0, 0), (0, r0)))
        Xs = jax.vmap(lambda vb: jax.vmap(
            lambda st: lax.dynamic_slice(vb, (st,), (r0,))
        )(bucket.sh_starts))(Vp)                      # [B, j, i] sheared
        U = Xs * bucket.sh_scale[None]                # masked cols-as-rows
        Ut = jnp.swapaxes(U, -1, -2)                  # upper triangular
        d = jnp.einsum("bjj->bj", Ut)
        X = Ut + jnp.swapaxes(Ut, -1, -2) - jnp.einsum(
            "bj,jk->bjk", d, jnp.eye(r0, dtype=U.dtype)
        )
        if r0 < k:
            X = jnp.pad(X, ((0, 0), (0, k - r0), (0, k - r0)))
        return X
    X = v_ext[bucket.gather_idx] * bucket.gather_scale
    if bucket.symmetrize:
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
    return X


def _psd_project_bucket(X, cones: ConeData, loose=None, bucket=None):
    """Batched PSD projection: eig + positive-part reconstruction
    (reference: convexset.jl:219-263). [B, k, k] -> [B, k, k].

    ``loose``: optional traced bool — the mixed-precision phase flag. While
    True (residuals far from tolerance) the polar backend runs its matmuls
    at "high" precision (3 bf16 MXU passes, ~f32-quality) instead of the
    ambient f32 "highest" (6 passes). NOT "default": a single bf16 pass
    floors the projection error near 1e-2, which is *above* the switch
    threshold — the latch then never trips and the solve stalls (measured
    on chip: rp pinned at 2.7e-2 forever)."""
    from .conedata import resolve_eigh_backend

    # "auto" is normally resolved once in compile_cones (which sees all
    # buckets); direct callers with hand-built ConeData get the conservative
    # resolution (never the Pallas kernel) from the same shared function.
    # A per-bucket override (PsdBucket.backend — compile_cones gives the
    # dominant small-k bucket of a multi-bucket plain-ADMM solve the Pallas
    # kernel) wins over the global string.
    backend = resolve_eigh_backend(cones.eigh_backend)
    if bucket is not None and getattr(bucket, "backend", ""):
        backend = bucket.backend
    if backend == "polar":
        if loose is None:
            return eigh_mod.psd_project_polar(X)
        return lax.cond(
            loose,
            lambda X: eigh_mod.psd_project_polar(X, precision="high"),
            lambda X: eigh_mod.psd_project_polar(X),
            X,
        )
    if backend == "pallas":
        from . import pallas_eigh

        return pallas_eigh.psd_project_pallas(X, cones.jacobi_sweeps)
    if cones.eigh_backend.startswith("jacobi"):
        method = "mm" if cones.eigh_backend == "jacobi_mm" else "vec"
        return eigh_mod.psd_project_jacobi(X, cones.jacobi_sweeps, method)
    w, V = jnp.linalg.eigh(X)
    wp = jnp.maximum(w, 0.0)
    # X_+ = V diag(w_+) V^T ; keep it as one einsum so XLA fuses the scaling
    return jnp.einsum("bik,bk,bjk->bij", V, wp, V)


def init_eig_state(cones: ConeData, dtype):
    """Initial per-bucket eigenbasis carry for the ``"amortized"`` PSD
    backend (identity stacks — the first projection falls back to full
    sweeps via the staleness guard); empty for stateless backends."""
    from .conedata import resolve_eigh_backend

    if resolve_eigh_backend(cones.eigh_backend) != "amortized":
        return ()
    return tuple(
        jnp.broadcast_to(
            jnp.eye(b.side, dtype=dtype),
            (b.gather_idx.shape[0], b.side, b.side),
        )
        for b in cones.psd_buckets
    )


def project(w2, cones: ConeData, eig_state=(), loose=None):
    """s = Pi_K(w2): project the slack part of the operator variable onto K.
    Returns ``(s, eig_state)`` — the state is non-empty only for the
    ``"amortized"`` PSD backend (eigenbasis carried across iterations).
    ``loose``: mixed-precision phase flag (see ``_psd_project_bucket``).

    Replaces admm_z!'s projection fan-out (reference: src/solver.jl:7-21,
    convexset.jl:885-891)."""
    from .conedata import resolve_eigh_backend

    backend = resolve_eigh_backend(cones.eigh_backend)
    s = jnp.clip(w2, cones.lb, cones.ub)
    v_ext = _ext(w2)

    for bucket in cones.soc_buckets:
        X = v_ext[bucket.idx]
        P = _soc_project_bucket(X)
        s = _ext(s).at[bucket.idx].set(P)[:-1]

    new_state = []
    for i, bucket in enumerate(cones.psd_buckets):
        X = _psd_gather(v_ext, bucket)
        if bucket.spec is not None:
            # mesh-sharded giant bucket (batch < n_dev): pin the block stack
            # to shard over the matrix row dim so the polar/Jacobi matmuls
            # split O(k^3)/n_dev per device (parallel/mesh.shard_cones)
            X = lax.with_sharding_constraint(X, bucket.spec)
        if backend == "amortized":
            Y, V = eigh_mod.psd_project_amortized(
                X, eig_state[i], warm_sweeps=2,
                full_sweeps=cones.jacobi_sweeps,
            )
            new_state.append(V)
        else:
            Y = _psd_project_bucket(X, cones, loose, bucket)
        if bucket.fastpath == "matmul":
            B = bucket.gather_idx.shape[0]
            T = (Y.reshape(B, bucket.side * bucket.side) @ bucket.compress)
            s = lax.dynamic_update_slice(
                s, T.reshape(-1), (bucket.contig_start,)
            )
        elif bucket.fastpath == "colpad":
            B = bucket.gather_idx.shape[0]
            r0 = bucket.r0
            # [j, i] layout: upper entries scaled, pad slots exactly 0
            T = jnp.swapaxes(Y, -1, -2) * bucket.cp_csc[None]
            s = lax.dynamic_update_slice(
                s, T.reshape(-1), (bucket.contig_start,)
            )
        elif bucket.fastpath == "shear":
            B = bucket.gather_idx.shape[0]
            r0 = bucket.r0
            Yc = Y[:, :r0, :r0]
            T = Yc.reshape(B, r0 * r0)[:, bucket.sh_flat] * bucket.sh_csc[None]
            s = lax.dynamic_update_slice(
                s, T.reshape(-1), (bucket.contig_start,)
            )
        else:
            s = _ext(s).at[bucket.scatter_idx].set(
                Y * bucket.scatter_scale
            )[:-1]

    if cones.exp.idx.shape[0] > 0:
        V = v_ext[cones.exp.idx]
        P = exp_pow.project_exp(
            V, cones.exp.is_dual, cones.exp.tol, cones.exp.max_iter
        )
        s = _ext(s).at[cones.exp.idx].set(P)[:-1]

    if cones.pow.idx.shape[0] > 0:
        V = v_ext[cones.pow.idx]
        P = exp_pow.project_pow(
            V, cones.pow.alpha, cones.pow.is_dual, cones.pow.tol,
            cones.pow.max_iter,
        )
        s = _ext(s).at[cones.pow.idx].set(P)[:-1]

    for offset, cone in cones.custom:
        v = lax.dynamic_slice(w2, (offset,), (cone.dim,))
        s = lax.dynamic_update_slice(s, cone.project(v), (offset,))

    return s, tuple(new_state)


# ----------------------------------------------------------------------
# Membership tests (used by the infeasibility certificates)
# ----------------------------------------------------------------------

def _psd_all_pd(X, tol):
    """All blocks of X [B,k,k] have min eigenvalue > -tol, via one batched
    Cholesky of X + tol I — the reference's own membership test (LAPACK
    cholesky!, algebra.jl:226-233) and ~10x cheaper than batched eigvalsh
    on TPU (XLA's QR eigh is the slowest op in the certificate path).
    A failed factorization surfaces as non-finite entries. Zero-padded
    slots get a tol diagonal and stay PD."""
    k = X.shape[-1]
    ar = jnp.arange(k)
    Xs = X.at[..., ar, ar].add(tol)
    L = jnp.linalg.cholesky(Xs)
    return jnp.all(jnp.isfinite(L))


def in_pol_recc_multi(v, cones: ConeData, tols):
    """Is v in the polar recession cone of K-tilde, evaluated at every
    tolerance in ``tols`` from ONE pass over the expensive reductions (the
    batched PSD eigendecompositions dominate; XLA does not CSE the eigh
    custom-calls across separate invocations). Used by the dual
    infeasibility certificate (reference: src/convexset.jl in_pol_recc per
    cone; src/infeasibility.jl:32-68) and its loose escalation gate.

    Note: zero-padding of PSD blocks adds eigenvalues exactly 0, which never
    flips the lambda_max <= tol test for tol >= 0.
    """
    v_ext = _ext(v)

    # margins: membership at tol <=> margin <= tol
    m_rows = jnp.max(jnp.where(cones.eq_mask, jnp.abs(v), 0.0), initial=0.0)
    m_rows = jnp.maximum(m_rows, jnp.max(
        jnp.where(cones.nonneg_mask, v, 0.0), initial=0.0))
    # Box rows: v > tol only allowed if u finite; v < -tol only if l finite
    # (convexset.jl:859-861)
    m_rows = jnp.maximum(m_rows, jnp.max(jnp.where(
        cones.box_mask & jnp.isposinf(cones.ub), v, 0.0), initial=0.0))
    m_rows = jnp.maximum(m_rows, jnp.max(jnp.where(
        cones.box_mask & jnp.isneginf(cones.lb), -v, 0.0), initial=0.0))

    margin = m_rows
    for bucket in cones.soc_buckets:
        X = v_ext[bucket.idx]
        nx = jnp.linalg.norm(X[:, 1:], axis=1)
        margin = jnp.maximum(margin, jnp.max(nx + X[:, 0]))
    psd_X = [_psd_gather(v_ext, bucket) for bucket in cones.psd_buckets]

    oks = []
    for tol in tols:
        ok = margin <= tol
        for X in psd_X:
            # lambda_max(X) <= tol  <=>  tol I - X is PSD
            ok &= _psd_all_pd(-X, tol)
        if cones.exp.idx.shape[0] > 0:
            V = v_ext[cones.exp.idx]
            # in_pol_recc(v) = in_dual(-v); dual cones: in_dual == in_cone
            prim = exp_pow.exp_in_dual(-V, tol)
            dual = exp_pow.exp_in_cone(-V, tol)
            ok &= jnp.all(jnp.where(cones.exp.is_dual, dual, prim))
        if cones.pow.idx.shape[0] > 0:
            V = v_ext[cones.pow.idx]
            a = cones.pow.alpha
            prim = exp_pow.pow_in_dual(-V, a, tol)
            dual = exp_pow.pow_in_cone(-V, a, tol)
            ok &= jnp.all(jnp.where(cones.pow.is_dual, dual, prim))
        for offset, cone in cones.custom:
            if cone.in_pol_recc is not None:
                v_c = lax.dynamic_slice(v, (offset,), (cone.dim,))
                ok &= cone.in_pol_recc(v_c, tol)
            elif cone.in_dual is not None:
                # for a cone K the polar recession cone is -K*, so
                # membership reduces to the user's dual-cone test
                # (reference: in_pol_recc(v) = in_dual(-v), convexset.jl)
                v_c = lax.dynamic_slice(v, (offset,), (cone.dim,))
                ok &= cone.in_dual(-v_c, tol)
            else:
                # unknown membership: conservatively fail the certificate
                ok &= jnp.asarray(False)
        oks.append(ok)
    return tuple(oks)


def in_pol_recc(v, cones: ConeData, tol):
    """Single-tolerance wrapper over :func:`in_pol_recc_multi`."""
    return in_pol_recc_multi(v, cones, (tol,))[0]


def support_function_multi(y, cones: ConeData, tols):
    """sup_{z in K} <z, y> evaluated the way the reference does for the
    primal infeasibility certificate (src/convexset.jl:850-936): finite sum
    over Box rows, and 0 / +inf indicator (via in_dual(-y)) for the cones.
    Evaluated at every tolerance in ``tols`` from one pass over the
    expensive reductions (batched PSD eigendecompositions; XLA does not CSE
    eigh custom-calls across invocations).
    """
    v_ext = _ext(y)
    dt = y.dtype
    inf = jnp.asarray(jnp.inf, dt)

    # margins: indicator ok at tol <=> margin <= tol
    margin = jnp.max(jnp.where(cones.nonneg_mask, y, 0.0), initial=0.0)
    for bucket in cones.soc_buckets:
        X = -v_ext[bucket.idx]
        nx = jnp.linalg.norm(X[:, 1:], axis=1)
        margin = jnp.maximum(margin, jnp.max(nx - X[:, 0]))
    psd_Xn = [_psd_gather(-v_ext, bucket) for bucket in cones.psd_buckets]

    outs = []
    for tol in tols:
        # Box rows (convexset.jl:850-856); guard 0 * inf
        pos = y > tol
        neg = y < -tol
        contrib = jnp.where(pos, y * cones.ub, jnp.where(neg, y * cones.lb, 0.0))
        box_sum = jnp.sum(jnp.where(cones.box_mask, contrib, 0.0))

        ok = margin <= tol
        for X in psd_Xn:
            # lambda_min(X) >= -tol  <=>  X + tol I is PSD
            ok &= _psd_all_pd(X, tol)
        if cones.exp.idx.shape[0] > 0:
            V = -v_ext[cones.exp.idx]
            prim = exp_pow.exp_in_dual(V, tol)
            dual = exp_pow.exp_in_cone(V, tol)
            ok &= jnp.all(jnp.where(cones.exp.is_dual, dual, prim))
        if cones.pow.idx.shape[0] > 0:
            V = -v_ext[cones.pow.idx]
            a = cones.pow.alpha
            prim = exp_pow.pow_in_dual(V, a, tol)
            dual = exp_pow.pow_in_cone(V, a, tol)
            ok &= jnp.all(jnp.where(cones.pow.is_dual, dual, prim))

        custom_sum = jnp.zeros((), dt)
        for offset, cone in cones.custom:
            if cone.support is not None:
                y_c = lax.dynamic_slice(y, (offset,), (cone.dim,))
                custom_sum = custom_sum + cone.support(y_c, tol)
            elif cone.in_dual is not None:
                # cone support is the 0 / +inf indicator of the polar:
                # sup_{z in K} <z, y> = 0 iff -y in K*
                y_c = lax.dynamic_slice(y, (offset,), (cone.dim,))
                ok &= cone.in_dual(-y_c, tol)
            else:
                ok &= jnp.asarray(False)
        outs.append(jnp.where(ok, box_sum + custom_sum, inf))
    return tuple(outs)


def support_function(y, cones: ConeData, tol):
    """Single-tolerance wrapper over :func:`support_function_multi`."""
    return support_function_multi(y, cones, (tol,))[0]
