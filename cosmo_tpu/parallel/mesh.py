"""Device-mesh sharding for the conic ADMM solve.

The reference is a single-process shared-memory library (SURVEY.md §2,
"Parallelism & communication"); its scale axis is *algorithmic* — chordal
decomposition turns one large PSD cone into many small clique blocks.  On
TPU that axis becomes literal hardware parallelism:

* the PSD/SOC bucket stacks ``[B, k, k]`` are sharded along the batch
  (block) dimension of a 1-D ``jax.sharding.Mesh`` — each device projects
  its local clique blocks (the analog of expert/data parallelism),
* the rows of ``A``, ``b`` and all row-indexed vectors are sharded the same
  way, so the per-row ADMM updates and the SpMM in the KKT matvec are local,
* the consensus couplings (A'y products, residual inf-norms, CG dot
  products, termination flags) become XLA collectives (``psum`` /
  ``all_gather``) inserted automatically by GSPMD from the sharding
  annotations — they ride ICI.

The whole jitted solve is compiled once over the mesh; no host round-trips
inside the iteration loop.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"

# Observability: the most recent shard_cones cost accounting (see
# psd_cost_report). Model prints it under verbose; tests assert on it.
LAST_SHARD_REPORT: dict | None = None


def psd_cost_report(cones, n_dev: int) -> dict:
    """Per-device projection-cost accounting for the PSD buckets of a
    (pre-sharding) ConeData over an ``n_dev``-device mesh.

    Cost model: one PSD projection of a side-k block is O(k^3) (Jacobi
    sweeps and polar iterations are both cubic). Sharding layout
    (matching :func:`shard_cones`):

    * buckets with B >= n_dev shard the batch dim; the batch is padded to
      a multiple of n_dev with dummy dump-slot blocks that do the same k^3
      work, so each device holds ``(B + pad)/n_dev`` blocks;
    * buckets with B < n_dev keep the batch replicated and shard the
      projection over the MATRIX row dim — per-device compute is
      ``B k^3 / n_dev`` plus one [k, k] all-gather per polar matmul riding
      ICI (counted separately as ``ici_bytes_scale``; not FLOPs).

    ``pad_waste`` = sum over devices of the max device cost, over the
    real-block cost — the wall-clock inflation vs a perfect split of the
    real work. ``imbalance`` = max/mean of the per-device cost vector
    (computed, not assumed: every bucket splits evenly under this layout,
    so any value > 1.0 indicates a layout bug).
    """
    buckets = []
    per_dev = np.zeros(n_dev)
    cost_real = 0.0
    ici_bytes = 0.0
    for bkt in cones.psd_buckets:
        B = int(bkt.gather_idx.shape[0])
        k = int(bkt.side)
        # dummy blocks gather only the dump slot: all scales exactly 0
        scal = np.asarray(bkt.gather_scale)
        b_real = int(np.sum(np.any(scal != 0, axis=(1, 2))))
        cost_real += b_real * k**3
        if B < n_dev:
            # matrix-dim sharded: compute splits exactly; ~49 polar matmuls
            # each all-gather the [k, k] iterate (4-byte f32)
            per_dev += B * k**3 / n_dev
            ici_bytes += 49 * B * k * k * 4
            buckets.append(dict(k=k, B_real=b_real, B_padded=B,
                                layout="matrix_sharded",
                                local_per_device=B))
        else:
            b_tot = B + ((-B) % n_dev)
            per_dev += (b_tot // n_dev) * k**3
            buckets.append(dict(k=k, B_real=b_real, B_padded=b_tot,
                                layout="batch_sharded",
                                local_per_device=b_tot // n_dev))
    ideal = cost_real / n_dev
    return dict(
        n_dev=n_dev,
        imbalance=round(float(per_dev.max() / per_dev.mean()), 4)
        if per_dev.mean() else 1.0,
        pad_waste=round(float(per_dev.max() * n_dev / cost_real), 4)
        if cost_real else 1.0,
        cost_real_flops_scale=cost_real,
        cost_per_device_scale=float(per_dev.max()),
        ici_bytes_scale=ici_bytes,
        buckets=buckets,
    )


def make_mesh(n_devices: int | None = None, axis: str = BLOCK_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"Requested {n_devices} devices but only {len(devs)} are available."
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _put(x, sharding):
    return jax.device_put(x, sharding)


def _pad_batch(arr, d: int, fill):
    """Pad the leading (batch) dim of ``arr`` up to a multiple of ``d``."""
    import jax.numpy as jnp

    b = arr.shape[0]
    pad = (-b) % d
    if pad == 0:
        return arr
    shape = (pad,) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.full(shape, fill, arr.dtype)], axis=0)


def _row_put(x, mesh: Mesh, axis: str):
    """Shard a row-indexed [m, ...] array if m divides the mesh, else
    replicate it (the per-row clip/masks are cheap; the heavy work — cone
    buckets and matvecs — is padded to shard exactly)."""
    n_dev = mesh.shape[axis]
    if x.shape[0] % n_dev == 0:
        spec = P(axis, *([None] * (x.ndim - 1)))
        return _put(x, NamedSharding(mesh, spec))
    return _put(x, NamedSharding(mesh, P()))


def shard_cones(mesh: Mesh, cones, axis: str = BLOCK_AXIS):
    """Device-put the batched cone data with block-parallel shardings.

    Bucket batch dims that don't divide the device count are padded with
    dump-slot blocks (gather the zero dump entry with scale 0, scatter back
    to the dump slot) — exact no-ops, so uneven clique counts shard without
    changing results.
    """
    global LAST_SHARD_REPORT

    batch = NamedSharding(mesh, P(axis))
    batch2 = NamedSharding(mesh, P(axis, None))
    batch3 = NamedSharding(mesh, P(axis, None, None))
    d = mesh.shape[axis]
    DUMP = cones.m
    LAST_SHARD_REPORT = psd_cost_report(cones, d)

    rep = NamedSharding(mesh, P())

    soc = tuple(
        dataclasses.replace(bkt, idx=_put(_pad_batch(bkt.idx, d, DUMP), batch2))
        for bkt in cones.soc_buckets
    )

    def _shard_psd(bkt):
        B = int(bkt.gather_idx.shape[0])
        if B < d:
            # fewer blocks than devices: batch sharding would replicate the
            # whole bucket as n_dev-fold dummy work (a [1, 896] clique
            # padded to 8 blocks ran 8x 896^3 for 1 real block — the
            # dominant sharding waste of the 10k maxcut layout). Keep the
            # batch replicated and shard the projection over the MATRIX row
            # dimension instead (PsdBucket.spec): the polar/Jacobi matmuls
            # split O(k^3)/n_dev per device with one all-gather of the
            # [k, k] iterate per matmul riding ICI.
            rput_all = lambda x: _put(x, rep) if x is not None else None
            return dataclasses.replace(
                bkt,
                gather_idx=_put(bkt.gather_idx, rep),
                gather_scale=_put(bkt.gather_scale, rep),
                scatter_idx=_put(bkt.scatter_idx, rep),
                scatter_scale=_put(bkt.scatter_scale, rep),
                expand=rput_all(bkt.expand),
                compress=rput_all(bkt.compress),
                sh_starts=rput_all(bkt.sh_starts),
                sh_scale=rput_all(bkt.sh_scale),
                sh_flat=rput_all(bkt.sh_flat),
                sh_csc=rput_all(bkt.sh_csc),
                cp_csc=rput_all(bkt.cp_csc),
                spec=NamedSharding(mesh, P(None, axis, None)),
            )
        # The selection-matmul fast path survives sharding whenever the
        # bucket's batch already divides the mesh (the compact transform
        # pads block counts with dummy blocks when built with
        # pad_batch=n_devices, so this holds for every decomposed solve).
        # Batch padding with dump blocks breaks the contiguous-rows
        # precondition, so uneven buckets fall back to the index maps
        # (which encode the dump no-ops).
        keep_fast = (
            bkt.fastpath != "none" and bkt.gather_idx.shape[0] % d == 0
        )
        rput = lambda x: _put(x, rep) if (keep_fast and x is not None) else None
        return dataclasses.replace(
            bkt,
            gather_idx=_put(_pad_batch(bkt.gather_idx, d, DUMP), batch3),
            gather_scale=_put(_pad_batch(bkt.gather_scale, d, 0), batch3),
            scatter_idx=_put(_pad_batch(bkt.scatter_idx, d, DUMP), batch3),
            scatter_scale=_put(_pad_batch(bkt.scatter_scale, d, 0), batch3),
            fastpath=bkt.fastpath if keep_fast else "none",
            contig_start=bkt.contig_start if keep_fast else -1,
            tri_len=bkt.tri_len if keep_fast else 0,
            expand=rput(bkt.expand),
            compress=rput(bkt.compress),
            sh_starts=rput(bkt.sh_starts),
            sh_scale=rput(bkt.sh_scale),
            sh_flat=rput(bkt.sh_flat),
            sh_csc=rput(bkt.sh_csc),
            cp_csc=rput(bkt.cp_csc),
        )

    psd = tuple(_shard_psd(bkt) for bkt in cones.psd_buckets)
    exp = dataclasses.replace(
        cones.exp,
        idx=_put(_pad_batch(cones.exp.idx, d, DUMP), batch2),
        is_dual=_put(_pad_batch(cones.exp.is_dual, d, False), batch),
        tol=_put(_pad_batch(cones.exp.tol, d, 1e-8), batch),
    )
    pw = dataclasses.replace(
        cones.pow,
        idx=_put(_pad_batch(cones.pow.idx, d, DUMP), batch2),
        alpha=_put(_pad_batch(cones.pow.alpha, d, 0.5), batch),
        is_dual=_put(_pad_batch(cones.pow.is_dual, d, False), batch),
        tol=_put(_pad_batch(cones.pow.tol, d, 1e-8), batch),
    )
    return dataclasses.replace(
        cones,
        lb=_row_put(cones.lb, mesh, axis),
        ub=_row_put(cones.ub, mesh, axis),
        eq_mask=_row_put(cones.eq_mask, mesh, axis),
        nonneg_mask=_row_put(cones.nonneg_mask, mesh, axis),
        box_mask=_row_put(cones.box_mask, mesh, axis),
        rect_mask=_row_put(cones.rect_mask, mesh, axis),
        rect_seg=_row_put(cones.rect_seg, mesh, axis),
        soc_buckets=soc,
        psd_buckets=psd,
        exp=exp,
        pow=pw,
    )


def shard_coo(mesh: Mesh, A, axis: str = BLOCK_AXIS):
    """Shard a :class:`~cosmo_tpu.ops.linops.Coo` over the mesh.

    Both triplet permutations are sharded along the nnz axis: every matvec
    then computes per-device partial segment sums over its local triplet
    chunk and GSPMD inserts the all-reduce that combines the partials into
    the (row- or replicated-) sharded output — the SPMD analog of the
    reference's matrix-free reduced-system products
    (kktsolver_indirect.jl:36-88).  Because the row-sorted copy is laid out
    contiguously, each device's chunk touches a contiguous row range, which
    keeps the partial outputs bandwidth-friendly.
    """
    from ..ops.linops import segment_ptr

    nnz = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    d = mesh.shape[axis]
    r, c, v = _align_triplets(np.asarray(A.rows), np.asarray(A.cols),
                              np.asarray(A.vals), d)
    cc, cr, cv = _align_triplets(np.asarray(A.ccols), np.asarray(A.crows),
                                 np.asarray(A.cvals), d)
    # the zero-value fillers count as (exact-zero) segment entries, so the
    # compensated-matvec pointers are rebuilt for the padded layout
    row_ptr, w_r = segment_ptr(r, A.m)
    col_ptr, w_c = segment_ptr(cc, A.n)
    return dataclasses.replace(
        A,
        rows=_put(r, nnz), cols=_put(c, nnz), vals=_put(v, nnz),
        crows=_put(cr, nnz), ccols=_put(cc, nnz), cvals=_put(cv, nnz),
        row_ptr=_put(row_ptr, rep), col_ptr=_put(col_ptr, rep),
        max_row_nnz=w_r, max_col_nnz=w_c,
    )


def _align_bounds(key, d: int):
    """Chunk boundaries for :func:`_align_triplets`: ``d`` near-equal nnz
    chunks snapped down to segment starts of ``key``, plus the padded
    per-chunk length ``L``."""
    nnz = key.shape[0]
    change = np.flatnonzero(np.diff(key)) + 1          # positions where key changes
    bounds = [0]
    for k in range(1, d):
        ideal = k * nnz // d
        # largest segment start <= ideal (0 if none)
        i = np.searchsorted(change, ideal, side="right") - 1
        snap = int(change[i]) if i >= 0 else 0
        bounds.append(max(snap, bounds[-1]))
    bounds.append(nnz)
    L = max(bounds[i + 1] - bounds[i] for i in range(d))
    return bounds, L


def coo_shard_remap(A, d: int):
    """Index map from the unsharded row-sorted nnz layout of ``A`` (a host
    :class:`~cosmo_tpu.ops.linops.Coo`) to the padded layout produced by
    :func:`shard_coo`: ``new_pos[j]`` is where original triplet ``j`` lands.
    Consumers holding nnz indices into ``A.vals`` (e.g. the blockkkt pair
    lists) must remap through this before gathering from the sharded copy.
    """
    key = np.asarray(A.rows)
    nnz = key.shape[0]
    if nnz == 0:
        return np.zeros(0, np.int64)
    bounds, L = _align_bounds(key, d)
    new_pos = np.empty(nnz, np.int64)
    for i in range(d):
        s, e = bounds[i], bounds[i + 1]
        new_pos[s:e] = i * L + np.arange(e - s, dtype=np.int64)
    return new_pos


def _align_triplets(key, other, vals, d: int):
    """Pad sorted COO triplets so each of the ``d`` equal nnz chunks covers
    only whole segments of ``key`` (rows for the row-sorted copy, columns
    for the col-sorted one).

    With segment-aligned chunks every output entry of the segment-sum matvec
    is computed *entirely* on one device — the other devices contribute
    exact IEEE zeros, so the GSPMD all-reduce that combines the partials is
    bit-exact regardless of reduction order: the sharded solve follows the
    single-device trajectory bit for bit (and the scatter-adds stay local to
    a contiguous segment range per device).  Fillers repeat the chunk's last
    key with value 0, preserving global sortedness.
    """
    nnz = key.shape[0]
    if nnz == 0:
        return key, other, vals
    bounds, L = _align_bounds(key, d)
    ko = np.empty(d * L, key.dtype)
    oo = np.zeros(d * L, other.dtype)
    vo = np.zeros(d * L, vals.dtype)
    for i in range(d):
        s, e = bounds[i], bounds[i + 1]
        n_i = e - s
        ko[i * L : i * L + n_i] = key[s:e]
        oo[i * L : i * L + n_i] = other[s:e]
        vo[i * L : i * L + n_i] = vals[s:e]
        fill_key = key[e - 1] if n_i > 0 else (key[s - 1] if s > 0 else 0)
        ko[i * L + n_i : (i + 1) * L] = fill_key
    return ko, oo, vo


def shard_problem(mesh: Mesh, P_mat, A, q, b, cones, axis: str = BLOCK_AXIS):
    """Shard the problem data over the mesh.

    ``A``/``b`` row-sharded (constraint-parallel); ``P``/``q`` replicated
    (the x-space is the consensus space — small after decomposition);
    cone stacks block-sharded.  Sparse ``A``/``P`` (:class:`Coo`) shard
    their triplet arrays along nnz (:func:`shard_coo`).
    """
    from ..ops.linops import Coo

    rep = NamedSharding(mesh, P())
    A_s = shard_coo(mesh, A, axis) if isinstance(A, Coo) else _row_put(A, mesh, axis)
    # P couples only the consensus space: replicate (dense) / keep triplets
    # replicated (sparse) — it is small or empty after decomposition
    P_s = _put(P_mat, rep) if not isinstance(P_mat, Coo) else P_mat
    return (
        P_s,
        A_s,
        _put(q, rep),
        _row_put(b, mesh, axis),
        shard_cones(mesh, cones, axis),
    )


def shard_blockkkt(mesh: Mesh, meta, A, axis: str = BLOCK_AXIS):
    """Shard a :class:`~cosmo_tpu.ops.blockkkt.BlockKKTMeta` over the mesh.

    ``A`` is the **unsharded** host ``Coo`` the meta was analyzed against:
    the pair lists hold nnz indices into its row-sorted ``vals``, and
    :func:`shard_coo` re-chunks/pads that layout — so ``a_pi``/``a_pj``
    are remapped through :func:`coo_shard_remap` to keep the device-side
    gathers pointing at the intended entries.

    Each bucket's component batch dim ``N`` is padded to a multiple of the
    mesh size (pad components are identity blocks: ``cols = n`` dump slots,
    which factor() turns into unit diagonals and apply() into exact zeros)
    and the member-column map is device_put sharded along it. The pair
    lists stay replicated: assembling the [N,k,k] blocks is cheap
    elementwise work, while the batched Cholesky / inverse-apply — the
    actual O(N k^3) / O(N k^2) cost — runs sharded (``BlockBucket.spec``).
    Per-block arithmetic is local to one device, so the sharded solve
    matches the single-device one to a few ULPs (exact bit-identity is not
    guaranteed: XLA may vectorize the batched Cholesky differently for
    different local batch sizes).
    """
    import dataclasses as _dc

    import jax.numpy as jnp

    from ..ops.blockkkt import BlockBucket

    d = mesh.shape[axis]
    remap = coo_shard_remap(A, d)
    rep = NamedSharding(mesh, P())
    spec3 = NamedSharding(mesh, P(axis, None, None))
    spec2 = NamedSharding(mesh, P(axis, None))
    buckets = []
    for b in meta.buckets:
        pad = (-b.N) % d
        cols = np.asarray(b.cols)
        if pad:
            cols = np.concatenate(
                [cols, np.full((pad, b.k), meta.n, cols.dtype)], axis=0
            )
        a_pi = remap[np.asarray(b.a_pi, np.int64)].astype(np.int32)
        a_pj = remap[np.asarray(b.a_pj, np.int64)].astype(np.int32)
        buckets.append(
            BlockBucket(
                k=b.k, N=b.N + pad, spec=spec3,
                cols=_put(jnp.asarray(cols), spec2),
                a_rows=_put(jnp.asarray(b.a_rows), rep),
                a_pi=_put(jnp.asarray(a_pi), rep),
                a_pj=_put(jnp.asarray(a_pj), rep),
                a_tgt=_put(jnp.asarray(b.a_tgt), rep),
                p_idx=_put(jnp.asarray(b.p_idx), rep),
                p_tgt=_put(jnp.asarray(b.p_tgt), rep),
                # flat targets index the FIRST N blocks, so they survive the
                # batch padding unchanged; the df32-pair assembly stream is
                # replicated like the other pair lists
                m_width=b.m_width,
                m_perm=_put(jnp.asarray(b.m_perm), rep),
                m_ptr=_put(jnp.asarray(b.m_ptr), rep),
                m_uniq=_put(jnp.asarray(b.m_uniq), rep),
            )
        )
    return _dc.replace(meta, buckets=tuple(buckets))


def shard_vectors(mesh: Mesh, x0, s0, mu0, axis: str = BLOCK_AXIS):
    """Shard warm-start vectors consistently with :func:`shard_problem`."""
    rep = NamedSharding(mesh, P())
    return (
        _put(x0, rep),
        _row_put(s0, mesh, axis),
        _row_put(mu0, mesh, axis),
    )
