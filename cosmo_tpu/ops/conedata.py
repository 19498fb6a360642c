"""Compile an ordered list of cones into batched, padded device arrays.

This replaces the reference's ``CompositeConvexSet`` + per-cone dynamic
dispatch (reference: src/convexset.jl:885-891, src/splitvector.jl) with a
TPU-native representation:

* Zero / Nonnegatives / Box rows (and 1x1 PSD blocks) collapse into ONE
  elementwise clip with per-row lower/upper bound vectors — a single fused
  VPU op over the whole slack vector.
* Second-order cones are bucketed by padded dimension into ``[B, d]`` stacks
  (zero-padding is exact for the SOC projection).
* PSD cones (square and svec-triangle storage) are bucketed by padded side
  into ``[B, k, k]`` stacks; the projection is one batched symmetric
  eigendecomposition per bucket (zero-embedding a block in a larger
  all-zeros matrix is exact for the PSD projection and for the +/- definite
  membership tests used by the solver).
* Exponential / power cones become ``[N, 3]`` stacks projected by vectorized
  bisection/Newton iterations; dual cones ride the same kernels via the
  Moreau identity  Pi_{K*}(v) = v + Pi_K(-v)  (reference: convexset.jl:784).

Gather/scatter between the global slack vector and the stacks uses
precomputed static index maps; padding lanes point at a one-past-the-end
"dump" slot so no masks are needed on the hot path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import numpy as np

from ..models import cones as C
from ..utils.pytrees import register_pytree_dataclass, static_field

SQRT2 = np.sqrt(2.0)

# geometric bucket ladder for PSD block padding: ~1.5x steps below 256 keep
# the number of distinct batched-eig shapes small (few compiles) while
# capping the padding FLOP waste at ~(1.5)^3. From 256 up, the ladder
# refines to 64-steps (then 128-steps past 1024): a giant block dominates
# the whole projection (the 10k maxcut north-star's largest clique is 93%
# of all projection FLOPs), its bucket holds one or two blocks regardless
# of ladder density — so a finer ladder costs no extra compiles in practice
# while a coarse one cubes the pad ratio (real side 887 padded to 1024 was
# 1.54x wasted eig work and +131k dead rows in m).
GEOMETRIC_SIZES = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 320, 384, 448,
                   512, 576, 640, 704, 768, 832, 896, 960, 1024, 1152, 1280,
                   1408, 1536, 1664, 1792, 1920, 2048)


def pad_side(r: int, pad_to: int = 8) -> int:
    """Padded length on the geometric ladder (multiple of ``pad_to``)."""
    if pad_to <= 1:
        return r
    for sz in GEOMETRIC_SIZES:
        if sz >= r and sz % pad_to == 0:
            return sz
    return -(-r // pad_to) * pad_to


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SocBucket:
    """A stack of second-order cones padded to a common dimension."""

    idx: Any  # int32 [B, d] gather/scatter rows into s (m == dump slot)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class PsdBucket:
    """A stack of PSD blocks (square or triangle storage) padded to side k.

    gather:   X[b,i,j] = s_ext[gather_idx[b,i,j]] * gather_scale[b,i,j]
    scatter:  s[scatter_idx[b,i,j]] = Y[b,i,j] * scatter_scale[b,i,j]
    Both maps embed the actual r x r block in the top-left corner of the
    padded k x k matrix; padding lanes read the dump slot with scale 0 and
    write to the dump slot.
    """

    gather_idx: Any      # int32 [B, k, k]
    gather_scale: Any    # dtype [B, k, k]
    scatter_idx: Any     # int32 [B, k, k]
    scatter_scale: Any   # dtype [B, k, k]
    side: int = static_field()
    symmetrize: bool = static_field()  # square storage needs (X + X^T)/2
    # Fast paths for a bucket of uniform-side triangle blocks in contiguous
    # rows (every uniform block_sdp / padded decomposed layout): the
    # per-iteration [B,k,k] arbitrary-index gather/scatter — measured as
    # the TOP per-iteration cost on chip (XLA TPU gathers run at a few
    # elements/cycle) — becomes either
    #  * "matmul" (k <= 64): a contiguous reshape plus one small selection
    #    matmul on the MXU (svec->full expansion S, full->svec compression
    #    S2, sqrt2 scaling folded in); the matrices are O(tri(k) k^2), so
    #    this caps at small k; or
    #  * "shear" (k > 64): svec columns are CONTIGUOUS runs, so expansion
    #    is k slice-gathers of length r (one dynamic_slice per column via
    #    vmap -> one structured XLA gather) + a mask/scale + symmetrize,
    #    and compression one flat [tri]-index gather from the k*k matrix.
    #    Measured at [8,256,256]: 3.88 -> 0.38 ms expand, 2.99 -> 0.37 ms
    #    compress vs the scalar-index maps.
    #  * "colpad" (PsdConeTriangleColPad storage): the svec entries already
    #    sit at a constant column stride r0 in v, so expansion is ONE
    #    contiguous reshape + mask/scale + symmetrize and compression one
    #    masked transpose — zero gathers (measured r0=896 on v5e: 3.70 ms
    #    shear -> 0.018 ms).
    fastpath: str = static_field(default="none")   # "none"|"matmul"|"shear"|"colpad"
    # per-bucket eigh backend override ("" = use the ConeData-global one).
    # "auto" resolution gives the single dominant small-k large-batch bucket
    # the Pallas Jacobi kernel and everyone else polar: at [1729, 8, 8] the
    # kernel measured 88 us vs polar's 1099, but a 9-block k=24 bucket pays
    # the kernel's fixed 128-slab cost (276 us vs 2 for polar). At most ONE
    # pallas instantiation per program — the regime the headline bench has
    # exercised for rounds (mixed pallas shapes have faulted the TPU worker
    # before).
    backend: str = static_field(default="")
    contig_start: int = static_field(default=-1)   # v offset of the bucket
    tri_len: int = static_field(default=0)          # tri_dim(r0)
    r0: int = static_field(default=0)               # real (uniform) side
    expand: Any = None     # dtype [tri_len, k*k]      (matmul)
    compress: Any = None   # dtype [k*k, tri_len]      (matmul)
    sh_starts: Any = None  # int32 [r0] column starts   (shear)
    sh_scale: Any = None   # dtype [r0, r0] mask*scale  (shear, rows = cols)
    sh_flat: Any = None    # int32 [tri_len] flat (i*r0+j) map (shear)
    sh_csc: Any = None     # dtype [tri_len] compress scale     (shear)
    cp_csc: Any = None     # dtype [r0, r0] compress mask*scale (colpad,
                           # [j, i] layout: sqrt2 i<j, 1 i==j, 0 pads)
    # optional NamedSharding over the MATRIX row dim (set by
    # parallel.shard_cones for buckets whose batch is smaller than the
    # mesh): the batched eig/polar matmuls then shard over rows of the
    # block instead of replicating the whole k^3 projection per device
    spec: Any = static_field(default=None)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class ExpCones:
    idx: Any       # int32 [N, 3]
    is_dual: Any   # bool  [N]
    tol: Any = None       # dtype [N] per-cone projection tolerance
    max_iter: int = static_field(default=100)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class PowCones:
    idx: Any       # int32 [N, 3]
    alpha: Any     # dtype [N]
    is_dual: Any   # bool  [N]
    tol: Any = None       # dtype [N] per-cone projection tolerance
    max_iter: int = static_field(default=20)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class ConeData:
    """Batched device representation of a Cartesian product of cones."""

    m: int = static_field()
    n_rect_segments: int = static_field()
    # batched-eig backend for PSD buckets: "xla" (jnp.linalg.eigh) or
    # "jacobi" (parallel-ordered Jacobi, ops/eigh.py)
    eigh_backend: str = static_field(default="xla")
    jacobi_sweeps: int = static_field(default=8)

    # elementwise family: rows of ZeroSet (l=u=0), Nonnegatives (l=0,u=inf),
    # Box (user bounds) and 1x1 PSD blocks (l=0,u=inf); +/-inf elsewhere.
    lb: Any = None        # dtype [m]
    ub: Any = None        # dtype [m]

    # row classification masks (for rho rules / constraint classification)
    eq_mask: Any = None       # bool [m]  ZeroSet rows
    nonneg_mask: Any = None   # bool [m]  Nonnegatives rows (incl. 1x1 PSD)
    box_mask: Any = None      # bool [m]  Box rows

    # Ruiz rectification segments (cones that need scalar scaling,
    # reference: src/convexset.jl:953-958): rows of segment i share one
    # scaling factor == mean of their Ruiz row scalings.
    rect_mask: Any = None     # bool  [m]
    rect_seg: Any = None      # int32 [m] in [0, n_rect_segments]; dump == last

    soc_buckets: Tuple[SocBucket, ...] = ()
    psd_buckets: Tuple[PsdBucket, ...] = ()
    exp: ExpCones = None
    pow: PowCones = None
    # user-defined cones: ((offset, cone_object), ...); the cone objects are
    # static (their jittable member functions are called during tracing)
    custom: Tuple = static_field(default=())


def resolve_eigh_backend(requested: str, buckets=None,
                         accel_on: bool = True,
                         decomposed: bool = False) -> str:
    """The single source of truth for resolving an ``"auto"`` eigh backend.

    Used by :func:`compile_cones` (which sees all PSD buckets) and by the
    projection fallback for hand-built :class:`ConeData` (``buckets=None``,
    which resolves conservatively). Off-TPU, LAPACK/XLA eigh always wins.
    On TPU, the Pallas Jacobi kernel is selected for a *single* bucket of
    side <= 16 (~2x the Newton-Schulz polar throughput there: 434 vs 932
    us/proj at [512, 16, 16] on v5e) — when Anderson acceleration is off
    (``accel_on=False``), or under Anderson only for DECOMPOSED problems
    with a large block batch. The caution exists because f32 Jacobi
    carries an inherent ~1e-5 relative backward-error floor (accumulated
    similarity-transform rounding over ~sweeps*k^2/2 rotations; measured
    6e-6 at k=8, 1.7e-5 at k=16, flat in sweep count, vs 4e-7 for polar),
    and that projection noise can destabilize the safeguarded AA dynamics
    — measured: an 8x8 min-eig SDP (dense KKT, not decomposed) orbits at
    rp~0.16 forever under AA+pallas but solves in ~690 iters under
    AA+polar and ~450 under plain+pallas. On the decomposed family the
    combination is measured SAFE and much faster (round 4: banded-2000
    4 seeds + banded-10k 3 seeds all Solved at comparable iteration
    counts, 93 -> 122 iter/s at 10k) — the df32 refine endgame cuts
    through the projection floor there. Everything else — multiple
    buckets (mixed kernel shapes have triggered TPU-worker faults) or
    larger blocks (the serial rotation chain loses to pure batched
    matmuls — measured k=32: polar 2.2x faster at B=2048, see ROADMAP) —
    resolves to polar. Explicit ``"pallas"`` remains available for
    throughput-critical plain-ADMM workloads.
    """
    if requested != "auto":
        return requested
    import jax

    if jax.default_backend() != "tpu":
        return "xla"
    if buckets is not None and len(buckets) == 1 and buckets[0].side <= 16:
        if not accel_on:
            return "pallas"
        # Under Anderson, the kernel's ~1e-5 f32 floor is tolerated ONLY on
        # decomposed problems with a large block batch (measured round 4:
        # banded-2000 4 seeds and banded-10k 3 seeds all Solved at
        # comparable iterations, 93 -> 122 iter/s at 10k; the decomposed
        # path's df32 refine endgame cuts through the projection floor).
        # The measured AA+pallas orbit (8x8 min-eig SDP pinned at rp~0.16
        # forever) is a dense-KKT, non-decomposed problem — excluded here.
        if decomposed and buckets[0].gather_idx.shape[0] >= 256:
            return "pallas"
    return "polar"


def _tri_index(i: int, j: int) -> int:
    """svec index of entry (i, j), i <= j, column-major upper triangle
    (reference packing order: src/convexset.jl:432-442)."""
    return j * (j + 1) // 2 + i


def compile_cones(sets: List[C.ConvexSet], dtype=np.float64, psd_pad_to: int = 8,
                  soc_pad_pow2: bool = True, eigh_backend: str = "xla",
                  jacobi_sweeps: int = 8, accel_on: bool = True,
                  decomposed: bool = False) -> ConeData:
    """Build the batched cone representation from an ordered cone list.

    ``accel_on``: whether the solve will run Anderson acceleration — gates
    the ``"auto"`` backend's Pallas-Jacobi selection (its f32 projection
    noise floor destabilizes AA; see :func:`resolve_eigh_backend`)."""
    m = sum(s.dim for s in sets)
    DUMP = m

    lb = np.full(m, -np.inf, dtype=dtype)
    ub = np.full(m, np.inf, dtype=dtype)
    eq_mask = np.zeros(m, dtype=bool)
    nonneg_mask = np.zeros(m, dtype=bool)
    box_mask = np.zeros(m, dtype=bool)
    rect_mask = np.zeros(m, dtype=bool)
    rect_seg = np.zeros(m, dtype=np.int32)

    custom_cones: list = []
    soc_groups: dict[int, list[int]] = {}
    psd_groups: dict[tuple[int, bool], list[tuple[int, int]]] = {}  # (k, sym) -> [(offset, r)]
    exp_rows: list[tuple[int, bool, float, int]] = []
    pow_rows: list[tuple[int, float, bool, float, int]] = []

    n_rect = 0
    offset = 0
    for cone in sets:
        d = cone.dim
        rows = slice(offset, offset + d)
        if isinstance(cone, C.ZeroSet):
            lb[rows] = 0.0
            ub[rows] = 0.0
            eq_mask[rows] = True
        elif isinstance(cone, C.Nonnegatives):
            lb[rows] = 0.0
            nonneg_mask[rows] = True
        elif isinstance(cone, C.Box):
            lb[rows] = cone.l
            ub[rows] = cone.u
            box_mask[rows] = True
        elif isinstance(cone, C.SecondOrderCone):
            pad = pad_side(d, 1 if not soc_pad_pow2 else 2)
            soc_groups.setdefault(pad, []).append(offset)
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.PsdCone):
            r = cone.side
            if r <= 1:
                # 1x1 PSD block == nonnegativity (reference: convexset.jl:303-308)
                lb[rows] = 0.0
                nonneg_mask[rows] = True
            else:
                k = pad_side(r, psd_pad_to)
                psd_groups.setdefault((k, True), []).append((offset, r))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.PsdConeTriangle):
            r = cone.side
            if r <= 1:
                lb[rows] = 0.0
                nonneg_mask[rows] = True
            else:
                k = pad_side(r, psd_pad_to)
                psd_groups.setdefault((k, False), []).append((offset, r))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.PsdConeTriangleColPad):
            r = cone.side
            # column-padded svec storage (see the cone class): side is
            # emitted pre-padded by the chordal transform; the bucket side
            # IS the storage stride, so no further ladder padding applies
            psd_groups.setdefault((r, "colpad"), []).append((offset, r))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.PsdConeTriangleComplex):
            r = cone.side
            if r <= 1:
                # 1x1 Hermitian block: single real diagonal entry >= 0
                lb[rows] = 0.0
                nonneg_mask[rows] = True
            else:
                # real 2r x 2r embedding M = [[A, -B], [B, A]] of H = A + iB;
                # M is symmetric with the eigenvalues of H doubled, so the
                # real batched projection applies unchanged (reference
                # complex path: convexset.jl:344-360, :446-490 uses zheevr)
                k = pad_side(2 * r, psd_pad_to)
                psd_groups.setdefault((k, "complex"), []).append((offset, r))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.ExponentialCone):
            exp_rows.append((offset, False, cone.tol, cone.max_iter))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.DualExponentialCone):
            exp_rows.append((offset, True, cone.tol, cone.max_iter))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.PowerCone):
            pow_rows.append((offset, cone.alpha, False, cone.tol, cone.max_iter))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.DualPowerCone):
            pow_rows.append((offset, cone.alpha, True, cone.tol, cone.max_iter))
            rect_mask[rows] = True
            rect_seg[rows] = n_rect
            n_rect += 1
        elif isinstance(cone, C.CustomCone):
            custom_cones.append((offset, cone))
            if cone.scalar_scaling:
                rect_mask[rows] = True
                rect_seg[rows] = n_rect
                n_rect += 1
        else:
            raise TypeError(f"Unsupported cone type: {type(cone).__name__}")
        offset += d

    # rows that are not in any rectified cone go to the dump segment
    rect_seg = np.where(rect_mask, rect_seg, n_rect).astype(np.int32)

    # --- SOC buckets ---
    soc_buckets = []
    for d_pad, offsets in sorted(soc_groups.items()):
        idx = np.full((len(offsets), d_pad), DUMP, dtype=np.int32)
        for b, o in enumerate(offsets):
            # actual dim of this cone: recover from the sets list is awkward;
            # instead store contiguous rows until the next cone. We recorded
            # only offsets; recompute dims below.
            pass
        soc_buckets.append((d_pad, offsets, idx))
    # second pass to fill dims (need dims per offset)
    soc_dims = {}
    off = 0
    for cone in sets:
        if isinstance(cone, C.SecondOrderCone):
            soc_dims[off] = cone.dim
        off += cone.dim
    soc_bucket_objs = []
    for d_pad, offsets, idx in soc_buckets:
        for b, o in enumerate(offsets):
            d = soc_dims[o]
            idx[b, :d] = np.arange(o, o + d, dtype=np.int32)
        soc_bucket_objs.append(SocBucket(idx=idx))

    # --- PSD buckets ---
    # normalize groups to (k, [(offset, r, kind), ...]) and consolidate all
    # small buckets into one: per-iteration cost is dominated by the number
    # of sequential projection dispatches, not padded FLOPs, and the Pallas
    # kernel is stable in the single-small-bucket regime
    norm_groups: dict = {}
    for (k, kind), blocks in psd_groups.items():
        norm_groups.setdefault(k, []).extend((o, r, kind) for (o, r) in blocks)
    # consolidation enlarges the gather/scatter maps (every block padded to
    # the largest small side), which costs more than the saved dispatches —
    # only collapse pathological shape diversity to bound compile time
    if psd_pad_to > 1:
        # colpad groups are excluded: their gather/scatter templates are
        # built at the block's own storage stride r == k, and merging an
        # r < k colpad block into a larger-side bucket would index past its
        # r*r region into neighboring cones' rows (colpad storage has no
        # in-bucket ladder padding by design — the side IS the stride)
        small_sides = [
            k for k, blocks in norm_groups.items()
            if k <= 48 and not any(kind == "colpad" for (_, _, kind) in blocks)
        ]
        if len(small_sides) > 6:
            target = max(small_sides)
            merged = []
            for k in small_sides:
                merged.extend(norm_groups.pop(k))
            norm_groups.setdefault(target, []).extend(merged)

    psd_bucket_objs = []
    for k, blocks in sorted(norm_groups.items()):
        kinds = {kind for (_, _, kind) in blocks}
        # square (column-stacked) storage gathers an unsymmetrized matrix;
        # symmetrizing is a no-op for the other storages, so a mixed bucket
        # just symmetrizes everything
        symmetrize = True in kinds
        B = len(blocks)
        g_idx = np.full((B, k, k), DUMP, dtype=np.int32)
        g_scl = np.zeros((B, k, k), dtype=dtype)
        s_idx = np.full((B, k, k), DUMP, dtype=np.int32)
        s_scl = np.zeros((B, k, k), dtype=dtype)

        # svec-triangle blocks (the universal decomposed-SDP kind) fill
        # their maps vectorized: one [k,k] template per distinct side r,
        # broadcast over every block of that side (a Python per-entry loop
        # here was 0.6 s of the 10k north-star host setup)
        tri_batch: dict[int, list[tuple[int, int]]] = {}
        for b, (o, r, kind) in enumerate(blocks):
            if kind is False:
                tri_batch.setdefault(r, []).append((b, o))
        for r, bo in tri_batch.items():
            ii, jj = np.tril_indices(r)        # i >= j pairs; use (j, i)
            i_, j_ = jj, ii                    # upper triangle i <= j
            t = j_ * (j_ + 1) // 2 + i_        # _tri_index vectorized
            scl_g = np.where(i_ == j_, 1.0, 1.0 / SQRT2).astype(dtype)
            scl_s = np.where(i_ == j_, 1.0, SQRT2).astype(dtype)
            bs = np.asarray([b for (b, _) in bo], np.int64)
            os_ = np.asarray([o for (_, o) in bo], np.int64)
            tb = (os_[:, None] + t[None, :]).astype(np.int32)   # [Nb, T]
            bb = np.broadcast_to(bs[:, None], tb.shape)
            iB = np.broadcast_to(i_[None, :], tb.shape)
            jB = np.broadcast_to(j_[None, :], tb.shape)
            g_idx[bb, iB, jB] = tb
            g_idx[bb, jB, iB] = tb
            g_scl[bb, iB, jB] = scl_g[None, :]
            g_scl[bb, jB, iB] = scl_g[None, :]
            s_idx[bb, iB, jB] = tb
            s_scl[bb, iB, jB] = scl_s[None, :]

        # colpad blocks fill vectorized too: gather reads the stored upper
        # entry for both (i,j) and (j,i); scatter writes the upper entries
        # scaled and the strictly-lower PAD slots with scale 0 (so every v
        # slot in the region is covered even on the non-fastpath route)
        cp_blocks = [(b, o) for b, (o, r, kind) in enumerate(blocks)
                     if kind == "colpad"]
        if cp_blocks:
            r = k
            iu, ju = np.triu_indices(r)            # i <= j
            t = ju * r + iu                        # stored slot (col-major)
            scl_g = np.where(iu == ju, 1.0, 1.0 / SQRT2).astype(dtype)
            scl_s = np.where(iu == ju, 1.0, SQRT2).astype(dtype)
            il, jl = np.tril_indices(r, -1)        # i > j: pad slots
            tl = jl * r + il
            for b, o in cp_blocks:
                g_idx[b, iu, ju] = o + t
                g_idx[b, ju, iu] = o + t
                g_scl[b, iu, ju] = scl_g
                g_scl[b, ju, iu] = scl_g
                s_idx[b, iu, ju] = o + t
                s_scl[b, iu, ju] = scl_s
                s_idx[b, il, jl] = o + tl
                s_scl[b, il, jl] = 0.0

        for b, (o, r, kind) in enumerate(blocks):
            if kind is False or kind == "colpad":
                continue                        # filled vectorized above
            if kind == "complex":
                # H = A + iB packed as [svec(A); sqrt(2) * strict-upper(B)]
                # (reference: convexset.jl:446-490). Real embedding:
                # M[:r,:r] = M[r:,r:] = A; M[r:,:r] = B; M[:r,r:] = -B.
                isq = 1.0 / SQRT2
                for j in range(r):
                    for i in range(j + 1):
                        t = o + _tri_index(i, j)
                        scl = 1.0 if i == j else isq
                        for (ii, jj) in ((i, j), (j, i), (r + i, r + j), (r + j, r + i)):
                            g_idx[b, ii, jj] = t
                            g_scl[b, ii, jj] = scl
                        # scatter real parts from the top-left block
                        s_idx[b, i, j] = t
                        s_scl[b, i, j] = 1.0 if i == j else SQRT2
                for j in range(r):
                    for i in range(j):
                        t = o + r * (r + 1) // 2 + j * (j - 1) // 2 + i
                        for (ii, jj, sgn) in (
                            (r + i, j, 1.0), (r + j, i, -1.0),
                            (i, r + j, -1.0), (j, r + i, 1.0),
                        ):
                            g_idx[b, ii, jj] = t
                            g_scl[b, ii, jj] = sgn * isq
                        # scatter imag parts from the bottom-left block
                        s_idx[b, r + i, j] = t
                        s_scl[b, r + i, j] = SQRT2
            elif kind is True:  # square storage
                # square, column-stacked storage: vec index of (i,j) = o + j*r + i
                for j in range(r):
                    for i in range(r):
                        g_idx[b, i, j] = o + j * r + i
                        g_scl[b, i, j] = 1.0
                        s_idx[b, i, j] = o + j * r + i
                        s_scl[b, i, j] = 1.0
            # (svec triangle blocks — kind False — were filled vectorized)
        # uniform-side triangle blocks in contiguous rows -> selection-
        # matmul (small k) or slice-shear (large k) fast path
        # (projections._psd_gather / project)
        fastpath, contig_start, tri_len, r0u = "none", -1, 0, 0
        expand = compress = None
        sh_starts = sh_scale = sh_flat = sh_csc = cp_csc = None
        rs = {r for (_, r, _) in blocks}
        if kinds == {"colpad"} and len(rs) == 1:
            r0u = next(iter(rs))
            offs = [o for (o, _, _) in blocks]
            if all(offs[i + 1] - offs[i] == r0u * r0u
                   for i in range(len(offs) - 1)):
                fastpath = "colpad"
                contig_start = int(offs[0])
                tri_len = r0u * r0u           # region length per block
                jr = np.arange(r0u)
                mask = jr[None, :] <= jr[:, None]   # [j, i] rows = cols
                sh_scale = np.where(
                    jr[None, :] == jr[:, None], 1.0, 1.0 / SQRT2
                ).astype(dtype) * mask
                cp_csc = np.where(
                    jr[None, :] == jr[:, None], 1.0, SQRT2
                ).astype(dtype) * mask
        if kinds == {False} and len(rs) == 1:
            r0u = next(iter(rs))
            t0 = r0u * (r0u + 1) // 2
            offs = [o for (o, _, _) in blocks]
            if all(offs[i + 1] - offs[i] == t0 for i in range(len(offs) - 1)):
                contig_start = int(offs[0])
                tri_len = t0
                if k <= 64:
                    # the selection matrices are O(tri(k) * k^2) = O(k^4)
                    # (8.6 GB at k = 256); at small k they are a few MB and
                    # the matmul replaces the gather at a fraction of its
                    # cost
                    fastpath = "matmul"
                    expand = np.zeros((t0, k * k), dtype)
                    compress = np.zeros((k * k, t0), dtype)
                    for j in range(r0u):
                        for i in range(j + 1):
                            t = _tri_index(i, j)
                            scl = 1.0 if i == j else 1.0 / SQRT2
                            expand[t, i * k + j] = scl
                            expand[t, j * k + i] = scl
                            compress[i * k + j, t] = 1.0 if i == j else SQRT2
                else:
                    fastpath = "shear"
                    jr = np.arange(r0u)
                    sh_starts = (jr * (jr + 1) // 2).astype(np.int32)
                    # rows index the column j, lanes the row i (sheared)
                    mask = jr[None, :] <= jr[:, None]
                    sh_scale = np.where(
                        jr[None, :] == jr[:, None], 1.0, 1.0 / SQRT2
                    ).astype(dtype) * mask
                    jj_t = np.repeat(jr, jr + 1)
                    ii_t = np.arange(t0) - (jj_t * (jj_t + 1) // 2)
                    sh_flat = (ii_t * r0u + jj_t).astype(np.int32)
                    sh_csc = np.where(ii_t == jj_t, 1.0, SQRT2).astype(dtype)

        psd_bucket_objs.append(
            PsdBucket(
                gather_idx=g_idx,
                gather_scale=g_scl,
                scatter_idx=s_idx,
                scatter_scale=s_scl,
                side=k,
                symmetrize=symmetrize,
                fastpath=fastpath,
                contig_start=contig_start,
                tri_len=tri_len,
                r0=int(r0u),
                expand=expand,
                compress=compress,
                sh_starts=sh_starts,
                sh_scale=sh_scale,
                sh_flat=sh_flat,
                sh_csc=sh_csc,
                cp_csc=cp_csc,
            )
        )

    # --- exp / pow stacks ---
    if exp_rows:
        e_idx = np.array(
            [[o, o + 1, o + 2] for (o, *_a) in exp_rows], dtype=np.int32
        )
        e_dual = np.array([d for (_, d, _t, _mi) in exp_rows], dtype=bool)
        e_tol = np.array([t for (_, _d, t, _mi) in exp_rows], dtype=dtype)
        exp = ExpCones(
            idx=e_idx, is_dual=e_dual, tol=e_tol,
            max_iter=max(mi for (_, _d, _t, mi) in exp_rows),
        )
    else:
        exp = ExpCones(
            idx=np.zeros((0, 3), np.int32), is_dual=np.zeros((0,), bool),
            tol=np.zeros((0,), dtype),
        )

    if pow_rows:
        p_idx = np.array([[o, o + 1, o + 2] for (o, *_a) in pow_rows], dtype=np.int32)
        p_alpha = np.array([a for (_, a, _d, _t, _mi) in pow_rows], dtype=dtype)
        p_dual = np.array([d for (_, _a, d, _t, _mi) in pow_rows], dtype=bool)
        p_tol = np.array([t for (_, _a, _d, t, _mi) in pow_rows], dtype=dtype)
        pw = PowCones(
            idx=p_idx, alpha=p_alpha, is_dual=p_dual, tol=p_tol,
            max_iter=max(mi for (_, _a, _d, _t, mi) in pow_rows),
        )
    else:
        pw = PowCones(
            idx=np.zeros((0, 3), np.int32),
            alpha=np.zeros((0,), dtype),
            is_dual=np.zeros((0,), bool),
            tol=np.zeros((0,), dtype),
        )

    requested = eigh_backend
    eigh_backend = resolve_eigh_backend(eigh_backend, psd_bucket_objs,
                                        accel_on, decomposed)
    if (
        requested == "auto"
        and eigh_backend == "polar"
        and (not accel_on or decomposed)
        and len(psd_bucket_objs) > 1
    ):
        import jax

        if jax.default_backend() == "tpu":
            # multi-bucket solves: give the single dominant small-k
            # large-batch bucket the Pallas kernel (see PsdBucket.backend)
            # — decomposed SDPs concentrate most blocks in one small-side
            # bucket (maxcut-2000: [1729, 8] dominates the projection at
            # 1105 of 1631 us under polar; maxcut-10k: [8540, 8] polar is
            # 4.9 ms of an 8.2 ms projection). Under Anderson this is
            # allowed only for DECOMPOSED problems — the same
            # family-validated rule as the single-bucket case in
            # resolve_eigh_backend (measured: maxcut-2000 seeds solve at
            # comparable iterations, see ROADMAP)
            cand = [
                (b.gather_idx.shape[0] * b.side**3, i)
                for i, b in enumerate(psd_bucket_objs)
                if b.side <= 16 and b.gather_idx.shape[0] >= 256
            ]
            if cand:
                _, i_star = max(cand)
                psd_bucket_objs[i_star] = dataclasses.replace(
                    psd_bucket_objs[i_star], backend="pallas"
                )

    return ConeData(
        m=m,
        n_rect_segments=n_rect,
        eigh_backend=eigh_backend,
        jacobi_sweeps=jacobi_sweeps,
        lb=lb,
        ub=ub,
        eq_mask=eq_mask,
        nonneg_mask=nonneg_mask,
        box_mask=box_mask,
        rect_mask=rect_mask,
        rect_seg=rect_seg,
        soc_buckets=tuple(soc_bucket_objs),
        psd_buckets=tuple(psd_bucket_objs),
        exp=exp,
        pow=pw,
        custom=tuple(custom_cones),
    )
