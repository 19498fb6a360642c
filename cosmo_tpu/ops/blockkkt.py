"""Block-diagonal direct KKT solver for structurally decoupled systems.

The ADMM x-update solves the reduced SPD system

    M x = r1 + A' (rho .* r2),     M = P + sigma I + A' diag(rho) A.

``M_ij`` is nonzero only when columns i and j of A share a row (or P_ij is
nonzero) — so under the connected components of that *column-intersection
graph*, M is **exactly block diagonal**.  For the compact chordal
decomposition (chordal/transform.py) of dual-form SDPs — the north-star
workload — the components are tiny: each aggregate-sparsity entry couples
one original variable with its chain of overlap variables (a handful of
columns), so the whole KKT solve collapses to a batched dense solve of
thousands of k<=64 blocks.  That replaces the CG inner loop (measured at
~23-33 iterations per ADMM iteration, each a latency-bound SpMM chain)
with one gather + one batched [N,k,k] matmul per iteration — and the
factorization (batched Cholesky on rho updates) maps straight onto the
MXU.

The reference's analog is the sparse QDLDL factorization of the full KKT
system (reference: src/linear_solver/kktsolver.jl:285-320); this module is
its TPU-native replacement for problems whose reduced system decouples.
Host-side :func:`analyze` decides applicability (components bounded by
``max_block``) and emits static index maps; everything on device is
scatter/gather + batched dense linear algebra with fixed shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import df32
from .linops import Coo, matvec, rmatvec
from ..utils.pytrees import register_pytree_dataclass, static_field


# Padded component-size ladder: one batched shape per bucket keeps the
# number of distinct XLA subgraphs small (same reasoning as the PSD
# bucket ladder in ops/conedata.py).
_LADDER = (1, 2, 4, 8, 16, 32, 64)

# Bail out of the analysis when the pair lists would get silly — the CG
# path handles those problems instead.
_MAX_PAIRS = 40_000_000
_MAX_BLOCK_MEM = 2 << 30  # bytes of Minv storage across buckets


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class BlockBucket:
    """One padded component bucket of the block-diagonal reduced system."""

    k: int = static_field()          # padded block side
    N: int = static_field()          # number of components in the bucket
    # optional NamedSharding over the component batch dim (set by
    # parallel.shard_blockkkt): factor/apply then pin the batched
    # Cholesky/matmul — the O(N k^3)/O(N k^2) work — to shard over the
    # mesh while the cheap pair-list assembly stays replicated
    spec: Any = static_field(default=None)
    cols: Any = None                 # int32 [N, k] member columns (pad = n)
    a_rows: Any = None               # int32 [nA] row id of each A-pair (rho gather)
    a_pi: Any = None                 # int32 [nA] row-sorted nnz index of entry a
    a_pj: Any = None                 # int32 [nA] row-sorted nnz index of entry b
    a_tgt: Any = None                # int32 [nA] flat target in [N*k*k]
    p_idx: Any = None                # int32 [nP] row-sorted nnz index into P
    p_tgt: Any = None                # int32 [nP] flat target in [N*k*k]
    # sorted-by-target stream over concat(A-pairs, P-entries), for the
    # compensated (double-f32) assembly of the block matrices themselves:
    # the refinement residual is then a batched [N,k,k] pair-matvec instead
    # of three global COO compensated passes per step (measured: each
    # refine step cost ~3.6 ms/iter on the 2k-node decomposed SDP)
    m_width: int = static_field(default=0)  # max entries per target
    m_perm: Any = None               # int32 [nA+nP] sort-by-target order
    m_ptr: Any = None                # int32 [nUniq+1] CSR ptr over targets
    m_uniq: Any = None               # int32 [nUniq] unique flat targets
    # Block-structured A applies: every row of A has all its nnz inside one
    # component (that is what defines the components), so A restricted to
    # the bucket is a batched dense [N, R, k] tensor and the per-iteration
    # t = r1 + A'(rho r2) / nu = rho (A x - r2) become batched einsums
    # instead of global COO ELL passes (the largest remaining per-iteration
    # cost after the projection fast path).
    R: int = static_field(default=0)         # padded rows per component
    row_ids: Any = None              # int32 [N, R] row of A (pad = m)
    av_idx: Any = None               # int32 [nAv] row-sorted nnz index
    av_tgt: Any = None               # int32 [nAv] flat target in [N*R*k]


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class BlockKKTMeta:
    """Static structure of the block-diagonal reduced KKT system."""

    n: int = static_field()
    buckets: Tuple[BlockBucket, ...] = ()


def _canonical_coo(X):
    """Replicate linops.coo_from_scipy's nnz ordering exactly (row-major,
    canonicalized through csr) so device-side ``vals[idx]`` gathers hit the
    intended entries."""
    import scipy.sparse as sp

    Xc = sp.coo_matrix(sp.csr_matrix(X))
    r = np.asarray(Xc.row, dtype=np.int64)
    c = np.asarray(Xc.col, dtype=np.int64)
    p = np.lexsort((c, r))
    return r[p], c[p]


def analyze(P, A, max_block: int = 64) -> BlockKKTMeta | None:
    """Host-side structure analysis. Returns the static index maps when the
    reduced system decouples into components of size <= ``max_block``, else
    None (caller falls back to CG/MINRES)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    m, n = A.shape
    ar, ac = _canonical_coo(A)
    prow, pcol = _canonical_coo(P)

    counts = np.bincount(ar, minlength=m).astype(np.int64)
    if counts.size and counts.max() > max_block:
        return None  # a row with t nnz forces a component of size >= t
    if int((counts**2).sum()) + prow.size > _MAX_PAIRS:
        return None

    # connectivity: chain edges within each row of A + off-diagonal P entries
    same = ar[1:] == ar[:-1]
    eu = np.concatenate([ac[:-1][same], prow[prow != pcol]])
    ev = np.concatenate([ac[1:][same], pcol[prow != pcol]])
    graph = sp.csr_matrix(
        (np.ones(eu.size, np.int8), (eu, ev)), shape=(n, n)
    )
    n_comp, labels = connected_components(graph, directed=False)
    sizes = np.bincount(labels, minlength=n_comp).astype(np.int64)
    if sizes.max() > max_block:
        return None

    # pad sizes up the ladder; memory guard on the cached inverses
    pad = np.empty(n_comp, np.int64)
    for k in _LADDER[::-1]:
        pad[sizes <= k] = k
    if int((pad**2).sum()) * 8 > _MAX_BLOCK_MEM:
        return None

    # slot position of each column inside its component (members ascending)
    order = np.argsort(labels, kind="stable")
    comp_start = np.zeros(n_comp + 1, np.int64)
    np.cumsum(sizes, out=comp_start[1:])
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n, dtype=np.int64) - comp_start[labels[order]]

    # A pairs: all ordered nnz pairs within each row, grouped by row arity
    row_start = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=row_start[1:])
    pis, pjs, prs = [], [], []
    for t in np.unique(counts[counts > 0]):
        rows_t = np.nonzero(counts == t)[0]
        idx = row_start[rows_t][:, None] + np.arange(t, dtype=np.int64)
        shape = (rows_t.size, t, t)
        pis.append(np.broadcast_to(idx[:, :, None], shape).reshape(-1))
        pjs.append(np.broadcast_to(idx[:, None, :], shape).reshape(-1))
        prs.append(np.repeat(rows_t, t * t))
    a_pi = np.concatenate(pis) if pis else np.zeros(0, np.int64)
    a_pj = np.concatenate(pjs) if pjs else np.zeros(0, np.int64)
    a_row = np.concatenate(prs) if prs else np.zeros(0, np.int64)

    buckets = []
    for k in _LADDER:
        comps_b = np.nonzero(pad == k)[0]
        if comps_b.size == 0:
            continue
        N = int(comps_b.size)
        local = np.full(n_comp, -1, np.int64)
        local[comps_b] = np.arange(N, dtype=np.int64)

        cols_b = np.full((N, k), n, np.int64)
        col_mask = local[labels] >= 0
        cb_cols = np.nonzero(col_mask)[0]
        cols_b[local[labels[cb_cols]], pos[cb_cols]] = cb_cols

        ca, cbb = ac[a_pi], ac[a_pj]
        amask = local[labels[ca]] >= 0
        tgt = (local[labels[ca[amask]]] * k + pos[ca[amask]]) * k + pos[cbb[amask]]

        pmask = local[labels[prow]] >= 0
        ptgt = (local[labels[prow[pmask]]] * k + pos[prow[pmask]]) * k + pos[
            pcol[pmask]
        ]

        # block-structured A: rows of this bucket's components, padded to
        # the bucket's exact max rows R
        rows_nz = np.nonzero(counts > 0)[0]
        rcomp = labels[ac[row_start[rows_nz]]]          # component per row
        rmask = local[rcomp] >= 0
        rows_b = rows_nz[rmask]
        rloc = local[rcomp[rmask]]
        rows_per = np.bincount(rloc, minlength=N)
        # exact max rows per component: the df32 pairwise reductions pad to
        # a power of two internally (df32._pairwise_sum), so pow2-padding R
        # here only inflated the per-iteration [N, R] row gather/scatter —
        # measured ~6.6 ns per gathered element on v5e, 21% of the m-side
        # movement at the 10k north-star was R padding
        R = 1 if rows_b.size == 0 else int(rows_per.max())
        slot_order = np.argsort(rloc, kind="stable")
        slot = np.empty(rows_b.size, np.int64)
        rstart = np.zeros(N + 1, np.int64)
        np.cumsum(rows_per, out=rstart[1:])
        slot[slot_order] = (
            np.arange(rows_b.size, dtype=np.int64) - rstart[rloc[slot_order]]
        )
        if N * R * k > 200_000_000:
            # skewed rows-per-component would blow the dense-A cache (the
            # padded tensor is N*R*k); fall back to the COO applies
            R = 0
        row_ids = None
        if R:
            row_ids = np.full((N, R), m, np.int64)
            row_ids[rloc, slot] = rows_b
        # nnz placement: entry e of row r goes to (comp, row slot, col pos)
        ridx = np.repeat(np.arange(rows_b.size, dtype=np.int64),
                         counts[rows_b])
        total = int(counts[rows_b].sum())
        off = np.zeros(rows_b.size + 1, np.int64)
        np.cumsum(counts[rows_b], out=off[1:])
        intra = np.arange(total, dtype=np.int64) - off[ridx]
        if R:
            av_idx = row_start[rows_b][ridx] + intra
            av_tgt = (rloc[ridx] * R + slot[ridx]) * k + pos[ac[av_idx]]
        else:
            av_idx = np.zeros(0, np.int64)
            av_tgt = np.zeros(0, np.int64)

        all_tgt = np.concatenate([tgt, ptgt])
        m_perm = np.argsort(all_tgt, kind="stable")
        sorted_t = all_tgt[m_perm]
        m_uniq, m_counts = np.unique(sorted_t, return_counts=True)
        m_ptr = np.zeros(m_uniq.size + 1, np.int64)
        np.cumsum(m_counts, out=m_ptr[1:])

        buckets.append(
            BlockBucket(
                k=k, N=N,
                cols=np.asarray(cols_b, np.int32),
                a_rows=np.asarray(a_row[amask], np.int32),
                a_pi=np.asarray(a_pi[amask], np.int32),
                a_pj=np.asarray(a_pj[amask], np.int32),
                a_tgt=np.asarray(tgt, np.int32),
                p_idx=np.asarray(np.nonzero(pmask)[0], np.int32),
                p_tgt=np.asarray(ptgt, np.int32),
                m_width=int(m_counts.max()) if m_counts.size else 0,
                m_perm=np.asarray(m_perm, np.int32),
                m_ptr=np.asarray(m_ptr, np.int32),
                m_uniq=np.asarray(m_uniq, np.int32),
                R=R,
                row_ids=(np.asarray(row_ids, np.int32)
                         if row_ids is not None else None),
                av_idx=np.asarray(av_idx, np.int32),
                av_tgt=np.asarray(av_tgt, np.int32),
            )
        )
    return BlockKKTMeta(n=int(n), buckets=tuple(buckets))


# ----------------------------------------------------------------------
# Device numeric phase
# ----------------------------------------------------------------------

def factor(meta: BlockKKTMeta, P: Coo, A: Coo, sigma, rho_vec,
           build_pair: bool = False):
    """Assemble the component blocks of M and cache their inverses.

    Runs at setup and again (under ``lax.cond``) on every rho update —
    the analog of the reference's ``update_rho!`` refactorization
    (kktsolver.jl:118-124).  Cost: one scatter-add over the pair lists +
    one batched Cholesky / triangular inversion per bucket, all
    MXU/VPU-shaped.

    ``build_pair``: additionally assemble the blocks as double-f32 pairs
    (compensated segment sum over the sorted target stream) so the
    refinement residual in :func:`solve` can be a batched block pair-matvec
    of the *exact* M instead of three global compensated COO passes per
    step. State per bucket: ``(Minv,)`` or ``(Minv, Mh, Ml)``.
    """
    dtype = A.vals.dtype
    states = []
    for b in meta.buckets:
        ar = jnp.arange(b.k)
        # sigma on real diagonals; identity on padded slots so the
        # factorization stays nonsingular (and the pad solves to 0)
        diag_add = jnp.where(jnp.asarray(b.cols) == meta.n,
                             jnp.ones((), dtype), jnp.asarray(sigma, dtype))
        if build_pair:
            # error-free products A_i A_j rho, P entries exact, reduced per
            # unique target with the compensated segment sum — Mh + Ml is
            # M to double-f32 accuracy (the refinement target)
            a_hi, a_e = df32.two_prod(A.vals[b.a_pi], A.vals[b.a_pj])
            rho_g = rho_vec[b.a_rows]
            m_hi, m_e1 = df32.two_prod(a_hi, rho_g)
            m_e = m_e1 + a_e * rho_g
            stream_h = jnp.concatenate([m_hi, P.vals[b.p_idx]])
            stream_e = jnp.concatenate([m_e, jnp.zeros(b.p_idx.size, dtype)])
            sh = stream_h[b.m_perm]
            se = stream_e[b.m_perm]
            hi, lo = df32._segment_sum_df32(sh, se, jnp.asarray(b.m_ptr),
                                            b.m_width)
            Mh = jnp.zeros(b.N * b.k * b.k, dtype).at[b.m_uniq].set(hi)
            Ml = jnp.zeros(b.N * b.k * b.k, dtype).at[b.m_uniq].set(lo)
            Mh = Mh.reshape(b.N, b.k, b.k)
            Ml = Ml.reshape(b.N, b.k, b.k)
            dh, de = df32.two_sum(Mh[:, ar, ar], diag_add)
            Mh = Mh.at[:, ar, ar].set(dh)
            Ml = Ml.at[:, ar, ar].add(de)
            M = Mh
        else:
            Mflat = jnp.zeros(b.N * b.k * b.k, dtype)
            if b.p_idx.size:
                Mflat = Mflat.at[b.p_tgt].add(P.vals[b.p_idx])
            if b.a_pi.size:
                w = A.vals[b.a_pi] * A.vals[b.a_pj] * rho_vec[b.a_rows]
                Mflat = Mflat.at[b.a_tgt].add(w)
            M = Mflat.reshape(b.N, b.k, b.k)
            M = M.at[:, ar, ar].add(diag_add)
        if b.spec is not None:
            # mesh-sharded bucket: the assembly above is replicated (cheap,
            # elementwise over the pair lists); pin the batched factorization
            # to shard over the component dim so the O(N k^3) work splits
            # across devices. Per-block math is local to one device.
            M = jax.lax.with_sharding_constraint(M, b.spec)
        L = jnp.linalg.cholesky(M)
        eye = jnp.broadcast_to(jnp.eye(b.k, dtype=dtype), (b.N, b.k, b.k))
        # cache the explicit inverse: the per-iteration apply is then one
        # batched [N,k,k]@[N,k] matmul (pure MXU) instead of two batched
        # triangular solves; the df32 refinement envelope absorbs the
        # slight extra rounding when tolerances are tight
        Minv = jax.scipy.linalg.cho_solve((L, True), eye)
        # block-dense A for the batched t/nu applies (one scatter; A is
        # constant across rho updates but rebuilding keeps the state
        # self-contained under the lax.cond refactor)
        Adense = (
            jnp.zeros(b.N * b.R * b.k, dtype)
            .at[b.av_tgt].set(A.vals[b.av_idx])
            .reshape(b.N, b.R, b.k)
        ) if b.row_ids is not None and b.spec is None else None
        # per-component rho rows, cached per factor (rho only changes at a
        # refactor): saves one [N, R] gather per iteration in _solve_fused —
        # XLA TPU gathers measured ~1.4 ms per 680k elements at the 10k
        # north-star, per pass
        rhog = (
            jnp.concatenate([rho_vec, jnp.zeros(1, dtype)])[b.row_ids]
        ) if Adense is not None else None
        if build_pair:
            states.append((Minv, Mh, Ml, Adense, rhog))
        else:
            states.append((Minv, Adense, rhog))
    return tuple(states)


def _apply(meta: BlockKKTMeta, state, t):
    tp = jnp.concatenate([t, jnp.zeros(1, t.dtype)])
    out = jnp.zeros(meta.n + 1, t.dtype)
    for b, st in zip(meta.buckets, state):
        Minv = st[0]
        tb = tp[b.cols]
        xb = jnp.einsum("nij,nj->ni", Minv, tb)
        if b.spec is not None:
            # batched apply sharded over components; the scatter back into
            # the (replicated) solution gathers the component results —
            # O(n) on the interconnect, the SPMD analog of the CG path's
            # psum over partial A'y products
            xb = jax.lax.with_sharding_constraint(
                xb, jax.sharding.NamedSharding(
                    b.spec.mesh, jax.sharding.PartitionSpec(b.spec.spec[0])
                )
            )
        out = out.at[jnp.asarray(b.cols).reshape(-1)].set(xb.reshape(-1))
    return out[:-1]


def _matvec_pair(meta: BlockKKTMeta, state, x_pair):
    """Compensated M @ x from the pair-valued block matrices: a batched
    [N,k,k] elementwise-product + pairwise two_sum reduction per bucket
    (~20x less traffic than the global COO compensated passes)."""
    xh, xl = x_pair
    dtype = xh.dtype
    xh_e = jnp.concatenate([xh, jnp.zeros(1, dtype)])
    xl_e = jnp.concatenate([xl, jnp.zeros(1, dtype)])
    outh = jnp.zeros(meta.n + 1, dtype)
    outl = jnp.zeros(meta.n + 1, dtype)
    for b, st in zip(meta.buckets, state):
        Mh, Ml = st[1], st[2]
        Xh = xh_e[b.cols][:, None, :]             # [N, 1, k]
        Xl = xl_e[b.cols][:, None, :]
        p, e = df32.two_prod(Mh, Xh)
        e = e + Mh * Xl + Ml * Xh
        hi, lo = df32._pairwise_sum(p, e, axis=2)  # [N, k]
        if b.spec is not None:
            sp = jax.sharding.NamedSharding(
                b.spec.mesh, jax.sharding.PartitionSpec(b.spec.spec[0])
            )
            hi = jax.lax.with_sharding_constraint(hi, sp)
            lo = jax.lax.with_sharding_constraint(lo, sp)
        flat = jnp.asarray(b.cols).reshape(-1)
        outh = outh.at[flat].set(hi.reshape(-1))
        outl = outl.at[flat].set(lo.reshape(-1))
    return outh[:-1], outl[:-1]


def _block_matvec(meta: BlockKKTMeta, state, x, m: int):
    """A @ x via the cached block-dense A (batched einsum per bucket)."""
    xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    out = jnp.zeros(m + 1, x.dtype)
    for b, st in zip(meta.buckets, state):
        Ad = st[-2]
        xb = xp[b.cols]
        yb = jnp.einsum("nrk,nk->nr", Ad, xb)
        out = out.at[jnp.asarray(b.row_ids).reshape(-1)].set(yb.reshape(-1))
    return out[:-1]


def _block_rmatvec(meta: BlockKKTMeta, state, y):
    """A' @ y via the cached block-dense A."""
    yp = jnp.concatenate([y, jnp.zeros(1, y.dtype)])
    out = jnp.zeros(meta.n + 1, y.dtype)
    for b, st in zip(meta.buckets, state):
        Ad = st[-2]
        yb = yp[b.row_ids]
        xb = jnp.einsum("nrk,nr->nk", Ad, yb)
        out = out.at[jnp.asarray(b.cols).reshape(-1)].set(xb.reshape(-1))
    return out[:-1]


def _block_rhs2(meta: BlockKKTMeta, state, rho_vec, r1, r2):
    """Compensated t = r1 + A'(rho r2) via the block-dense A (replaces the
    global COO df32 pass). R is the bucket's exact max rows per component;
    df32._pairwise_sum pads its reduction axis to a power of two
    internally, so no pow2 padding of R is needed (or present) here."""
    dtype = r1.dtype
    ph, pl = df32.two_prod(rho_vec, r2)
    php = jnp.concatenate([ph, jnp.zeros(1, dtype)])
    plp = jnp.concatenate([pl, jnp.zeros(1, dtype)])
    outh = jnp.zeros(meta.n + 1, dtype)
    outl = jnp.zeros(meta.n + 1, dtype)
    for b, st in zip(meta.buckets, state):
        Ad = st[-2]
        yh = php[b.row_ids][:, :, None]            # [N, R, 1]
        yl = plp[b.row_ids][:, :, None]
        p, e = df32.two_prod(Ad, yh)
        e = e + Ad * yl
        # reduce over the row axis: move R last
        hi, lo = df32._pairwise_sum(
            jnp.swapaxes(p, 1, 2), jnp.swapaxes(e, 1, 2), axis=2
        )                                           # [N, k]
        flat = jnp.asarray(b.cols).reshape(-1)
        outh = outh.at[flat].set(hi.reshape(-1))
        outl = outl.at[flat].set(lo.reshape(-1))
    return df32.add((outh[:-1], outl[:-1]), df32.promote(r1))


def _solve_fused(meta: BlockKKTMeta, state, rho_vec, r1, r2):
    """Plain solve with the whole t -> x -> nu chain kept in block space.

    The unfused path costs ~8 global gather/scatter passes through n- and
    m-sized vectors per solve (rhs scatter + re-gather, apply scatter +
    re-gather, matvec scatter + global elementwise) — measured 5.65 ms of
    the 6.6 ms bare iteration at the 10k north-star, where XLA TPU
    scatters/gathers run at a few elements per cycle. Components have
    DISJOINT rows and columns (that is what makes the block-diagonal
    reduction exact), so each bucket can gather its inputs once, run the
    batched einsum chain locally, and scatter x and nu once. All
    elementwise values are computed in the same order as the unfused path
    — results are bitwise identical.
    """
    dtype = r1.dtype
    m = r2.shape[0]
    r1p = jnp.concatenate([r1, jnp.zeros(1, dtype)])
    r2p = jnp.concatenate([r2, jnp.zeros(1, dtype)])
    x_out = jnp.zeros(meta.n + 1, dtype)
    # rows not covered by any component (all-zero A rows, e.g. the compact
    # transform's pad rows) see Ax = 0 in the unfused path
    nu_out = jnp.concatenate([rho_vec * (0.0 - r2), jnp.zeros(1, dtype)])
    for b, st in zip(meta.buckets, state):
        Minv, Ad, rhog = st[0], st[-2], st[-1]     # rhog cached per factor
        rows = jnp.asarray(b.row_ids)
        r2g = r2p[rows]
        tb = r1p[b.cols] + jnp.einsum("nrk,nr->nk", Ad, rhog * r2g)
        xb = jnp.einsum("nij,nj->ni", Minv, tb)
        nub = rhog * (jnp.einsum("nrk,nk->nr", Ad, xb) - r2g)
        x_out = x_out.at[jnp.asarray(b.cols).reshape(-1)].set(xb.reshape(-1))
        nu_out = nu_out.at[rows.reshape(-1)].set(nub.reshape(-1))
    return x_out[:meta.n], nu_out[:m]


def _solve_fused_refined(meta: BlockKKTMeta, state, rho_vec, r1, r2,
                         refine_steps: int):
    """Refined solve with the rhs/apply/pair-matvec refinement chain kept
    in block space (see :func:`_solve_fused` — the same disjoint-rows/
    disjoint-columns argument; requires pair-valued state, i.e.
    factor(build_pair=True)). The compensated values are computed in the
    same elementwise/reduction order as the unfused path — bitwise
    identical results."""
    dtype = r1.dtype
    m = r2.shape[0]
    r1p = jnp.concatenate([r1, jnp.zeros(1, dtype)])
    r2p = jnp.concatenate([r2, jnp.zeros(1, dtype)])
    x_out = jnp.zeros(meta.n + 1, dtype)
    nu_out = jnp.concatenate([rho_vec * (0.0 - r2), jnp.zeros(1, dtype)])
    for b, st in zip(meta.buckets, state):
        Minv, Mh, Ml, Ad, rhog = st
        rows = jnp.asarray(b.row_ids)
        r2g = r2p[rows]
        # compensated t = r1 + A'(rho r2) (block-local _block_rhs2)
        ph, pl = df32.two_prod(rhog, r2g)
        p, e = df32.two_prod(Ad, ph[:, :, None])
        e = e + Ad * pl[:, :, None]
        hi, lo = df32._pairwise_sum(
            jnp.swapaxes(p, 1, 2), jnp.swapaxes(e, 1, 2), axis=2
        )                                           # [N, k]
        th, tl = df32.add((hi, lo), df32.promote(r1p[b.cols]))
        xp = df32.promote(jnp.einsum("nij,nj->ni", Minv, th))
        for _ in range(refine_steps):
            # block-local _matvec_pair of the exact (Mh, Ml)
            Xh = xp[0][:, None, :]
            Xl = xp[1][:, None, :]
            pp, ee = df32.two_prod(Mh, Xh)
            ee = ee + Mh * Xl + Ml * Xh
            mh, ml = df32._pairwise_sum(pp, ee, axis=2)
            rr = df32.to_f32(df32.add((th, tl), (-mh, -ml)))
            xp = df32.add(
                xp, df32.promote(jnp.einsum("nij,nj->ni", Minv, rr))
            )
        xb = df32.to_f32(xp)
        nub = rhog * (jnp.einsum("nrk,nk->nr", Ad, xb) - r2g)
        x_out = x_out.at[jnp.asarray(b.cols).reshape(-1)].set(xb.reshape(-1))
        nu_out = nu_out.at[rows.reshape(-1)].set(nub.reshape(-1))
    return x_out[:meta.n], nu_out[:m]


def supports_blockspace(meta) -> bool:
    """True when every bucket carries the block-dense A (row_ids) and no
    mesh sharding spec — the preconditions of the block-space x carry
    (:func:`solve_blockspace`)."""
    return (
        meta is not None
        and len(meta.buckets) > 0
        and all(b.row_ids is not None and b.spec is None
                for b in meta.buckets)
    )


def blockspace_cols(meta: BlockKKTMeta):
    """The concatenated member-column map [sum(N_b k_b)] over all buckets
    (pad slots == n). Components partition the columns, so this lists every
    column exactly once plus pads — the (static) permutation between the
    n-space x and its block-space layout. Trace-safe: ``cols`` may be a
    traced leaf inside the jitted solve; the concat is loop-invariant and
    hoisted."""
    if not meta.buckets:
        return jnp.zeros(0, jnp.int32)
    return jnp.concatenate(
        [jnp.asarray(b.cols, jnp.int32).reshape(-1) for b in meta.buckets])


def blockspace_dim(meta: BlockKKTMeta) -> int:
    """Static length of the block-space x layout (sum of N_b k_b)."""
    return int(sum(b.N * b.k for b in meta.buckets))


def solve_blockspace(meta: BlockKKTMeta, state, rho_vec, r1g, r2,
                     refine_steps: int = 0):
    """Fused solve with the x-space kept in the concatenated block layout.

    ``r1g`` is r1 already in block space (``r1_n`` gathered at
    :func:`blockspace_cols` — the solver keeps w1/q there permanently);
    returns ``(xg, nu)`` with ``xg`` in the same layout. This removes the
    per-iteration n-space index movement entirely: the round-5 split
    measured the fused solve as ~100% gather/scatter (rows 3.2 ms + cols
    1.7 ms gathers, x 1.5 ms + nu 2.9 ms scatters at the 10k north-star;
    einsums 5.5 us) — the cols gather and x scatter become static slices
    and a concat here. Same rho_vec-must-match-factor contract as
    :func:`solve`. Elementwise/reduction order matches :func:`_solve_fused`
    bitwise for the shared math.
    """
    dtype = r1g.dtype
    m = r2.shape[0]
    r2p = jnp.concatenate([r2, jnp.zeros(1, dtype)])
    nu_out = jnp.concatenate([rho_vec * (0.0 - r2), jnp.zeros(1, dtype)])
    xs = []
    off = 0
    has_pair = len(state) > 0 and len(state[0]) == 5
    for b, st in zip(meta.buckets, state):
        Minv, Ad, rhog = st[0], st[-2], st[-1]
        rows = jnp.asarray(b.row_ids)
        r2g = r2p[rows]
        r1b = r1g[off:off + b.N * b.k].reshape(b.N, b.k)
        off += b.N * b.k
        if refine_steps > 0 and has_pair:
            Mh, Ml = st[1], st[2]
            ph, pl = df32.two_prod(rhog, r2g)
            p, e = df32.two_prod(Ad, ph[:, :, None])
            e = e + Ad * pl[:, :, None]
            hi, lo = df32._pairwise_sum(
                jnp.swapaxes(p, 1, 2), jnp.swapaxes(e, 1, 2), axis=2
            )
            th, tl = df32.add((hi, lo), df32.promote(r1b))
            xp = df32.promote(jnp.einsum("nij,nj->ni", Minv, th))
            for _ in range(refine_steps):
                Xh = xp[0][:, None, :]
                Xl = xp[1][:, None, :]
                pp, ee = df32.two_prod(Mh, Xh)
                ee = ee + Mh * Xl + Ml * Xh
                mh, ml = df32._pairwise_sum(pp, ee, axis=2)
                rr = df32.to_f32(df32.add((th, tl), (-mh, -ml)))
                xp = df32.add(
                    xp, df32.promote(jnp.einsum("nij,nj->ni", Minv, rr))
                )
            xb = df32.to_f32(xp)
        else:
            tb = r1b + jnp.einsum("nrk,nr->nk", Ad, rhog * r2g)
            xb = jnp.einsum("nij,nj->ni", Minv, tb)
        nub = rhog * (jnp.einsum("nrk,nk->nr", Ad, xb) - r2g)
        xs.append(xb.reshape(-1))
        nu_out = nu_out.at[rows.reshape(-1)].set(nub.reshape(-1))
    return jnp.concatenate(xs), nu_out[:m]


def covered_rows_mask(meta: BlockKKTMeta, m: int):
    """Bool [m+1]: rows covered by some component (loop-invariant — build
    once per solve and pass to :func:`compensated_residuals`)."""
    covered = jnp.zeros(m + 1, bool)
    for bkt in meta.buckets:
        covered = covered.at[jnp.asarray(bkt.row_ids).reshape(-1)].set(True)
    return covered


def compensated_residuals(meta: BlockKKTMeta, state, xg, s, mu, bv, qg,
                          Einv, Dg, cinv, Px_pair_g=None, covered=None):
    """Termination/rho residuals (rp, rd, mp, md) of the reduced system in
    double-f32 through the block-dense A.

    Replaces the global df32 COO passes for decomposed problems: the COO
    compensated matvec is an [m, width] ELL gather + pairwise tree, which
    at the 10k north-star (m = 1.44M, width 10) measured **407 ms per
    check** vs ~9 ms here — every A row lives inside one component, so the
    compensated products are batched [N, R, k] two_prod/pairwise passes on
    the cached Ad tensors plus one rows gather. Definitions match
    ops/residuals.py: rp = max|Einv (Ax + s - b)|, rd = cinv max|Dg (Px +
    q - A'mu)| (evaluated in the block-space x layout — components
    partition the columns, pads are exactly 0), mp/md the component norms.

    ``xg``/``qg`` live in the block-space layout (:func:`blockspace_cols`);
    ``Einv`` is the m-vector row scaling (ones when unscaled); ``Dg`` the
    column scaling gathered to block space WITH pad slots zero (they mask
    the pad columns); ``Px_pair_g`` an optional compensated P x in block
    space (None when P has no entries).
    """
    dtype = xg.dtype
    m = s.shape[0]
    zero1 = jnp.zeros(1, dtype)
    sb_ext = jnp.concatenate([s - bv, zero1])
    mu_ext = jnp.concatenate([mu, zero1])
    E_ext = jnp.concatenate([Einv, zero1])   # pad slot 0 masks pad rows
    if covered is None:
        covered = covered_rows_mask(meta, m)
    rp_cov = jnp.zeros((), dtype)
    mp_ax = jnp.zeros((), dtype)
    at_h, at_l = [], []
    off = 0
    for bkt, st in zip(meta.buckets, state):
        Ad = st[-2]
        rows = jnp.asarray(bkt.row_ids)
        xb = xg[off:off + bkt.N * bkt.k].reshape(bkt.N, bkt.k)
        off += bkt.N * bkt.k
        # compensated (A x) at the covered rows: [N, R]
        p, e = df32.two_prod(Ad, xb[:, None, :])
        axh, axl = df32._pairwise_sum(p, e, axis=2)
        Er = E_ext[rows]
        rph, rpl = df32.add((axh, axl), df32.promote(sb_ext[rows]))
        rp_cov = jnp.maximum(
            rp_cov, jnp.max(jnp.abs(Er * df32.to_f32((rph, rpl)))))
        mp_ax = jnp.maximum(
            mp_ax, jnp.max(jnp.abs(Er * df32.to_f32((axh, axl)))))
        # compensated (A' mu) in block space: [N, k]
        p2, e2 = df32.two_prod(Ad, mu_ext[rows][:, :, None])
        h2, l2 = df32._pairwise_sum(
            jnp.swapaxes(p2, 1, 2), jnp.swapaxes(e2, 1, 2), axis=2)
        at_h.append(h2.reshape(-1))
        at_l.append(l2.reshape(-1))
    ath = jnp.concatenate(at_h)
    atl = jnp.concatenate(at_l)
    # uncovered rows have structurally zero A rows: r_prim there is s - b
    rp_unc = jnp.max(jnp.where(covered[:-1], 0.0,
                               jnp.abs(Einv * sb_ext[:-1])))
    rp = jnp.maximum(rp_cov, rp_unc)
    mp = jnp.maximum(mp_ax, jnp.maximum(
        jnp.max(jnp.abs(Einv * s)), jnp.max(jnp.abs(Einv * bv))))
    if Px_pair_g is None:
        ph = jnp.zeros_like(qg)
        pl = jnp.zeros_like(qg)
    else:
        ph, pl = Px_pair_g
    dh, dl = df32.add((ph, pl), df32.promote(qg))
    dh, dl = df32.add((dh, dl), (-ath, -atl))
    rd = cinv * jnp.max(jnp.abs(Dg * df32.to_f32((dh, dl))))
    md = cinv * jnp.maximum(
        jnp.max(jnp.abs(Dg * df32.to_f32((ph, pl)))),
        jnp.maximum(jnp.max(jnp.abs(Dg * qg)),
                    jnp.max(jnp.abs(Dg * df32.to_f32((ath, atl))))))
    return rp, rd, mp, md


def solve(meta: BlockKKTMeta, state, P, A, sigma, rho_vec, r1, r2,
          refine_steps: int = 0):
    """Solve the KKT system through the cached block inverses.

    Same contract (and the same compensated double-f32 refinement
    envelope) as ops/kkt.py ``dense_solve``. Returns (x_tilde, nu).
    When the state carries pair-valued blocks (factor(build_pair=True)),
    the refinement residual uses the batched block pair-matvec; otherwise
    it falls back to the global compensated COO passes.

    ``rho_vec`` MUST be the vector the ``state`` was factored with: the
    fused path reads the factor-time cached per-row rho (``rhog``) for
    covered rows and the argument only for uncovered ones, so a stale
    argument silently produces inconsistent nu across the two row classes.
    The in-tree solver always refactors on rho changes (solver.adapt_rho);
    direct callers changing rho must call :func:`factor` first.
    """
    use_block_A = len(state) > 0 and all(st[-2] is not None for st in state)
    m = r2.shape[0]
    if refine_steps <= 0:
        if use_block_A:
            return _solve_fused(meta, state, rho_vec, r1, r2)
        t = r1 + rmatvec(A, rho_vec * r2)
        x = _apply(meta, state, t)
    else:
        has_pair_f = len(state) > 0 and len(state[0]) == 5
        if use_block_A and has_pair_f:
            return _solve_fused_refined(meta, state, rho_vec, r1, r2,
                                        refine_steps)
        if use_block_A:
            t_pair = _block_rhs2(meta, state, rho_vec, r1, r2)
        else:
            t_pair = df32.kkt_rhs2(A, rho_vec, r1, r2)
        x_pair = df32.promote(_apply(meta, state, t_pair[0]))
        has_pair = len(state) > 0 and len(state[0]) == 5
        for _ in range(refine_steps):
            if has_pair:
                mh, ml = _matvec_pair(meta, state, x_pair)
                r = df32.to_f32(df32.add(t_pair, (-mh, -ml)))
            else:
                r = df32.kkt_residual_pair(
                    P, A, sigma, rho_vec, t_pair, x_pair
                )
            x_pair = df32.add(x_pair, df32.promote(_apply(meta, state, r)))
        x = df32.to_f32(x_pair)
    if use_block_A:
        nu = rho_vec * (_block_matvec(meta, state, x, m) - r2)
    else:
        nu = rho_vec * (matvec(A, x) - r2)
    return x, nu
