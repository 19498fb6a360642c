"""Linear-operator layer: dense or COO-sparse matrices on device.

The reference stores problem data as CPU sparse CSC and hits it with
SuiteSparse kernels (SURVEY.md §2.11). On TPU, unstructured sparse solves
don't map to the hardware — but sparse *matvecs* do, as gather + multiply +
sorted segment-sum (one pass per orientation). This module gives every
consumer (Ruiz scaling, CG-KKT, residuals, infeasibility) a single
interface over:

* dense ``jnp.ndarray`` — small/medium problems; matvecs ride the MXU;
* :class:`Coo` — two permutations of the same triplets, one sorted by row
  (for ``A @ x``) and one sorted by column (for ``A.T @ y``), so both
  matvecs are sorted segment-sums (`indices_are_sorted=True` lets XLA lower
  them efficiently). Index arrays are static-shaped; only ``vals`` changes
  under scaling, so everything stays inside one jitted program.

A ``Coo`` is built on host from scipy sparse / numpy data.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.pytrees import register_pytree_dataclass, static_field


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class Coo:
    """COO sparse matrix with row-sorted and col-sorted triplet copies.

    ``row_ptr``/``col_ptr`` are CSR/CSC-style segment pointers into the
    sorted copies with static max segment widths — they let the compensated
    double-f32 matvecs (ops/df32.py) reduce each row with a static-shape
    gather + pairwise tree instead of a scan over nnz (scans over large nnz
    triggered TPU kernel faults, and the gather form is faster anyway).
    """

    m: int = static_field()
    n: int = static_field()
    rows: Any = None    # int32 [nnz], sorted ascending
    cols: Any = None    # int32 [nnz]
    vals: Any = None    # dtype [nnz]
    crows: Any = None   # int32 [nnz] (col-sorted copy)
    ccols: Any = None   # int32 [nnz], sorted ascending
    cvals: Any = None   # dtype [nnz]
    row_ptr: Any = None  # int32 [m+1] segment starts in the row-sorted copy
    col_ptr: Any = None  # int32 [n+1] segment starts in the col-sorted copy
    max_row_nnz: int = static_field(default=0)
    max_col_nnz: int = static_field(default=0)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def T(self) -> "Coo":
        return Coo(
            m=self.n, n=self.m,
            rows=self.ccols, cols=self.crows, vals=self.cvals,
            crows=self.cols, ccols=self.rows, cvals=self.vals,
            row_ptr=self.col_ptr, col_ptr=self.row_ptr,
            max_row_nnz=self.max_col_nnz, max_col_nnz=self.max_row_nnz,
        )


def segment_ptr(sorted_ids: np.ndarray, num_segments: int):
    """CSR-style pointer array for a sorted segment-id array (host side).
    Returns (ptr [num_segments+1] int32, max segment width)."""
    counts = np.bincount(sorted_ids, minlength=num_segments)
    ptr = np.zeros(num_segments + 1, dtype=np.int32)
    np.cumsum(counts, out=ptr[1:])
    return ptr, int(counts.max()) if counts.size else 0


def coo_from_scipy(A, dtype) -> Coo:
    """Build a Coo from a scipy sparse matrix (host side)."""
    import scipy.sparse as sp

    Ac = sp.coo_matrix(A)
    m, n = Ac.shape
    r = np.asarray(Ac.row, dtype=np.int32)
    c = np.asarray(Ac.col, dtype=np.int32)
    v = np.asarray(Ac.data, dtype=dtype)
    pr = np.lexsort((c, r))
    pc = np.lexsort((r, c))
    row_ptr, w_r = segment_ptr(r[pr], m)
    col_ptr, w_c = segment_ptr(c[pc], n)
    return Coo(
        m=m, n=n,
        rows=r[pr], cols=c[pr], vals=v[pr],
        crows=r[pc], ccols=c[pc], cvals=v[pc],
        row_ptr=row_ptr, col_ptr=col_ptr,
        max_row_nnz=w_r, max_col_nnz=w_c,
    )


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class Bde:
    """Block-dense rows: G contiguous groups of ``rb`` rows, each group
    touching at most ``cmax`` columns — the natural storage of constraint
    matrices whose rows come in per-cone blocks over small column subsets
    (every block-structured SDP: one clique block = tri(k) rows over the
    clique's columns).

    TPU-native rationale: a dense [m, n] matvec reads the full m*n f32
    panel from HBM every iteration (the measured top per-iteration cost of
    the headline bench: 414 us of a 673 us iteration at [69632, 512]), and
    an unstructured Coo SpMV is gather-bound (XLA TPU gathers run at a few
    elements/cycle). Block-dense rows replace both with ONE small structured
    gather ``x[cols]`` per group plus a batched [rb, cmax] @ [cmax] matmul —
    MXU work over G*rb*cmax values instead of m*n.

    ``cols`` is padded with the dump column ``n`` (reads 0, scatters fold
    into a sliced-off slot). ``ccols_sorted``/``csort_perm``/``col_ptr``
    give the column-sorted view of the (group, lane) entries for the
    transpose scatter and the compensated df32 reductions.
    """

    m: int = static_field()
    n: int = static_field()
    rb: int = static_field()            # rows per group
    cmax: int = static_field()          # padded columns per group
    vals: Any = None                    # dtype [G, rb, cmax]
    vals_t: Any = None                  # dtype [G, cmax, rb] (transpose copy:
                                        # both matvec orientations then reduce
                                        # over their MINOR axis — reducing the
                                        # middle axis forced a 7 MB transpose
                                        # per rmatvec, measured ~100 us)
    cols: Any = None                    # int32 [G, cmax], dump = n
    ccols_sorted: Any = None            # int32 [G*cmax] sorted ascending
    csort_perm: Any = None              # int32 [G*cmax] into (g*cmax + c)
    col_ptr: Any = None                 # int32 [n+2] (n+1 segments, dump last)
    max_col_nnz: int = static_field(default=0)
    # ELL transpose map: ell_idx[j, l] indexes the flat [G*cmax] per-column
    # partials (G*cmax = one appended zero slot for padding), so the
    # transpose reduction is one static-shape gather + a dense sum instead
    # of a scatter (the sorted segment-sum lowers to a scatter on TPU and
    # measured 200 us at [512 groups, 25 cols])
    ell_idx: Any = None                 # int32 [n, max_col_nnz]
    # Selection matmul (preferred when its panel fits the budget): one-hot
    # sel[k, j] = 1 iff flat entry k = g*cmax + c has cols[g, c] = j (dump
    # rows all-zero). XLA TPU gathers run BELOW one element/cycle here
    # (measured: the [512, 40] ELL gather+sum 138 us, the [512, 25] x-gather
    # 55 us, each over <= 26 KB of payload), while the same selections as
    # MXU matmuls are HBM-bound on the sel panel (~32 us at 26 MB): both
    # matvec orientations use this one panel, transposed for the scatter.
    sel: Any = None                     # dtype [G*cmax, n] or None

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.m, self.n)

    @property
    def G(self) -> int:
        return self.vals.shape[0]

    @property
    def dtype(self):
        return self.vals.dtype


def bde_from_scipy(A, rb: int, max_cmax: int | None = None,
                   sel_budget_bytes: int = 64 << 20) -> "Bde | None":
    """Build a :class:`Bde` from a scipy sparse matrix whose rows decompose
    into ``m / rb`` contiguous groups (host side). Returns None when the
    structure doesn't fit: ``rb`` doesn't divide m, or some group touches
    more than ``max_cmax`` columns (default: storage capped at ~1/4 of the
    dense panel, where the bandwidth win evaporates)."""
    import scipy.sparse as sp

    Ac = sp.csr_matrix(A)
    m, n = Ac.shape
    if rb <= 0 or m % rb != 0:
        return None
    G = m // rb
    indptr, indices, data = Ac.indptr, Ac.indices, Ac.data
    col_lists = []
    cmax = 0
    for g in range(G):
        s, e = indptr[g * rb], indptr[(g + 1) * rb]
        u = np.unique(indices[s:e])
        col_lists.append(u)
        cmax = max(cmax, u.size)
    if cmax == 0:
        cmax = 1
    limit = max_cmax if max_cmax is not None else max(1, n // 4)
    if cmax > limit:
        return None
    cols = np.full((G, cmax), n, dtype=np.int32)
    vals = np.zeros((G, rb, cmax), dtype=data.dtype if data.size else np.float64)
    for g, u in enumerate(col_lists):
        cols[g, : u.size] = u
        blk = Ac[g * rb : (g + 1) * rb, :][:, u].toarray()
        vals[g, :, : u.size] = blk
    flat_cols = cols.reshape(-1)
    perm = np.argsort(flat_cols, kind="stable").astype(np.int32)
    scols = flat_cols[perm]
    col_ptr, w_c = segment_ptr(scols, n + 1)
    w = max(int(np.max(col_ptr[1 : n + 1] - col_ptr[:n])) if n else 0, 1)
    ell = np.full((n, w), G * cmax, dtype=np.int32)   # pad -> zero slot
    for j in range(n):
        s, e = col_ptr[j], col_ptr[j + 1]
        ell[j, : e - s] = perm[s:e]
    sel = None
    if G * cmax * n * vals.itemsize <= sel_budget_bytes:
        sel = np.zeros((G * cmax, n), dtype=vals.dtype)
        valid = flat_cols < n
        sel[np.flatnonzero(valid), flat_cols[valid]] = 1.0
    return Bde(
        m=m, n=n, rb=rb, cmax=cmax,
        vals=vals, vals_t=np.ascontiguousarray(np.swapaxes(vals, 1, 2)),
        cols=cols,
        ccols_sorted=scols.astype(np.int32),
        csort_perm=perm, col_ptr=col_ptr, max_col_nnz=w_c,
        ell_idx=ell, sel=sel,
    )


def _ext0(x):
    """x with one appended zero (the Bde dump-column read slot)."""
    return jnp.concatenate([x, jnp.zeros((1,), x.dtype)])


def is_sparse(A) -> bool:
    return isinstance(A, (Coo, Bde))


# ----------------------------------------------------------------------
# matvecs
# ----------------------------------------------------------------------

def matvec(A, x):
    """A @ x."""
    if isinstance(A, Coo):
        return jax.ops.segment_sum(
            A.vals * x[A.cols], A.rows, num_segments=A.m,
            indices_are_sorted=True,
        )
    if isinstance(A, Bde):
        if A.sel is not None:
            xg = (A.sel @ x).reshape(A.G, A.cmax)
        else:
            xg = _ext0(x)[A.cols]                   # [G, cmax]
        return jnp.einsum("grc,gc->gr", A.vals, xg).reshape(A.m)
    return A @ x


def rmatvec(A, y):
    """A.T @ y."""
    if isinstance(A, Coo):
        return jax.ops.segment_sum(
            A.cvals * y[A.crows], A.ccols, num_segments=A.n,
            indices_are_sorted=True,
        )
    if isinstance(A, Bde):
        t = jnp.einsum("gcr,gr->gc", A.vals_t, y.reshape(A.G, A.rb))
        if A.sel is not None:
            return t.reshape(-1) @ A.sel
        return jnp.sum(_ext0(t.reshape(-1))[A.ell_idx], axis=1)
    return A.T @ y


# ----------------------------------------------------------------------
# reductions / scalings used by Ruiz equilibration and CG preconditioning
# ----------------------------------------------------------------------

def colmax_abs(A):
    """max_i |A_ij| per column j.

    Empty columns give 0, matching the dense semantics: segment_max fills
    empty segments with -inf, which would otherwise poison the Ruiz cost
    scaling (mean over column norms) for any sparse matrix with structurally
    empty columns — e.g. P = 0 in dual-form SDPs.
    """
    if isinstance(A, Coo):
        return jnp.maximum(
            jax.ops.segment_max(
                jnp.abs(A.cvals), A.ccols, num_segments=A.n,
                indices_are_sorted=True,
            ),
            0.0,
        )
    if isinstance(A, Bde):
        t = jnp.max(jnp.abs(A.vals), axis=1)        # [G, cmax]
        return jnp.max(_ext0(t.reshape(-1))[A.ell_idx], axis=1)
    if A.shape[0] == 0:
        return jnp.zeros(A.shape[1], A.dtype)
    return jnp.max(jnp.abs(A), axis=0)


def rowmax_abs(A):
    """max_j |A_ij| per row i (0 for empty rows, as for dense)."""
    if isinstance(A, Coo):
        return jnp.maximum(
            jax.ops.segment_max(
                jnp.abs(A.vals), A.rows, num_segments=A.m,
                indices_are_sorted=True,
            ),
            0.0,
        )
    if isinstance(A, Bde):
        return jnp.max(jnp.abs(A.vals), axis=2).reshape(A.m)
    if A.shape[1] == 0:
        return jnp.zeros(A.shape[0], A.dtype)
    return jnp.max(jnp.abs(A), axis=1)


def scale_rows_cols(A, ew, dw):
    """E A D with diagonal row scaling ew and column scaling dw."""
    if isinstance(A, Coo):
        return dataclasses.replace(
            A,
            vals=A.vals * ew[A.rows] * dw[A.cols],
            cvals=A.cvals * ew[A.crows] * dw[A.ccols],
        )
    if isinstance(A, Bde):
        ewg = ew.reshape(A.G, A.rb)
        dwg = _ext0(dw)[A.cols]
        return dataclasses.replace(
            A,
            vals=A.vals * ewg[:, :, None] * dwg[:, None, :],
            vals_t=A.vals_t * ewg[:, None, :] * dwg[:, :, None],
        )
    return ew[:, None] * A * dw[None, :]


def scale_rows(A, ew):
    if isinstance(A, Coo):
        return dataclasses.replace(
            A, vals=A.vals * ew[A.rows], cvals=A.cvals * ew[A.crows]
        )
    if isinstance(A, Bde):
        ewg = ew.reshape(A.G, A.rb)
        return dataclasses.replace(
            A, vals=A.vals * ewg[:, :, None], vals_t=A.vals_t * ewg[:, None, :]
        )
    return ew[:, None] * A


def scale_all(A, c):
    """c * A with a scalar c."""
    if isinstance(A, Coo):
        return dataclasses.replace(A, vals=A.vals * c, cvals=A.cvals * c)
    if isinstance(A, Bde):
        return dataclasses.replace(A, vals=A.vals * c, vals_t=A.vals_t * c)
    return A * c


def symmetrize(P):
    """(P + P') / 2 — for Coo assumed already symmetric (symmetric scaling
    preserves symmetry)."""
    if isinstance(P, Coo):
        return P
    return 0.5 * (P + P.T)


def diag_part(P):
    """diag(P) as a vector."""
    if isinstance(P, Coo):
        on_diag = P.rows == P.cols
        return jax.ops.segment_sum(
            jnp.where(on_diag, P.vals, 0.0), P.rows, num_segments=P.m,
            indices_are_sorted=True,
        )
    return jnp.diag(P)


def diag_AtRhoA(A, rho_vec):
    """diag(A' diag(rho) A) = sum_i rho_i A_ij^2 per column j (the Jacobi
    preconditioner of the reduced KKT system)."""
    if isinstance(A, Coo):
        return jax.ops.segment_sum(
            rho_vec[A.crows] * A.cvals * A.cvals, A.ccols, num_segments=A.n,
            indices_are_sorted=True,
        )
    if isinstance(A, Bde):
        t = jnp.einsum(
            "grc,gr,grc->gc", A.vals, rho_vec.reshape(A.G, A.rb), A.vals
        )
        return jnp.sum(_ext0(t.reshape(-1))[A.ell_idx], axis=1)
    return jnp.sum(rho_vec[:, None] * A * A, axis=0)


def AtRhoA(A, rho_vec):
    """Dense n x n assembly of A' diag(rho) A — the reduced-KKT Gram matrix
    the cached dense Cholesky factors (ops/kkt.dense_factor). For
    :class:`Bde` this is G batched [cmax, cmax] Gram blocks scatter-added
    into the dense panel instead of an O(m n^2) dense triple product."""
    if isinstance(A, Bde):
        C = jnp.einsum(
            "grc,gr,grd->gcd", A.vals, rho_vec.reshape(A.G, A.rb), A.vals
        )
        Mext = jnp.zeros((A.n + 1, A.n + 1), A.vals.dtype)
        Mext = Mext.at[A.cols[:, :, None], A.cols[:, None, :]].add(C)
        return Mext[: A.n, : A.n]
    if isinstance(A, Coo):
        raise NotImplementedError(
            "dense KKT with Coo A is unsupported — use Bde (block-dense "
            "rows), a dense A, or the blockdiag/CG solvers"
        )
    return A.T @ (rho_vec[:, None] * A)
