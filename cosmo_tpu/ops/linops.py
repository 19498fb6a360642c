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


def is_sparse(A) -> bool:
    return isinstance(A, Coo)


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
    return A @ x


def rmatvec(A, y):
    """A.T @ y."""
    if isinstance(A, Coo):
        return jax.ops.segment_sum(
            A.cvals * y[A.crows], A.ccols, num_segments=A.n,
            indices_are_sorted=True,
        )
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
    return ew[:, None] * A * dw[None, :]


def scale_rows(A, ew):
    if isinstance(A, Coo):
        return dataclasses.replace(
            A, vals=A.vals * ew[A.rows], cvals=A.cvals * ew[A.crows]
        )
    return ew[:, None] * A


def scale_all(A, c):
    """c * A with a scalar c."""
    if isinstance(A, Coo):
        return dataclasses.replace(A, vals=A.vals * c, cvals=A.cvals * c)
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
    return jnp.sum(rho_vec[:, None] * A * A, axis=0)
