"""Batched symmetric eigendecomposition for many small blocks.

The reference's hot kernel is one LAPACK ``syevr`` call per PSD cone per
iteration (SURVEY.md §2.9, reference src/convexset.jl:163-263). After
chordal decomposition the TPU workload is the opposite regime: thousands of
small blocks. XLA's ``eigh`` targets few large matrices; for small-k stacks
a *parallel-ordered cyclic Jacobi* is the TPU-native fit:

* one round-robin "tournament" round applies k/2 disjoint Givens rotations
  at once, packed into a single [B, k, k] rotation matrix J;
* the similarity update X <- J' X J and the eigenvector accumulation
  V <- V J are batched matmuls — pure MXU work, no data-dependent control
  flow, fully fused by XLA inside the solver's while_loop;
* a sweep is k-1 static rounds; quadratic convergence gives ~fp32 machine
  precision within 6-10 sweeps for k <= 64.

Exactness note: rotations are orthogonal by construction, so the computed
V diag(w) V' is always a symmetric matrix similar to X up to rounding —
the PSD projection built from it is the projection of a nearby symmetric
matrix, which is what inexact-ADMM theory needs.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def _round_robin_rounds(k: int):
    """Static round-robin pairings: k-1 rounds of k/2 disjoint pairs
    (circle method). Requires k even."""
    assert k % 2 == 0
    players = list(range(k))
    rounds = []
    for _ in range(k - 1):
        pairs = [(players[i], players[k - 1 - i]) for i in range(k // 2)]
        rounds.append(
            (
                np.array([min(a, b) for a, b in pairs], dtype=np.int32),
                np.array([max(a, b) for a, b in pairs], dtype=np.int32),
            )
        )
        players = [players[0], players[-1]] + players[1:-1]
    return tuple(rounds)


def _apply_round(X, V, p, q):
    """One parallel Jacobi round: zero out X[p, q] for k/2 disjoint pairs
    via a single packed rotation matrix."""
    B, k, _ = X.shape
    dtype = X.dtype
    app = X[:, p, p]
    aqq = X[:, q, q]
    apq = X[:, p, q]

    small = jnp.abs(apq) <= jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 16, dtype)
    safe_apq = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau == 0 -> 45-degree rotation
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    J = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (B, k, k))
    J = J.at[:, p, p].set(c)
    J = J.at[:, q, q].set(c)
    J = J.at[:, p, q].set(s)
    J = J.at[:, q, p].set(-s)

    JX = jnp.einsum("bji,bjk->bik", J, X)      # J' X
    X = jnp.einsum("bik,bkl->bil", JX, J)      # (J' X) J
    V = jnp.einsum("bik,bkl->bil", V, J)
    return X, V


def _apply_round_vec(X, V, p, q):
    """Same parallel Jacobi round as :func:`_apply_round`, but applied as
    O(k^2) row/column updates (VPU gathers/scatters with static indices)
    instead of O(k^3) matmuls — wins when k is far below the 128-lane MXU
    tile so batched matmuls would run at a few percent utilization."""
    dtype = X.dtype
    app = X[:, p, p]
    aqq = X[:, q, q]
    apq = X[:, p, q]

    small = jnp.abs(apq) <= jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 16, dtype)
    safe_apq = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    cc = c[:, :, None]
    ss = s[:, :, None]
    # rows: X <- J' X
    Xp = X[:, p, :]
    Xq = X[:, q, :]
    X = X.at[:, p, :].set(cc * Xp - ss * Xq)
    X = X.at[:, q, :].set(ss * Xp + cc * Xq)
    # cols: X <- X J
    Xp = X[:, :, p]
    Xq = X[:, :, q]
    X = X.at[:, :, p].set(cc.swapaxes(1, 2) * Xp - ss.swapaxes(1, 2) * Xq)
    X = X.at[:, :, q].set(ss.swapaxes(1, 2) * Xp + cc.swapaxes(1, 2) * Xq)
    # eigenvectors: V <- V J (column update)
    Vp = V[:, :, p]
    Vq = V[:, :, q]
    V = V.at[:, :, p].set(cc.swapaxes(1, 2) * Vp - ss.swapaxes(1, 2) * Vq)
    V = V.at[:, :, q].set(ss.swapaxes(1, 2) * Vp + cc.swapaxes(1, 2) * Vq)
    return X, V


def _jacobi_eigh_transposed(X, sweeps: int):
    """Jacobi in transposed layout: X as [k, k, B] so every rotation indexes
    the two *leading* axes with static indices (free on TPU — no lane
    shuffles; the batch rides the 128-lane dimension). Returns (w [B,k],
    V [B,k,k])."""
    k = X.shape[0]
    B = X.shape[2]
    dtype = X.dtype
    rounds = _round_robin_rounds(k)
    eyeT = jnp.broadcast_to(jnp.eye(k, dtype=dtype)[:, :, None], (k, k, B))
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 16, dtype)

    def apply_round(X, V, p, q):
        app = X[p, p, :]            # [k/2, B]
        aqq = X[q, q, :]
        apq = X[p, q, :]
        small = jnp.abs(apq) <= tiny
        safe_apq = jnp.where(small, 1.0, apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(small, 1.0, c)
        s = jnp.where(small, 0.0, s)

        cr = c[:, None, :]          # rotate rows: [k/2, 1, B]
        sr = s[:, None, :]
        Xp = X[p]                   # [k/2, k, B]
        Xq = X[q]
        X = X.at[p].set(cr * Xp - sr * Xq)
        X = X.at[q].set(sr * Xp + cr * Xq)
        Xp = X[:, p, :]             # rotate cols: [k, k/2, B]
        Xq = X[:, q, :]
        cc = c[None, :, :]
        sc = s[None, :, :]
        X = X.at[:, p, :].set(cc * Xp - sc * Xq)
        X = X.at[:, q, :].set(sc * Xp + cc * Xq)
        Vp = V[:, p, :]
        Vq = V[:, q, :]
        V = V.at[:, p, :].set(cc * Vp - sc * Vq)
        V = V.at[:, q, :].set(sc * Vp + cc * Vq)
        return X, V

    def one_sweep(_, carry):
        X, V = carry
        for p, q in rounds:
            X, V = apply_round(X, V, jnp.asarray(p), jnp.asarray(q))
        X = 0.5 * (X + jnp.swapaxes(X, 0, 1))
        return X, V

    X, V = lax.fori_loop(0, sweeps, one_sweep, (X, eyeT))
    w = X[jnp.arange(k), jnp.arange(k), :]          # [k, B]
    return w.T, jnp.transpose(V, (2, 0, 1))


def jacobi_eigh(X, sweeps=8, method: str = "vec", V0=None):
    """Eigendecomposition of a stack of symmetric matrices [B, k, k].

    Returns (w, V) with w unsorted; X = V diag(w) V' up to rounding.
    k must be even (PSD buckets are padded to a multiple of 8).
    ``method``: "vec" (row/col VPU updates) or "mm" (packed-rotation
    batched matmuls). ``sweeps`` may be a traced scalar (the amortized
    projection picks it from the measured off-diagonal mass).  ``V0``
    accumulates rotations on top of an existing basis (V_total = V0 Q)."""
    B, k, _ = X.shape
    if k % 2 != 0:
        w, V = jnp.linalg.eigh(X)
        return w, V
    if method == "vecT" and V0 is None:
        return _jacobi_eigh_transposed(jnp.transpose(X, (1, 2, 0)), sweeps)
    rounds = _round_robin_rounds(k)
    if V0 is None:
        V0 = jnp.broadcast_to(jnp.eye(k, dtype=X.dtype), (B, k, k))
    apply = _apply_round_vec if method in ("vec", "vecT") else _apply_round

    def one_sweep(_, carry):
        X, V = carry
        for p, q in rounds:
            X, V = apply(X, V, jnp.asarray(p), jnp.asarray(q))
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        return X, V

    X, V = lax.fori_loop(0, sweeps, one_sweep, (X, V0))
    w = jnp.diagonal(X, axis1=-2, axis2=-1)
    return w, V


def psd_project_polar(X, quintic_iters: int = 9, cubic_iters: int = 6,
                      precision=None):
    """PSD projection via the matrix sign function: Pi(X) = (X + |X|)/2 with
    |X| = X sign(X), sign computed by a Newton-Schulz iteration on
    Z0 = X/||X||_F.

    Pure batched matmuls — the right tool for *large* blocks on the MXU
    where Jacobi's rotation chain is too serial. Schedule: an aggressive
    quintic phase p(x) = ax + bx^3 + cx^5 with slope ~3.4 at the origin
    (pushes |lambda| >= ~1e-6 ||X|| into O(1) in ~9 steps; the polynomial
    keeps |p| <= ~1.2 on [0, 1.2], inside the cubic basin |x| < sqrt(3)),
    then plain cubic (3Z - Z^3)/2 to polish to ~1e-7. Projection error for
    eigenvalues whose sign stays unresolved is bounded by |lambda| itself,
    so overall accuracy is ~1e-6-relative — inside the solver's 1e-5 regime.

    ``precision`` overrides the ambient matmul precision for every einsum
    (the mixed-precision loose phase passes ``"high"`` — 3 bf16 MXU passes
    instead of the 6 of f32-"highest" — while ADMM residuals are far from
    tolerance and projection error is dominated by iterate error anyway).
    """
    a, bq, cq = 3.4445, -4.7750, 2.0315  # standard quintic sign coefficients
    nrm = jnp.sqrt(jnp.sum(X * X, axis=(-2, -1), keepdims=True))
    Z = X / jnp.maximum(nrm, jnp.asarray(np.finfo(np.dtype(X.dtype)).tiny, X.dtype))

    def mm(U, V):
        return jnp.einsum("bij,bjk->bik", U, V, precision=precision)

    eye = jnp.eye(X.shape[-1], dtype=X.dtype)

    def quintic(_, Z):
        # W = Z (aI + b Y + c Y^2), Y = Z^2 — 3 matmuls instead of the
        # 4 of the aZ + b ZY + c Z(YY) form (same iteration: Z and Y
        # commute exactly in exact arithmetic, and the symmetrization
        # absorbs the rounding skew either way). 9 quintic steps = 27 of
        # the 40 total matmuls, so this is ~18% off the whole polar pass.
        Y = mm(Z, Z)
        W = mm(Z, a * eye + bq * Y + cq * mm(Y, Y))
        return 0.5 * (W + jnp.swapaxes(W, -1, -2))

    def cubic(_, Z):
        Z = 1.5 * Z - 0.5 * mm(mm(Z, Z), Z)
        return 0.5 * (Z + jnp.swapaxes(Z, -1, -2))

    Z = lax.fori_loop(0, quintic_iters, quintic, Z)
    Z = lax.fori_loop(0, cubic_iters, cubic, Z)
    P = 0.5 * (X + mm(X, Z))
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def psd_project_jacobi(X, sweeps: int = 8, method: str = "vec"):
    """PSD projection via Jacobi: V max(w, 0) V'."""
    w, V = jacobi_eigh(X, sweeps, method)
    wp = jnp.maximum(w, 0.0)
    return jnp.einsum("bik,bk,bjk->bij", V, wp, V)


def psd_project_amortized(X, V_prev, warm_sweeps: int = 2,
                          full_sweeps: int = 8, method: str = "vec"):
    """PSD projection with the eigenbasis amortized across ADMM iterations
    (the approximate-projection direction of Garstka et al.,
    arXiv:1912.02767; reference hot kernel: convexset.jl:163-263).

    ADMM iterates drift slowly, so last iteration's eigenvectors nearly
    diagonalize this iteration's block: rotate W = V' X V (2 batched
    matmuls), then run only ``warm_sweeps`` Jacobi sweeps on the
    near-diagonal W — falling back to ``full_sweeps`` whenever the measured
    off-diagonal mass says the basis went stale (first iteration, rho
    re-expressions, accepted acceleration jumps).  The sweep count is a
    traced scalar, so both regimes share one compiled loop.

    ``V_prev`` is re-orthonormalized with one Newton-Schulz step each call
    (V (3I - V'V)/2), so rounding drift never compounds across thousands of
    iterations.  Returns (projection, V_new).
    """
    dtype = X.dtype
    B, k, _ = X.shape

    def mm(U, W):
        return jnp.einsum("bij,bjk->bik", U, W)

    # one Newton-Schulz orthonormalization step (exact identity stays exact,
    # so padded lanes are untouched)
    eye = jnp.eye(k, dtype=dtype)
    V_prev = 0.5 * mm(V_prev, 3.0 * jnp.broadcast_to(eye, (B, k, k))
                      - mm(jnp.swapaxes(V_prev, -1, -2), V_prev))

    W = mm(jnp.swapaxes(V_prev, -1, -2), mm(X, V_prev))
    W = 0.5 * (W + jnp.swapaxes(W, -1, -2))

    diag = jnp.diagonal(W, axis1=-2, axis2=-1)
    off2 = jnp.sum(W * W, axis=(-2, -1)) - jnp.sum(diag * diag, axis=-1)
    tot2 = jnp.sum(W * W, axis=(-2, -1))
    # stale iff any block's off-diagonal mass exceeds ~9% of its energy
    stale = jnp.any(off2 > 0.09 * tot2 + jnp.asarray(
        np.finfo(np.dtype(dtype)).tiny, dtype))
    sweeps = jnp.where(stale, full_sweeps, warm_sweeps)

    w, V = jacobi_eigh(W, sweeps, method, V0=V_prev)
    wp = jnp.maximum(w, 0.0)
    P = jnp.einsum("bik,bk,bjk->bij", V, wp, V)
    return 0.5 * (P + jnp.swapaxes(P, -1, -2)), V


def min_max_eig_jacobi(X, sweeps: int = 8, method: str = "vec"):
    """(min, max) eigenvalue per block via Jacobi (for membership tests)."""
    w, _ = jacobi_eigh(X, sweeps, method)
    return jnp.min(w, axis=-1), jnp.max(w, axis=-1)
