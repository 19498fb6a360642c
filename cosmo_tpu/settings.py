"""Solver settings.

Mirrors the option surface of the reference solver's ``Settings`` struct
(reference: src/settings.jl:61-155) as a plain dataclass.  At solve time the
options are split into a *static* part (ints/flags/choices — changing any of
these triggers an XLA recompile) and a *dynamic* part (floats that are fed to
the compiled program as device scalars, so e.g. tolerances or ``rho`` can be
changed without recompiling).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np


# Accelerator activation kinds (reference: src/settings.jl:20-23,
# src/accelerator_interface.jl:6-48)
ACTIVATION_IMMEDIATE = "immediate"
ACTIVATION_ITER = "iter"
ACTIVATION_ACCURACY = "accuracy"

# KKT solver kinds (reference: src/linear_solver/)
KKT_DENSE = "dense"          # cached dense Cholesky of P + sigma*I + A' rho A
KKT_CG = "cg"                # matrix-free conjugate gradient on the reduced system
KKT_MINRES = "minres"        # matrix-free MINRES on the reduced system
KKT_BLOCK = "blockdiag"      # batched direct solve of the component-decoupled
                             # reduced system (ops/blockkkt.py); auto-selected
                             # for sparse problems whose column-intersection
                             # graph decomposes into blocks <= kkt_block_max

# Clique merge strategies (reference: src/chordal_decomposition/clique_merging.jl)
MERGE_CLIQUE_GRAPH = "clique_graph"
MERGE_PARENT_CHILD = "parent_child"
MERGE_NONE = "none"


@dataclasses.dataclass(eq=False)  # identity hash: part of the jit cache key
class CustomKKTSolver:
    """User-supplied KKT solver plug-in (reference: the 4-method
    AbstractKKTSolver contract, src/linear_solver/kktsolver.jl:5-11).

    Both members must be jittable JAX functions; they are traced into the
    solve program, so a rho update re-invokes ``setup`` inside the loop
    (the analog of ``update_rho!``) and there is nothing to free:

    * ``setup(P, A, sigma, rho_vec) -> state`` — build/factor whatever the
      solve needs (any pytree; may be ``()`` for matrix-free solvers);
    * ``solve(state, P, A, sigma, rho_vec, r1, r2) -> (x_tilde, nu)`` —
      solve the quasi-definite KKT system
      ``[P + sigma I, A'; A, -diag(1/rho)] [x; nu] = [r1; r2]``.

    Pass an instance as ``Settings(kkt_solver=CustomKKTSolver(...))``.
    """

    setup: Any = None
    solve: Any = None

    def __post_init__(self):
        if self.setup is None or self.solve is None:
            raise ValueError("CustomKKTSolver needs both setup and solve functions")


@dataclasses.dataclass
class Settings:
    """User-facing solver settings.

    Defaults follow the reference (src/settings.jl:101-139).
    """

    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-5
    eps_rel: float = 1e-5
    nearly_ratio: float = 100.0
    eps_prim_inf: float = 1e-4
    eps_dual_inf: float = 1e-4
    max_iter: int = 5000
    verbose: bool = False
    kkt_solver: str = KKT_DENSE
    check_termination: int = 25
    check_infeasibility: int = 40
    scaling: int = 10
    MIN_SCALING: float = 1e-4
    MAX_SCALING: float = 1e4
    adaptive_rho: bool = True
    adaptive_rho_interval: int = 40
    # rho-update deadband: an adaptation applies only when the proposed rho
    # leaves [rho/tol, rho*tol]. 0.0 = auto: 1.5 when the block-diagonal
    # direct KKT is active (its refactor is a cheap batched op, and the
    # decomposed SDP families measurably crawl on a deadband-frozen rho —
    # deadband sweep on TPU: banded-2000 median 2982 -> 1550 iters over 4
    # seeds, maxcut-2000 seed 0 from Max_iter@20000 -> 4234, north-star 10k
    # tail seed 9150 -> 2925), else the reference's 5.0 (dense refactors
    # are O(n^3) per update; on CG/MINRES the re-expression + AA restart
    # measurably drives a rho limit cycle on the min-eig family).
    adaptive_rho_tolerance: float = 0.0
    adaptive_rho_fraction: float = 0.4
    adaptive_rho_max_adaptions: int = 2**31 - 1
    verbose_timing: bool = False
    RHO_MIN: float = 1e-6
    RHO_MAX: float = 1e6
    RHO_TOL: float = 1e-4
    RHO_EQ_OVER_RHO_INEQ: float = 1e3
    COSMO_INFTY: float = 1e20
    decompose: bool = True
    complete_dual: bool = False
    time_limit: float = 0.0
    obj_true: float = float("nan")
    obj_true_tol: float = 1e-3
    merge_strategy: str = MERGE_CLIQUE_GRAPH
    compact_transformation: bool = True
    # Anderson acceleration (reference default:
    # AndersonAccelerator{T, Type2{QRDecomp}, RestartedMemory, NoRegularizer}, mem=15)
    accelerator: Optional[str] = "anderson"
    accelerator_mem: int = 15
    accelerator_memory: str = "restarted"   # "restarted" | "rolling"
    accelerator_type: str = "type2"         # "type2" | "type2_qr" | "type1"
    # Regularizer for the normal-equation accelerator solves (reference:
    # COSMOAccelerators NoRegularizer/TikonovRegularizer/
    # FrobeniusNormRegularizer): "none" | "tikhonov" | "frobenius"
    accelerator_regularizer: str = "none"
    accelerator_activation: str = ACTIVATION_IMMEDIATE
    accelerator_activation_iter: int = 2
    accelerator_activation_accuracy: float = 1e-4
    safeguard: bool = True
    safeguard_tol: float = 2.0
    # Divergence anchor for the safeguard: accelerated candidates whose
    # fixed-point residual exceeds this multiple of the best residual seen
    # (since the last accelerator restart) are declined even if they pass
    # the per-step safeguard_tol growth bound. Bounds how far a run of
    # noise-driven tol-passing steps can compound (f32/TPU robustness; the
    # reference has only the per-step bound).
    safeguard_anchor: float = 100.0
    # Stagnation toggle for the accelerator (no reference analog; f32
    # robustness): after this many consecutive termination checks without
    # >=5% improvement of the normalized residual score, the accelerator's
    # suspension state flips (stalled with AA on -> suspend it; stalled
    # with AA off -> re-enable it). -1 = auto: 10 in f32, off in f64
    # (measured: the 10k banded SDP solves in 9.3k iters with the toggle
    # vs 15k without; at >=1e-5 tolerances the detector never trips before
    # convergence on the fast problems, so it is free there. In the
    # 1e-6-in-f32 indirect-KKT regime both settings orbit the noise floor
    # — see the dev-notes gotcha).
    accelerator_stall_checks: int = -1
    # KKT indirect-solver controls (reference: kktsolver_indirect.jl:168-170;
    # reference default 1.0, tightened to 0.1: the absolute target is
    # sched/||rhs|| ∧ 0.1*admm_residual, and measured total inner-iteration
    # counts on decomposed SDPs are lowest around 0.1)
    kkt_cg_tol_constant: float = 0.1
    kkt_cg_tol_exponent: float = 1.5
    kkt_cg_max_iter: int = 250
    # Iterative-refinement steps for the KKT solve with the residual in
    # compensated double-f32 arithmetic (ops/df32.py). -1 = auto: 1 in f32
    # when the problem carries rho_eq-amplified rows (ZeroSet, or Box rows
    # with l == u) whose 1e3x weighting makes kappa(M)*eps floor plain-f32
    # ADMM around 1e-3..1e-4; 0 otherwise (refinement costs extra matvecs
    # and triangular solves per iteration). Applies to the dense Cholesky
    # solve and as compensated-residual restarts to CG/MINRES.
    kkt_refine_steps: int = -1
    # Endgame gate for the refinement: while BOTH relative ADMM residuals
    # sit above this threshold, KKT solves run plain f32 (inexact-ADMM
    # tolerates solve error below the iterate error) and the compensated
    # refinement latches on one-way once a termination check sees residuals
    # below it. The refinement is numerically needed only near convergence
    # but costs ~40-80% of a block-KKT iteration (measured: 1.6 of 4.7 ms
    # at banded-2000). 0 disables the gate (refine from iteration 1).
    # Mirrors the mixed_precision_switch latch design.
    kkt_refine_switch: float = 1e-3
    # rho multiplier for rows carrying compact-decomposition overlap
    # variables (the +-1 consistency rows): the separator coupling is the
    # decomposed dual's known conditioning bottleneck, and weighting those
    # rows' rho rebalances the per-row primal/dual residual trade
    # (extends the reference's 3-class row rule, parameters.jl:17-49,
    # which has no decomposition-aware class). Applied per-BLOCK as
    # scale**frac_overlap (cone-scalar, see models/model.py). 1.0 = off.
    # Default 2.0 from an on-chip sweep (scripts/sweep_rho.py): banded-2000
    # median iterations 3332 -> 2840 over 8 seeds, maxcut-2000 3645 -> 3405
    # over 6 seeds, with tighter spreads in both families.
    rho_overlap_scale: float = 2.0
    # Structure-aware CG preconditioner for the compact decomposition's
    # overlap block (exact Sherman-Morrison inverse of sigma I + O' rho O,
    # ops/kkt.py OverlapPrecond); Jacobi elsewhere.
    kkt_overlap_precond: bool = True
    # Largest component size the block-diagonal direct KKT solver
    # (ops/blockkkt.py) accepts before falling back to CG. Sparse problems
    # whose reduced system decouples (e.g. compact-decomposed dual-form
    # SDPs) are solved by batched dense factorization instead of CG.
    kkt_block_max: int = 64
    # --- TPU-specific knobs (no reference equivalent) ---
    # Problem-matrix representation: "auto" keeps scipy-sparse inputs sparse
    # (COO segment-sum matvecs + matrix-free CG KKT); True forces sparse;
    # False densifies everything.
    sparse: Any = "auto"
    # Pad PSD blocks up to a multiple of this size when bucketing, to reduce
    # the number of distinct batched-eigh shapes (zero-padding is exact for
    # PSD projection).
    psd_pad_to: int = 8
    # Decomposed clique blocks with padded side >= this take column-padded
    # svec storage (models/cones.py PsdConeTriangleColPad): the projection's
    # tri<->full conversion becomes a pure reshape+mask instead of XLA
    # gathers (measured 3.70 -> 0.018 ms/iter at side 896 on v5e) at the
    # cost of k(k-1)/2 structural-zero rows per block.
    colpad_min: int = 512
    # Batched-eig backend for the PSD projection: "auto" (Pallas Jacobi
    # kernel on TPU, XLA/LAPACK eigh elsewhere), "xla", "jacobi",
    # "jacobi_mm", "pallas", "polar", or "amortized" (eigenbasis carried
    # across ADMM iterations: rotate into last iteration's basis + 2 warm
    # Jacobi sweeps, full sweeps whenever the basis goes stale).
    eigh_backend: str = "auto"
    jacobi_sweeps: int = 8
    # Use float64 where available (CPU); float32 otherwise.
    dtype: Any = None
    # When set, the device execution of the solve is captured with
    # jax.profiler.trace into this directory (open with TensorBoard /
    # xprof) — the TPU-native analog of the reference's verbose_timing
    # phase breakdown at kernel granularity.
    profile_dir: Any = None
    # Matmul precision for the solve. On TPU, float32 matmuls default to
    # bfloat16 passes, which caps achievable residuals around 1e-3; 'highest'
    # uses enough passes for true fp32 accuracy (needed for 1e-4/1e-5
    # tolerances in float32).
    matmul_precision: str = "highest"
    # Mixed-precision loose phase: while the relative ADMM residuals are
    # above ``mixed_precision_switch``, the polar PSD projection runs its
    # matmuls at "high" precision (3 bf16 MXU passes, ~2x the 6-pass
    # "highest" f32 throughput); once residuals cross the threshold the
    # solve latches to full precision for the endgame. Safe because early
    # projection error is dominated by iterate error (inexact-ADMM), and
    # the latch means final residual checks always run at full precision.
    # ("default"/1-pass bf16 is NOT used: its ~1e-2 projection floor sits
    # above the switch threshold, so the latch would never trip.)
    mixed_precision: bool = False
    mixed_precision_switch: float = 1e-3
    # Device-side residual-history ring buffer: the last N termination
    # checks' (iter, cost, r_prim, r_dual, rho) rows live in the loop carry
    # and come back with the result (ResultInfo.res_history). This is the
    # on-TPU observability path: the axon relay aborts on host callbacks,
    # so the in-loop jax.debug.print rows cannot run there — with the ring
    # buffer a verbose solve prints its residual rows host-side after each
    # dispatch chunk instead (reference rows: printing.jl:38-48; history:
    # types.jl:283-312 IterateHistory). 0 disables.
    residual_history: int = 64
    # Largest number of iterations per device call. The solve re-enters the
    # same compiled program through the full loop carry between chunks
    # (identical trajectory, no recompile), so chunking costs one dispatch
    # round-trip per chunk. 0 = auto: 2000 on the axon TPU relay — whose
    # worker reliably dies on multi-thousand-iteration single dispatches —
    # and unchunked elsewhere. -1 = never chunk.
    dispatch_chunk: int = 0

    def replace(self, **kwargs) -> "Settings":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def from_dict(cls, d: dict) -> "Settings":
        """Build settings from a plain (string-keyed) dict.

        Parity with the reference's python entry point
        (src/settings.jl:167-183).
        """
        kwargs = {}
        for key, val in d.items():
            if not hasattr(cls, "__dataclass_fields__") or key not in cls.__dataclass_fields__:
                raise KeyError(f"Unknown setting: {key}")
            kwargs[key] = val
        return cls(**kwargs)


class StaticConfig(NamedTuple):
    """Hashable solve configuration — part of the jit cache key.

    ``max_iter`` lives in :class:`DynConfig` (a device scalar), so changing
    the iteration limit — or re-entering a chunked time-limited solve —
    never triggers a recompile.
    """

    check_termination: int
    check_infeasibility: int
    scaling_iters: int
    adaptive_rho: bool
    adaptive_rho_max_adaptions: int
    infeas_enabled: bool
    kkt_solver: str
    kkt_cg_max_iter: int
    kkt_refine_steps: int
    kkt_refine_gated: bool
    accel_mem: int                 # 0 disables acceleration
    accel_activation: str
    accel_memory: str
    accel_type: str
    accel_regularizer: str
    accel_stall_checks: int        # 0 disables the stagnation detector
    safeguard: bool
    check_obj_true: bool
    verbose: bool
    mixed_precision: bool
    res_hist: int                  # residual-history ring rows (0 = off)
    m: int
    n: int


class DynConfig(NamedTuple):
    """Dynamic (device-scalar) solve parameters; same dtype as the problem
    (``max_iter`` / ``adaptive_rho_interval`` are int32; the interval is
    dynamic so the auto mode — interval computed from a timed probe chunk,
    reference solver.jl:242-256 — never recompiles)."""

    max_iter: Any
    adaptive_rho_interval: Any
    rho: Any
    sigma: Any
    alpha: Any
    eps_abs: Any
    eps_rel: Any
    eps_prim_inf: Any
    eps_dual_inf: Any
    min_scaling: Any
    max_scaling: Any
    rho_min: Any
    rho_max: Any
    rho_tol: Any
    rho_eq_over_rho_ineq: Any
    infty: Any
    adaptive_rho_tolerance: Any
    safeguard_tol: Any
    safeguard_anchor: Any
    obj_true: Any
    obj_true_tol: Any
    accel_activation_iter: Any
    accel_activation_accuracy: Any
    kkt_cg_tol_constant: Any
    kkt_cg_tol_exponent: Any
    mixed_precision_switch: Any
    kkt_refine_switch: Any


def _is_axon_backend() -> bool:
    """True when running through the axon TPU relay (dev tunnel). The relay
    registers as plugin 'axon' but reports platform 'tpu'; the plugin name
    only shows up in platform_version."""
    try:
        import jax._src.xla_bridge as xb

        return "axon" in xb.get_backend().platform_version
    except Exception:
        return False


def _backend_supports_callbacks() -> bool:
    """The in-loop residual rows use ``jax.debug.print`` (host callbacks).
    The axon relay rejects host send/recv at dispatch time, which would
    abort the whole solve — degrade to the banner/footer-only verbosity
    there instead of failing."""
    return not _is_axon_backend()


def split_settings(settings: Settings, m: int, n: int, dtype,
                   refine_hint: bool = True) -> tuple[StaticConfig, DynConfig]:
    """Split user settings into (static, dynamic) solve configuration.

    ``refine_hint``: whether the problem structure warrants the f32 KKT
    refinement when ``kkt_refine_steps`` is auto (-1) — the Model passes
    True iff rho_eq-amplified rows exist (ZeroSet / Box with l == u).
    """
    accel_mem = settings.accelerator_mem if settings.accelerator == "anderson" else 0
    static = StaticConfig(
        check_termination=int(settings.check_termination),
        check_infeasibility=int(settings.check_infeasibility),
        scaling_iters=int(settings.scaling),
        adaptive_rho=bool(settings.adaptive_rho),
        adaptive_rho_max_adaptions=min(int(settings.adaptive_rho_max_adaptions), 2**31 - 1),
        infeas_enabled=(
            settings.eps_prim_inf > 0
            and settings.eps_dual_inf > 0
            and settings.check_infeasibility < settings.max_iter
        ),
        kkt_solver=settings.kkt_solver,
        kkt_cg_max_iter=int(settings.kkt_cg_max_iter),
        kkt_refine_steps=(
            int(settings.kkt_refine_steps) if settings.kkt_refine_steps >= 0
            else (1 if np.dtype(dtype) == np.float32 and refine_hint else 0)
        ),
        kkt_refine_gated=bool(settings.kkt_refine_switch > 0),
        accel_mem=int(accel_mem),
        accel_activation=settings.accelerator_activation,
        accel_memory=settings.accelerator_memory,
        accel_type=settings.accelerator_type,
        accel_regularizer=settings.accelerator_regularizer,
        accel_stall_checks=(
            int(settings.accelerator_stall_checks)
            if settings.accelerator_stall_checks >= 0
            else (10 if np.dtype(dtype) == np.float32 else 0)
        ),
        safeguard=bool(settings.safeguard),
        check_obj_true=not np.isnan(settings.obj_true),
        verbose=bool(settings.verbose) and _backend_supports_callbacks(),
        mixed_precision=bool(settings.mixed_precision),
        res_hist=int(settings.residual_history),
        m=int(m),
        n=int(n),
    )
    f = lambda x: np.asarray(x, dtype=dtype)
    dyn = DynConfig(
        max_iter=np.asarray(settings.max_iter, dtype=np.int32),
        adaptive_rho_interval=np.asarray(settings.adaptive_rho_interval, dtype=np.int32),
        rho=f(settings.rho),
        sigma=f(settings.sigma),
        alpha=f(settings.alpha),
        eps_abs=f(settings.eps_abs),
        eps_rel=f(settings.eps_rel),
        eps_prim_inf=f(settings.eps_prim_inf),
        eps_dual_inf=f(settings.eps_dual_inf),
        min_scaling=f(settings.MIN_SCALING),
        max_scaling=f(settings.MAX_SCALING),
        rho_min=f(settings.RHO_MIN),
        rho_max=f(settings.RHO_MAX),
        rho_tol=f(settings.RHO_TOL),
        rho_eq_over_rho_ineq=f(settings.RHO_EQ_OVER_RHO_INEQ),
        infty=f(settings.COSMO_INFTY),
        # 0 = auto, resolved by Model when it picks the KKT solver; direct
        # split_settings callers get the conservative reference value
        adaptive_rho_tolerance=f(settings.adaptive_rho_tolerance
                                 if settings.adaptive_rho_tolerance > 0
                                 else 5.0),
        safeguard_tol=f(settings.safeguard_tol),
        safeguard_anchor=f(settings.safeguard_anchor),
        obj_true=f(settings.obj_true),
        obj_true_tol=f(settings.obj_true_tol),
        accel_activation_iter=np.asarray(settings.accelerator_activation_iter, dtype=np.int32),
        accel_activation_accuracy=f(settings.accelerator_activation_accuracy),
        kkt_cg_tol_constant=f(settings.kkt_cg_tol_constant),
        kkt_cg_tol_exponent=f(settings.kkt_cg_tol_exponent),
        mixed_precision_switch=f(settings.mixed_precision_switch),
        kkt_refine_switch=f(settings.kkt_refine_switch),
    )
    return static, dyn
