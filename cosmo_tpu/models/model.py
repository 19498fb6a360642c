"""Native modeling API: Model / assemble / set_ / update_ / warm_start / optimize.

Mirrors the reference's interface layer (src/interface.jl): constraint
merging, canonical set ordering, the ``A <- -A`` sign flip that turns
``Ax + b in K`` into ``Ax + s = b, s in K``, and warm-start semantics
(mu = -y).  The heavy lifting happens in :mod:`cosmo_tpu.solver`, which runs
the entire solve as one jitted XLA program; this layer only prepares numpy
data and unpacks device results.
"""
from __future__ import annotations

import functools
import time
from typing import List, Optional, Sequence, Union

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .. import results as results_mod
from .. import solver as solver_mod
from ..ops import conedata
from ..ops import linops
from ..settings import KKT_BLOCK, KKT_CG, KKT_DENSE, Settings, split_settings
from . import cones as C
from .constraint import Constraint


def _default_dtype(settings: Settings):
    if settings.dtype is not None:
        return np.dtype(settings.dtype)
    return np.float64 if jax.config.read("jax_enable_x64") else np.float32


def _to_dense(M) -> np.ndarray:
    if sp.issparse(M):
        return np.asarray(M.todense())
    return np.asarray(M)


class Model:
    """Problem container + solve orchestration (reference Workspace/Model,
    src/types.jl:348-403)."""

    def __init__(self, settings: Optional[Settings] = None):
        self.settings = settings if settings is not None else Settings()
        self.empty()

    # -- state ---------------------------------------------------------
    def empty(self):
        """Reset the model (reference: interface.jl:98-114)."""
        self.P: Optional[np.ndarray] = None
        self.q: Optional[np.ndarray] = None
        self.A: Optional[np.ndarray] = None
        self.b: Optional[np.ndarray] = None
        self.sets: List[C.ConvexSet] = []
        self.x0: Optional[np.ndarray] = None
        self.s0: Optional[np.ndarray] = None
        self.mu0: Optional[np.ndarray] = None
        self.is_assembled = False
        self.is_decomposed = False
        self._chordal_info = None
        self._decomp_key = None
        self._blockkkt_cache = None
        # device-residency cache across re-solves: structure-keyed device
        # copies of P/A/cones/blockkkt (the tunnel pays ~a full RTT per
        # host->device array each dispatch otherwise) + version-keyed
        # q/b and warm-start device vectors
        self._dev_cache = None
        self._qb_version = 0
        self._ws_version = 0
        self._last_result: Optional[results_mod.Result] = None
        # the interval chosen by the auto rho-adaptation probe
        # (settings.adaptive_rho_interval == 0), for introspection
        self.auto_rho_interval: Optional[int] = None

    @property
    def model_size(self):
        m = self.A.shape[0] if self.A is not None else 0
        n = self.A.shape[1] if self.A is not None else 0
        return m, n

    # -- assembly ------------------------------------------------------
    def assemble(
        self,
        P,
        q,
        constraints: Union[Constraint, Sequence[Constraint]],
        settings: Optional[Settings] = None,
        x0=None,
        y0=None,
        s0=None,
    ):
        """Build the stacked problem (reference: interface.jl:30-77)."""
        if isinstance(constraints, Constraint):
            constraints = [constraints]
        constraints = list(constraints)
        if settings is not None:
            self.settings = settings

        q = np.asarray(q, dtype=np.float64).ravel()
        n = q.shape[0]
        if not sp.issparse(P):
            P = _to_dense(P).astype(np.float64)
            if P.ndim == 0:
                P = P.reshape(1, 1)
            if P.ndim == 1:
                P = np.diag(P) if P.shape[0] == q.shape[0] else P.reshape(1, 1)
        if P.shape != (n, n):
            raise ValueError("The dimensions of matrix P and vector q don't match.")

        constraints = _merge_constraints(constraints)
        # canonical ordering (interface.jl:55, :466-475); stable sort
        constraints.sort(key=lambda c: C.sort_key(c.convex_set))

        m = sum(c.dim for c in constraints)
        any_sparse = any(sp.issparse(c.A) for c in constraints)
        for con in constraints:
            if con.A.shape[1] != n:
                raise ValueError(
                    f"A constraint has {con.A.shape[1]} columns but the problem has n={n}."
                )
        b = np.concatenate([con.b for con in constraints]) if m else np.zeros(0)
        # sign flip: Ax + b in K  ->  (-A)x + s = b (interface.jl:478-484)
        if any_sparse:
            A = -sp.vstack(
                [sp.csr_matrix(con.A) for con in constraints], format="csr"
            )
        else:
            A = np.zeros((m, n), dtype=np.float64)
            row = 0
            for con in constraints:
                d = con.dim
                A[row : row + d, :] = -_to_dense(con.A)
                row += d

        self.P, self.q, self.A, self.b = P, q, A, b
        self.sets = [con.convex_set for con in constraints]
        self.is_assembled = True
        self.is_decomposed = False
        self._chordal_info = None
        self._decomp_key = None
        self._blockkkt_cache = None
        self._dev_cache = None
        self._qb_version += 1
        self._ws_version += 1
        self.x0 = np.zeros(n)
        self.s0 = np.zeros(m)
        self.mu0 = np.zeros(m)

        if x0 is not None:
            self.warm_start_primal(x0)
        if y0 is not None:
            self.warm_start_dual(y0)
        if s0 is not None:
            self.warm_start_slack(s0)
        return self

    def set(self, P, q, A, b, sets: Sequence[C.ConvexSet], settings: Optional[Settings] = None):
        """Raw-data entry: problem is already in ``Ax + s = b`` form
        (reference: interface.jl:218-250). scipy sparse P/A are kept sparse
        and solved through the matrix-free CG KKT path."""
        if settings is not None:
            self.settings = settings
        self.P = P if sp.issparse(P) else _to_dense(P).astype(np.float64)
        self.q = np.asarray(q, dtype=np.float64).ravel()
        self.A = A if sp.issparse(A) else _to_dense(A).astype(np.float64)
        self.b = np.asarray(b, dtype=np.float64).ravel()
        m, n = self.A.shape
        if len(self.q) != n or len(self.b) != m or self.P.shape != (n, n):
            raise ValueError("Inconsistent problem dimensions.")
        if sum(s.dim for s in sets) != m:
            raise ValueError("Cone dimensions don't sum to the number of rows of A.")
        self.sets = list(sets)
        self.is_assembled = True
        self.is_decomposed = False
        self._chordal_info = None
        self._decomp_key = None
        self._blockkkt_cache = None
        self._dev_cache = None
        self._qb_version += 1
        self._ws_version += 1
        self.x0 = np.zeros(n)
        self.s0 = np.zeros(m)
        self.mu0 = np.zeros(m)
        return self

    def set_csc(self, P_data, P_indices, P_indptr, q, A_data, A_indices,
                A_indptr, b, cone: dict, l=None, u=None, m=None, n=None,
                settings=None):
        """CSC-triplet entry with an SCS-style cone dict — the cosmo-python
        path (reference: interface.jl:253-309, convex_sets_from_dict
        :319-366). Keys: "f" (zero rows), "l" (nonneg rows), "q" (SOC dims),
        "s" (PSD triangle dims), "ep"/"ed" (# exp / dual-exp cones),
        "p" (power exponents, negative = dual), "b" (box with bounds l, u).
        """
        n = len(q) if n is None else n
        m = len(b) if m is None else m
        P = sp.csc_matrix((P_data, P_indices, P_indptr), shape=(n, n))
        A = sp.csc_matrix((A_data, A_indices, A_indptr), shape=(m, n))
        if isinstance(settings, dict):
            settings = Settings.from_dict(settings)
        return self.set(P, q, A, b, cone_sets_from_dict(cone, l, u), settings)

    # -- updates / warm starts ------------------------------------------
    def update(self, q=None, b=None):
        """Update q and/or b between solves (reference: interface.jl:187-211).

        Because the whole solve (including scaling and factorization) is one
        cached XLA program, updating vectors never triggers a recompile."""
        if not self.is_assembled:
            raise RuntimeError("Model has to be assembled before updating q or b.")
        # unlike the reference (interface.jl:193: updates are forbidden after
        # decomposition because it rewrites the stored problem in place), the
        # cached decomposition here keeps the original-space index maps, so
        # updated q/b re-derive the decomposed vectors in O(m) and the graph
        # analysis is reused
        if q is not None:
            q = np.asarray(q, dtype=np.float64).ravel()
            if len(q) != self.model_size[1]:
                raise ValueError("The dimension of q does not agree with n.")
            self.q = q
        if b is not None:
            b = np.asarray(b, dtype=np.float64).ravel()
            if len(b) != self.model_size[0]:
                raise ValueError("The dimension of b does not agree with m.")
            self.b = b
        self._qb_version += 1
        return self

    def warm_start_primal(self, x0, ind=None):
        x0 = np.atleast_1d(np.asarray(x0, dtype=np.float64))
        if ind is None and len(x0) == self.model_size[1]:
            self.x0[:] = x0
            # full x0 also warm starts s = b - A x (interface.jl:133-150)
            self.s0[:] = self.b - self.A @ x0
        else:
            self.x0[ind] = x0
        self._ws_version += 1
        return self

    def warm_start_slack(self, s0, ind=None):
        s0 = np.atleast_1d(np.asarray(s0, dtype=np.float64))
        if ind is None:
            self.s0[:] = s0
        else:
            self.s0[ind] = s0
        self._ws_version += 1
        return self

    def warm_start_dual(self, y0, ind=None):
        """Internally mu = -y (interface.jl:161-169)."""
        y0 = np.atleast_1d(np.asarray(y0, dtype=np.float64))
        if ind is None:
            self.mu0[:] = -y0
        else:
            self.mu0[ind] = -y0
        self._ws_version += 1
        return self

    def warm_start(self, x0=None, y0=None, s0=None):
        if x0 is not None:
            self.warm_start_primal(x0)
        if y0 is not None:
            self.warm_start_dual(y0)
        if s0 is not None:
            self.warm_start_slack(s0)
        return self

    # -- solve -----------------------------------------------------------
    def optimize(self, mesh=None) -> results_mod.Result:
        """Solve the assembled problem.

        ``mesh``: an optional ``jax.sharding.Mesh`` (1-D); the problem data —
        dense or sparse — is sharded over it (rows/cone-blocks/nnz) and the
        single jitted solve runs SPMD with GSPMD-inserted collectives
        (cosmo_tpu.parallel). The result is bit-identical to the
        single-device solve.
        """
        if not self.is_assembled:
            raise RuntimeError(
                "The model has to be assembled/set before optimize() can be called."
            )
        settings = self.settings
        times = results_mod.ResultTimes()
        t_solver = time.perf_counter()

        # ---- chordal decomposition (host, reference: chordal_decomposition.jl) ----
        t_graph = time.perf_counter()
        P, q, A, b, sets = self.P, self.q, self.A, self.b, self.sets
        chordal_info = None
        # mesh size enters the transform (dummy-block batch padding keeps
        # bucket contiguity under sharding), so it keys the structure cache
        n_dev = 1
        if mesh is not None:
            from ..parallel import BLOCK_AXIS

            n_dev = int(mesh.shape[BLOCK_AXIS])
        decomp_key = (settings.merge_strategy, settings.compact_transformation,
                      settings.psd_pad_to, settings.colpad_min, n_dev)
        if settings.decompose and any(
            isinstance(s, (C.PsdCone, C.PsdConeTriangle)) and getattr(s, "decomposable", False)
            for s in sets
        ):
            from .. import chordal

            if self._chordal_info is not None and self._decomp_key == decomp_key:
                # structure cache hit: A/P and all index maps are unchanged
                # by q/b updates, so graph analysis is skipped entirely and
                # only the vectors are re-derived (reference: the States
                # caching flags, types.jl:330-337, setup.jl:22-61)
                chordal_info = self._chordal_info
                q2, b2 = chordal_info.refresh_qb(q, b)
                P, _, A, _, sets = chordal_info.problem
                q, b = q2, b2
                self.is_decomposed = True
            else:
                chordal_info = chordal.decompose(P, q, A, b, sets, settings,
                                                 pad_batch=n_dev)
                if chordal_info is not None:
                    P, q, A, b, sets = chordal_info.problem
                    self.is_decomposed = True
                    self._chordal_info = chordal_info
                    self._decomp_key = decomp_key
        times.graph_time = time.perf_counter() - t_graph

        dtype = _default_dtype(settings)
        m, n = A.shape

        t_setup = time.perf_counter()
        # representation choice: sparse inputs (or huge dense shapes) go
        # through the COO segment-sum matvec path + matrix-free CG KKT
        use_sparse = settings.sparse is True or (
            settings.sparse == "auto" and (sp.issparse(A) or sp.issparse(P))
        )
        mesh_key = (
            None if mesh is None else tuple(d.id for d in mesh.devices.flat)
        )
        struct_key = (
            str(dtype), bool(use_sparse), mesh_key, decomp_key,
            self.is_decomposed, int(settings.psd_pad_to),
            settings.eigh_backend, int(settings.jacobi_sweeps),
            settings.accelerator is not None,
            settings.kkt_solver if isinstance(settings.kkt_solver, str)
            else id(settings.kkt_solver),
            int(settings.kkt_block_max),
        )
        cache = self._dev_cache
        if cache is not None and cache.get("struct_key") == struct_key:
            # structure hit: the device copies of P/A/cones/blockkkt (and
            # the compiled-cone index maps behind them) are reused — a
            # re-solve only moves the version-changed vectors
            cones = cache["cones"]
            kkt_block = cache["kkt_block"]
            Pd, Ad = cache["Pd"], cache["Ad"]
        else:
            cones = conedata.compile_cones(
                sets, dtype=dtype, psd_pad_to=settings.psd_pad_to,
                eigh_backend=settings.eigh_backend,
                jacobi_sweeps=settings.jacobi_sweeps,
                accel_on=settings.accelerator is not None,
                decomposed=self._chordal_info is not None,
            )
            # sparse problems cannot use the dense Cholesky; prefer the
            # batched block-diagonal direct solver (ops/blockkkt.py)
            # whenever the reduced system's column-intersection graph
            # decouples into small components (always true for
            # compact-decomposed dual-form SDPs), else matrix-free CG
            kkt_block = None
            if use_sparse and isinstance(settings.kkt_solver, str) and (
                settings.kkt_solver in (KKT_DENSE, KKT_BLOCK)
            ):
                # the analysis is purely structural, so it survives q/b
                # updates and warm-started re-solves (invalidated by set())
                bk_key = (int(settings.kkt_block_max), self._decomp_key,
                          self.is_decomposed)
                cached = getattr(self, "_blockkkt_cache", None)
                if cached is not None and cached[0] == bk_key:
                    kkt_block = cached[1]
                else:
                    from ..ops import blockkkt

                    kkt_block = blockkkt.analyze(
                        sp.csr_matrix(P), sp.csr_matrix(A),
                        max_block=int(settings.kkt_block_max),
                    )
                    self._blockkkt_cache = (bk_key, kkt_block)
            # Coupled-column sparse problems (no blockkkt decoupling) whose
            # rows come in uniform per-cone blocks over small column subsets
            # take block-dense row storage + the cached dense-KKT inverse
            # apply (ops/linops.Bde) instead of matrix-free CG: the batched
            # slab products + selection matmuls ride the MXU where the Coo
            # segment-sum SpMV is gather-bound (single-device only; the
            # sharded path keeps the nnz-sharded Coo).
            bde = None
            if (
                use_sparse and kkt_block is None and mesh is None
                and isinstance(settings.kkt_solver, str)
                and settings.kkt_solver == KKT_DENSE
                and n <= 2048
            ):
                dims = {s.dim for s in sets}
                if len(dims) == 1:
                    bde = linops.bde_from_scipy(sp.csr_matrix(A),
                                                rb=dims.pop())
            if use_sparse:
                if bde is not None:
                    # dense_factor adds P + sigma I elementwise: densify the
                    # (small, n <= 2048) quadratic term
                    Pd = jnp.asarray(_to_dense(P), dtype)
                    Ad = jax.tree_util.tree_map(
                        lambda v: jnp.asarray(v, dtype)
                        if np.issubdtype(np.asarray(v).dtype, np.floating)
                        else jnp.asarray(v), bde)
                else:
                    Pd = linops.coo_from_scipy(sp.csr_matrix(P), dtype)
                    Ad = linops.coo_from_scipy(sp.csr_matrix(A), dtype)
            else:
                Pd = jnp.asarray(_to_dense(P), dtype)
                Ad = jnp.asarray(_to_dense(A), dtype)
            if mesh is not None:
                from .. import parallel

                if kkt_block is not None:
                    # remap the pair lists against the UNSHARDED Ad layout
                    # before shard_problem re-chunks the triplets
                    kkt_block = parallel.shard_blockkkt(mesh, kkt_block, Ad)
                Pd, Ad, _, _, cones = parallel.shard_problem(
                    mesh, Pd, Ad, jnp.zeros(n, dtype), jnp.zeros(m, dtype),
                    cones,
                )
            else:
                # pin the cone index maps on device now so re-solves don't
                # re-transfer them (each host->device array costs a tunnel
                # RTT at dispatch)
                cones = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x), cones
                )
            self._dev_cache = cache = dict(
                struct_key=struct_key, cones=cones, kkt_block=kkt_block,
                Pd=Pd, Ad=Ad, qb_version=None, ws_version=None,
            )
        if kkt_block is not None or (
            use_sparse and isinstance(settings.kkt_solver, str)
            and settings.kkt_solver in (KKT_DENSE, KKT_BLOCK)
            # block-dense rows keep the requested dense KKT (inverse apply)
            and not isinstance(Ad, linops.Bde)
        ):
            settings = settings.replace(
                kkt_solver=KKT_BLOCK if kkt_block is not None else KKT_CG
            )
        if settings.adaptive_rho_tolerance <= 0:
            # auto rho deadband (see Settings.adaptive_rho_tolerance): tight
            # where the refactor is a cheap batched op, reference-default
            # elsewhere
            settings = settings.replace(
                adaptive_rho_tolerance=1.5
                if settings.kkt_solver == KKT_BLOCK else 5.0
            )
        use_dense_kkt = settings.kkt_solver == KKT_DENSE
        # rho_eq-amplified rows (ZeroSet / Box l==u) or compact-decomposition
        # overlap columns (separator conditioning) both push kappa(M) into
        # the regime where plain-f32 KKT solves floor the iterate: measured,
        # the decomposed banded-1k SDP stalls at 5e-4 without refinement and
        # solves to 1e-5 with it
        refine_hint = any(
            isinstance(s, C.ZeroSet)
            or (isinstance(s, C.Box) and np.any(s.l == s.u))
            for s in sets
        ) or (chordal_info is not None and chordal_info.num_overlaps > 0)
        static, dyn = split_settings(settings, m, n, dtype,
                                     refine_hint=refine_hint)
        # observability: the post-auto-resolution option set this solve ran
        # with (kkt_solver rewrite, rho-deadband auto, ...)
        self._resolved_settings = settings

        if cache["qb_version"] == self._qb_version:
            qd, bd = cache["qd"], cache["bd"]
        else:
            qd = jnp.asarray(q, dtype)
            bd = jnp.asarray(b, dtype)
            if mesh is not None:
                from ..parallel.mesh import _put, _row_put
                from jax.sharding import NamedSharding, PartitionSpec

                qd = _put(qd, NamedSharding(mesh, PartitionSpec()))
                bd = _row_put(bd, mesh, "blocks")
            cache.update(qd=qd, bd=bd, qb_version=self._qb_version)

        if cache["ws_version"] == self._ws_version:
            x0d, s0d, mu0d = cache["x0d"], cache["s0d"], cache["mu0d"]
        else:
            if chordal_info is not None:
                # lift user warm starts into the decomposed space
                # (reference: interface.jl:117-179 compose with every
                # solve; round 1 zeroed them for decomposed problems)
                x0, s0, mu0 = chordal_info.map_warm_start(
                    self.x0, self.s0, self.mu0
                )
            else:
                x0, s0, mu0 = self.x0, self.s0, self.mu0
            x0d = jnp.asarray(x0, dtype)
            s0d = jnp.asarray(s0, dtype)
            mu0d = jnp.asarray(mu0, dtype)
            if mesh is not None:
                from .. import parallel

                x0d, s0d, mu0d = parallel.shard_vectors(mesh, x0d, s0d, mu0d)
            cache.update(x0d=x0d, s0d=s0d, mu0d=mu0d,
                         ws_version=self._ws_version)
        times.setup_time = time.perf_counter() - t_setup

        # Per-clique-block rho scale (Settings.rho_overlap_scale) —
        # separator conditioning is the decomposed dual's bottleneck, so
        # blocks with a larger overlap-row fraction get
        # scale = rho_overlap_scale ** frac_overlap. The scale MUST be a
        # scalar per PSD block: mu = rho (w - Pi(w)) lies in the normal
        # cone only for cone-scalar rho (measured: a per-ROW overlap
        # weighting converges to a complementarity-violating pseudo-
        # solution, <s, mu> = 18 with residuals 1e-9).
        rho_row_scale = None
        if (
            settings.rho_overlap_scale != 1.0
            and chordal_info is not None
            and chordal_info.mode == "compact"
            and chordal_info.num_overlaps > 0
        ):
            ov = np.zeros(m, bool)
            ov[np.asarray(chordal_info.ov_child_rows)] = True
            ov[np.asarray(chordal_info.ov_parent_rows)] = True
            scale = np.ones(m, dtype)
            off = 0
            for s_ in sets:
                d_ = s_.dim
                if isinstance(s_, (C.PsdCone, C.PsdConeTriangle,
                                   C.PsdConeTriangleColPad)):
                    # overlap fraction over the REAL block rows: colpad
                    # storage interleaves structural-zero pad slots that
                    # must not dilute the per-block factor
                    real = d_
                    if isinstance(s_, C.PsdConeTriangleColPad):
                        real = s_.side * (s_.side + 1) // 2
                    frac = float(ov[off:off + d_].sum()) / max(real, 1)
                    if frac > 0.0:
                        scale[off:off + d_] = settings.rho_overlap_scale ** frac
                off += d_
            rho_row_scale = jnp.asarray(scale)

        # overlap-block Sherman-Morrison preconditioner for the CG KKT on
        # compact-decomposed problems (ops/kkt.py OverlapPrecond)
        kkt_precond = None
        if (
            settings.kkt_overlap_precond
            and settings.kkt_solver == KKT_CG
            and chordal_info is not None
            and chordal_info.mode == "compact"
            and chordal_info.num_overlaps > 0
            and chordal_info.ov_child_rows is not None
        ):
            from ..ops import kkt as kkt_ops

            kkt_precond = kkt_ops.make_overlap_precond(
                chordal_info.n_orig, chordal_info.ov_child_rows,
                chordal_info.ov_parent_rows,
            )

        if settings.verbose:
            from ..utils import printing

            # `settings` (not self.settings): kkt_solver has been resolved
            # ("dense"/"blockdiag" auto-select ran above)
            printing.print_header(self, m, n, sets=sets,
                                  chordal_info=chordal_info, settings=settings)

        t_iter = time.perf_counter()
        import contextlib

        profile_ctx = (
            jax.profiler.trace(settings.profile_dir)
            if settings.profile_dir
            else contextlib.nullcontext()
        )
        with profile_ctx, jax.default_matmul_precision(settings.matmul_precision):
            carry0 = None
            setup0 = None
            out = None
            if (
                settings.adaptive_rho
                and settings.adaptive_rho_interval == 0
                and settings.max_iter > 2 * settings.check_termination
            ):
                # auto rho-adaptation interval (reference: solver.jl:242-256,
                # parameters.jl:75-92): spend ~adaptive_rho_fraction of the
                # host setup time iterating, then fix the interval as a
                # multiple of check_termination.  The loop is one compiled
                # XLA program with no host clock, so the per-iteration time
                # comes from a timed probe chunk re-entered via the loop
                # carry; the interval is a device scalar, so resolving it
                # never recompiles.
                dyn, carry0, setup0, out = self._resolve_auto_rho_interval(
                    Pd, Ad, qd, bd, cones, x0d, s0d, mu0d, dyn, static,
                    settings, times, kkt_precond, kkt_block, rho_row_scale,
                )
            dispatch_chunk = settings.dispatch_chunk
            if dispatch_chunk == 0:
                from ..settings import _is_axon_backend

                # the axon relay's worker reliably dies on multi-thousand-
                # iteration single dispatches; re-entering the same compiled
                # program via the carry costs ~one RTT per chunk
                dispatch_chunk = 2000 if _is_axon_backend() else -1
            if out is not None:
                pass  # the probe already finished the solve
            elif (settings.time_limit and settings.time_limit > 0) or (
                # enter chunked mode as soon as a solve could exceed the
                # 500-iteration start chunk: the relay-degradation regime
                # (see _solve_chunked) starts well below the 2000-iteration
                # auto cap
                dispatch_chunk > 0 and settings.max_iter > min(dispatch_chunk, 500)
            ):
                # chunked solving re-entered through the loop carry so the
                # wall clock can be checked between device calls (reference
                # behavior: Time_limit_reached, solver.jl:303-321) and no
                # single device call exceeds the dispatch-chunk bound
                out = self._solve_chunked(
                    Pd, Ad, qd, bd, cones, x0d, s0d, mu0d, dyn, static,
                    settings, t_solver, dtype, carry0, kkt_precond, kkt_block,
                    dispatch_chunk=dispatch_chunk, rho_row_scale=rho_row_scale,
                    setup0=setup0,
                )
            elif carry0 is not None:
                out = solver_mod.solve_jit(
                    Pd, Ad, qd, bd, cones, x0d, s0d, mu0d, dyn,
                    static=static, carry_in=carry0, return_carry=True,
                    kkt_precond=kkt_precond, kkt_block=kkt_block,
                    rho_row_scale=rho_row_scale, setup_in=setup0,
                )
                out = dict(out)
                out.pop("carry")
                out.pop("setup")
            else:
                out = solver_mod.solve_jit(
                    Pd, Ad, qd, bd, cones, x0d, s0d, mu0d, dyn, static=static,
                    kkt_precond=kkt_precond, kkt_block=kkt_block,
                    rho_row_scale=rho_row_scale,
                )
        # one-transfer host fetch: leaf-by-leaf np.asarray costs a tunnel
        # RTT per array (~1.5 s/solve measured on the 17-leaf out dict)
        out = solver_mod.fetch_out(out)
        times.iter_time = time.perf_counter() - t_iter

        t_post = time.perf_counter()
        x = out["x"]
        y = out["y"]
        s = out["s"]
        if chordal_info is not None:
            from .. import chordal

            x, y, s = chordal.reverse(chordal_info, x, y, s, settings)
        times.post_time = time.perf_counter() - t_post

        status = results_mod.STATUS_NAMES[int(out["status"])]
        n_updates = int(out["n_rho_adapt"]) + 1
        nr = settings.nearly_ratio
        nearly = (
            float(out["r_prim"])
            < nr * settings.eps_abs + nr * settings.eps_rel * float(out["max_norm_prim"])
        ) and (
            float(out["r_dual"])
            < nr * settings.eps_abs + nr * settings.eps_rel * float(out["max_norm_dual"])
        )
        res_history = _order_history(out)
        if (
            settings.verbose
            and not static.verbose              # in-loop rows unavailable
            and res_history is not None
            and not getattr(self, "_hist_printed", False)
        ):
            from ..utils import printing

            printing.print_history_rows(res_history)
        self._hist_printed = False
        info = results_mod.ResultInfo(
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
            max_norm_prim=float(out["max_norm_prim"]),
            max_norm_dual=float(out["max_norm_dual"]),
            rho_updates=out["rho_log"][: min(n_updates, solver_mod.RHO_LOG_LEN)],
            nearly_feasible=bool(nearly),
            kkt_solver_iters=int(out.get("kkt_solver_iters", 0)),
            res_history=res_history,
        )
        if settings.verbose_timing:
            self._measure_phase_times(
                times, Pd, Ad, qd, bd, cones, dyn, static, settings, out,
                dtype, kkt_block,
            )
        times.solver_time = time.perf_counter() - t_solver
        result = results_mod.Result(
            x=x,
            y=y,
            s=s,
            obj_val=float(out["cost"]),
            iter=int(out["iter"]) + int(out["safeguarding_iter"]),
            safeguarding_iter=int(out["safeguarding_iter"]),
            status=status,
            info=info,
            times=times,
        )
        self._last_result = result
        if settings.verbose:
            from ..utils import printing

            printing.print_result(self, result)
        return result


def _order_history(out) -> "np.ndarray | None":
    """Chronologically ordered rows of the device-side residual-history
    ring (oldest first); None when the ring is disabled/empty."""
    if "res_hist" not in out:
        return None
    rows = np.asarray(out["res_hist"])
    H = rows.shape[0]
    hn = int(out["res_hist_n"])
    if hn <= 0:
        return rows[:0]
    if hn <= H:
        return rows[:hn]
    k = hn % H
    return np.concatenate([rows[k:], rows[:k]])


# attached as Model methods below (kept separate for readability)
def _measure_phase_times(self, times, Pd, Ad, qd, bd, cones, dyn, static,
                         settings, out, dtype, kkt_block=None):
    """Populate the per-phase timers (reference: types.jl:26-58).

    The whole solve is ONE fused XLA program, so phases cannot be timed in
    situ; instead each phase kernel is run standalone on the real problem
    data and its per-call time is multiplied by how often the solve invoked
    it (reference semantics: cumulative per-phase cost). Only runs when
    ``verbose_timing`` is set — each measurement costs device round-trips.
    """
    from ..ops import kkt as kkt_ops
    from ..ops import projections, scaling as scaling_ops
    from ..settings import KKT_BLOCK, KKT_DENSE

    def timed(fn, *args, reps=3, **kw):
        fn(*args, **kw)  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*args, **kw)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x).ravel()[:1], r
            )  # force host transfer: tunnel-safe sync
            best = min(best, time.perf_counter() - t0)
        return best

    n_iter = max(int(out["iter"]) + int(out["safeguarding_iter"]), 1)
    n_rho = int(out["n_rho_adapt"])
    n_acc = int(out.get("n_accelerated", 0))
    m, n = static.m, static.n
    w2 = jnp.asarray(np.asarray(bd), dtype)

    eig0 = projections.init_eig_state(cones, dtype)
    proj_fn = jax.jit(projections.project)
    times.proj_time = timed(proj_fn, w2, cones, eig0) * n_iter

    rho_vec = jnp.full(m, dyn.rho, dtype)
    if static.scaling_iters > 0:
        scale_fn = jax.jit(
            lambda: scaling_ops.ruiz_scale(Pd, Ad, qd, bd, cones,
                                           static.scaling_iters, dyn)
        )
        times.scaling_time = timed(scale_fn)
    else:
        times.scaling_time = 0.0

    if not isinstance(static.kkt_solver, str):
        # custom KKT plug-in: time setup + solve through its own hooks
        setup_fn = jax.jit(static.kkt_solver.setup)
        times.init_factor_time = timed(setup_fn, Pd, Ad, dyn.sigma, rho_vec)
        times.factor_update_time = times.init_factor_time * n_rho
        st = setup_fn(Pd, Ad, dyn.sigma, rho_vec)
        solve_fn = jax.jit(lambda st, r1, r2: static.kkt_solver.solve(
            st, Pd, Ad, dyn.sigma, rho_vec, r1, r2))
        t_solve = timed(solve_fn, st, jnp.zeros(n, dtype) + 1.0, w2)
    elif static.kkt_solver == KKT_DENSE:
        factor_fn = jax.jit(functools.partial(
            kkt_ops.dense_factor, use_inverse=static.accel_mem == 0))
        t_factor = timed(factor_fn, Pd, Ad, dyn.sigma, rho_vec)
        times.init_factor_time = t_factor
        times.factor_update_time = t_factor * n_rho
        st = factor_fn(Pd, Ad, dyn.sigma, rho_vec)
        solve_fn = jax.jit(lambda st, r1, r2: kkt_ops.dense_solve(
            st, Pd, Ad, dyn.sigma, rho_vec, r1, r2, static.kkt_refine_steps))
        t_solve = timed(solve_fn, st, jnp.zeros(n, dtype) + 1.0, w2)
    elif static.kkt_solver == KKT_BLOCK and kkt_block is not None:
        from ..ops import blockkkt

        factor_fn = jax.jit(lambda rv: blockkkt.factor(
            kkt_block, Pd, Ad, dyn.sigma, rv,
            build_pair=static.kkt_refine_steps > 0))
        t_factor = timed(factor_fn, rho_vec)
        times.init_factor_time = t_factor
        times.factor_update_time = t_factor * n_rho
        st = factor_fn(rho_vec)
        solve_fn = jax.jit(lambda st, r1, r2: blockkkt.solve(
            kkt_block, st, Pd, Ad, dyn.sigma, rho_vec, r1, r2,
            static.kkt_refine_steps))
        t_solve = timed(solve_fn, st, jnp.zeros(n, dtype) + 1.0, w2)
    else:
        times.init_factor_time = 0.0
        times.factor_update_time = 0.0
        solve_fn = jax.jit(lambda r1, r2: kkt_ops.cg_solve(
            Pd, Ad, dyn.sigma, rho_vec, r1, r2, jnp.zeros(n, dtype),
            jnp.asarray(1e-6, dtype), jnp.asarray(1e-6, dtype),
            static.kkt_cg_max_iter, static.kkt_refine_steps))
        t_solve = timed(solve_fn, jnp.zeros(n, dtype) + 1.0, w2)
    times.update_time = t_solve * n_iter  # the x/nu-update == the KKT solve

    if static.accel_mem > 0 and n_acc > 0:
        from .. import accel

        aa = accel.init_accel(n + m, static.accel_mem, dtype)
        acc_fn = jax.jit(lambda aa, w: accel.accelerate(
            aa, w, static.accel_type, static.accel_regularizer))
        times.accelerate_time = timed(
            acc_fn, aa, jnp.ones(n + m, dtype)) * n_acc
    else:
        times.accelerate_time = 0.0


Model._measure_phase_times = _measure_phase_times


def _resolve_auto_rho_interval(self, Pd, Ad, qd, bd, cones, x0d, s0d, mu0d,
                               dyn, static, settings, times, kkt_precond=None,
                               kkt_block=None, rho_row_scale=None):
    """Run two short probe chunks; time the second (the first absorbs any
    compile); set the interval so ~adaptive_rho_fraction of the setup time
    passes between adaptations, rounded to a multiple of check_termination.
    Returns (dyn, carry, finished_out_or_None); probe iterations count
    toward the solve via the carry."""
    probe = max(int(settings.check_termination), 10)
    out = solver_mod.solve_jit(
        Pd, Ad, qd, bd, cones, x0d, s0d, mu0d,
        dyn._replace(max_iter=np.asarray(probe, np.int32)),
        static=static, return_carry=True, kkt_precond=kkt_precond,
        kkt_block=kkt_block, rho_row_scale=rho_row_scale,
    )
    out = dict(out)
    carry = out.pop("carry")
    setup = out.pop("setup")
    if int(out["status"]) != results_mod.MAX_ITER_REACHED:
        return dyn, carry, setup, out  # solved (or certified) within the probe
    t0 = time.perf_counter()
    out = solver_mod.solve_jit(
        Pd, Ad, qd, bd, cones, x0d, s0d, mu0d,
        dyn._replace(max_iter=np.asarray(2 * probe, np.int32)),
        static=static, carry_in=carry, return_carry=True,
        kkt_precond=kkt_precond, kkt_block=kkt_block,
        rho_row_scale=rho_row_scale, setup_in=setup,
    )
    out = dict(out)
    carry = out.pop("carry")
    setup = out.pop("setup")
    status = int(out["status"])  # also forces the host transfer for timing
    per_iter = (time.perf_counter() - t0) / probe
    setup_s = times.graph_time + times.setup_time
    ct = max(int(settings.check_termination), 1)
    iv = settings.adaptive_rho_fraction * setup_s / max(per_iter, 1e-9)
    iv = int(round(iv / ct)) * ct
    iv = min(max(iv, ct), int(settings.max_iter))
    self.auto_rho_interval = iv
    dyn = dyn._replace(adaptive_rho_interval=np.asarray(iv, np.int32))
    if status != results_mod.MAX_ITER_REACHED:
        return dyn, carry, setup, out
    return dyn, carry, setup, None


Model._resolve_auto_rho_interval = _resolve_auto_rho_interval


def _solve_chunked(self, Pd, Ad, qd, bd, cones, x0d, s0d, mu0d, dyn, static,
                   settings, t_start, dtype, carry=None, kkt_precond=None,
                   kkt_block=None, dispatch_chunk=-1, rho_row_scale=None,
                   setup0=None):
    """Chunked solve: run fixed-size chunks of the SAME compiled program
    (``max_iter`` is a device scalar) and re-enter with the full loop carry,
    so the iterate trajectory — rho state, accelerator history, CG warm
    start, iteration counters — matches one uninterrupted solve
    (reference behavior: Time_limit_reached, solver.jl:303-321).

    With ``time_limit`` set, the chunk is small (~10 termination checks) so
    the wall clock is consulted often; otherwise ``dispatch_chunk`` bounds
    the device-call length (the axon relay's worker dies on very long
    single dispatches)."""
    timed = bool(settings.time_limit and settings.time_limit > 0)
    if timed:
        # start small so the wall clock is consulted early, then grow the
        # chunk toward ~5 s of device time: each chunk re-entry costs a
        # fixed ~0.3 s of dispatch/transfer overhead through the tunnel,
        # so fixed small chunks taxed long solves ~25% (measured at
        # banded-2000 with 250-iteration chunks)
        chunk = max(int(settings.check_termination) * 10, 50)
    else:
        # the axon relay DEGRADES on long single dispatches well before the
        # outright worker-crash regime: at the 10k north-star (m=1.44M) the
        # identical program measured 14.7 ms/iter in 500-1000-iteration
        # chunks vs 54.8 at one 2000-iteration chunk and up to 292 on a
        # single 2000-iteration dispatch — start at 500 and let the growth
        # rule below find the ~5 s device-time sweet spot
        chunk = 500
    if dispatch_chunk > 0:
        chunk = min(chunk, dispatch_chunk)
    limit = int(np.asarray(carry.iter)) + int(np.asarray(carry.sg_iter)) if carry is not None else 0
    # live residual rows between chunks: the on-TPU verbose path (in-loop
    # jax.debug.print is unavailable on the axon relay — static.verbose is
    # auto-disabled there; the device-side history ring substitutes)
    live_rows = (
        settings.verbose and not static.verbose and static.res_hist > 0
    )
    printed_n = int(np.asarray(carry.hist_n)) if (
        live_rows and carry is not None
    ) else 0
    setup = setup0
    chunk_cap = dispatch_chunk if dispatch_chunk > 0 else 4000
    while True:
        t_chunk = time.perf_counter()
        it_before = limit
        limit = min(limit + chunk, int(settings.max_iter))
        out = solver_mod.solve_jit(
            Pd, Ad, qd, bd, cones, x0d, s0d, mu0d,
            dyn._replace(max_iter=np.asarray(limit, np.int32)),
            static=static, carry_in=carry, return_carry=True,
            kkt_precond=kkt_precond, kkt_block=kkt_block,
            rho_row_scale=rho_row_scale, setup_in=setup,
        )
        carry = out.pop("carry")
        setup = out.pop("setup")
        status = int(out["status"])
        if live_rows:
            from ..utils import printing

            hist = _order_history(out)
            hn = int(out["res_hist_n"])
            new = min(hn - printed_n, hist.shape[0])
            if new > 0:
                printing.print_history_rows(hist[-new:])
            printed_n = hn
            self._hist_printed = True
        elapsed = time.perf_counter() - t_start
        if status != results_mod.MAX_ITER_REACHED or limit >= settings.max_iter:
            break
        if timed and elapsed > settings.time_limit:
            out = dict(out)
            out["status"] = np.asarray(results_mod.TIME_LIMIT_REACHED)
            break
        # grow toward ~5 s device chunks (never past the dispatch cap) —
        # the same target bounds the relay-degradation regime measured on
        # long dispatches (see the chunk-start comment above)
        per_iter = (time.perf_counter() - t_chunk) / max(limit - it_before, 1)
        chunk = int(min(max(5.0 / max(per_iter, 1e-9), chunk), chunk_cap))
    return out


Model._solve_chunked = _solve_chunked


def cone_sets_from_dict(cone: dict, l=None, u=None) -> List[C.ConvexSet]:
    """SCS-style cone dict -> ordered cone list (reference:
    interface.jl:319-366)."""
    sets: List[C.ConvexSet] = []
    if cone.get("f"):
        sets.append(C.ZeroSet(int(cone["f"])))
    if cone.get("l"):
        sets.append(C.Nonnegatives(int(cone["l"])))
    for dim in cone.get("q", []):
        sets.append(C.SecondOrderCone(int(dim)))
    for dim in cone.get("s", []):
        sets.append(C.PsdConeTriangle(int(dim)))
    for _ in range(int(cone.get("ep", 0))):
        sets.append(C.ExponentialCone())
    for _ in range(int(cone.get("ed", 0))):
        sets.append(C.DualExponentialCone())
    for expo in cone.get("p", []):
        if expo >= 0:
            sets.append(C.PowerCone(float(expo)))
        else:
            sets.append(C.DualPowerCone(-float(expo)))
    if cone.get("b"):
        sets.append(C.Box(l, u))
    return sets


def _merge_constraints(constraints: List[Constraint]) -> List[Constraint]:
    """Fuse all ZeroSet rows and all Nonnegatives rows into one constraint
    each (reference: interface.jl:411-462)."""
    out: List[Constraint] = []
    for SetT in (C.ZeroSet, C.Nonnegatives):
        group = [c for c in constraints if type(c.convex_set) is SetT]
        if len(group) > 1:
            A = sp.vstack([sp.csr_matrix(c.A) for c in group])
            b = np.concatenate([c.b for c in group])
            merged = Constraint(A, b, SetT(A.shape[0]))
            constraints = [c for c in constraints if type(c.convex_set) is not SetT]
            constraints.append(merged)
    out = constraints
    return out


# convenience aliases matching the reference's API names
def assemble(model: Model, P, q, constraints, **kwargs) -> Model:
    return model.assemble(P, q, constraints, **kwargs)


def optimize(model: Model) -> results_mod.Result:
    return model.optimize()
