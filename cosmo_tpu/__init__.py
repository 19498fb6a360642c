"""cosmo_tpu — a TPU-native conic ADMM solver.

A from-scratch JAX/XLA re-design with the capabilities of the reference
solver COSMO.jl (see SURVEY.md): it solves

    min  1/2 x'Px + q'x    s.t.  Ax + b in K

for Cartesian products of zero, nonnegative, box, second-order, PSD
(square/triangle), exponential and power cones (and their duals) — LPs,
QPs, SOCPs, SDPs, exp/pow-cone programs — with Ruiz equilibration,
per-constraint adaptive rho, infeasibility certificates, warm starting,
safeguarded Anderson acceleration and chordal decomposition of sparse PSD
constraints with clique merging.

Unlike the single-process reference, the entire splitting loop runs as one
jitted XLA program: cone projections are type-grouped batched kernels (PSD
blocks -> bucketed batched eigendecompositions), the KKT system is solved by
a cached dense Cholesky or matrix-free CG, and decomposed problems shard
their clique blocks across a TPU mesh.
"""
import os as _os

import jax as _jax

# persistent XLA compilation cache: the jitted solve programs are large
# (batched projection kernels + KKT loop); caching them across processes
# turns minute-scale TPU compiles into cache hits.
# CPU-pinned runs skip it: XLA:CPU AOT cache entries bake in the compile
# host's CPU feature set, and reloading them on a different host (this
# container migrates) can SIGILL/segfault mid-suite.
_platforms = (
    _os.environ.get("JAX_PLATFORMS", "") or _os.environ.get("JAX_PLATFORM_NAME", "")
).lower()
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") and _platforms != "cpu":
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("COSMO_TPU_CACHE", "/tmp/cosmo_tpu_jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the option
        pass


def enable_x64():
    """Enable float64 computation (recommended on CPU for 1e-5 tolerances)."""
    _jax.config.update("jax_enable_x64", True)


from .models.cones import (  # noqa: E402
    Box,
    ConvexSet,
    CustomCone,
    DensePsdCone,
    DensePsdConeTriangle,
    DualExponentialCone,
    DualPowerCone,
    ExponentialCone,
    Nonnegatives,
    PowerCone,
    PsdCone,
    PsdConeTriangle,
    PsdConeTriangleColPad,
    PsdConeTriangleComplex,
    SecondOrderCone,
    ZeroSet,
)
from .chordal.merging import CliqueGraphMerge, MergeStrategy  # noqa: E402
from .interface import solve  # noqa: E402
from .models.constraint import Constraint  # noqa: E402
from .models.model import Model, assemble, optimize  # noqa: E402
from .results import Result, ResultInfo, ResultTimes  # noqa: E402
from .settings import CustomKKTSolver, Settings  # noqa: E402
from .utils.printing import print_clique_sizes, print_merge_logs  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Model",
    "Settings",
    "Constraint",
    "Result",
    "ResultInfo",
    "ResultTimes",
    "assemble",
    "optimize",
    "solve",
    "print_merge_logs",
    "print_clique_sizes",
    "enable_x64",
    "CustomCone",
    "CustomKKTSolver",
    "MergeStrategy",
    "CliqueGraphMerge",
    "ZeroSet",
    "Nonnegatives",
    "Box",
    "SecondOrderCone",
    "PsdCone",
    "DensePsdCone",
    "PsdConeTriangle",
    "DensePsdConeTriangle",
    "PsdConeTriangleColPad",
    "PsdConeTriangleComplex",
    "ExponentialCone",
    "DualExponentialCone",
    "PowerCone",
    "DualPowerCone",
]
