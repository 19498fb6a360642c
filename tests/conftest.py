"""Test configuration: force the CPU backend with 8 virtual devices (the
multi-chip sharding tests run on a simulated mesh) and enable float64."""
import os

# must happen before jax initializes its backends
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
