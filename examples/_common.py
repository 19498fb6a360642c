"""Shared setup for the examples: run on CPU (float64) by default so they
are reproducible anywhere; set COSMO_TPU_DEVICE=tpu to run on the chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("COSMO_TPU_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax  # noqa: F401
