"""Test configuration: force the CPU backend with 8 virtual devices (the
multi-chip sharding tests run on a simulated mesh) and enable float64."""
import os

# must happen before jax initializes its backends
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Control-lattice sweep hook (scripts/sweep_constants.py): COSMO_SWEEP of
# the form "NAME=VALUE[,NAME=VALUE...]" overrides solver module constants
# (e.g. AA_STRIKE_FACTOR) for the whole pytest session — they are read at
# trace time, so this must happen before any solve compiles.
if os.environ.get("COSMO_SWEEP"):
    from cosmo_tpu import solver as _solver_mod

    for _pair in os.environ["COSMO_SWEEP"].split(","):
        _name, _val = _pair.split("=")
        _old = getattr(_solver_mod, _name)  # unknown name -> loud failure
        setattr(_solver_mod, _name, type(_old)(float(_val)))
