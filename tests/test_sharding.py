"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

The production layout for decomposed SDPs: A/b row-sharded, PSD block
stacks sharded along the batch (clique) dimension, x-space replicated;
GSPMD inserts the collectives (SURVEY.md §5.8).
"""
import numpy as np

import jax
import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems, solver as solver_mod
from cosmo_tpu.ops import conedata
from cosmo_tpu.parallel import make_mesh, shard_problem
from cosmo_tpu.settings import Settings, split_settings


def _prepare(n_blocks=8, side=4, n=16):
    P, q, A, b, sets = problems.block_sdp(
        n_blocks=n_blocks, side=side, n=n, seed=3
    )
    dtype = np.float64
    settings = Settings(
        max_iter=200, accelerator=None, adaptive_rho=False,
        eps_abs=1e-6, eps_rel=1e-6,
    )
    cones = conedata.compile_cones(sets, dtype=dtype, psd_pad_to=4)
    static, dyn = split_settings(settings, b.shape[0], n, dtype)
    arrs = tuple(jnp.asarray(v, dtype) for v in (P, A, q, b))
    z = (jnp.zeros(n, dtype), jnp.zeros(b.shape[0], dtype), jnp.zeros(b.shape[0], dtype))
    return arrs, cones, z, dyn, static


def test_sharded_solve_matches_single_device():
    assert jax.device_count() >= 8
    (P, A, q, b), cones, (x0, s0, mu0), dyn, static = _prepare()

    out1 = solver_mod.solve_jit(P, A, q, b, cones, x0, s0, mu0, dyn, static=static)

    mesh = make_mesh(8)
    Ps, As, qs, bs, cones_s = shard_problem(mesh, P, A, q, b, cones)
    out8 = solver_mod.solve_jit(Ps, As, qs, bs, cones_s, x0, s0, mu0, dyn, static=static)

    assert int(out8["iter"]) == int(out1["iter"])
    np.testing.assert_allclose(
        np.asarray(out8["x"]), np.asarray(out1["x"]), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out8["s"]), np.asarray(out1["s"]), rtol=1e-6, atol=1e-8
    )


def test_graft_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
