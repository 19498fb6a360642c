"""Device-side residual history + chunked direct-solver entry.

The history ring (Settings.residual_history) is the on-TPU observability
path: the axon relay aborts host callbacks, so in-loop jax.debug.print rows
cannot run there and the ring substitutes (reference rows:
printing.jl:38-48; history object: types.jl:283-312 IterateHistory).
solver.solve_chunked is the dispatch-length safety for direct callers
(the Model layer's Settings.dispatch_chunk equivalent, VERDICT r2 #7).
"""
import numpy as np

import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems, solver as solver_mod
from cosmo_tpu.ops import conedata
from cosmo_tpu.settings import Settings, split_settings


def _prepare(max_iter=200, residual_history=64, **kw):
    P, q, A, b, sets = problems.block_sdp(n_blocks=8, side=4, n=16, seed=3)
    dtype = np.float64
    settings = Settings(
        max_iter=max_iter, accelerator=None, adaptive_rho=False,
        eps_abs=1e-9, eps_rel=1e-9, residual_history=residual_history, **kw
    )
    cones = conedata.compile_cones(sets, dtype=dtype, psd_pad_to=4)
    static, dyn = split_settings(settings, b.shape[0], q.shape[0], dtype)
    arrs = tuple(jnp.asarray(v, dtype) for v in (P, A, q, b))
    z = (jnp.zeros(q.shape[0], dtype), jnp.zeros(b.shape[0], dtype),
         jnp.zeros(b.shape[0], dtype))
    return arrs, cones, z, dyn, static


def test_residual_history_rows_through_model():
    P, q, A, b, sets = problems.block_sdp(n_blocks=6, side=4, n=12, seed=1)
    m = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7, residual_history=16))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    h = r.info.res_history
    assert h is not None and h.shape[1] == 6   # + refine-latch col
    assert h.shape[0] >= 1
    # chronological iteration column; rows recorded at termination checks
    its = h[:, 0]
    assert np.all(np.diff(its) > 0)
    # the final row's residuals match the result info (the last check is
    # the converging one)
    assert np.isclose(h[-1, 2], r.info.r_prim)
    assert np.isclose(h[-1, 3], r.info.r_dual)
    # ring wrap: more checks than the ring holds keeps the LAST rows
    m2 = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7, residual_history=2,
                              check_termination=5))
    m2.set(P, q, A, b, sets)
    r2 = m2.optimize()
    h2 = r2.info.res_history
    assert h2.shape[0] == 2 and h2[1, 0] > h2[0, 0]
    assert np.isclose(h2[-1, 2], r2.info.r_prim)


def test_residual_history_disabled():
    P, q, A, b, sets = problems.block_sdp(n_blocks=6, side=4, n=12, seed=1)
    m = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, residual_history=0))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    assert r.info.res_history is None


def test_solve_chunked_matches_one_shot():
    """Chunked re-entry through the resumable carry follows the identical
    trajectory (bit-exact) of an uninterrupted solve."""
    (P, A, q, b), cones, (x0, s0, mu0), dyn, static = _prepare(max_iter=120)
    ref = solver_mod.solve_jit(P, A, q, b, cones, x0, s0, mu0, dyn,
                               static=static)
    out = solver_mod.solve_chunked(P, A, q, b, cones, x0, s0, mu0, dyn,
                                   static, chunk=17)
    assert int(out["iter"]) == int(ref["iter"])
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(ref["x"]))
    np.testing.assert_array_equal(np.asarray(out["s"]), np.asarray(ref["s"]))
    assert int(out["status"]) == int(ref["status"])


def test_solve_chunked_early_exit():
    """A solve converging inside the first chunk returns immediately with
    the solved status (no extra chunks dispatched)."""
    (P, A, q, b), cones, (x0, s0, mu0), dyn, static = _prepare(max_iter=5000)
    out = solver_mod.solve_chunked(P, A, q, b, cones, x0, s0, mu0,
                                   dyn._replace(eps_abs=jnp.asarray(1e-5),
                                                eps_rel=jnp.asarray(1e-5)),
                                   static, chunk=1000)
    assert int(out["status"]) == 1  # Solved
    assert int(out["iter"]) < 1000
