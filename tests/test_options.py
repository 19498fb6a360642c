"""Option-surface tests: accelerator combinations (reference:
test/UnitTests/AccelerationTests/anderson_accelerator.jl asserts :Solved for
all 13 type combinations), settings-from-dict, printing smoke, KKT solvers
vs a dense reference solve."""
import io
import contextlib

import numpy as np
import pytest

import cosmo_tpu as ct
from cosmo_tpu.ops import kkt as kkt_ops

import jax.numpy as jnp


def _qp():
    rng = np.random.default_rng(7)
    n, m = 8, 12
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    return P, q, A, b, [ct.Nonnegatives(m)]


@pytest.mark.parametrize("aa_type", ["type2", "type2_qr", "type1"])
@pytest.mark.parametrize("memory", ["restarted", "rolling"])
@pytest.mark.parametrize("activation", ["immediate", "iter", "accuracy"])
@pytest.mark.parametrize("safeguard", [True, False])
def test_accelerator_combinations_solve(aa_type, memory, activation, safeguard):
    P, q, A, b, sets = _qp()
    model = ct.Model(
        ct.Settings(
            eps_abs=1e-7, eps_rel=1e-7,
            accelerator_type=aa_type,
            accelerator_memory=memory,
            accelerator_activation=activation,
            safeguard=safeguard,
        )
    )
    model.set(P, q, A, b, sets)
    res = model.optimize()
    assert res.status == "Solved"


@pytest.mark.parametrize("regularizer", ["tikhonov", "frobenius"])
def test_accelerator_regularizers_solve(regularizer):
    """Reference parity: COSMOAccelerators' Tikonov/FrobeniusNorm
    regularizer axis on the normal-equation accelerator solves."""
    P, q, A, b, sets = _qp()
    model = ct.Model(
        ct.Settings(eps_abs=1e-7, eps_rel=1e-7,
                    accelerator_regularizer=regularizer)
    )
    model.set(P, q, A, b, sets)
    res = model.optimize()
    assert res.status == "Solved"


def test_auto_adaptive_rho_interval():
    """adaptive_rho_interval=0 resolves the interval from a timed probe
    chunk (reference: solver.jl:242-256) — a multiple of check_termination,
    no recompile (the interval is a device scalar)."""
    rng = np.random.default_rng(5)
    n, m = 20, 30
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.standard_normal(n) * 3
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    model = ct.Model(ct.Settings(adaptive_rho_interval=0, eps_abs=1e-8,
                                 eps_rel=1e-8, check_termination=10))
    model.set(P, q, A, b, [ct.Nonnegatives(m)])
    r = model.optimize()
    assert r.status == "Solved"
    if model.auto_rho_interval is not None:  # not solved within the probe
        assert model.auto_rho_interval % 10 == 0
        assert model.auto_rho_interval >= 10


def test_rho_log_overflow_capped():
    """More rho adaptations than the RHO_LOG_LEN=64 ring can hold must not
    crash or corrupt the result; the log keeps the first entries and the
    count keeps counting (reference: unbounded rho_updates vector,
    parameters.jl:86)."""
    from cosmo_tpu import solver as solver_mod

    rng = np.random.default_rng(9)
    n, m = 6, 9
    M = rng.standard_normal((n, n))
    P = M @ M.T / n
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    model = ct.Model(ct.Settings(
        eps_abs=0.0, eps_rel=0.0, max_iter=3000,
        adaptive_rho_interval=2,            # adapt as often as possible
        adaptive_rho_tolerance=1.0 + 1e-12,  # every check changes rho
        accelerator=None,
    ))
    model.set(P, rng.standard_normal(n), A, b, [ct.Nonnegatives(m)])
    res = model.optimize()
    rl = np.asarray(res.info.rho_updates)
    assert len(rl) <= solver_mod.RHO_LOG_LEN
    assert np.all(np.isfinite(rl))
    assert np.all(rl > 0)


def test_set_csc_triangle_dims_convention():
    """set_csc's cone dict "s" entries are svec triangle dims (reference:
    convex_sets_from_dict, interface.jl:330-336), NOT matrix side lengths."""
    from cosmo_tpu.models.model import cone_sets_from_dict

    sets = cone_sets_from_dict({"f": 1, "s": [6, 10]})
    assert isinstance(sets[1], ct.PsdConeTriangle) and sets[1].side == 3
    assert isinstance(sets[2], ct.PsdConeTriangle) and sets[2].side == 4


def test_set_csc_end_to_end():
    """CSC-triplet entry with an SCS-style cone dict (the cosmo-python path,
    reference: interface_python.jl): same solution as set()."""
    import scipy.sparse as sp

    P, q, A, b, sets = _qp()
    Pc = sp.csc_matrix(P)
    Ac = sp.csc_matrix(A)
    m1 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m1.set_csc(Pc.data, Pc.indices, Pc.indptr, q, Ac.data, Ac.indices,
               Ac.indptr, b, {"l": A.shape[0]})
    r1 = m1.optimize()
    m2 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m2.set(P, q, A, b, sets)
    r2 = m2.optimize()
    assert r1.status == "Solved"
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-7)


def test_custom_kkt_solver_plugin():
    """User KKT solver through the 4-method AbstractKKTSolver contract
    (reference: kktsolver.jl:5-11): a plain jnp.linalg.solve plug-in must
    reproduce the built-in dense solution and survive rho updates."""
    P, q, A, b, sets = _qp()

    def setup(Pm, Am, sigma, rho_vec):
        n = Pm.shape[0]
        M = Pm + sigma * jnp.eye(n, dtype=Pm.dtype) + Am.T @ (rho_vec[:, None] * Am)
        return jnp.linalg.inv(M)

    def solve(Minv, Pm, Am, sigma, rho_vec, r1, r2):
        x = Minv @ (r1 + Am.T @ (rho_vec * r2))
        nu = rho_vec * (Am @ x - r2)
        return x, nu

    custom = ct.CustomKKTSolver(setup=setup, solve=solve)
    m1 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8, kkt_solver=custom))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert r1.status == "Solved"

    m0 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    np.testing.assert_allclose(r1.x, r0.x, rtol=1e-5, atol=1e-7)

    with pytest.raises(ValueError):
        ct.CustomKKTSolver(setup=setup)


def test_verbose_timing_populates_phase_timers():
    """verbose_timing measures each phase kernel standalone and scales by
    call count (reference phase timers: types.jl:26-58)."""
    P, q, A, b, sets = _qp()
    model = ct.Model(ct.Settings(verbose_timing=True, eps_abs=1e-6, eps_rel=1e-6))
    model.set(P, q, A, b, sets)
    r = model.optimize()
    t = r.times
    for name in ("scaling_time", "init_factor_time", "factor_update_time",
                 "proj_time", "update_time", "accelerate_time",
                 "setup_time", "graph_time", "iter_time", "post_time",
                 "solver_time"):
        assert np.isfinite(getattr(t, name)), name
    assert t.proj_time > 0 and t.update_time > 0


def test_settings_from_dict_and_unknown_key():
    s = ct.Settings.from_dict({"eps_abs": 1e-6, "max_iter": 100})
    assert s.eps_abs == 1e-6 and s.max_iter == 100
    with pytest.raises(KeyError):
        ct.Settings.from_dict({"nope": 1})


def test_settings_accepts_every_reference_keyword():
    """Every keyword of the reference constructor (settings.jl:101-139) is
    a valid cosmo_tpu setting under the same name — the name-compatibility
    contract documented in docs/migration.md. Values are the reference
    defaults (solver-class options as their string spellings)."""
    ref_kwargs = {
        "rho": 0.1, "sigma": 1e-6, "alpha": 1.6,
        "eps_abs": 1e-5, "eps_rel": 1e-5, "nearly_ratio": 100.0,
        "eps_prim_inf": 1e-4, "eps_dual_inf": 1e-4,
        "max_iter": 5000, "verbose": False, "kkt_solver": "dense",
        "check_termination": 25, "check_infeasibility": 40,
        "scaling": 10, "MIN_SCALING": 1e-4, "MAX_SCALING": 1e4,
        "adaptive_rho": True, "adaptive_rho_interval": 40,
        "adaptive_rho_tolerance": 5.0, "adaptive_rho_fraction": 0.4,
        "adaptive_rho_max_adaptions": 2**31 - 1,
        "verbose_timing": False, "RHO_MIN": 1e-6, "RHO_MAX": 1e6,
        "RHO_TOL": 1e-4, "RHO_EQ_OVER_RHO_INEQ": 1e3,
        "COSMO_INFTY": 1e20, "decompose": True, "complete_dual": False,
        "time_limit": 0.0, "obj_true": float("nan"),
        "obj_true_tol": 1e-3, "merge_strategy": "clique_graph",
        "compact_transformation": True, "accelerator": "anderson",
        "safeguard": True, "safeguard_tol": 2.0,
    }
    s = ct.Settings.from_dict(ref_kwargs)
    for key, val in ref_kwargs.items():
        got = getattr(s, key)
        if isinstance(val, float) and np.isnan(val):
            assert np.isnan(got), key
        else:
            assert got == val, key


def test_verbose_printing_smoke():
    P, q, A, b, sets = _qp()
    model = ct.Model(ct.Settings(verbose=True, eps_abs=1e-5, eps_rel=1e-5))
    model.set(P, q, A, b, sets)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res = model.optimize()
    out = buf.getvalue()
    assert "cosmo_tpu" in out
    assert "Results" in out
    assert res.status == "Solved"


@pytest.mark.parametrize("solver", ["cg", "minres"])
def test_indirect_kkt_matches_dense(solver):
    """Each KKT backend against a dense numpy reference solve (reference:
    test/UnitTests/kktsolver.jl)."""
    rng = np.random.default_rng(3)
    n, m = 15, 22
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    A = rng.standard_normal((m, n))
    rho = rng.random(m) + 0.5
    sigma = 1e-6
    r1 = rng.standard_normal(n)
    r2 = rng.standard_normal(m)
    Mred = P + sigma * np.eye(n) + A.T @ (rho[:, None] * A)
    x_ref = np.linalg.solve(Mred, r1 + A.T @ (rho * r2))
    nu_ref = rho * (A @ x_ref - r2)

    fn = kkt_ops.minres_solve if solver == "minres" else kkt_ops.cg_solve
    x, nu, k = fn(
        jnp.asarray(P), jnp.asarray(A), sigma, jnp.asarray(rho),
        jnp.asarray(r1), jnp.asarray(r2), jnp.zeros(n),
        jnp.asarray(1e-12), jnp.asarray(np.inf), 1000,
    )
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-7
    assert np.abs(np.asarray(nu) - nu_ref).max() < 1e-6


def test_mixed_precision_loose_phase():
    """mixed_precision=True threads the loose-phase flag through the
    projection (polar backend runs "default"-precision matmuls until the
    relative residuals cross mixed_precision_switch, then latches to full
    precision). On CPU both precisions are identical — this locks the
    carry/cond plumbing and that results match the plain configuration."""
    import numpy as np
    import cosmo_tpu as ct
    from cosmo_tpu.problems import block_sdp

    P, q, A, b, sets = block_sdp(n_blocks=8, side=8, n=32, seed=1)
    res = {}
    for mp in (False, True):
        m = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7,
                                 eigh_backend="polar", mixed_precision=mp))
        m.set(P, q, A, b, sets)
        r = m.optimize()
        assert r.status == "Solved", mp
        res[mp] = r
    np.testing.assert_allclose(res[True].x, res[False].x, rtol=1e-6, atol=1e-8)


def test_adaptive_rho_max_adaptions():
    """adaptive_rho_max_adaptions bounds the number of rho updates
    (reference: AccelerationTests/max_rho_adaption.jl — num_rho_adaptions
    equals the configured cap when rho starts far off at 1e-6)."""
    import numpy as np
    import cosmo_tpu as ct

    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0]); u = np.array([1.0, 0.7, 0.7])
    Aa = np.vstack([-A, A]); ba = np.concatenate([u, -l])
    for cap in (1, 2):
        m = ct.Model(ct.Settings(adaptive_rho_interval=25,
                                 adaptive_rho_max_adaptions=cap, rho=1e-6,
                                 eps_abs=1e-6, eps_rel=1e-4, max_iter=4000))
        m.assemble(P, q, [ct.Constraint(Aa, ba, ct.Nonnegatives)])
        r = m.optimize()
        # rho_updates[0] is the initial rho; adaptions are the rest
        assert len(r.info.rho_updates) - 1 == cap, (cap, r.info.rho_updates)


def test_banner_reports_resolved_kkt_solver(capsys):
    """The verbose banner must print the solve-time KKT solver (after the
    sparse-problem auto-selection), not the pre-resolution default."""
    import numpy as np
    import scipy.sparse as sp
    import cosmo_tpu as ct
    from cosmo_tpu.problems import banded_sdp

    P, q, A, b, sets, _ = banded_sdp(n_nodes=60, bandwidth=4, seed=0,
                                     sparse=True)
    m = ct.Model(ct.Settings(eps_abs=1e-4, eps_rel=1e-4, decompose=True,
                             verbose=True, max_iter=2000))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    out = capsys.readouterr().out
    assert "KKT solver = blockdiag" in out, out[-500:]


def test_auto_rho_deadband_resolution():
    """adaptive_rho_tolerance=0 (the default) resolves per KKT solver: 1.5
    when the block-diagonal direct KKT is active (cheap batched refactor;
    TPU-measured sweep: banded-2000 median 2982 -> 1550 iters, north-star
    10k tail seed 9150 -> 2925), the reference's 5.0 elsewhere
    (reference: settings.jl adaptive_rho_tolerance)."""
    from cosmo_tpu.problems import banded_sdp

    P, q, A, b, sets, _ = banded_sdp(n_nodes=200, bandwidth=8, seed=0,
                                     sparse=True)
    m = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, decompose=True,
                             max_iter=4000))
    m.set(P, q, A, b, sets)
    r = m.optimize()
    assert r.status == "Solved"
    assert m._resolved_settings.kkt_solver == "blockdiag"
    assert m._resolved_settings.adaptive_rho_tolerance == 1.5

    # dense path keeps the reference deadband
    m2 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6))
    m2.assemble(np.array([[4.0, 1.0], [1.0, 2.0]]), np.array([1.0, 1.0]),
                [ct.Constraint(np.eye(2), np.zeros(2), ct.Nonnegatives(2))])
    r2 = m2.optimize()
    assert r2.status == "Solved"
    assert m2._resolved_settings.adaptive_rho_tolerance == 5.0

    # explicit user value always wins
    m3 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, decompose=True,
                              max_iter=4000, adaptive_rho_tolerance=3.0))
    m3.set(P, q, A, b, sets)
    r3 = m3.optimize()
    assert r3.status == "Solved"
    assert m3._resolved_settings.adaptive_rho_tolerance == 3.0
