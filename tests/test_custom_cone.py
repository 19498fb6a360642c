"""Custom (user-defined) cone tests — reference headline feature
"allows custom cones" (README.md:36-50, AbstractConvexSet interface)."""
import numpy as np

import jax.numpy as jnp

import cosmo_tpu as ct


def _qp():
    rng = np.random.default_rng(0)
    n, m = 8, 12
    M = rng.standard_normal((n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + rng.random(m)
    return P, q, A, b, m


def test_custom_nonneg_matches_builtin():
    P, q, A, b, m = _qp()
    custom = ct.CustomCone(
        dim=m,
        project=lambda v: jnp.maximum(v, 0.0),
        in_pol_recc=lambda v, tol: jnp.all(v <= tol),
        support=lambda y, tol: jnp.where(jnp.all(y <= tol), 0.0, jnp.inf),
        scalar_scaling=False,
    )
    m1 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m1.set(P, q, A, b, [custom])
    r1 = m1.optimize()
    r1b = m1.optimize()  # re-solve exercises the jit-cache hash path

    m0 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m0.set(P, q, A, b, [ct.Nonnegatives(m)])
    r0 = m0.optimize()
    assert r1.status == "Solved"
    assert np.abs(r1.x - r0.x).max() < 1e-7
    assert np.abs(r1b.x - r0.x).max() < 1e-7


def test_custom_second_order_cone_mixed():
    """A custom SOC next to builtin cones."""
    P, q, A, b, m = _qp()

    def soc_project(v):
        t, x = v[0], v[1:]
        nx = jnp.linalg.norm(x)
        scale = jnp.clip((nx + t) / 2.0, 0.0, None)
        safe = jnp.where(nx > 0, nx, 1.0)
        proj = jnp.concatenate([scale[None], (scale / safe) * x])
        inside = nx <= t
        polar = nx <= -t
        return jnp.where(inside, v, jnp.where(polar, jnp.zeros_like(v), proj))

    soc_dim = 4
    custom = ct.CustomCone(dim=soc_dim, project=soc_project)
    sets = [ct.Nonnegatives(m - soc_dim), custom]
    m1 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()

    m0 = ct.Model(ct.Settings(eps_abs=1e-8, eps_rel=1e-8))
    m0.set(P, q, A, b, [ct.Nonnegatives(m - soc_dim), ct.SecondOrderCone(soc_dim)])
    r0 = m0.optimize()
    assert r1.status == "Solved"
    assert np.abs(r1.x - r0.x).max() < 1e-6
