"""Cone projection unit tests (reference: test/UnitTests/projections.jl).

Every projection Pi_K must satisfy (for a closed convex cone K):
  1. Pi(v) in K
  2. v - Pi(v) in K^polar  (equivalently Pi(v) - v in K^*)
  3. <Pi(v), v - Pi(v)> = 0
and PSD / SOC projections must match dense numpy references.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cosmo_tpu.models import cones as C
from cosmo_tpu.ops import conedata, exp_pow, projections

RNG = np.random.default_rng(12345)


def _project(sets, v, psd_pad_to=8):
    cd = conedata.compile_cones(sets, dtype=np.float64, psd_pad_to=psd_pad_to)
    return np.asarray(projections.project(jnp.asarray(v), cd)[0]), cd


def test_zero_nonneg_box():
    sets = [C.ZeroSet(3), C.Nonnegatives(4), C.Box(l=[-1, 0.0], u=[1, 2.0])]
    v = np.array([1.0, -2.0, 3.0, -1.0, 2.0, -0.5, 0.5, -3.0, 5.0])
    s, _ = _project(sets, v)
    expected = np.array([0, 0, 0, 0, 2, 0, 0.5, -1.0, 2.0])
    np.testing.assert_allclose(s, expected)


def _soc_project_ref(v):
    t, x = v[0], v[1:]
    nx = np.linalg.norm(x)
    if nx <= t:
        return v.copy()
    if nx <= -t:
        return np.zeros_like(v)
    out = np.concatenate([[(nx + t) / 2], (nx + t) / (2 * nx) * x])
    return out


@pytest.mark.parametrize("dims", [[3], [2, 5], [3, 3, 7]])
def test_soc(dims):
    sets = [C.SecondOrderCone(d) for d in dims]
    m = sum(dims)
    for _ in range(5):
        v = RNG.normal(size=m) * 3
        s, _ = _project(sets, v)
        off = 0
        for d in dims:
            np.testing.assert_allclose(
                s[off : off + d], _soc_project_ref(v[off : off + d]), atol=1e-12
            )
            off += d


def _svec(X):
    """Column-major upper-triangle packing with sqrt(2) off-diagonals."""
    r = X.shape[0]
    out = []
    for j in range(r):
        for i in range(j + 1):
            out.append(X[i, j] * (1.0 if i == j else np.sqrt(2.0)))
    return np.array(out)


def _smat(v, r):
    X = np.zeros((r, r))
    k = 0
    for j in range(r):
        for i in range(j + 1):
            X[i, j] = v[k] * (1.0 if i == j else 1 / np.sqrt(2.0))
            X[j, i] = X[i, j]
            k += 1
    return X


def _psd_project_ref(X):
    w, V = np.linalg.eigh(X)
    return (V * np.maximum(w, 0)) @ V.T


@pytest.mark.parametrize("r", [2, 3, 5, 9])
@pytest.mark.parametrize("pad", [1, 8])
def test_psd_triangle(r, pad):
    sets = [C.PsdConeTriangle(r * (r + 1) // 2)]
    Xs = RNG.normal(size=(r, r))
    X = 0.5 * (Xs + Xs.T)
    v = _svec(X)
    s, _ = _project(sets, v, psd_pad_to=pad)
    np.testing.assert_allclose(_smat(s, r), _psd_project_ref(X), atol=1e-10)


@pytest.mark.parametrize("r", [2, 4])
def test_psd_square(r):
    sets = [C.PsdCone(r * r)]
    Xs = RNG.normal(size=(r, r))  # NOT symmetric: projection symmetrizes first
    v = Xs.flatten(order="F")
    s, _ = _project(sets, v)
    X = 0.5 * (Xs + Xs.T)
    np.testing.assert_allclose(
        s.reshape(r, r, order="F"), _psd_project_ref(X), atol=1e-10
    )


def test_psd_mixed_buckets():
    """Multiple PSD blocks of different sizes + other cones in one program."""
    rs = [2, 3, 6, 3]
    sets = [C.Nonnegatives(5)] + [C.PsdConeTriangle(r * (r + 1) // 2) for r in rs]
    m = 5 + sum(r * (r + 1) // 2 for r in rs)
    v = RNG.normal(size=m) * 2
    s, _ = _project(sets, v)
    np.testing.assert_allclose(s[:5], np.maximum(v[:5], 0))
    off = 5
    for r in rs:
        d = r * (r + 1) // 2
        np.testing.assert_allclose(
            _smat(s[off : off + d], r),
            _psd_project_ref(_smat(v[off : off + d], r)),
            atol=1e-10,
        )
        off += d


def _check_cone_identities(sets, v, in_cone_fn, in_dual_fn, atol=1e-6):
    s, _ = _project(sets, v)
    resid = v - s
    # Pi(v) in K
    assert in_cone_fn(s, atol), f"Pi(v) not in K: {s}"
    # -(v - Pi(v)) in K* (Moreau)
    assert in_dual_fn(-resid, atol), f"v - Pi(v) not in polar: {resid}"
    # orthogonality
    assert abs(np.dot(s, resid)) < 1e-6


@pytest.mark.parametrize("seed", range(8))
def test_exp_cone_identities(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=3) * 2
    sets = [C.ExponentialCone()]
    _check_cone_identities(
        sets,
        v,
        lambda s, tol: bool(exp_pow.exp_in_cone(jnp.asarray(s), tol)),
        lambda s, tol: bool(exp_pow.exp_in_dual(jnp.asarray(s), tol)),
    )


@pytest.mark.parametrize("seed", range(8))
def test_dual_exp_cone_identities(seed):
    rng = np.random.default_rng(100 + seed)
    v = rng.normal(size=3) * 2
    sets = [C.DualExponentialCone()]
    _check_cone_identities(
        sets,
        v,
        lambda s, tol: bool(exp_pow.exp_in_dual(jnp.asarray(s), tol)),
        lambda s, tol: bool(exp_pow.exp_in_cone(jnp.asarray(s), tol)),
    )


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("alpha", [0.3, 0.5, 0.8])
def test_pow_cone_identities(seed, alpha):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=3) * 2
    sets = [C.PowerCone(alpha)]
    _check_cone_identities(
        sets,
        v,
        lambda s, tol: bool(exp_pow.pow_in_cone(jnp.asarray(s), alpha, tol)),
        lambda s, tol: bool(exp_pow.pow_in_dual(jnp.asarray(s), alpha, tol)),
    )


@pytest.mark.parametrize("seed", range(4))
def test_dual_pow_cone_identities(seed):
    alpha = 0.4
    rng = np.random.default_rng(50 + seed)
    v = rng.normal(size=3) * 2
    sets = [C.DualPowerCone(alpha)]
    _check_cone_identities(
        sets,
        v,
        lambda s, tol: bool(exp_pow.pow_in_dual(jnp.asarray(s), alpha, tol)),
        lambda s, tol: bool(exp_pow.pow_in_cone(jnp.asarray(s), alpha, tol)),
    )


def test_psd_1x1_becomes_nonneg():
    sets = [C.PsdConeTriangle(1), C.PsdCone(1)]
    v = np.array([-3.0, 4.0])
    s, cd = _project(sets, v)
    np.testing.assert_allclose(s, [0.0, 4.0])
    assert len(cd.psd_buckets) == 0


# ---------------------------------------------------------------------------
# Membership tests feeding the infeasibility certificates
# (reference: test/UnitTests/sets.jl "in_dual Functions" + the per-cone
# in_pol_recc / support_function methods, src/convexset.jl:850-936)
# ---------------------------------------------------------------------------

def _cd(sets):
    return conedata.compile_cones(sets, dtype=np.float64, psd_pad_to=8)


def test_in_pol_recc_per_family():
    from cosmo_tpu.problems import svec

    tol = 1e-6
    # ZeroSet: only ~0 vectors are in the polar recession cone of {0}+b
    cd = _cd([C.ZeroSet(3)])
    assert bool(projections.in_pol_recc(jnp.zeros(3), cd, tol))
    assert not bool(projections.in_pol_recc(jnp.asarray([0.0, 1e-3, 0]), cd, tol))
    # Nonnegatives: v <= tol
    cd = _cd([C.Nonnegatives(3)])
    assert bool(projections.in_pol_recc(jnp.asarray([-1.0, -2.0, 0.0]), cd, tol))
    assert not bool(projections.in_pol_recc(jnp.asarray([1.0, -2.0, 0.0]), cd, tol))
    # Box with finite bounds: anything passes; infinite u forbids v > tol
    cd = _cd([C.Box(l=[-1.0, -1.0], u=[1.0, np.inf])])
    assert bool(projections.in_pol_recc(jnp.asarray([5.0, -3.0]), cd, tol))
    assert not bool(projections.in_pol_recc(jnp.asarray([5.0, 3.0]), cd, tol))
    # SOC: ||x|| <= -t
    cd = _cd([C.SecondOrderCone(3)])
    assert bool(projections.in_pol_recc(jnp.asarray([-2.0, 1.0, 1.0]), cd, tol))
    assert not bool(projections.in_pol_recc(jnp.asarray([2.0, 1.0, 1.0]), cd, tol))
    # PSD triangle: -V must be PSD (lambda_max(V) <= tol)
    cd = _cd([C.PsdConeTriangle(6)])
    Vneg = svec(-np.eye(3))
    assert bool(projections.in_pol_recc(jnp.asarray(Vneg), cd, tol))
    assert not bool(projections.in_pol_recc(jnp.asarray(-Vneg), cd, tol))


def test_support_function_per_family():
    from cosmo_tpu.problems import svec

    tol = 1e-6
    # Box: finite weighted sum of bounds
    cd = _cd([C.Box(l=[-1.0, -2.0], u=[3.0, 4.0])])
    y = jnp.asarray([2.0, -1.0])
    # sup over [l,u] of <z,y> = 2*3 + (-1)*(-2) = 8
    assert float(projections.support_function(y, cd, tol)) == pytest.approx(8.0)
    # Nonnegatives: 0 if y <= 0 (dual side), +inf otherwise
    cd = _cd([C.Nonnegatives(2)])
    assert float(projections.support_function(jnp.asarray([-1.0, 0.0]), cd, tol)) == 0.0
    assert np.isinf(float(projections.support_function(jnp.asarray([1.0, 0.0]), cd, tol)))
    # SOC: 0 iff -y in SOC
    cd = _cd([C.SecondOrderCone(3)])
    assert float(projections.support_function(jnp.asarray([-2.0, 1.0, 0.0]), cd, tol)) == 0.0
    assert np.isinf(float(projections.support_function(jnp.asarray([-0.5, 1.0, 0.0]), cd, tol)))
    # PSD: 0 iff -Y is PSD
    cd = _cd([C.PsdConeTriangle(6)])
    yv = svec(-np.eye(3))
    assert float(projections.support_function(jnp.asarray(yv), cd, tol)) == 0.0
    assert np.isinf(float(projections.support_function(jnp.asarray(-yv), cd, tol)))


def test_contiguous_bucket_fast_path_matches_index_maps():
    """The selection-matmul fast path (uniform contiguous triangle buckets)
    must produce bit-comparable projections to the generic index maps."""
    import dataclasses
    import jax.numpy as jnp

    from cosmo_tpu.problems import tri_dim

    sets = [C.PsdConeTriangle(tri_dim(6)) for _ in range(5)]
    m = sum(s_.dim for s_ in sets)
    v = RNG.standard_normal(m)
    cd = conedata.compile_cones(sets, dtype=np.float64, psd_pad_to=8)
    assert cd.psd_buckets[0].contig_start >= 0  # fast path engaged
    s_fast, _ = projections.project(jnp.asarray(v), cd)
    # disable the fast path -> legacy gather/scatter maps
    legacy = dataclasses.replace(
        cd,
        psd_buckets=tuple(
            dataclasses.replace(b, fastpath="none", contig_start=-1,
                                tri_len=0, expand=None, compress=None)
            for b in cd.psd_buckets
        ),
    )
    s_ref, _ = projections.project(jnp.asarray(v), legacy)
    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref),
                               rtol=1e-13, atol=1e-14)
    # membership margins agree too
    for tol in (1e-6, 1e-2):
        a = bool(projections.in_pol_recc(jnp.asarray(v), cd, tol))
        b_ = bool(projections.in_pol_recc(jnp.asarray(v), legacy, tol))
        assert a == b_


def test_shear_fast_path_matches_index_maps():
    """The slice-shear fast path (uniform contiguous triangle buckets with
    side > 64, where the selection matrices would be O(k^4)) must match the
    generic index maps, including at a padded side (r0 < k)."""
    import dataclasses
    import jax.numpy as jnp

    from cosmo_tpu.problems import tri_dim

    for r in (96, 90):   # 96 == bucket side; 90 pads to 96
        sets = [C.PsdConeTriangle(tri_dim(r)) for _ in range(3)]
        m = sum(s_.dim for s_ in sets)
        v = RNG.standard_normal(m)
        cd = conedata.compile_cones(sets, dtype=np.float64, psd_pad_to=8)
        assert cd.psd_buckets[0].fastpath == "shear", r
        s_fast, _ = projections.project(jnp.asarray(v), cd)
        legacy = dataclasses.replace(
            cd,
            psd_buckets=tuple(
                dataclasses.replace(b, fastpath="none", contig_start=-1,
                                    tri_len=0, sh_starts=None, sh_scale=None,
                                    sh_flat=None, sh_csc=None)
                for b in cd.psd_buckets
            ),
        )
        s_ref, _ = projections.project(jnp.asarray(v), legacy)
        np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref),
                                   rtol=1e-12, atol=1e-13)
        for tol in (1e-6, 1e-2):
            a = bool(projections.in_pol_recc(jnp.asarray(v), cd, tol))
            b_ = bool(projections.in_pol_recc(jnp.asarray(v), legacy, tol))
            assert a == b_
