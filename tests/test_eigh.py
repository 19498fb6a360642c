"""Batched Jacobi eigensolver tests (ops/eigh.py)."""
import numpy as np

import jax.numpy as jnp

import cosmo_tpu as ct
from cosmo_tpu import problems
from cosmo_tpu.ops import eigh as eigh_mod


def _sym_stack(B, k, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((B, k, k))
    return jnp.asarray((G + G.swapaxes(1, 2)) / 2)


def test_jacobi_eigh_reconstructs():
    for B, k in [(32, 8), (16, 16), (4, 32)]:
        X = _sym_stack(B, k, seed=k)
        w, V = eigh_mod.jacobi_eigh(X, sweeps=10)
        R = jnp.einsum("bik,bk,bjk->bij", V, w, V)
        assert float(jnp.abs(R - X).max()) < 1e-10
        orth = jnp.einsum("bki,bkj->bij", V, V) - jnp.eye(k)
        assert float(jnp.abs(orth).max()) < 1e-10
        w_ref = np.linalg.eigvalsh(np.asarray(X))
        assert np.abs(np.sort(np.asarray(w), axis=1) - w_ref).max() < 1e-10


def test_jacobi_psd_projection_matches_xla():
    X = _sym_stack(24, 16, seed=3)
    Y1 = eigh_mod.psd_project_jacobi(X, sweeps=10)
    w, V = jnp.linalg.eigh(X)
    Y2 = jnp.einsum("bik,bk,bjk->bij", V, jnp.maximum(w, 0.0), V)
    assert float(jnp.abs(Y1 - Y2).max()) < 1e-9


def test_solver_with_jacobi_backend():
    """Full SDP solve with the Jacobi projection backend."""
    P, q, A, b, sets, _ = problems.closest_correlation(n=10, seed=0)
    m0 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, eigh_backend="xla"))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    m1 = ct.Model(
        ct.Settings(eps_abs=1e-6, eps_rel=1e-6, eigh_backend="jacobi")
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert r0.status == "Solved" and r1.status == "Solved"
    assert abs(r0.obj_val - r1.obj_val) < 1e-4
    assert np.allclose(r0.x, r1.x, atol=1e-4)


def test_amortized_projection_tracks_slow_drift():
    """The amortized backend must match a fresh full eigendecomposition
    while the input drifts slowly (the ADMM regime), including across a
    sudden jump (staleness fallback)."""
    import numpy as np
    import jax.numpy as jnp
    from cosmo_tpu.ops import eigh as eigh_mod

    rng = np.random.default_rng(3)
    B, k = 8, 16
    M = rng.standard_normal((B, k, k))
    X = jnp.asarray((M + np.transpose(M, (0, 2, 1))) / 2)
    V = jnp.broadcast_to(jnp.eye(k), (B, k, k))
    D = rng.standard_normal((B, k, k)) * 0.01
    D = jnp.asarray((D + np.transpose(D, (0, 2, 1))) / 2)

    for step in range(25):
        if step == 12:  # sudden jump -> staleness guard must recover
            J = rng.standard_normal((B, k, k)) * 2.0
            X = X + jnp.asarray((J + np.transpose(J, (0, 2, 1))) / 2)
        P, V = eigh_mod.psd_project_amortized(X, V, warm_sweeps=2,
                                              full_sweeps=10)
        w, Q = np.linalg.eigh(np.asarray(X))
        P_ref = np.einsum("bik,bk,bjk->bij", Q, np.maximum(w, 0.0), Q)
        err = np.abs(np.asarray(P) - P_ref).max()
        assert err < 5e-7, (step, err)
        X = X + D  # slow drift


def test_amortized_backend_end_to_end():
    """Full solve with eigh_backend='amortized' matches the xla backend."""
    import numpy as np
    import cosmo_tpu as ct
    from cosmo_tpu.problems import block_sdp

    P, q, A, b, sets = block_sdp(n_blocks=12, side=8, n=48, seed=5)
    res = {}
    for be in ("xla", "amortized"):
        m = ct.Model(ct.Settings(eps_abs=1e-7, eps_rel=1e-7,
                                 eigh_backend=be, jacobi_sweeps=10))
        m.set(P, q, A, b, sets)
        r = m.optimize()
        assert r.status == "Solved", be
        res[be] = r
    assert abs(res["amortized"].obj_val - res["xla"].obj_val) < 1e-5
    np.testing.assert_allclose(res["amortized"].x, res["xla"].x,
                               rtol=1e-4, atol=1e-5)


def test_pallas_rr_kernel_interpret_mode(monkeypatch):
    """The round-parallel Pallas Jacobi kernel (pallas_eigh._proj_kernel_rr)
    in interpret mode vs the LAPACK eigh projection: the circle-method
    schedule (pairs at rows (2t, 2t+1), fixed slot rotation between rounds)
    must cover all pairs and converge to ~f32 precision in 8 sweeps."""
    import numpy as np
    import jax.numpy as jnp
    from cosmo_tpu.ops import pallas_eigh

    monkeypatch.setenv("COSMO_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    for k in (8, 16):
        B = TB = 128
        A = rng.standard_normal((B, k, k)).astype(np.float32)
        A = (A + np.swapaxes(A, 1, 2)) / 2
        Xt = jnp.transpose(jnp.asarray(A), (1, 2, 0))
        Y = pallas_eigh._build_proj_rr(k, B, TB, 8, "float32")(Xt)
        Y = np.transpose(np.asarray(Y), (2, 0, 1))
        w, Q = np.linalg.eigh(A.astype(np.float64))
        Yref = np.einsum("bik,bk,bjk->bij", Q, np.maximum(w, 0.0), Q)
        assert np.abs(Y - Yref).max() < 5e-4, k


def test_auto_per_bucket_pallas_selection(monkeypatch):
    """compile_cones "auto" on TPU (simulated): a multi-bucket plain-ADMM
    layout gives the single dominant small-k large-batch bucket the Pallas
    kernel and polar to everything else (at most ONE pallas instantiation
    per program — mixed pallas shapes have faulted the TPU worker); with
    the accelerator on, or off-TPU, no bucket is overridden."""
    import numpy as np

    import cosmo_tpu.models.cones as C
    from cosmo_tpu.ops import conedata

    sets = (
        [C.PsdConeTriangle(36) for _ in range(400)]     # side 8, dominant
        + [C.PsdConeTriangle(136) for _ in range(300)]  # side 16, smaller cost
        + [C.PsdConeTriangle(300) for _ in range(5)]    # side 24, tiny batch
    )

    real_jax = __import__("jax")
    monkeypatch.setattr(real_jax, "default_backend", lambda: "tpu")

    cones = conedata.compile_cones(sets, dtype=np.float32, psd_pad_to=8,
                                   eigh_backend="auto", accel_on=False)
    # cost: 400*8^3 = 204800 < 300*16^3 = 1228800 -> the k=16 bucket wins
    overrides = {(b.side, b.backend) for b in cones.psd_buckets}
    assert (16, "pallas") in overrides
    assert all(bk == "" for (side, bk) in overrides if side != 16)
    assert cones.eigh_backend == "polar"

    # accelerator on, NOT decomposed: no pallas anywhere (the measured
    # AA+pallas orbit family); decomposed + AA gets the override (round-4
    # family rule, measured on maxcut-2000/-10k)
    cones_aa = conedata.compile_cones(sets, dtype=np.float32, psd_pad_to=8,
                                      eigh_backend="auto", accel_on=True)
    assert all(b.backend == "" for b in cones_aa.psd_buckets)
    cones_dec = conedata.compile_cones(sets, dtype=np.float32, psd_pad_to=8,
                                       eigh_backend="auto", accel_on=True,
                                       decomposed=True)
    assert any(b.backend == "pallas" for b in cones_dec.psd_buckets)

    # tiny batches (< 256 blocks) never take the kernel
    small = [C.PsdConeTriangle(36) for _ in range(100)] + [
        C.PsdConeTriangle(136) for _ in range(50)]
    cones_sm = conedata.compile_cones(small, dtype=np.float32, psd_pad_to=8,
                                      eigh_backend="auto", accel_on=False)
    assert all(b.backend == "" for b in cones_sm.psd_buckets)


def test_auto_single_bucket_decomposed_aa_rule(monkeypatch):
    """Round-4 rule: under Anderson, "auto" picks the Pallas kernel only
    for DECOMPOSED single-small-bucket layouts with a large batch (measured
    safe + ~30% faster on banded 2k/10k); non-decomposed AA keeps polar
    (the measured 8x8 min-eig AA+pallas orbit is that family)."""
    import numpy as np

    import cosmo_tpu.models.cones as C
    from cosmo_tpu.ops import conedata

    real_jax = __import__("jax")
    monkeypatch.setattr(real_jax, "default_backend", lambda: "tpu")

    big = [C.PsdConeTriangle(36) for _ in range(400)]   # one side-8 bucket

    r = conedata.resolve_eigh_backend
    cones = conedata.compile_cones(big, dtype=np.float32, psd_pad_to=8,
                                   eigh_backend="auto", accel_on=True,
                                   decomposed=True)
    assert cones.eigh_backend == "pallas"
    cones2 = conedata.compile_cones(big, dtype=np.float32, psd_pad_to=8,
                                    eigh_backend="auto", accel_on=True,
                                    decomposed=False)
    assert cones2.eigh_backend == "polar"
    small = [C.PsdConeTriangle(36) for _ in range(100)]  # batch < 256
    cones3 = conedata.compile_cones(small, dtype=np.float32, psd_pad_to=8,
                                    eigh_backend="auto", accel_on=True,
                                    decomposed=True)
    assert cones3.eigh_backend == "polar"
    cones4 = conedata.compile_cones(big, dtype=np.float32, psd_pad_to=8,
                                    eigh_backend="auto", accel_on=False,
                                    decomposed=False)
    assert cones4.eigh_backend == "pallas"
