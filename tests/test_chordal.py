"""Chordal decomposition tests.

Mirrors the reference test strategy (SURVEY.md §4, reference
test/UnitTests/DecompositionTests/): the 9x9 docs example cliques, solve
parity with/without decomposition across merge strategies, PSD-ness of the
reassembled primal block and of the completed dual.
"""
import numpy as np
import pytest

import cosmo_tpu as ct
from cosmo_tpu import problems
from cosmo_tpu.chordal import graph, merging, trees
from cosmo_tpu.problems import smat, svec, tri_dim


def _docs_example_adj():
    """The 9x9 sparsity graph from reference docs/src/decomposition.md
    (0-based edges)."""
    edges = [
        (0, 2), (0, 5), (1, 2), (2, 5), (2, 6), (2, 7), (3, 4), (3, 7),
        (4, 7), (5, 6), (5, 7), (6, 7), (5, 8), (6, 8), (7, 8),
    ]
    adj = [set() for _ in range(9)]
    for i, j in edges:
        adj[i].add(j)
        adj[j].add(i)
    return adj


def test_docs_example_cliques():
    """Expected cliques {1,3,6},{2,3},{3,6,7,8},{4,5,8},{6,7,8,9}
    (1-based; reference docs/src/decomposition.md)."""
    adj = _docs_example_adj()
    cols, perm = graph.chordal_extension(adj)
    t = trees.build_clique_tree(cols, graph_mode=False)
    assert t.num == 5
    cliques = set()
    for pos in range(t.num):
        c = int(t.snd_post[pos])
        cliques.add(frozenset(int(perm[v]) + 1 for v in (t.snd[c] | t.sep[c])))
    expected = {
        frozenset({1, 3, 6}), frozenset({2, 3}), frozenset({3, 6, 7, 8}),
        frozenset({4, 5, 8}), frozenset({6, 7, 8, 9}),
    }
    assert cliques == expected


def test_clique_graph_merge_weight():
    """Merge weight |C1|^3+|C2|^3-|C1 u C2|^3 (reference:
    clique_merging.jl:403)."""
    w = merging._complexity_weight({0, 1, 2}, {2, 3, 4})
    assert w == 27 + 27 - 125
    w2 = merging._complexity_weight({0, 1, 2}, {1, 2})
    assert w2 == 27 + 8 - 27


def test_chordal_extension_is_chordal():
    """Every column's higher neighborhood must form a clique in the filled
    graph (defining property used by the clique decomposition)."""
    rng = np.random.default_rng(3)
    n = 25
    adj = [set() for _ in range(n)]
    for _ in range(60):
        i, j = rng.integers(0, n, 2)
        if i != j:
            adj[int(i)].add(int(j))
            adj[int(j)].add(int(i))
    cols, perm = graph.chordal_extension(adj)
    filled = [set(int(x) for x in c) for c in cols]
    for v in range(n):
        nb = sorted(filled[v])
        for a_i in range(len(nb)):
            for b_i in range(a_i + 1, len(nb)):
                a_, b_ = nb[a_i], nb[b_i]
                assert b_ in filled[a_], "fill-in not chordal"


@pytest.mark.parametrize("strategy", ["none", "clique_graph", "parent_child"])
def test_banded_sdp_decomposition_parity(strategy):
    P, q, A, b, sets, L = problems.banded_sdp(n_nodes=20, bandwidth=3, seed=1)
    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-6, eps_rel=1e-6))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    assert r0.status == "Solved"

    m1 = ct.Model(
        ct.Settings(
            decompose=True, merge_strategy=strategy, eps_abs=1e-6, eps_rel=1e-6
        )
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed
    assert r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) < 1e-3
    # reassembled primal slack must be PSD
    S = smat(r1.s)
    assert np.linalg.eigvalsh(S).min() > -1e-7
    # x parity
    assert np.allclose(r1.x, r0.x, atol=1e-3)


def test_psd_completion_of_dual():
    """With complete_dual=True the dual block must be PSD after completion
    (reference: test/UnitTests/DecompositionTests/psd_completion.jl)."""
    P, q, A, b, sets, L = problems.banded_sdp(n_nodes=20, bandwidth=3, seed=5)
    # the completion's accuracy tracks the dual accuracy (back-substitution
    # amplifies it by the conditioning of the separator blocks), so solve
    # tightly
    m1 = ct.Model(
        ct.Settings(
            decompose=True, merge_strategy="clique_graph", complete_dual=True,
            eps_abs=1e-9, eps_rel=1e-9, max_iter=20000,
        )
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert r1.status == "Solved"
    Y = smat(r1.y)
    assert np.linalg.eigvalsh(Y).min() > -1e-4


def test_maxcut_decomposed_vs_not():
    P, q, A, b, sets, L = problems.maxcut(n_nodes=25, density=0.15, seed=7)
    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-6, eps_rel=1e-6))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    m1 = ct.Model(ct.Settings(decompose=True, eps_abs=1e-6, eps_rel=1e-6))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert r0.status == "Solved" and r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) / max(1.0, abs(r0.obj_val)) < 1e-3


def test_dense_pattern_not_decomposed():
    """A dense PSD cone must be left alone (reference:
    chordal_decomposition.jl:53-60 falls back to the dense equivalent)."""
    P, q, A, b, sets, _ = problems.closest_correlation(n=8, seed=0)
    m1 = ct.Model(ct.Settings(decompose=True))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert not m1.is_decomposed
    assert r1.status == "Solved"


def test_merge_reduces_clique_count():
    adj = _docs_example_adj()
    cols, perm = graph.chordal_extension(adj)
    t = trees.build_clique_tree(cols, graph_mode=True)
    n_before = t.num
    merging.merge_cliques(t, "clique_graph")
    assert 1 <= t.num <= n_before
    # after merging, a valid clique tree exists: exactly one root among live
    live = [k for k in range(len(t.snd)) if len(t.snd[k]) + len(t.sep[k]) > 0]
    roots = [k for k in live if t.snd_par[k] == trees.ROOT]
    assert len(roots) == 1


def test_standard_transformation_triangle():
    """Agler-form decomposition (compact_transformation=False; reference:
    transformations.jl:5-138) must match the undecomposed solve."""
    P, q, A, b, sets, L = problems.banded_sdp(n_nodes=18, bandwidth=3, seed=2)
    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-6, eps_rel=1e-6))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    m1 = ct.Model(
        ct.Settings(
            decompose=True, compact_transformation=False, complete_dual=True,
            eps_abs=1e-6, eps_rel=1e-6,
        )
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed and r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) < 1e-3
    assert np.linalg.eigvalsh(smat(r1.s)).min() > -1e-7
    assert np.linalg.eigvalsh(smat(r1.y)).min() > -1e-4


def test_standard_transformation_square_psd():
    """Square (column-stacked) PSD cones decompose through the standard
    transformation (the compact path leaves them dense, matching the
    reference)."""
    n_nodes = 16
    _, _, _, _, _, L = problems.banded_sdp(n_nodes=n_nodes, bandwidth=3, seed=3)
    mrows = n_nodes * n_nodes
    A = np.zeros((mrows, n_nodes))
    for i in range(n_nodes):
        A[i * n_nodes + i, i] = -1.0
    b = (-L / 4.0).T.reshape(-1)
    q = np.ones(n_nodes)
    P = np.zeros((n_nodes, n_nodes))

    m1 = ct.Model(
        ct.Settings(
            decompose=True, compact_transformation=False, complete_dual=True,
            eps_abs=1e-6, eps_rel=1e-6,
        )
    )
    m1.set(P, q, A, b, [ct.PsdCone(mrows)])
    r1 = m1.optimize()
    assert m1.is_decomposed and r1.status == "Solved"

    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-6, eps_rel=1e-6))
    m0.set(P, q, A, b, [ct.PsdCone(mrows)])
    r0 = m0.optimize()
    assert abs(r1.obj_val - r0.obj_val) < 1e-3
    Y = r1.y.reshape(n_nodes, n_nodes).T
    assert np.linalg.eigvalsh(0.5 * (Y + Y.T)).min() > -1e-3


def test_standard_transformation_sparse_input():
    """Agler mode with scipy-sparse problem data.

    Note sparse=False: the Agler form's reduced KKT system carries the
    rho_eq*1e3 equality block and is too ill-conditioned for the inexact CG
    path (residual 1e-7 still leaves large error); the dense factor handles
    it. The compact transformation (default) is the right partner for CG.
    """
    P, q, A, b, sets, L = problems.banded_sdp(n_nodes=16, bandwidth=3, seed=6,
                                              sparse=True)
    m1 = ct.Model(
        ct.Settings(decompose=True, compact_transformation=False,
                    sparse=False, eps_abs=1e-6, eps_rel=1e-6)
    )
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed and r1.status == "Solved"

    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-6, eps_rel=1e-6,
                              sparse=False))
    m0.set(np.asarray(P.todense()), q, np.asarray(A.todense()), b, sets)
    r0 = m0.optimize()
    assert abs(r1.obj_val - r0.obj_val) < 1e-3


@pytest.mark.parametrize("weight", ["complexity", "padded"])
def test_native_merge_matches_python(weight):
    """The native C++ clique-graph merge (native.clique_graph_merge) is the
    hot path for large setups; it must produce the exact tree (snd, sep,
    parents, post order, merge log) of the pure-Python loop, which is the
    executable spec (reference: clique_merging.jl:147-357)."""
    import copy
    import importlib

    from cosmo_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    dec_mod = importlib.import_module("cosmo_tpu.chordal.decompose")

    P, q, A, b, sets, _ = problems.banded_sdp(n_nodes=300, bandwidth=6,
                                              seed=3, sparse=True)
    side = sets[0].side
    nz = dec_mod._aggregate_sparsity(A, b[: sets[0].dim], side, row0=0)
    adj = dec_mod._adjacency_from_svec(nz, side)
    cols, _perm = graph.chordal_extension(adj)
    t1 = trees.build_clique_tree(cols, graph_mode=True)
    t2 = copy.deepcopy(t1)

    wfn = merging._padded_weight if weight == "padded" else None
    merging.merge_clique_graph(t1, weight_fn=wfn)     # native
    orig = native.clique_graph_merge
    native.clique_graph_merge = lambda *a, **k: None  # force Python
    try:
        merging.merge_clique_graph(t2, weight_fn=wfn)
    finally:
        native.clique_graph_merge = orig

    assert t1.num == t2.num
    assert all(a == b for a, b in zip(t1.snd, t2.snd))
    assert all(a == b for a, b in zip(t1.sep, t2.sep))
    assert np.array_equal(t1.snd_par, t2.snd_par)
    assert np.array_equal(t1.snd_post, t2.snd_post)
    assert t1.merge_log.clique_pairs == t2.merge_log.clique_pairs
    assert t1.merge_log.decisions == t2.merge_log.decisions
    assert t1.merge_log.num == t2.merge_log.num


def test_dense_psd_cone_exempt_from_decomposition(capsys):
    """DensePsdConeTriangle must NOT be decomposed even when its sparsity
    pattern is chordal-decomposable (reference: convexset.jl:288-299 /
    :383-394, chordal_decomposition.jl:57-79)."""
    import numpy as np
    import cosmo_tpu as ct
    from cosmo_tpu.problems import banded_sdp

    P, q, A, b, sets, _ = banded_sdp(n_nodes=40, bandwidth=4, seed=0)
    assert len(sets) == 1
    d = sets[0].dim
    dense_set = [ct.DensePsdConeTriangle(d)]

    m1 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, decompose=True,
                              max_iter=4000))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed

    m2 = ct.Model(ct.Settings(eps_abs=1e-6, eps_rel=1e-6, decompose=True,
                              max_iter=4000))
    m2.set(P, q, A, b, dense_set)
    r2 = m2.optimize()
    assert not m2.is_decomposed
    assert r1.status == r2.status == "Solved"
    assert abs(r1.obj_val - r2.obj_val) < 1e-4


def test_rho_overlap_scale_same_solution():
    """Settings.rho_overlap_scale reweights the +-1 consistency rows' rho
    (an iteration-count lever for separator conditioning); any positive
    scale must land on the same solution."""
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=25, density=0.15, seed=7)
    ref = None
    for scale in (1.0, 0.2, 5.0):
        m = ct.Model(ct.Settings(decompose=True, eps_abs=1e-8, eps_rel=1e-8,
                                 max_iter=20000, rho_overlap_scale=scale))
        m.set(P, q, A, b, sets)
        r = m.optimize()
        assert r.status == "Solved", scale
        if ref is None:
            ref = r.obj_val
        else:
            assert abs(r.obj_val - ref) < 1e-5 * max(1.0, abs(ref)), scale


def test_user_merge_strategy_edge_weight():
    """The extension hook of the reference's strategy pattern
    (AbstractMergeStrategy / AbstractEdgeWeight,
    clique_merging.jl:108-129, :388-403): a user-supplied edge weight
    drives the clique-graph merge and the solve stays correct."""
    P, q, A, b, sets, _ = problems.maxcut(n_nodes=25, density=0.15, seed=7)

    def cardinality_weight(c1, c2):
        # merge while the separators are large relative to the cliques
        return float(2 * len(c1 & c2) - min(len(c1), len(c2)))

    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-7, eps_rel=1e-7))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()

    m1 = ct.Model(ct.Settings(
        decompose=True, eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
        merge_strategy=ct.CliqueGraphMerge(edge_weight=cardinality_weight),
    ))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed
    assert r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) < 1e-4 * max(1.0, abs(r0.obj_val))


def test_user_merge_strategy_custom_callable():
    """A fully custom tree-based strategy: merge every clique into its
    parent whenever the separator covers half the child (user-defined
    traverse/evaluate logic, reference clique_merging.jl:108-129)."""
    from cosmo_tpu.chordal.trees import DEAD, children_from_par, post_order

    class HalfSepMerge(ct.MergeStrategy):
        graph_based = False

        def __call__(self, t):
            child = children_from_par(t.snd_par)
            for pos in range(len(t.snd_post) - 2, -1, -1):
                c = int(t.snd_post[pos])
                p = int(t.snd_par[c])
                if p < 0:
                    continue
                merge = 2 * len(t.sep[c]) >= len(t.snd[c]) + len(t.sep[c])
                t.merge_log.clique_pairs.append((p, c))
                t.merge_log.decisions.append(bool(merge))
                if not merge:
                    continue
                t.merge_log.num += 1
                t.snd[p] |= t.snd[c]
                t.snd[c] = set()
                t.sep[c] = set()
                for g in child[c]:
                    t.snd_par[g] = p
                    child[p].append(g)
                t.snd_par[c] = DEAD
                child[p].remove(c)
                child[c] = []
                t.num -= 1
                if t.num == 1:
                    break
            t.snd_post = post_order(
                t.snd_par, children_from_par(t.snd_par), t.num
            )

    P, q, A, b, sets, _ = problems.maxcut(n_nodes=25, density=0.15, seed=7)
    m0 = ct.Model(ct.Settings(decompose=False, eps_abs=1e-7, eps_rel=1e-7))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    m1 = ct.Model(ct.Settings(
        decompose=True, eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
        merge_strategy=HalfSepMerge(),
    ))
    m1.set(P, q, A, b, sets)
    r1 = m1.optimize()
    assert m1.is_decomposed
    assert r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) < 1e-4 * max(1.0, abs(r0.obj_val))


def test_colpad_storage_solve_parity():
    """Column-padded svec storage for giant clique blocks
    (Settings.colpad_min; models/cones.py PsdConeTriangleColPad): a low
    threshold forces every clique block onto the colpad layout — the
    solve must match the tri-layout decomposed solve and the undecomposed
    reference solution, pad slots must be exactly 0, and the reassembled
    primal block must stay PSD."""
    P, q, A, b, sets, L = problems.maxcut(n_nodes=25, density=0.15, seed=7)
    m0 = ct.Model(ct.Settings(decompose=True, eps_abs=1e-6, eps_rel=1e-6))
    m0.set(P, q, A, b, sets)
    r0 = m0.optimize()
    # colpad_min=8 puts every padded block (side >= 8) on colpad storage
    m1 = ct.Model(ct.Settings(decompose=True, colpad_min=8,
                              eps_abs=1e-6, eps_rel=1e-6))
    m1.set(P, q, A, b, sets)
    ci = m1._chordal_info
    r1 = m1.optimize()
    ci = m1._chordal_info
    sets_d = ci.problem[4]
    assert any(isinstance(s_, ct.PsdConeTriangleColPad) for s_ in sets_d)
    assert r0.status == "Solved" and r1.status == "Solved"
    assert abs(r1.obj_val - r0.obj_val) / max(1.0, abs(r0.obj_val)) < 1e-3
    assert np.allclose(r1.x, r0.x, atol=1e-3)
    S = smat(r1.s)
    assert np.linalg.eigvalsh(S).min() > -1e-7


def test_colpad_conedata_projection_matches_tri():
    """compile_cones + project on colpad storage reproduces the tri-layout
    projection values entry for entry (the represented matrix is
    identical; only the memory layout differs)."""
    import jax.numpy as jnp

    from cosmo_tpu.models import cones as C
    from cosmo_tpu.ops import conedata, projections

    rng = np.random.default_rng(3)
    r = 8
    tri = r * (r + 1) // 2
    v_tri = rng.standard_normal(tri)
    # colpad layout of the same values
    v_cp = np.zeros(r * r)
    for j in range(r):
        for i in range(j + 1):
            v_cp[j * r + i] = v_tri[j * (j + 1) // 2 + i]

    cones_t = conedata.compile_cones([C.PsdConeTriangle(tri)],
                                     dtype=np.float64)
    cones_c = conedata.compile_cones([C.PsdConeTriangleColPad(r * r)],
                                     dtype=np.float64)
    bkt_c = cones_c.psd_buckets[0]
    assert bkt_c.fastpath == "colpad"
    s_t, _ = projections.project(jnp.asarray(v_tri), cones_t, ())
    s_c, _ = projections.project(jnp.asarray(v_cp), cones_c, ())
    s_c = np.asarray(s_c)
    # pad slots exactly 0
    for j in range(r):
        for i in range(j + 1, r):
            assert s_c[j * r + i] == 0.0
    # real entries match the tri projection
    got = np.array([s_c[j * r + i] for j in range(r)
                    for i in range(j + 1)])
    assert np.allclose(got, np.asarray(s_t), atol=1e-12)

    # membership path: the gathered matrix is identical for both layouts
    Xt = projections._psd_gather(projections._ext(jnp.asarray(v_tri)),
                                 cones_t.psd_buckets[0])
    Xc = projections._psd_gather(projections._ext(jnp.asarray(v_cp)),
                                 cones_c.psd_buckets[0])
    assert np.allclose(np.asarray(Xt), np.asarray(Xc), atol=1e-12)

    # non-fastpath (scatter-map) route must also zero the pad slots: build
    # a second block so offsets are non-contiguous... instead just use the
    # legacy maps directly
    Y = projections._psd_project_bucket(Xc, cones_c, None, bkt_c)
    s_legacy = projections._ext(jnp.zeros(r * r))
    s_legacy = s_legacy.at[bkt_c.scatter_idx].set(
        Y * bkt_c.scatter_scale)[:-1]
    s_legacy = np.asarray(s_legacy)
    assert np.allclose(s_legacy, s_c, atol=1e-12)


def test_colpad_blocks_survive_small_bucket_consolidation():
    """Reviewer repro: >6 distinct small sides trigger the small-bucket
    consolidation (ops/conedata.py); colpad blocks must NOT be merged into
    a larger-side bucket — their index templates are built at the block's
    own storage stride, and merging an r < k block made the maps read and
    scatter-write past its r*r region into neighboring cones' rows."""
    import jax.numpy as jnp

    from cosmo_tpu.models import cones as C
    from cosmo_tpu.ops import conedata, projections

    rng = np.random.default_rng(11)
    sides = (9, 10, 11, 12, 13)
    sets = [C.PsdConeTriangleColPad(r * r) for r in sides]
    sets += [C.PsdConeTriangle(8 * 9 // 2), C.PsdConeTriangle(6 * 7 // 2),
             C.PsdConeTriangle(5 * 6 // 2), C.PsdConeTriangle(4 * 5 // 2),
             C.PsdConeTriangle(3 * 4 // 2), C.PsdConeTriangle(2 * 3 // 2),
             C.PsdConeTriangle(1)]
    dim = sum(s.dim for s in sets)
    cones = conedata.compile_cones(sets, dtype=np.float64)
    v = rng.standard_normal(dim)
    s_all, _ = projections.project(jnp.asarray(v), cones, ())
    s_all = np.asarray(s_all)
    # reference: project each cone independently
    off = 0
    for s_ in sets:
        c1 = conedata.compile_cones([type(s_)(s_.dim)], dtype=np.float64)
        s_one, _ = projections.project(jnp.asarray(v[off:off + s_.dim]), c1, ())
        np.testing.assert_allclose(s_all[off:off + s_.dim],
                                   np.asarray(s_one), atol=1e-12,
                                   err_msg=f"cone at offset {off} corrupted")
        off += s_.dim
