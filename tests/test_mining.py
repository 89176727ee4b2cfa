"""Mining layer: kCL, motif census, SGL patterns vs brute-force oracles
(reference mining/{kcl_dfs,motif_dfs,sgl})."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.mining.kcl import kcl_solver, kcl_verifier
from gardenia_tpu.mining.motif import motif_solver, motif_census_bruteforce
from gardenia_tpu.mining.sgl import sgl_solver, sgl_verifier


@pytest.mark.parametrize("k", [3, 4, 5])
def test_kcl_chesapeake(k):
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    assert kcl_solver(g, k) == kcl_verifier(g, k)


@pytest.mark.parametrize("k", [3, 4])
def test_kcl_random(k):
    g = random_graph(m=70, avg_deg=8, seed=1, symmetric=True)
    assert kcl_solver(g, k) == kcl_verifier(g, k)


def test_kcl_small_chunk():
    g = random_graph(m=50, avg_deg=8, seed=2, symmetric=True)
    assert kcl_solver(g, 4, chunk=64) == kcl_verifier(g, 4)


def test_motif3_random():
    g = random_graph(m=40, avg_deg=5, seed=3, symmetric=True)
    got = motif_solver(g, 3)
    expect = motif_census_bruteforce(g, 3)
    assert got == expect


@pytest.mark.parametrize("seed", [0, 4])
def test_motif4_random(seed):
    g = random_graph(m=28, avg_deg=6, seed=seed, symmetric=True)
    got = motif_solver(g, 4)
    expect = motif_census_bruteforce(g, 4)
    assert got == expect


@pytest.mark.parametrize("pattern",
                         ["diamond", "rectangle", "pentagon", "house"])
def test_sgl_random(pattern):
    g = random_graph(m=26, avg_deg=5, seed=5, symmetric=True)
    assert sgl_solver(g, pattern) == sgl_verifier(g, pattern)


@pytest.mark.parametrize("k,minsup", [(1, 2), (2, 3), (3, 2), (3, 4)])
def test_fsm_random(k, minsup):
    from gardenia_tpu.mining.fsm import fsm_solver, fsm_verifier
    g = random_graph(m=30, avg_deg=4, seed=7, symmetric=True)
    labels = np.random.default_rng(7).integers(0, 3, g.m)
    assert fsm_solver(g, k, minsup, labels) == \
        fsm_verifier(g, k, minsup, labels)


@pytest.mark.parametrize("seed,nlabels,minsup",
                         [(1, 2, 2), (2, 3, 3), (3, 4, 5), (4, 1, 2),
                          (5, 3, 8)])
def test_fsm_aggregate_vs_gspan_and_bruteforce(seed, nlabels, minsup):
    """The embedding-free aggregate engine (mining/fsm_agg.py) equals
    both the gSpan engine and the brute-force MNI oracle for k in
    {1, 2} across label alphabets and support thresholds."""
    from gardenia_tpu.mining.fsm import fsm_verifier
    from gardenia_tpu.mining.fsm_agg import fsm_k2_aggregate
    from gardenia_tpu.mining.gspan import fsm_gspan
    g = random_graph(m=40, avg_deg=5, seed=seed, symmetric=True)
    labels = np.random.default_rng(seed).integers(0, nlabels, g.m)
    for k in (1, 2):
        agg = fsm_k2_aggregate(g, k, minsup, labels)
        assert agg == fsm_gspan(g, k, minsup, labels)
        assert agg == fsm_verifier(g, k, minsup, labels)


def test_fsm_aggregate_default_labels():
    """Degree-bucket default labels give the same answer through both
    engines (the bench/CLI configuration)."""
    from gardenia_tpu.mining.fsm_agg import fsm_k2_aggregate
    from gardenia_tpu.mining.gspan import fsm_gspan
    g = random_graph(m=60, avg_deg=6, seed=23, symmetric=True)
    for minsup in (2, 10, 40):
        assert fsm_k2_aggregate(g, 2, minsup) == \
            fsm_gspan(g, 2, minsup)


def test_fsm_aggregate_rmat_skew():
    """Graph500-skewed R-MAT (hubs -> low-label degree buckets, big
    wedge counts) through both engines — the shape class the aggregate
    path exists for (fsm at RMAT-20 in the bench)."""
    from gardenia_tpu.core.generate import generate_graph
    from gardenia_tpu.mining.fsm_agg import fsm_k2_aggregate
    from gardenia_tpu.mining.gspan import fsm_gspan
    g = generate_graph("rmat", scale=9, degree=8, symmetrize=True,
                       need_reverse=False)
    for minsup in (2, 30, 200):
        assert fsm_k2_aggregate(g, 2, minsup) == \
            fsm_gspan(g, 2, minsup)


@pytest.mark.parametrize("k,minsup", [(4, 2), (4, 3), (5, 3)])
def test_fsm_k4plus(k, minsup):
    """gSpan pattern growth beyond 3 edges (round-1 gap: the old
    enumerator was capped at k<=3)."""
    from gardenia_tpu.mining.fsm import fsm_solver, fsm_verifier
    g = random_graph(m=16, avg_deg=3, seed=11, symmetric=True)
    labels = np.random.default_rng(3).integers(0, 2, g.m)
    assert fsm_solver(g, k, minsup, labels) == \
        fsm_verifier(g, k, minsup, labels)


def test_dfscode_canonical_invariance():
    """Canonical DFS codes are relabeling-invariant and separate
    non-isomorphic patterns."""
    import itertools
    from gardenia_tpu.mining.dfscode import (automorphisms, canonical,
                                             make_pattern)
    tri = make_pattern(3, ((0, 1), (1, 2), (0, 2)), (1, 1, 1))
    assert len(automorphisms(tri)) == 6
    # all relabelings of a labeled path share one code
    codes = set()
    for p in itertools.permutations(range(3)):
        edges = [(p[0], p[1]), (p[1], p[2])]
        labs = [0] * 3
        labs[p[0]], labs[p[1]], labs[p[2]] = 2, 1, 2
        codes.add(canonical(make_pattern(3, edges, labs))[0])
    assert len(codes) == 1
    star = make_pattern(4, ((0, 1), (0, 2), (0, 3)), (1, 2, 2, 2))
    path4 = make_pattern(4, ((0, 1), (1, 2), (2, 3)), (2, 1, 2, 2))
    assert canonical(star)[0] != canonical(path4)[0]


def test_sgl_diamond_formula_vs_enum():
    g = random_graph(m=60, avg_deg=6, seed=6, symmetric=True)
    assert sgl_solver(g, "diamond", use_formula=True) == \
        sgl_solver(g, "diamond", use_formula=False)


def test_kcl_multi_slice(monkeypatch):
    """LEGACY host-slice path: embedding frontiers whose wedge space
    exceeds the per-slice budget are processed in embedding-range
    slices (int32-safe).  The device path is disabled so the fallback
    machinery stays covered."""
    import gardenia_tpu.mining.kcl as kclmod
    g = random_graph(m=60, avg_deg=12, seed=7, symmetric=True)
    expect = kclmod.kcl_verifier(g, 4)
    monkeypatch.setattr(kclmod, "EMB_WEDGE_LIMIT", 512)
    monkeypatch.setattr(kclmod, "_kcl_device",
                        lambda *a, **kw: None)
    assert kclmod.kcl_solver(g, 4, chunk=256) == expect


def test_kcl_device_multi_call(monkeypatch):
    """Device-resident expansion with several windows per program and
    several programs per level stays exact (k=4 and k=5)."""
    import gardenia_tpu.mining.kcl as kclmod
    g = random_graph(m=60, avg_deg=12, seed=7, symmetric=True)
    monkeypatch.setattr(kclmod, "EXPAND_WINS", 2)
    monkeypatch.setattr(kclmod, "LAST_WIN", 128)
    for k in (4, 5):
        expect = kclmod.kcl_verifier(g, k)
        assert kclmod.kcl_solver(g, k, chunk=128) == expect


def test_kcl_class_sort_chunked(monkeypatch):
    """The final-level class sort sweeps its per-member class keys in
    column chunks (one whole-buffer rowsel gather materialized a 32 GB
    (2^26, 128) row table at a RMAT-20 kcl4 slice — r5 sweep).  Shrink
    the chunk so CPU-sized buffers take the multi-chunk path, including
    a non-divisible last window."""
    import gardenia_tpu.mining.kcl as kclmod
    g = random_graph(m=60, avg_deg=12, seed=7, symmetric=True)
    monkeypatch.setattr(kclmod, "SORT_CHUNK", 384)
    monkeypatch.setattr(kclmod, "LAST_WIN", 128)
    for k in (4, 5):
        expect = kclmod.kcl_verifier(g, k)
        assert kclmod.kcl_solver(g, k, chunk=128) == expect


def test_kcl_mask_engine_matches_legacy(monkeypatch):
    """k=4 candidate-mask engine (packed per-edge masks, parent-indexed
    final level) must agree with the legacy per-wedge-probe path and
    the brute-force oracle — including on a hub graph whose adjacency
    spans multiple 128-wide chunks (packed words beyond word 3)."""
    import gardenia_tpu.mining.kcl as kclmod
    for g in (random_graph(m=60, avg_deg=12, seed=7, symmetric=True),
              random_graph(m=150, avg_deg=80, seed=3, symmetric=True)):
        expect = kclmod.kcl_verifier(g, 4)
        assert kclmod.kcl_solver(g, 4) == expect
        g2 = random_graph(m=g.m, avg_deg=12 if g.m == 60 else 80,
                          seed=7 if g.m == 60 else 3, symmetric=True)
        monkeypatch.setattr(kclmod, "USE_EDGE_MASKS", False)
        assert kclmod.kcl_solver(g2, 4) == expect
        monkeypatch.setattr(kclmod, "USE_EDGE_MASKS", True)


def test_kcl_device_guard_falls_back(monkeypatch):
    """When a level's wedge space nears int32 the device path declines
    (guard goes negative here via a huge chunk) and the host-slice path
    takes over, exactly."""
    import gardenia_tpu.mining.kcl as kclmod
    g = random_graph(m=60, avg_deg=12, seed=8, symmetric=True)
    expect = kclmod.kcl_verifier(g, 4)
    monkeypatch.setattr(kclmod, "EXPAND_WINS", 1 << 16)
    assert kclmod.kcl_solver(g, 4, chunk=1 << 15) == expect


def test_pattern_multi_slice(monkeypatch):
    import gardenia_tpu.mining.kcl as kclmod
    from gardenia_tpu.mining.sgl import sgl_verifier
    from gardenia_tpu.mining.pattern import DIAMOND, count_pattern
    g = random_graph(m=40, avg_deg=8, seed=3, symmetric=True)
    expect = sgl_verifier(g, "diamond")
    monkeypatch.setattr(kclmod, "EMB_WEDGE_LIMIT", 512)
    assert count_pattern(g, DIAMOND, chunk=256) == expect


def test_motif_edge_tri_multi_slice(monkeypatch):
    import gardenia_tpu.mining.kcl as kclmod
    from gardenia_tpu.mining.motif import edge_triangle_counts
    g = random_graph(m=50, avg_deg=10, seed=5, symmetric=True)
    expect = edge_triangle_counts(g)
    monkeypatch.setattr(kclmod, "EMB_WEDGE_LIMIT", 256)
    got = edge_triangle_counts(g, chunk=128)
    np.testing.assert_array_equal(got, expect)


def test_codegree_quads_multipass():
    """Hash-partitioned multi-pass C4 codegree counting is exact for any
    pass budget (removes the round-1 2e8 wedge cap)."""
    from gardenia_tpu.mining.motif import codegree_cycle_quads
    g = random_graph(m=40, avg_deg=8, seed=9, symmetric=True)
    ref = codegree_cycle_quads(g)
    assert codegree_cycle_quads(g, pass_budget=64) == ref
    assert codegree_cycle_quads(g, pass_budget=7) == ref


def test_wedgestream_vs_host_oracles():
    """Device wedge-stream sort-groupby (mining/wedgestream.py) matches
    the host membership sweep (tri per edge) and the host multi-pass
    codegree sort (C4 quads) on a non-trivial graph."""
    from gardenia_tpu.mining.motif import (codegree_cycle_quads,
                                           edge_triangle_counts)
    from gardenia_tpu.mining.wedgestream import wedge_stream_stats
    g = random_graph(m=300, avg_deg=12, seed=11, symmetric=True)
    c_non, tri_u, _, _ = wedge_stream_stats(g)
    assert c_non == codegree_cycle_quads(g)
    tri_e = edge_triangle_counts(g)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    dst = np.asarray(g.colidx)
    sel = src < dst
    np.testing.assert_array_equal(tri_u, tri_e[sel])


def test_wedgestream_multi_partition():
    """a-keyed partitioning is exact for any slot budget (runs never
    cross partitions)."""
    from gardenia_tpu.mining.wedgestream import wedge_stream_stats
    g = random_graph(m=120, avg_deg=10, seed=13, symmetric=True)
    ref = wedge_stream_stats(g)
    for budget in (1 << 14, 1 << 12):
        got = wedge_stream_stats(g, budget_slots=budget)
        assert got[0] == ref[0]
        np.testing.assert_array_equal(got[1], ref[1])


def test_wedgestream_triangle_free_and_empty():
    from gardenia_tpu.mining.wedgestream import wedge_stream_stats
    # star graph: no triangles, codegree of every leaf pair is 1
    import gardenia_tpu.core.build as build
    from gardenia_tpu.core.graph import Graph
    n = 12
    src = np.concatenate([np.zeros(n - 1, np.int64),
                          np.arange(1, n, dtype=np.int64)])
    dst = np.concatenate([np.arange(1, n, dtype=np.int64),
                          np.zeros(n - 1, np.int64)])
    rp, ci, _ = build.coo_to_csr(n, src, dst, None, sorted_by_src=False)
    g = Graph(rp, ci, None, num_cols=n, symmetric=True)
    c_non, tri_u, _, _ = wedge_stream_stats(g)
    assert c_non == 0          # all codegrees 1 -> no C(1,2) pairs
    assert tri_u.sum() == 0


def test_wedgestream_big_codegree_no_overflow():
    """A codegree >= 2^18 made the old int32 BLOCK partial sums overflow
    (advisor r4): two hubs sharing 262,400 leaves.  The 14-bit hi/lo
    split must return the exact C(codeg, 2) in int64."""
    import gardenia_tpu.core.build as build
    from gardenia_tpu.core.graph import Graph
    from gardenia_tpu.mining.wedgestream import wedge_stream_stats
    codeg = (1 << 18) + 256
    leaves = np.arange(2, 2 + codeg, dtype=np.int64)
    src = np.concatenate([np.zeros(codeg, np.int64),
                          np.ones(codeg, np.int64)])
    dst = np.concatenate([leaves, leaves])
    src, dst = (np.concatenate([src, dst]), np.concatenate([dst, src]))
    rp, ci, _ = build.coo_to_csr(2 + codeg, src, dst, None,
                                 sorted_by_src=False)
    g = Graph(rp, ci, None, num_cols=2 + codeg, symmetric=True)
    c_non, tri_u, _, _ = wedge_stream_stats(g)
    assert c_non == codeg * (codeg - 1) // 2   # 34,426,650,880 > 2^31
    assert tri_u.sum() == 0                    # no hub-hub edge


def test_kcl_device_edge_slicing():
    """Summed edge-slices of the device path equal the whole-graph
    count (expansion trees are independent per level-2 seed) — the
    int32-guard slicing used at RMAT-20's 2.47 G-wedge level 2."""
    from gardenia_tpu.mining.kcl import (_kcl_device, _make_chunk_member,
                                         kcl_solver)
    import numpy as np
    g = random_graph(m=120, avg_deg=14, seed=7, symmetric=True)
    ref = kcl_solver(g, 4)
    dag = g.oriented()
    deg = np.diff(dag.rowptr)
    member_fn, mem_ctx = _make_chunk_member(dag)
    rowptr, colidx = dag.device_csr()
    ctx = (rowptr, colidx, mem_ctx)
    nnz = dag.nnz
    total = 0
    for lo in range(0, nnz, 97):
        got = _kcl_device(dag, 4, 1 << 10, member_fn, mem_ctx, ctx,
                          deg, lo, min(lo + 97, nnz))
        assert got is not None
        total += got
    assert total == ref
