"""SCC + MST vs serial oracles (reference src/scc/verifier.cc Tarjan,
src/mst/main.cu Boruvka total weight)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.solvers.mst import mst_solver
from gardenia_tpu.solvers.scc import scc_solver
from gardenia_tpu.verify import oracles


def partitions_equal(a, b):
    a, b = np.asarray(a), np.asarray(b)
    _, ia = np.unique(a, return_inverse=True)
    _, ib = np.unique(b, return_inverse=True)
    return len(np.unique(ia * (ib.max() + 1) + ib)) == len(np.unique(ib)) \
        and len(np.unique(ia)) == len(np.unique(ib))


@pytest.mark.parametrize("seed,deg", [(0, 2), (1, 3), (4, 1)])
def test_scc_random_directed(seed, deg):
    g = random_graph(m=120, avg_deg=deg, seed=seed)
    res = scc_solver(g)
    assert partitions_equal(res.scc_root, oracles.scc_serial(g))


def test_scc_fixture():
    g = load_graph(f"{DATASETS}/test_scc.mtx", "mtx")
    res = scc_solver(g)
    assert partitions_equal(res.scc_root, oracles.scc_serial(g))


def test_scc_roots_are_members():
    g = random_graph(m=80, avg_deg=2, seed=2)
    res = scc_solver(g)
    root = np.asarray(res.scc_root)
    # every root label is a vertex inside its own component
    for v in range(g.m):
        assert root[root[v]] == root[v]


@pytest.mark.parametrize("seed", [0, 3])
def test_mst_weighted(seed):
    g = random_graph(m=100, avg_deg=4, seed=seed, weighted=True,
                     symmetric=True)
    res = mst_solver(g)
    assert float(res.total_weight) == \
        pytest.approx(oracles.mst_total_weight(g))


def test_mst_fixture():
    g = load_graph(f"{DATASETS}/test_mst.mtx", "mtx", symmetrize=True)
    res = mst_solver(g)
    assert float(res.total_weight) == \
        pytest.approx(oracles.mst_total_weight(g))


def test_mst_unweighted_forest():
    g = random_graph(m=90, avg_deg=2, seed=5, symmetric=True)
    res = mst_solver(g)
    # unit weights: MSF weight == m - #components
    comp = oracles.cc_serial(g)
    expect = g.m - len(np.unique(comp))
    assert float(res.total_weight) == pytest.approx(expect)


def test_scc_trim2_chain():
    """Chains of mutual 2-cycles are settled by trim-2 without FB
    rounds per pair (reference FB-Trim)."""
    from gardenia_tpu.core.graph import from_edges
    from gardenia_tpu.core.io import EdgeListData
    src, dst = [], []
    for i in range(0, 20, 2):
        src += [i, i + 1]
        dst += [i + 1, i]
        if i + 2 < 20:
            src.append(i + 1)
            dst.append(i + 2)
    g = from_edges(EdgeListData(20, 20, np.array(src, np.int32),
                                np.array(dst, np.int32)))
    res = scc_solver(g)
    assert partitions_equal(res.scc_root, oracles.scc_serial(g))
    assert len(np.unique(np.asarray(res.scc_root))) == 10


@pytest.mark.parametrize("variant", ["color", "wcc"])
def test_scc_variants_random(variant):
    g = random_graph(m=120, avg_deg=3, seed=11)
    res = scc_solver(g, variant=variant)
    assert partitions_equal(res.scc_root, oracles.scc_serial(g))


@pytest.mark.parametrize("variant", ["color", "wcc"])
def test_scc_adversarial_cycle(variant):
    """Single directed cycle: one big SCC (diameter-bound closures)."""
    import numpy as np
    from gardenia_tpu.core.graph import Graph
    n = 400
    g = Graph(np.arange(n + 1), ((np.arange(n) + 1) % n).astype(np.int32))
    res = scc_solver(g, variant=variant)
    assert len(np.unique(np.asarray(res.scc_root))) == 1


@pytest.mark.parametrize("variant", ["color", "wcc"])
def test_scc_adversarial_chain_of_2cycles(variant):
    """Chain of 2-cycles linked by forward edges (reference wcc.cu /
    two_phase.cu stress shape)."""
    import numpy as np
    from gardenia_tpu.core.graph import Graph
    n = 60
    src, dst = [], []
    for i in range(n):
        a, b = 2 * i, 2 * i + 1
        src += [a, b]
        dst += [b, a]
        if i < n - 1:
            src += [b]
            dst += [2 * i + 2]
    order = np.lexsort((dst, src))
    src = np.asarray(src)[order]
    dst = np.asarray(dst)[order]
    rp = np.zeros(2 * n + 1, np.int64)
    np.add.at(rp, src + 1, 1)
    g = Graph(np.cumsum(rp), dst.astype(np.int32))
    res = scc_solver(g, variant=variant)
    assert partitions_equal(res.scc_root, oracles.scc_serial(g))
