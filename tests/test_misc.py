"""NLF index, random walks, clustering (reference stubs made real)."""

import numpy as np
import pytest

from tests.conftest import random_graph

from gardenia_tpu.mining.labels import (label_frequency, nlf_index,
                                        nlf_filter)
from gardenia_tpu.solvers.clustering import cluster_threshold
from gardenia_tpu.solvers.sampling import random_walks
from gardenia_tpu.verify import oracles


def test_nlf_index_matches_manual():
    g = random_graph(m=60, avg_deg=5, seed=1, symmetric=True)
    L = 4
    labels = np.random.default_rng(0).integers(0, L, g.m)
    nlf = np.asarray(nlf_index(g, labels, L))
    for v in (0, 7, 33):
        nbrs = g.colidx[g.rowptr[v]:g.rowptr[v + 1]]
        expect = np.bincount(labels[nbrs], minlength=L)
        np.testing.assert_array_equal(nlf[v], expect)
    assert label_frequency(labels, L).sum() == g.m
    # filter keeps vertices dominating the query row
    q = nlf[5]
    keep = np.asarray(nlf_filter(nlf_index(g, labels, L), q))
    assert keep[5]


def test_random_walks_follow_edges():
    g = random_graph(m=80, avg_deg=4, seed=2, symmetric=True)
    walks = np.asarray(random_walks(g, np.arange(16), length=10, seed=3))
    assert walks.shape == (16, 11)
    adj = [set(g.colidx[g.rowptr[v]:g.rowptr[v + 1]].tolist())
           for v in range(g.m)]
    for w in range(16):
        for t in range(10):
            a, b = walks[w, t], walks[w, t + 1]
            assert (b in adj[a]) or (a == b and len(adj[a]) == 0)


def test_cluster_threshold_unweighted_equals_cc():
    g = random_graph(m=90, avg_deg=2, seed=5, symmetric=True)
    res = cluster_threshold(g)
    comp = oracles.cc_serial(g)
    assert res.num_clusters == len(np.unique(comp))


def test_cluster_threshold_weighted_levels():
    g = random_graph(m=70, avg_deg=3, seed=7, weighted=True,
                     symmetric=True)
    low = cluster_threshold(g, threshold=0.0)
    high = cluster_threshold(g, threshold=8.0)
    # raising the threshold can only split clusters
    assert high.num_clusters >= low.num_clusters


def test_cli_flags_positional_anywhere(capsys):
    """--flags may trail the positional args (the reference binaries
    are purely positional; a trailing --device once crashed the
    symmetrize parse and silently skipped the solve)."""
    from tests.conftest import DATASETS
    from gardenia_tpu.cli import main
    rc = main(["cc", "mtx", f"{DATASETS}/chesapeake.mtx", "1",
               "--device=cpu"])
    out = capsys.readouterr().out
    assert rc == 0 and "Correct" in out
    rc = main(["cc", "--device=cpu", "mtx",
               f"{DATASETS}/chesapeake.mtx", "1"])
    out = capsys.readouterr().out
    assert rc == 0 and "Correct" in out
    assert main(["cc", "--bogus-flag", "mtx", "x"]) == 1


def test_bench_warm_hybrid_contract_and_consistency(tmp_path,
                                                    monkeypatch):
    """warm_hybrid only serves symmetric unweighted graphs, and the
    seeded caches reproduce the cold-path PR scores exactly."""
    import numpy as np
    import bench
    from tests.conftest import random_graph
    from gardenia_tpu.solvers.pr import pr_solver
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path))
    g = random_graph(m=300, avg_deg=6, seed=2, symmetric=True)
    bench.warm_hybrid(g, scale=0)
    warm = pr_solver(g, layout="hybrid")
    g2 = random_graph(m=300, avg_deg=6, seed=2, symmetric=True)
    cold = pr_solver(g2, layout="hybrid")
    np.testing.assert_array_equal(np.asarray(warm.scores),
                                  np.asarray(cold.scores))
    # second call loads the pickle it just wrote
    g3 = random_graph(m=300, avg_deg=6, seed=2, symmetric=True)
    bench.warm_hybrid(g3, scale=0)
    reloaded = pr_solver(g3, layout="hybrid")
    np.testing.assert_array_equal(np.asarray(reloaded.scores),
                                  np.asarray(cold.scores))
    directed = random_graph(m=60, avg_deg=3, seed=4)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        bench.warm_hybrid(directed, scale=1)
