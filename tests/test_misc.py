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
