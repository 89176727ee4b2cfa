"""Batched multi-source traversal (BC, MS-BFS) vs per-source oracles."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.solvers.bc import bc_batched, bc_solver
from gardenia_tpu.solvers.bfs import bfs_multi_source
from gardenia_tpu.verify import oracles


def bc_multi_oracle(g, sources):
    """Sum of per-source Brandes deltas, normalized by max (the
    reference's num_iters accumulation, src/bc/omp_base.cc:69-95)."""
    m = g.m
    total = np.zeros(m, np.float64)
    for s in sources:
        total += _raw_delta(g, int(s))
    mx = total.max()
    return (total / mx if mx > 0 else total).astype(np.float32)


def _raw_delta(g, source):
    m = g.m
    depth = np.full(m, -1, np.int64)
    sigma = np.zeros(m, np.float64)
    depth[source] = 0
    sigma[source] = 1
    levels = [[source]]
    rp, ci = g.rowptr, g.colidx
    while levels[-1]:
        nxt = []
        for u in levels[-1]:
            for v in ci[rp[u]:rp[u + 1]]:
                if depth[v] < 0:
                    depth[v] = depth[u] + 1
                    nxt.append(v)
                if depth[v] == depth[u] + 1:
                    sigma[v] += sigma[u]
        levels.append(nxt)
    delta = np.zeros(m, np.float64)
    for lvl in reversed(levels):
        for u in lvl:
            for v in ci[rp[u]:rp[u + 1]]:
                if depth[v] == depth[u] + 1:
                    delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
    return delta


@pytest.mark.parametrize("S", [4, 16])
def test_bc_batched_matches_oracle(S):
    g = random_graph(m=90, avg_deg=5, seed=3, symmetric=True)
    sources = np.arange(S)
    res = bc_batched(g, sources)
    expect = bc_multi_oracle(g, sources)
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-3)


def test_bc_solver_batched_path():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = bc_solver(g, 0, num_sources=8)
    expect = bc_multi_oracle(g, np.arange(8))
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("S", [3, 9])
def test_msbfs_matches_per_source(S):
    g = random_graph(m=130, avg_deg=4, seed=6, symmetric=True)
    sources = (np.arange(S) * 7) % g.m
    res = bfs_multi_source(g, sources)
    dist = np.asarray(res.dist)
    for j, s in enumerate(sources):
        np.testing.assert_array_equal(dist[:, j],
                                      oracles.bfs_serial(g, int(s)))


@pytest.mark.parametrize("S", [4, 16])
def test_bc_batched_hybrid_layout(S):
    """The TPU production path (batched hybrid blocks + COO remainder),
    forced on CPU, matches the per-source oracle."""
    g = random_graph(m=90, avg_deg=5, seed=3, symmetric=True)
    sources = np.arange(S)
    res = bc_batched(g, sources, layout="hybrid")
    expect = bc_multi_oracle(g, sources)
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("S", [3, 9])
def test_msbfs_hybrid_layout(S):
    g = random_graph(m=130, avg_deg=4, seed=6, symmetric=True)
    sources = (np.arange(S) * 7) % g.m
    res = bfs_multi_source(g, sources, layout="hybrid")
    dist = np.asarray(res.dist)
    for j, s in enumerate(sources):
        np.testing.assert_array_equal(dist[:, j],
                                      oracles.bfs_serial(g, int(s)))


def test_msbfs_directed():
    g = random_graph(m=80, avg_deg=2, seed=8)
    sources = np.array([0, 5, 11])
    res = bfs_multi_source(g, sources)
    dist = np.asarray(res.dist)
    for j, s in enumerate(sources):
        np.testing.assert_array_equal(dist[:, j],
                                      oracles.bfs_serial(g, int(s)))
