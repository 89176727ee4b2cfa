"""BFS + SSSP vs serial oracles (reference src/{bfs,sssp}/verifier.cc:
exact depth/distance equality)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.core import types as T
from gardenia_tpu.solvers.bfs import bfs_solver
from gardenia_tpu.solvers.sssp import sssp_solver
from gardenia_tpu.verify import oracles


@pytest.mark.parametrize("variant", ["pull", "do"])
def test_bfs_chesapeake(variant):
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = bfs_solver(g, 0, variant=variant)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.bfs_serial(g, 0))


@pytest.mark.parametrize("variant", ["pull", "do"])
@pytest.mark.parametrize("seed", [0, 1])
def test_bfs_random(variant, seed):
    g = random_graph(m=180, avg_deg=3, seed=seed, symmetric=True)
    res = bfs_solver(g, 5, variant=variant)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.bfs_serial(g, 5))


def test_bfs_directed_with_unreachable():
    g = random_graph(m=120, avg_deg=2, seed=7)  # directed, sparse
    res = bfs_solver(g, 3, variant="pull")
    expect = oracles.bfs_serial(g, 3)
    assert (expect == T.MYINFINITY).any()  # fixture has unreachable nodes
    np.testing.assert_array_equal(np.asarray(res.dist), expect)


@pytest.mark.parametrize("variant", ["bf", "delta"])
def test_sssp_unit_weights(variant):
    g = random_graph(m=150, avg_deg=4, seed=2, symmetric=True)
    res = sssp_solver(g, 0, variant=variant)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 0))


@pytest.mark.parametrize("variant", ["bf", "delta", "hybrid"])
@pytest.mark.parametrize("delta", [1, 4, 64])
def test_sssp_weighted(variant, delta):
    g = random_graph(m=130, avg_deg=5, seed=3, weighted=True,
                     symmetric=True)
    res = sssp_solver(g, 2, delta, variant=variant)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 2))


def test_sssp_hybrid_grid():
    """High-diameter road-like fixture (grid ~ road_usa stand-in)."""
    from gardenia_tpu.core.generate import grid_edges
    from gardenia_tpu.core.graph import from_edges
    g = from_edges(grid_edges(24), symmetrize=True)
    res = sssp_solver(g, 0, 32, variant="hybrid")
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 0))


def test_sssp_directed_unreachable():
    g = random_graph(m=90, avg_deg=2, seed=9, weighted=True)
    res = sssp_solver(g, 0)
    expect = oracles.sssp_serial(g, 0)
    assert (expect == T.MYINFINITY).any()
    np.testing.assert_array_equal(np.asarray(res.dist), expect)


# --- near-far delta-stepping (persistent compact frontiers) ----------------

@pytest.mark.parametrize("delta", [1, 8, 64])
def test_sssp_nearfar_weighted(delta):
    g = random_graph(m=130, avg_deg=5, seed=3, weighted=True,
                     symmetric=True)
    res = sssp_solver(g, 2, delta, variant="nearfar")
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 2))


def test_sssp_nearfar_grid():
    from gardenia_tpu.core.generate import grid_edges
    from gardenia_tpu.core.graph import from_edges
    g = from_edges(grid_edges(24), symmetrize=True, need_reverse=True)
    res = sssp_solver(g, 0, 64, variant="nearfar")
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 0))


def test_sssp_nearfar_directed_unreachable():
    g = random_graph(m=90, avg_deg=2, seed=9, weighted=True)
    res = sssp_solver(g, 0, 16, variant="nearfar")
    expect = oracles.sssp_serial(g, 0)
    assert (expect == T.MYINFINITY).any()
    np.testing.assert_array_equal(np.asarray(res.dist), expect)


def test_sssp_nearfar_overflow_paths():
    """Tiny queue capacity forces the dense-rebuild overflow branch;
    tiny segment_rounds forces multi-segment host loops."""
    from gardenia_tpu.solvers.sssp_nf import sssp_nearfar
    g = random_graph(m=200, avg_deg=6, seed=5, weighted=True,
                     symmetric=True)
    res = sssp_nearfar(g, 0, 4, q_cap=2, segment_rounds=3)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 0))


def test_sssp_segmented_matches_unsegmented():
    """The host-segmented fused loop must be bit-identical to a
    single-program run, including the round counter."""
    g = random_graph(m=150, avg_deg=4, seed=2, symmetric=True)
    a = sssp_solver(g, 0, 8, variant="delta", segment_rounds=2)
    b = sssp_solver(g, 0, 8, variant="delta", segment_rounds=100000)
    np.testing.assert_array_equal(np.asarray(a.dist), np.asarray(b.dist))
    assert int(a.iterations) == int(b.iterations)
