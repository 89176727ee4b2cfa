"""Multi-chip solvers on the 8-device virtual CPU mesh vs single-chip
results (SURVEY.md §7.6; BASELINE.json multichip configs)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

import jax

from gardenia_tpu import load_graph
from gardenia_tpu.parallel import (bc_batched_dist, bfs_solver_dist,
                                   cc_solver_dist, make_mesh,
                                   pr_solver_dist, sgd_train_dist,
                                   spmv_solver_dist, sssp_solver_dist,
                                   tc_solver_dist)
from gardenia_tpu.verify import oracles

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize("balance", ["vertices", "edges"])
def test_pr_dist_matches_single(mesh, balance):
    from gardenia_tpu.solvers.pr import pr_solver
    g = random_graph(m=257, avg_deg=6, seed=1)
    d = pr_solver_dist(g, mesh=mesh, balance=balance)
    s = pr_solver(g)
    assert int(d.iterations) == int(s.iterations)
    np.testing.assert_allclose(np.asarray(d.scores),
                               np.asarray(s.scores), atol=1e-6)


@pytest.mark.parametrize("balance", ["vertices", "edges"])
def test_bfs_dist_matches_oracle(mesh, balance):
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = bfs_solver_dist(g, 0, mesh=mesh, balance=balance)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.bfs_serial(g, 0))


def test_bfs_dist_directed_unreachable(mesh):
    g = random_graph(m=150, avg_deg=2, seed=4)
    res = bfs_solver_dist(g, 3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.bfs_serial(g, 3))


def test_tc_dist_matches_single(mesh):
    from gardenia_tpu.solvers.tc import tc_solver
    g = random_graph(m=120, avg_deg=8, seed=2, symmetric=True)
    assert tc_solver_dist(g, mesh=mesh, chunk=256) == tc_solver(g)


def test_sgd_dist_trains(mesh):
    g = random_graph(m=60, avg_deg=5, seed=3, weighted=True)
    res = sgd_train_dist(g, mesh=mesh, iters=4)
    final = oracles.sgd_rmse(g.rowptr, g.colidx,
                             np.asarray(g.weights, np.float32),
                             np.asarray(res.user_lv),
                             np.asarray(res.item_lv))
    # training reduced RMSE vs the un-trained factors
    from gardenia_tpu.solvers.sgd import init_latent
    base = oracles.sgd_rmse(g.rowptr, g.colidx,
                            np.asarray(g.weights, np.float32),
                            init_latent(g.m, 0),
                            init_latent(max(g.n,
                                            int(g.colidx.max()) + 1), 1))
    assert final < base


def test_vc_dist_proper(mesh):
    from gardenia_tpu.parallel import vc_solver_dist
    g = random_graph(m=120, avg_deg=6, seed=4, symmetric=True)
    res = vc_solver_dist(g, mesh=mesh)
    assert oracles.vc_check(g, np.asarray(res.colors))
    # comparable palette to the single-chip solver (exact equality no
    # longer holds: single-chip ends with a sequential core pass, the
    # dist solver runs the pure speculative cascade — both proper)
    from gardenia_tpu.solvers.vc import vc_solver
    single = vc_solver(g)
    assert int(res.num_colors) <= g.max_degree + 1
    assert int(single.num_colors) <= g.max_degree + 1


def test_scc_dist_matches_oracle(mesh):
    from gardenia_tpu.parallel import scc_solver_dist
    g = random_graph(m=100, avg_deg=2, seed=6)
    res = scc_solver_dist(g, mesh=mesh)
    root = np.asarray(res.scc_root)
    expect = oracles.scc_serial(g)
    _, ia = np.unique(root, return_inverse=True)
    _, ib = np.unique(expect, return_inverse=True)
    assert len(np.unique(ia * (ib.max() + 1) + ib)) == len(np.unique(ib))
    assert len(np.unique(ia)) == len(np.unique(ib))


def test_sgd_dist_matches_single_chip(mesh):
    """Distributed dp gradients == single-chip full-batch gradients."""
    from gardenia_tpu.solvers.sgd import sgd_solver
    g = random_graph(m=40, avg_deg=4, seed=5, weighted=True)
    d = sgd_train_dist(g, mesh=mesh, iters=2)
    s = sgd_solver(g, max_iters=2, epsilon=0.0)
    np.testing.assert_allclose(np.asarray(d.user_lv),
                               np.asarray(s.user_lv), rtol=2e-5,
                               atol=1e-7)


# --- 2D edge partition (BASELINE config 5: TC/VC/SCC 2D multichip) ---------

@pytest.fixture(scope="module")
def mesh2d():
    from gardenia_tpu.parallel.two_d import make_mesh2d
    return make_mesh2d(8)


def test_mesh2d_shape(mesh2d):
    assert mesh2d.devices.shape == (2, 4)
    assert mesh2d.axis_names == ("r", "c")


def test_tc_dist2d_matches_oracle(mesh2d):
    from gardenia_tpu.parallel.two_d import tc_solver_dist2d
    g = random_graph(m=150, avg_deg=9, seed=4, symmetric=True)
    expect = oracles.tc_serial(g.oriented())
    assert tc_solver_dist2d(g, mesh=mesh2d) == expect


def test_scc_dist2d_matches_single(mesh2d):
    from gardenia_tpu.parallel.two_d import scc_solver_dist2d
    from gardenia_tpu.solvers.scc import scc_solver
    g = random_graph(m=130, avg_deg=3, seed=6)   # directed
    d = np.asarray(scc_solver_dist2d(g, mesh=mesh2d).scc_root)
    s = np.asarray(scc_solver(g).scc_root)
    # same partition into components (labels may differ)
    _, ia = np.unique(d, return_inverse=True)
    _, ib = np.unique(s, return_inverse=True)
    assert len(np.unique(ia * (ib.max() + 1) + ib)) == \
        len(np.unique(ib)) == len(np.unique(ia))


def test_vc_dist2d_valid_coloring(mesh2d):
    from gardenia_tpu.parallel.two_d import vc_solver_dist2d
    g = random_graph(m=140, avg_deg=7, seed=2, symmetric=True)
    res = vc_solver_dist2d(g, mesh=mesh2d)
    assert oracles.vc_check(g, np.asarray(res.colors))


def test_msbfs_dp_matches_per_source(mesh):
    """Source-sharded data-parallel MS-BFS == serial per-source BFS."""
    from gardenia_tpu.parallel import bfs_multi_source_dist
    g = random_graph(m=150, avg_deg=5, seed=9, symmetric=True)
    sources = (np.arange(16) * 11) % g.m
    res = bfs_multi_source_dist(g, sources, mesh=mesh)
    dist = np.asarray(res.dist)
    assert dist.shape == (g.m, 16)
    for j, s in enumerate(sources):
        np.testing.assert_array_equal(dist[:, j],
                                      oracles.bfs_serial(g, int(s)))


def test_tc_dist2d_wedge_slices():
    """A tiny wedge budget forces multi-slice streaming through one
    compiled executable (the full wedge stream is never materialized)."""
    from gardenia_tpu.parallel.two_d import make_mesh2d, tc_solver_dist2d
    from gardenia_tpu.verify import oracles
    g = random_graph(m=120, avg_deg=8, seed=3, symmetric=True)
    mesh2d = make_mesh2d(4)
    expect = oracles.tc_serial(g.oriented())
    assert tc_solver_dist2d(g, mesh=mesh2d, chunk=256,
                            wedge_budget=128) == expect


@pytest.mark.parametrize("balance", ["vertices", "edges"])
def test_sssp_dist_matches_oracle(mesh, balance):
    g = random_graph(m=157, avg_deg=5, seed=11, weighted=True)
    res = sssp_solver_dist(g, 3, mesh=mesh, balance=balance)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 3))


def test_sssp_dist_unweighted_unreachable(mesh):
    g = random_graph(m=150, avg_deg=2, seed=4)   # directed, unit weights
    res = sssp_solver_dist(g, 7, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 7))


@pytest.mark.parametrize("balance", ["vertices", "edges"])
def test_cc_dist_matches_oracle(mesh, balance):
    g = random_graph(m=143, avg_deg=2, seed=7, symmetric=True)
    res = cc_solver_dist(g, mesh=mesh, balance=balance)
    comp = np.asarray(res.comp)
    expect = oracles.cc_serial(g)
    # same partition into components (labels may differ)
    _, ia = np.unique(comp, return_inverse=True)
    _, ib = np.unique(expect, return_inverse=True)
    assert len(np.unique(ia * (ib.max() + 1) + ib)) == \
        len(np.unique(ib)) == len(np.unique(ia))
    assert len(np.unique(ia)) > 1   # non-trivial: several components
    # labels are the min original vertex id of each component
    mins = np.full(comp.max() + 1, -1)
    for lbl in np.unique(comp):
        assert lbl == np.flatnonzero(comp == lbl).min()


@pytest.mark.parametrize("layout", ["coo", "hybrid"])
def test_bc_dist_matches_single(mesh, layout):
    """Both the segment-sum and the production hybrid-panel dist BC
    match the single-chip batched Brandes (round 5: dist BC pulls ride
    ops/bsr.spmv_hybrid_batched)."""
    from gardenia_tpu.solvers.bc import bc_batched
    g = random_graph(m=120, avg_deg=6, seed=2, symmetric=True)
    sources = (np.arange(16) * 7) % g.m
    d = bc_batched_dist(g, sources, mesh=mesh, layout=layout)
    s = bc_batched(g, sources)
    assert int(d.iterations) == int(s.iterations)
    np.testing.assert_allclose(np.asarray(d.scores),
                               np.asarray(s.scores), atol=1e-5)


def test_mst_dist_matches_single_and_oracle(mesh):
    """Round-5 edge-sharded Boruvka (pmin-merged min tables): the
    distributed total weight equals both the single-chip solver and
    the serial Kruskal oracle."""
    from gardenia_tpu.core.graph import Graph
    from gardenia_tpu.parallel import mst_solver_dist
    from gardenia_tpu.solvers.mst import mst_solver
    base = random_graph(m=160, avg_deg=6, seed=17, symmetric=True)
    src = np.repeat(np.arange(base.m), np.diff(base.rowptr))
    dst = np.asarray(base.colidx)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    w = ((lo * 2654435761 + hi * 40503) % 97 + 1).astype(np.float64)
    g = Graph(base.rowptr, base.colidx, w, num_cols=base.n,
              symmetric=True)
    d = mst_solver_dist(g, mesh=mesh)
    s = mst_solver(g)
    assert float(d.total_weight) == float(s.total_weight)
    assert float(d.total_weight) == oracles.mst_total_weight(g)


def test_symgs_dist_matches_single(mesh):
    """Round-5 distributed SymGS (color-masked sweeps over stacked
    hybrid panels) matches the single-chip smoother on the same
    synthetic system and coloring."""
    from gardenia_tpu.parallel import symgs_solver_dist
    from gardenia_tpu.solvers.symgs import symgs_solver
    from gardenia_tpu.solvers.vc import vc_solver
    g = random_graph(m=180, avg_deg=6, seed=21, symmetric=True)
    rng = np.random.default_rng(7)
    Ax = rng.random(g.nnz).astype(np.float32)
    x0 = rng.random(g.m).astype(np.float32)
    b = rng.random(g.m).astype(np.float32)
    diag = (g.degrees + 1).astype(np.float32)
    colors = np.asarray(vc_solver(g).colors)
    d = symgs_solver_dist(g, Ax, x0, b, diag, colors, mesh=mesh)
    s = symgs_solver(g, Ax, x0, b, diag, colors)
    assert d.num_colors == s.num_colors
    np.testing.assert_allclose(np.asarray(d.x), np.asarray(s.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layout", ["ell", "hybrid"])
def test_sssp_cc_spmv_dist_layouts(mesh, layout):
    """The round-5 stacked-hybrid dist paths and the retained ELL slab
    paths agree with the serial oracles on one weighted graph."""
    g = random_graph(m=170, avg_deg=7, seed=13, weighted=True)
    res = sssp_solver_dist(g, 2, mesh=mesh, layout=layout)
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 2))
    y = spmv_solver_dist(g, mesh=mesh, layout=layout)
    expect = oracles.spmv_serial(g, np.asarray(g.weights, np.float32),
                                 np.full(g.n, 0.3, np.float32))
    # 2e-5: the hybrid dense panels' split-bf16 operand is exact to
    # ~2^-16 relative (ops/bsr.py numerics contract); ell is f32-exact
    np.testing.assert_allclose(np.asarray(y), expect, rtol=2e-5,
                               atol=1e-6)
    gs = random_graph(m=170, avg_deg=3, seed=14, symmetric=True)
    comp = np.asarray(cc_solver_dist(gs, mesh=mesh, layout=layout).comp)
    expect_c = oracles.cc_serial(gs)
    np.testing.assert_array_equal(comp, expect_c)


@pytest.mark.parametrize("balance", ["vertices", "edges"])
def test_spmv_dist_matches_oracle(mesh, balance):
    g = random_graph(m=133, avg_deg=6, seed=5, weighted=True)
    y = spmv_solver_dist(g, mesh=mesh, balance=balance)
    expect = oracles.spmv_serial(g, np.asarray(g.weights, np.float32),
                                 np.full(g.n, 0.3, np.float32))
    # 2e-5: the production hybrid panels' split-bf16 operand is exact
    # to ~2^-16 relative (ops/bsr.py numerics contract)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=2e-5,
                               atol=1e-6)


def test_spmv_dist_synthetic_ax(mesh):
    """Unweighted graph rides the reference driver's synthetic 0.2."""
    g = random_graph(m=90, avg_deg=4, seed=8)
    y = spmv_solver_dist(g, mesh=mesh)
    expect = oracles.spmv_serial(g, np.full(g.nnz, 0.2, np.float32),
                                 np.full(g.n, 0.3, np.float32))
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5,
                               atol=1e-6)


def test_pr_bfs_dist_at_scale(mesh):
    """At-scale virtual-mesh regression (VERDICT r2: the few-hundred-
    vertex tests prove collectives compile, not that the sharded
    production layout stays correct once every shard holds thousands of
    vertices and the edge-balanced bounds are non-trivial).  RMAT-13
    with Graph500 skew exercises panel sharding + halo exchange on all
    8 virtual devices."""
    from gardenia_tpu.core.generate import generate_graph
    from gardenia_tpu.solvers.pr import pr_solver

    g = generate_graph("rmat", scale=13, degree=16, symmetrize=True,
                       need_reverse=True)
    d = pr_solver_dist(g, mesh=mesh, balance="edges")
    s = pr_solver(g)
    assert int(d.iterations) == int(s.iterations)
    np.testing.assert_allclose(np.asarray(d.scores),
                               np.asarray(s.scores), atol=1e-6)

    res = bfs_solver_dist(g, 7, mesh=mesh, balance="edges")
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.bfs_serial(g, 7))


def test_sssp_cc_bc_spmv_dist_at_scale(mesh):
    """RMAT-13 virtual-mesh oracle equality for the round-4 distributed
    kernels (VERDICT r3 item 1): non-trivial shard sizes on all 8
    devices, edge-balanced bounds."""
    from gardenia_tpu.core.generate import generate_graph
    from gardenia_tpu.solvers.bc import bc_batched

    g = generate_graph("rmat", scale=13, degree=8, symmetrize=True,
                       need_reverse=True)
    res = sssp_solver_dist(g, 5, mesh=mesh, balance="edges")
    np.testing.assert_array_equal(np.asarray(res.dist),
                                  oracles.sssp_serial(g, 5))

    comp = np.asarray(cc_solver_dist(g, mesh=mesh,
                                     balance="edges").comp)
    expect = oracles.cc_serial(g)
    _, ia = np.unique(comp, return_inverse=True)
    _, ib = np.unique(expect, return_inverse=True)
    assert len(np.unique(ia * (ib.max() + 1) + ib)) == \
        len(np.unique(ib)) == len(np.unique(ia))

    sources = (np.arange(16) * 131) % g.m
    d = bc_batched_dist(g, sources, mesh=mesh)
    s = bc_batched(g, sources)
    np.testing.assert_allclose(np.asarray(d.scores),
                               np.asarray(s.scores), atol=1e-4)

    y = spmv_solver_dist(g, mesh=mesh, balance="edges")
    expect_y = oracles.spmv_serial(g, np.full(g.nnz, 0.2, np.float32),
                                   np.full(g.n, 0.3, np.float32))
    np.testing.assert_allclose(np.asarray(y), expect_y, rtol=1e-4,
                               atol=1e-5)
