"""Pallas tiled-SpMV kernel correctness (interpret mode — the kernel is
experimental on-device; see ops/pallas_spmv.py status note)."""

import numpy as np
import pytest

from tests.conftest import random_graph

import jax
import jax.numpy as jnp

from gardenia_tpu.core import build
from gardenia_tpu.ops.pallas_spmv import build_tiles, spmv_tiled


@pytest.mark.parametrize("seed,deg", [(1, 6), (3, 12)])
def test_tiled_spmv_matches_dense(seed, deg):
    g = random_graph(m=300, avg_deg=deg, seed=seed, weighted=True)
    tiles_h = build_tiles(g.rowptr, np.asarray(g.colidx),
                          np.asarray(g.weights, np.float32),
                          num_rows=g.m, num_cols=g.n)
    tiles = jax.tree_util.tree_map(jnp.asarray, tiles_h)
    x = np.random.default_rng(seed).random(g.n).astype(np.float32)
    y = spmv_tiled(tiles, jnp.asarray(x), num_rows=g.m, interpret=True)
    A = np.zeros((g.m, g.n))
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    A[s, d] = g.weights
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-5)


def test_tiled_spmv_empty_rows():
    from gardenia_tpu.core.graph import Graph
    g = Graph(np.array([0, 0, 2, 2, 3]), np.array([0, 3, 1], np.int32))
    tiles_h = build_tiles(g.rowptr, np.asarray(g.colidx), None,
                          num_rows=4, num_cols=4)
    tiles = jax.tree_util.tree_map(jnp.asarray, tiles_h)
    y = spmv_tiled(tiles, jnp.asarray(np.arange(4, dtype=np.float32)),
                   num_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y), [0., 3., 0., 1.])


def test_hybrid_panel_row_splitting():
    """Rows wider than MAX_PANEL_WIDTH split across slots whose outputs
    scatter-ADD back; narrow/wide widths agree."""
    import jax.numpy as jnp
    from gardenia_tpu.ops import bsr
    from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid

    g = random_graph(m=1500, avg_deg=12, seed=5, symmetric=True)
    x = np.random.default_rng(0).random(g.n).astype(np.float32)
    hyb1 = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                        dense_threshold=2)
    try:
        bsr.MAX_PANEL_WIDTH, keep = 2, bsr.MAX_PANEL_WIDTH
        hyb2 = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                            dense_threshold=2)
    finally:
        bsr.MAX_PANEL_WIDTH = keep
    # narrow slots force duplicate row ids (split rows)
    rows2 = np.concatenate([np.asarray(p.rows) for p in hyb2.dense])
    assert len(rows2) > len(np.unique(rows2))
    y1 = np.asarray(spmv_hybrid(hyb1, jnp.asarray(x), num_rows=g.m))
    y2 = np.asarray(spmv_hybrid(hyb2, jnp.asarray(x), num_rows=g.m))
    np.testing.assert_allclose(y1, y2, atol=1e-3)


def test_spmv_hybrid_pallas_s1_routing():
    """use_pallas single-vector routes through the batched kernel at
    S=1 (legal (1,128,1) blocks); interpret mode vs the XLA path."""
    from jax.experimental.pallas import tpu as pltpu
    from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid

    for weighted in (False, True):
        g = random_graph(m=300, avg_deg=10, seed=2, symmetric=True,
                         weighted=weighted)
        w = None if g.weights is None else np.asarray(g.weights,
                                                      np.float32)
        hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                           dense_threshold=4)
        x = np.random.default_rng(1).random(g.n).astype(np.float32)
        y_x = np.asarray(spmv_hybrid(hyb, jnp.asarray(x), num_rows=g.m,
                                     use_pallas=False))
        with pltpu.force_tpu_interpret_mode():
            y_p = np.asarray(spmv_hybrid(hyb, jnp.asarray(x),
                                         num_rows=g.m, use_pallas=True))
        scale = max(1e-9, float(np.abs(y_x).max()))
        assert np.abs(y_p - y_x).max() / scale < 1e-4
