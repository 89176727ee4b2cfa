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
