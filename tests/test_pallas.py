"""Pallas/hybrid panel-layout correctness (interpret mode)."""

import numpy as np

from tests.conftest import random_graph

import jax.numpy as jnp


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
