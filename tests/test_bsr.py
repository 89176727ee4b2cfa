"""Hybrid block-sparse SpMV (ops/bsr.py) + degree relabeling
(core/relabel.py) — the production TPU locality path.

Oracle: direct NumPy scatter-add over the CSR, exactly as
tests/test_pr_spmv.py checks the ELL path."""

import numpy as np
import pytest

from tests.conftest import random_graph

from gardenia_tpu.core.relabel import degree_relabel, relabeled
from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid


def _oracle_spmv(g, x, w=None):
    exp = np.zeros(g.m, np.float32)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    ww = np.ones(g.nnz, np.float32) if w is None else np.asarray(
        w, np.float32)
    np.add.at(exp, src, ww * x[g.colidx])
    return exp


@pytest.mark.parametrize("m,deg,weighted,thr", [
    (97, 6, False, 4),      # dense blocks only
    (300, 10, True, 8),     # weighted f32 blocks
    (513, 3, False, 2),     # mixed blocks + tiles, m % 128 != 0
    (64, 40, True, 64),     # single 128x128 block smaller than a lane row
    (5, 1, False, 64),      # tiles only
    (130, 0, False, 4),     # empty matrix
])
def test_spmv_hybrid_matches_oracle(m, deg, weighted, thr):
    rng = np.random.default_rng(m)
    g = random_graph(m=m, avg_deg=deg, seed=m, weighted=weighted,
                     symmetric=True)
    w = None if g.weights is None else np.asarray(g.weights, np.float32)
    hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                       dense_threshold=thr)
    x = rng.random(g.n).astype(np.float32)
    y = np.asarray(spmv_hybrid(hyb, x, num_rows=g.m))
    exp = _oracle_spmv(g, x, w)
    scale = max(1e-9, float(np.abs(exp).max()))
    # bf16-split operand: exact to ~2^-16 relative
    assert np.abs(y - exp).max() / scale < 2e-4


@pytest.mark.parametrize("m,deg,thr,uniform", [
    (97, 8, 4, False),      # int weight panels + remainder
    (300, 12, 8, False),
    (150, 9, 4, True),      # uniform weights -> scale-factored counts
    (40, 2, 64, False),     # remainder only
])
def test_spmv_hybrid_min_plus_matches_oracle(m, deg, thr, uniform):
    """Round-5 min-plus masked reduce (dist SSSP relax) == the NumPy
    min-plus oracle, across weight-panel dtypes and the scale-factored
    uniform-weight layout."""
    from gardenia_tpu.core import types as T
    from gardenia_tpu.ops.bsr import spmv_hybrid_min_plus
    rng = np.random.default_rng(m)
    g = random_graph(m=m, avg_deg=deg, seed=m + 1, weighted=True,
                     symmetric=True)
    w = np.full(g.nnz, 3.0, np.float32) if uniform \
        else np.round(np.asarray(g.weights, np.float32))
    hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                       dense_threshold=thr)
    INF = np.int32(T.MYINFINITY)
    x = rng.integers(0, 100, g.n).astype(np.int32)
    x[rng.random(g.n) < 0.3] = INF     # unreached sentinel values
    import jax.numpy as jnp
    y = np.asarray(spmv_hybrid_min_plus(hyb, jnp.asarray(x),
                                        num_rows=g.m,
                                        sentinel=int(INF)))
    # exact: min-plus is integer arithmetic end to end (INF + w < 2^31)
    exp = np.full(g.m, INF, np.int64)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    np.minimum.at(exp, src, x[g.colidx].astype(np.int64)
                  + w.astype(np.int64))
    np.testing.assert_array_equal(y.astype(np.int64), exp)


def test_spmv_hybrid_init_accumulates():
    g = random_graph(m=50, avg_deg=4, seed=2, symmetric=True)
    hyb = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                       dense_threshold=4)
    x = np.ones(g.n, np.float32)
    y0 = np.full(g.m, 7.0, np.float32)
    y = np.asarray(spmv_hybrid(hyb, x, num_rows=g.m, init=y0))
    exp = _oracle_spmv(g, x) + 7.0
    assert np.allclose(y, exp, atol=1e-2)


def test_degree_relabel_preserves_graph():
    g = random_graph(m=120, avg_deg=5, seed=4, weighted=True,
                     symmetric=True)
    rel = degree_relabel(g)
    g2, new_of_old, old_of_new = rel
    assert g2.nnz == g.nnz
    assert (new_of_old[old_of_new] == np.arange(g.m)).all()
    # degree ordering: non-increasing
    d2 = np.diff(g2.rowptr)
    assert (d2[:-1] >= d2[1:]).all()
    # edge multiset with weights preserved
    src1 = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    src2 = np.repeat(np.arange(g2.m), d2)
    e1 = sorted(zip(src1.tolist(), g.colidx.tolist(),
                    np.asarray(g.weights).tolist()))
    e2 = sorted(zip(old_of_new[src2].tolist(),
                    old_of_new[g2.colidx].tolist(),
                    np.asarray(g2.weights).tolist()))
    assert e1 == e2
    # cached accessor returns the same object
    assert relabeled(g).graph is relabeled(g).graph


def test_pr_hybrid_matches_ell_and_delta_converges():
    from gardenia_tpu.solvers.pr import pr_solver
    g = random_graph(m=400, avg_deg=8, seed=9, symmetric=True)
    r_ell = pr_solver(g, layout="ell")
    r_hyb = pr_solver(g, layout="hybrid")
    assert int(r_ell.iterations) == int(r_hyb.iterations)
    assert np.abs(np.asarray(r_ell.scores)
                  - np.asarray(r_hyb.scores)).max() < 1e-6
    for layout in ("ell", "hybrid"):
        r_d = pr_solver(g, variant="delta", layout=layout)
        assert np.abs(np.asarray(r_ell.scores)
                      - np.asarray(r_d.scores)).max() < 1e-5
        assert int(r_d.iterations) <= int(r_ell.iterations) + 2


@pytest.mark.parametrize("m,deg,weighted,thr,S,exact", [
    (300, 10, False, 4, 8, True),
    (300, 10, True, 8, 16, True),
    (513, 3, False, 2, 8, False),    # bf16 single-pass (counting mode)
    (5, 1, False, 64, 4, True),      # remainder only
])
def test_spmv_hybrid_batched_matches_oracle(m, deg, weighted, thr, S,
                                            exact):
    from gardenia_tpu.ops.bsr import spmv_hybrid_batched
    rng = np.random.default_rng(m + S)
    g = random_graph(m=m, avg_deg=deg, seed=m, weighted=weighted,
                     symmetric=True)
    w = None if g.weights is None else np.asarray(g.weights, np.float32)
    hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                       dense_threshold=thr)
    x2d = rng.random((g.n, S)).astype(np.float32)
    y = np.asarray(spmv_hybrid_batched(hyb, x2d, num_rows=g.m,
                                       exact=exact))
    exp = np.stack([_oracle_spmv(g, x2d[:, s], w) for s in range(S)],
                   axis=1)
    scale = max(1e-9, float(np.abs(exp).max()))
    tol = 2e-4 if exact or weighted else 1e-2   # bf16 mode ~2^-8
    assert y.shape == (g.m, S)
    assert np.abs(y - exp).max() / scale < tol


def test_pallas_dense_panel_matmul_interpret():
    """Panel Pallas kernel == the XLA einsum path on the dense part,
    both split (exact) and plain bf16 operands, across width buckets."""
    import jax.numpy as jnp
    from gardenia_tpu.ops.bsr import (LANES, _pad_operand_batched,
                                      spmv_hybrid_batched)
    from gardenia_tpu.ops.pallas_bsr import dense_panel_matmul

    S = 8
    g = random_graph(m=300, avg_deg=10, seed=1, symmetric=True)
    hyb = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                       dense_threshold=4)
    assert hyb.dense
    x2d = np.random.default_rng(0).random((g.n, S)).astype(np.float32)
    hyb_dense = hyb._replace(rem=type(hyb.rem)(buckets=()),
                             rem_dst=hyb.rem_dst[:0],
                             rem_src=hyb.rem_src[:0])
    mb = (g.m + LANES - 1) // LANES
    for exact in (True, False):
        x3d = _pad_operand_batched(jnp.asarray(x2d), g.n, exact=exact)
        y_p = np.zeros((mb, LANES, S), np.float32)
        for p in hyb_dense.dense:
            R, W = p.src.shape
            xg = np.asarray(x3d)[p.src].reshape(R, W * LANES, -1)
            part = np.asarray(dense_panel_matmul(
                jnp.asarray(p.panel), jnp.asarray(xg), S, split=exact,
                interpret=True))
            np.add.at(y_p, p.rows, part)
        y_p = y_p.reshape(-1, S)[:g.m]
        y_x = np.asarray(spmv_hybrid_batched(hyb_dense, jnp.asarray(x2d),
                                             num_rows=g.m, exact=exact))
        assert np.abs(y_p - y_x).max() < 1e-4


def test_panel_block_cap_splits_buckets():
    """MAX_PANEL_BLOCKS bounds each panel's block count (the batched
    operand materialization would exceed HBM otherwise); split panels
    reproduce the unsplit result."""
    from gardenia_tpu.ops import bsr
    from gardenia_tpu.ops.bsr import spmv_hybrid_batched
    g = random_graph(m=700, avg_deg=12, seed=7, symmetric=True)
    x2d = np.random.default_rng(2).random((g.n, 4)).astype(np.float32)
    hyb1 = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                        dense_threshold=2)
    try:
        bsr.MAX_PANEL_BLOCKS, keep = 8, bsr.MAX_PANEL_BLOCKS
        hyb8 = build_hybrid(g.rowptr, g.colidx, None, num_cols=g.n,
                            dense_threshold=2)
    finally:
        bsr.MAX_PANEL_BLOCKS = keep
    assert len(hyb8.dense) > len(hyb1.dense)
    assert all(p.src.size <= 8 or p.width > 8 for p in hyb8.dense)
    assert hyb8.num_blocks == hyb1.num_blocks
    y1 = np.asarray(spmv_hybrid_batched(hyb1, x2d, num_rows=g.m))
    y8 = np.asarray(spmv_hybrid_batched(hyb8, x2d, num_rows=g.m))
    np.testing.assert_allclose(y1, y8, atol=1e-3)


def test_spmv_solver_hybrid_variant():
    from gardenia_tpu.solvers.spmv import spmv_solver
    g = random_graph(m=200, avg_deg=7, seed=11, weighted=True,
                     symmetric=True)
    w = np.asarray(g.weights, np.float32)
    x = np.random.default_rng(1).random(g.n).astype(np.float32)
    y_h = np.asarray(spmv_solver(g, w, x, variant="hybrid"))
    exp = _oracle_spmv(g, x, w)
    scale = max(1e-9, float(np.abs(exp).max()))
    assert np.abs(y_h - exp).max() / scale < 2e-4


def test_split_bf16_reconstructs():
    """The truncation bitmask split reconstructs x to ~2^-16 relative
    with a NONZERO lo half (the arithmetic round-based split
    miscompiles under xla_allow_excess_precision — lo collapses to
    zero; see ops/bsr._split_bf16)."""
    import jax
    import jax.numpy as jnp
    from gardenia_tpu.ops.bsr import _split_bf16
    x = (np.random.default_rng(3).random(4096).astype(np.float32)
         * 1e3 - 500.0)
    hi, lo = jax.jit(_split_bf16)(jnp.asarray(x))
    hi = np.asarray(hi).astype(np.float32)
    lo = np.asarray(lo).astype(np.float32)
    err = np.abs(hi + lo - x) / np.maximum(np.abs(x), 1e-6)
    assert err.max() < 2 ** -15
    # hi is a truncation: |lo| reaches ~x * 2^-8, far from zero
    assert np.abs(lo).max() > 1e-3


def test_hybrid_constant_weight_scale():
    """Uniform weights factor into scale x int8 count panels; results
    must equal the f32 reference product."""
    import jax.numpy as jnp

    from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid, \
        spmv_hybrid_batched
    from tests.conftest import random_graph
    g = random_graph(m=300, avg_deg=8, seed=11, symmetric=True)
    w = np.full(g.nnz, 0.25, np.float32)
    hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                       dense_threshold=4)
    assert hyb.scale == 0.25
    assert not any(p.panel.dtype == np.float32 for p in hyb.dense)
    x = np.random.default_rng(0).random(g.n).astype(np.float32)
    y = np.asarray(spmv_hybrid(hyb, jnp.asarray(x), num_rows=g.m))
    dense = np.zeros((g.m, g.n), np.float32)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    np.add.at(dense, (src, g.colidx), w)
    np.testing.assert_allclose(y, dense @ x, rtol=2e-5, atol=2e-5)
    x2 = np.random.default_rng(1).random((g.n, 4)).astype(np.float32)
    y2 = np.asarray(spmv_hybrid_batched(hyb, jnp.asarray(x2),
                                        num_rows=g.m))
    np.testing.assert_allclose(y2, dense @ x2, rtol=2e-5, atol=2e-5)


def test_hybrid_int_weights_int8_or_bf16_panels():
    """Integer edge weights (1..255) ride int8 or exact-bf16 panels,
    never f32, and stay exact."""
    import jax.numpy as jnp

    from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid
    from tests.conftest import random_graph
    g = random_graph(m=260, avg_deg=9, seed=3, symmetric=True)
    rng = np.random.default_rng(7)
    w = rng.integers(1, 256, g.nnz).astype(np.float32)
    hyb = build_hybrid(g.rowptr, g.colidx, w, num_cols=g.n,
                       dense_threshold=4)
    assert hyb.scale == 1.0
    assert all(p.panel.dtype != np.float32 for p in hyb.dense)
    x = (rng.random(g.n) * 2 - 1).astype(np.float32)
    y = np.asarray(spmv_hybrid(hyb, jnp.asarray(x), num_rows=g.m))
    dense = np.zeros((g.m, g.n), np.float32)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    np.add.at(dense, (src, g.colidx), w)
    # split-bf16 error ~2^-16 of the row 1-norm (|w| up to 255) — well
    # inside the reference SpMV sqrt(eps)-scaled contract
    # (src/spmv/spmv_util.h:16-43)
    np.testing.assert_allclose(y, dense @ x, rtol=2e-3, atol=1e-2)
