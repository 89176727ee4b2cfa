"""ELL blocking + generalized SpMV correctness vs dense NumPy oracles."""

import numpy as np
import pytest

from tests.conftest import random_graph

import jax.numpy as jnp

from gardenia_tpu.ops import (
    build_ell, spmv_ell, spmv_segment,
    F32_PLUS_TIMES, F32_MIN_PLUS, I32_MIN_PLUS, I32_PLUS_TIMES,
    I32_MIN_SELECT2,
)
from gardenia_tpu.core import build


def dense_of(g, weighted=False):
    A = np.zeros((g.m, g.n), np.float64)
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    w = g.weights if (weighted and g.weights is not None) else np.ones(g.nnz)
    A[s, d] = w
    return A


@pytest.mark.parametrize("width_cap", [4, 16, 256])
@pytest.mark.parametrize("seed", [0, 3])
def test_spmv_plus_times(width_cap, seed):
    g = random_graph(m=117, avg_deg=7, seed=seed, weighted=True)
    A = dense_of(g, weighted=True)
    x = np.random.default_rng(seed).random(g.n).astype(np.float32)
    ell = build_ell(g.rowptr, g.colidx,
                    np.asarray(g.weights, np.float32),
                    num_cols=g.n, width_cap=width_cap)
    y = spmv_ell(ell, jnp.asarray(x), semiring=F32_PLUS_TIMES, num_rows=g.m)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-5)


def test_spmv_plus_times_unweighted_with_init():
    g = random_graph(m=64, avg_deg=5, seed=1)
    A = dense_of(g)
    x = np.arange(g.n, dtype=np.float32)
    y0 = np.full(g.m, 2.5, np.float32)
    ell = build_ell(g.rowptr, g.colidx, num_cols=g.n)
    y = spmv_ell(ell, jnp.asarray(x), semiring=F32_PLUS_TIMES,
                 num_rows=g.m, init=jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(y), A @ x + y0, rtol=1e-5)


def test_spmv_min_plus():
    g = random_graph(m=80, avg_deg=6, seed=2, weighted=True)
    x = np.random.default_rng(0).random(g.n).astype(np.float32) * 10
    ell = build_ell(g.rowptr, g.colidx, np.asarray(g.weights, np.float32),
                    num_cols=g.n, width_cap=8)
    y = np.asarray(spmv_ell(ell, jnp.asarray(x), semiring=F32_MIN_PLUS,
                            num_rows=g.m))
    # oracle
    expect = np.full(g.m, np.inf, np.float32)
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    for e in range(g.nnz):
        expect[s[e]] = min(expect[s[e]], g.weights[e] + x[d[e]])
    np.testing.assert_allclose(y, expect, rtol=1e-6)


def test_spmv_i32_min_select2():
    g = random_graph(m=50, avg_deg=4, seed=5)
    labels = np.random.default_rng(1).permutation(g.n).astype(np.int32)
    ell = build_ell(g.rowptr, g.colidx, num_cols=g.n, width_cap=8)
    y = np.asarray(spmv_ell(ell, jnp.asarray(labels),
                            semiring=I32_MIN_SELECT2, num_rows=g.m))
    imax = np.iinfo(np.int32).max
    expect = np.full(g.m, imax, np.int32)
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    for e in range(g.nnz):
        expect[s[e]] = min(expect[s[e]], labels[d[e]])
    np.testing.assert_array_equal(y, expect)


def test_spmv_frontier_count_and_row_mask():
    g = random_graph(m=70, avg_deg=5, seed=7)
    frontier = (np.random.default_rng(2).random(g.n) < 0.3).astype(np.int32)
    ell = build_ell(g.rowptr, g.colidx, num_cols=g.n, width_cap=8)
    counts = np.asarray(spmv_ell(ell, jnp.asarray(frontier),
                                 semiring=I32_PLUS_TIMES, num_rows=g.m))
    A = dense_of(g)
    np.testing.assert_array_equal(counts, (A @ frontier).astype(np.int32))
    # masked: only even rows computed
    mask = np.arange(g.m) % 2 == 0
    got = np.asarray(spmv_ell(ell, jnp.asarray(frontier),
                              semiring=I32_PLUS_TIMES, num_rows=g.m,
                              row_mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(got, np.where(mask, counts, 0))


def test_spmv_segment_matches_ell():
    g = random_graph(m=90, avg_deg=6, seed=9, weighted=True)
    x = np.random.default_rng(3).random(g.n).astype(np.float32)
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    y_seg = spmv_segment(jnp.asarray(s), jnp.asarray(d),
                         jnp.asarray(g.weights, dtype=jnp.float32),
                         jnp.asarray(x), semiring=F32_PLUS_TIMES,
                         num_rows=g.m)
    A = dense_of(g, weighted=True)
    np.testing.assert_allclose(np.asarray(y_seg), A @ x, rtol=1e-5)


def test_ell_empty_rows_and_graph():
    # graph with isolated vertices
    from gardenia_tpu.core.graph import Graph
    rowptr = np.array([0, 0, 2, 2, 3])
    colidx = np.array([0, 3, 1], np.int32)
    g = Graph(rowptr, colidx)
    ell = build_ell(g.rowptr, g.colidx, num_cols=4)
    x = np.array([1., 2., 3., 4.], np.float32)
    y = np.asarray(spmv_ell(ell, jnp.asarray(x), semiring=F32_PLUS_TIMES,
                            num_rows=4))
    np.testing.assert_allclose(y, [0., 5., 0., 2.])
    # fully empty
    ell0 = build_ell(np.array([0, 0]), np.empty(0, np.int32), num_cols=1)
    y0 = spmv_ell(ell0, jnp.ones(1), semiring=F32_PLUS_TIMES, num_rows=1)
    assert float(y0[0]) == 0.0
