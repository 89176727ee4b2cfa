"""End-to-end slice: SpMV + PageRank vs serial oracles
(BASELINE.md configs 1-2, reference src/{spmv,pr}/verifier.cc)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

import jax.numpy as jnp

from gardenia_tpu import load_graph
from gardenia_tpu.solvers.pr import pr_solver, EPSILON
from gardenia_tpu.solvers.spmv import spmv_solver
from gardenia_tpu.verify import oracles, maximum_relative_error


SQRT_EPS = float(np.sqrt(np.finfo(np.float32).eps))


def test_spmv_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    Ax = np.full(g.nnz, 0.2, np.float32)
    x = np.full(g.m, 0.3, np.float32)
    y = spmv_solver(g, Ax, x)
    expect = oracles.spmv_serial(g, Ax, x)
    assert maximum_relative_error(np.asarray(y), expect) < SQRT_EPS


@pytest.mark.parametrize("variant", ["ell", "segment"])
def test_spmv_variants_weighted(variant):
    g = random_graph(m=143, avg_deg=9, seed=4, weighted=True)
    x = np.random.default_rng(0).random(g.m).astype(np.float32)
    y0 = np.random.default_rng(1).random(g.m).astype(np.float32)
    y = spmv_solver(g, np.asarray(g.weights, np.float32), x,
                    y0, variant=variant)
    expect = oracles.spmv_serial(g, g.weights, x, y0)
    assert maximum_relative_error(np.asarray(y), expect) < SQRT_EPS


def test_pr_pr4_fixture(pr4):
    """Must reproduce the golden transcript: 15 iterations to 8.3e-5
    (test/reference/graph-pr.mtx.out)."""
    res = pr_solver(pr4)
    assert int(res.iterations) == 15
    errs = np.asarray(res.errors)[:15]
    golden = [0.354167, 0.240833, 0.085295, 0.043501, 0.035948, 0.020080,
              0.007204, 0.005053, 0.003801, 0.001311, 0.000713, 0.000599,
              0.000314, 0.000118, 0.000083]
    np.testing.assert_allclose(errs, golden, atol=1e-6)
    # push-residual oracle check as the reference verifier does
    resid = oracles.pagerank_push_residual(pr4, np.asarray(res.scores))
    assert resid < EPSILON


@pytest.mark.parametrize("variant", ["pull", "push"])
def test_pr_random(variant):
    g = random_graph(m=200, avg_deg=6, seed=11)
    res = pr_solver(g, variant=variant)
    expect, ref_iters, _ = oracles.pagerank_serial(g)
    assert abs(int(res.iterations) - ref_iters) <= 1
    np.testing.assert_allclose(np.asarray(res.scores), expect, atol=1e-5)


def test_pr_chesapeake_oracle():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = pr_solver(g)
    resid = oracles.pagerank_push_residual(g, np.asarray(res.scores))
    assert resid < EPSILON


def test_spmv_push_pb_transpose_product():
    """Propagation-blocking push computes y += A^T x with precomputed
    dst-bin permutation maps (reference prop_blocking.h)."""
    g = random_graph(m=140, avg_deg=7, seed=8, weighted=True)
    x = np.random.default_rng(4).random(g.m).astype(np.float32)
    y0 = np.random.default_rng(5).random(g.n).astype(np.float32)
    from gardenia_tpu.solvers.spmv import spmv_solver
    y = np.asarray(spmv_solver(g, np.asarray(g.weights, np.float32), x,
                               y0, variant="push_pb"))
    from gardenia_tpu.core import build
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    expect = y0.astype(np.float64).copy()
    np.add.at(expect, d, np.asarray(g.weights) * x[s])
    assert maximum_relative_error(y, expect) < SQRT_EPS
