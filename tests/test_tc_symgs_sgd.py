"""TC / SymGS / SGD correctness (reference src/{tc,symgs,sgd})."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.solvers.sgd import sgd_solver, init_latent, K
from gardenia_tpu.solvers.symgs import symgs_solver
from gardenia_tpu.solvers.tc import tc_solver
from gardenia_tpu.verify import oracles, l2_error


def test_tc_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    assert tc_solver(g) == oracles.tc_serial(g.oriented())


@pytest.mark.parametrize("seed", [0, 2])
def test_tc_random(seed):
    g = random_graph(m=160, avg_deg=10, seed=seed, symmetric=True)
    assert tc_solver(g) == oracles.tc_serial(g.oriented())


def test_tc_small_chunk_edges():
    g = random_graph(m=64, avg_deg=6, seed=5, symmetric=True)
    # chunk smaller than the wedge count exercises the fori_loop path
    assert tc_solver(g, chunk=128) == oracles.tc_serial(g.oriented())


def test_symgs_matches_serial():
    g = random_graph(m=120, avg_deg=5, seed=1, symmetric=True)
    rng = np.random.default_rng(13)
    Ax = rng.random(g.nnz).astype(np.float32)
    x0 = rng.random(g.m).astype(np.float32)
    b = rng.random(g.m).astype(np.float32)
    diag = (g.degrees + 1).astype(np.float32)
    res = symgs_solver(g, Ax, x0, b, diag)
    # serial oracle in the reference's indices/color_offsets form
    from gardenia_tpu.solvers.vc import vc_solver
    colors = np.asarray(vc_solver(g).colors)
    order = np.argsort(colors, kind="stable")
    counts = np.bincount(colors, minlength=colors.max() + 1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    expect = oracles.symgs_serial(g, order, Ax, diag, x0, b, offsets)
    assert l2_error(np.asarray(res.x), expect) < 1e-4


def test_sgd_rmse_decreases_and_tracks_serial():
    g = random_graph(m=80, avg_deg=6, seed=3, weighted=True)
    res = sgd_solver(g, max_iters=5, epsilon=0.0)
    rmse = np.asarray(res.rmse)[:int(res.iterations)]
    assert len(rmse) == 5
    # training reduces the objective
    final = oracles.sgd_rmse(g.rowptr, g.colidx,
                             np.asarray(g.weights, np.float32),
                             np.asarray(res.user_lv),
                             np.asarray(res.item_lv))
    assert final < rmse[0]
    assert rmse[-1] < rmse[0]


def test_sgd_gradient_matches_manual():
    """One step of the jax.grad update equals the hand-written
    synchronous form of the reference's per-edge update."""
    g = random_graph(m=40, avg_deg=4, seed=7, weighted=True)
    lam, step = 0.05, 0.003
    res = sgd_solver(g, lam, step, max_iters=1, epsilon=0.0)
    ulv0 = init_latent(g.m, 0)
    ilv0 = init_latent(max(g.n, int(g.colidx.max()) + 1), 1)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    dst = g.colidx
    r = np.asarray(g.weights, np.float32)
    delta = r - np.einsum("ek,ek->e", ulv0[src], ilv0[dst])
    gu = np.zeros_like(ulv0)
    gi = np.zeros_like(ilv0)
    np.add.at(gu, src, -delta[:, None] * ilv0[dst] + lam * ulv0[src])
    np.add.at(gi, dst, -delta[:, None] * ulv0[src] + lam * ilv0[dst])
    np.testing.assert_allclose(np.asarray(res.user_lv), ulv0 - step * gu,
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.item_lv), ilv0 - step * gi,
                               rtol=2e-4, atol=2e-6)


def test_tc_bsearch_multi_slice(monkeypatch):
    """Graphs whose wedge space exceeds the per-slice budget are
    processed in edge-range slices (int32-safe)."""
    import gardenia_tpu.solvers.tc as tcmod
    g = random_graph(m=110, avg_deg=9, seed=4, symmetric=True)
    expect = oracles.tc_serial(g.oriented())
    monkeypatch.setattr(tcmod, "WEDGE_SLICE_LIMIT", 4096)
    assert tcmod.tc_bsearch(g, chunk=512) == expect


def test_tc_rotate_multi_slice(monkeypatch):
    """Chunk-pair spaces beyond the per-slice budget run as multiple
    edge-range slices through one compiled kernel (int32-safe)."""
    import gardenia_tpu.solvers.tc as tcmod
    g = random_graph(m=110, avg_deg=9, seed=4, symmetric=True)
    expect = oracles.tc_serial(g.oriented())
    monkeypatch.setattr(tcmod, "PAIR_SLICE_LIMIT", 2048)
    assert tcmod.tc_rotate(g, chunk=256) == expect


def test_sgd_packed_epoch_matches_unpacked():
    """The 4-vertices-per-128-lane-row packed epoch (TPU row-gather
    fast path) computes the same factors/RMSE as the unpacked epoch —
    the K=20->32 pad lanes stay identically zero."""
    g = random_graph(m=150, avg_deg=8, seed=11, weighted=True)
    ref = sgd_solver(g, step=0.1, max_iters=4, epsilon=0.0, batches=4,
                     packed=False)
    got = sgd_solver(g, step=0.1, max_iters=4, epsilon=0.0, batches=4,
                     packed=True)
    np.testing.assert_allclose(np.asarray(got.rmse),
                               np.asarray(ref.rmse), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.user_lv),
                               np.asarray(ref.user_lv),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.item_lv),
                               np.asarray(ref.item_lv),
                               rtol=1e-4, atol=1e-6)


def test_sgd_minibatch_converges():
    """Mini-batched epochs (reference accumulate-then-apply semantics,
    degree-normalized) reduce RMSE monotonically-ish on weighted data."""
    g = random_graph(m=200, avg_deg=10, seed=5, weighted=True)
    res = sgd_solver(g, step=0.1, max_iters=6, epsilon=0.0, batches=4)
    rmse = np.asarray(res.rmse)[:6]
    assert np.isfinite(rmse).all()
    assert rmse[-1] < rmse[0] * 0.8


def test_bitonic_merge_intersect_oracle():
    """The bitonic-merge kernel's per-row count equals the numpy set
    intersection, across fill combinations including empty rows."""
    import jax
    import jax.numpy as jnp

    import gardenia_tpu.solvers.tc as tcmod
    rng = np.random.default_rng(3)
    rows_a, rows_b, expect = [], [], []
    for fa, fb in [(0, 0), (0, 128), (128, 128), (1, 1), (7, 100),
                   (64, 64), (128, 1), (100, 100), (33, 97)]:
        a = np.sort(rng.choice(4000, fa, replace=False)) if fa else \
            np.zeros(0, np.int64)
        # force overlaps
        b = np.sort(np.unique(np.concatenate(
            [rng.choice(4000, max(fb - fb // 2, 0), replace=False),
             rng.choice(a, min(fb // 2, len(a)), replace=False) if fa
             else np.zeros(0, np.int64)])))[:fb]
        ra = np.full(128, -1, np.int32)
        rb = np.full(128, -1, np.int32)
        ra[:len(a)] = a
        rb[:len(b)] = b
        rows_a.append(ra)
        rows_b.append(rb)
        expect.append(len(np.intersect1d(a, b)))
    A = jnp.asarray(np.stack(rows_a))
    Brev = jnp.asarray(np.stack(rows_b)[:, ::-1].copy())
    lane = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
    eq = tcmod._bitonic_intersect(
        A, Brev, lambda x, s: jnp.roll(x, s, axis=1), lane)
    np.testing.assert_array_equal(np.asarray(eq.sum(axis=1)), expect)


def test_tc_merge_class_routing(monkeypatch):
    """Routing every width class through the merge kernel (XLA path)
    keeps counts exact on a hub-heavy graph."""
    import gardenia_tpu.solvers.tc as tcmod
    g = random_graph(m=400, avg_deg=30, seed=6, symmetric=True)
    expect = tcmod.tc_rotate(g)
    monkeypatch.setattr(tcmod, "MERGE_MIN_W", 8)
    assert tcmod.tc_rotate(random_graph(m=400, avg_deg=30, seed=6,
                                        symmetric=True)) == expect


def test_tc_merge_pallas_interpret():
    """Pallas merge kernel (interpret mode) matches the XLA formulation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import gardenia_tpu.solvers.tc as tcmod
    rng = np.random.default_rng(9)
    P = 16
    A = np.sort(rng.integers(0, 3000, (P, 128)).astype(np.int32), axis=1)
    B = np.sort(np.where(rng.random((P, 128)) < 0.4, A,
                         rng.integers(0, 3000, (P, 128)).astype(np.int32)),
                axis=1)
    # dedup within rows (intersection semantics need distinct elements)
    for r in range(P):
        ua = np.unique(A[r])
        ub = np.unique(B[r])
        A[r] = -1
        B[r] = -1
        A[r, :len(ua)] = ua
        B[r, :len(ub)] = ub
    Brev = jnp.asarray(B[:, ::-1].copy())
    Ad = jnp.asarray(A)
    lane = jax.lax.broadcasted_iota(jnp.int32, Ad.shape, 1)
    ref = tcmod._bitonic_intersect(
        Ad, Brev, lambda x, s: jnp.roll(x, s, axis=1), lane).sum()
    with pltpu.force_tpu_interpret_mode():
        got = tcmod._merge_count_pallas(Ad, Brev, interpret=True).sum()
    assert int(got) == int(ref)
