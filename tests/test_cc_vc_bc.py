"""CC / VC / BC vs serial oracles (reference src/{cc,vc,bc}/verifier.cc)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.solvers.bc import bc_solver
from gardenia_tpu.solvers.cc import cc_solver
from gardenia_tpu.solvers.vc import vc_solver
from gardenia_tpu.verify import oracles


def canonical(labels):
    """Rename labels to first-occurrence order so labelings compare up to
    renaming (the reference only demands label CONSISTENCY)."""
    labels = np.asarray(labels)
    _, first = np.unique(labels, return_index=True)
    remap = {labels[i]: rank for rank, i in enumerate(sorted(first))}
    return np.array([remap[x] for x in labels])


@pytest.mark.parametrize("variant", ["sv", "afforest"])
def test_cc_random_symmetric(variant):
    g = random_graph(m=200, avg_deg=2, seed=5, symmetric=True)
    res = cc_solver(g, variant=variant)
    np.testing.assert_array_equal(canonical(res.comp),
                                  canonical(oracles.cc_serial(g)))


@pytest.mark.parametrize("variant", ["sv", "afforest"])
def test_cc_directed_weak(variant):
    g = random_graph(m=150, avg_deg=1, seed=8)  # directed, fragmented
    res = cc_solver(g, variant=variant)
    np.testing.assert_array_equal(canonical(res.comp),
                                  canonical(oracles.cc_serial(g)))


@pytest.mark.parametrize("symmetric", [True, False])
def test_cc_sv_hybrid_layout(symmetric):
    """The TPU production CC path (XLA fused masked-min dense panels +
    ELL remainder, relabeled id space) matches the oracle on any
    backend (round 4: no Pallas in the path anymore)."""
    from gardenia_tpu.solvers.cc import cc_sv
    g = random_graph(m=200, avg_deg=4, seed=5, symmetric=symmetric)
    res = cc_sv(g, layout="hybrid")
    np.testing.assert_array_equal(canonical(res.comp),
                                  canonical(oracles.cc_serial(g)))


def test_cc_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = cc_solver(g)
    assert len(np.unique(np.asarray(res.comp))) == \
        len(np.unique(oracles.cc_serial(g)))


def test_vc_proper_coloring():
    g = random_graph(m=180, avg_deg=6, seed=3, symmetric=True)
    res = vc_solver(g)
    colors = np.asarray(res.colors)
    assert oracles.vc_check(g, colors)
    assert int(res.num_colors) <= 128
    # first-fit should be reasonably tight: <= max_degree + 1
    assert int(res.num_colors) <= g.max_degree + 1


def test_vc_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = vc_solver(g)
    assert oracles.vc_check(g, np.asarray(res.colors))


def test_vc_palette_escalation():
    """A clique wider than the palette saturates every vertex's
    forbidden row; the fixed-C loop would spin forever (the axon worker
    killed vc@RMAT-20 this way — 111 colors already at scale 16).  The
    solver must detect saturation, double the palette, and produce a
    proper coloring."""
    import numpy as np
    from gardenia_tpu.core.graph import Graph
    n = 10
    src = np.repeat(np.arange(n, dtype=np.int32), n - 1)
    dst = np.concatenate(
        [[j for j in range(n) if j != i] for i in range(n)]
    ).astype(np.int32)
    order = np.argsort(src, kind="stable")
    rowptr = np.zeros(n + 1, np.int64)
    np.add.at(rowptr[1:], src, 1)
    rowptr = np.cumsum(rowptr)
    g = Graph(rowptr.astype(np.int64), dst[order], symmetric=True)
    res = vc_solver(g, max_color=4)      # K_10 needs 10 colors
    assert oracles.vc_check(g, np.asarray(res.colors))
    assert int(res.num_colors) == n


def test_vc_dense_tier(monkeypatch):
    """Small CPU graphs always fit the sparse tiers, so the dense
    fallback (the path RMAT-20's first rounds take) needs its caps
    zeroed out to run under test at all."""
    from gardenia_tpu.solvers import vc as vcmod
    monkeypatch.setattr(vcmod, "VC_SPARSE_CAPS", ())
    monkeypatch.setattr(vcmod, "VC_CORE_CAP", 0)
    g = random_graph(m=180, avg_deg=6, seed=3, symmetric=True)
    res = vcmod.vc_solver(g)
    assert oracles.vc_check(g, np.asarray(res.colors))


def test_vc_spill_and_tiny_segments(monkeypatch):
    """Force tier churn: a 16-slot sparse cap spills as soon as conflict
    reactivation grows the frontier past it (the segment must exit with
    the spill flag, not silently drop rounds), and 2-round segments
    exercise the host resume loop many times over one solve."""
    from gardenia_tpu.solvers import vc as vcmod
    monkeypatch.setattr(vcmod, "VC_SPARSE_CAPS", (16,))
    monkeypatch.setattr(vcmod, "VC_CORE_CAP", 0)
    g = random_graph(m=180, avg_deg=6, seed=11, symmetric=True)
    res = vcmod.vc_solver(g, rounds_per_segment=2)
    assert oracles.vc_check(g, np.asarray(res.colors))
    # reference semantics: round count grows one per speculative pass
    assert int(res.iterations) >= 1


def test_vc_core_handoff(monkeypatch):
    """Speculative tiers must hand off to the sequential core pass the
    round the frontier fits VC_CORE_CAP, and the handoff coloring stays
    proper (the core's forbidden table must see every committed
    non-core color and the core-core near-clique through adj)."""
    from gardenia_tpu.solvers import vc as vcmod
    monkeypatch.setattr(vcmod, "VC_CORE_CAP", 16)
    g = random_graph(m=180, avg_deg=8, seed=5, symmetric=True)
    res = vcmod.vc_solver(g)
    assert oracles.vc_check(g, np.asarray(res.colors))
    assert int(res.num_colors) <= g.max_degree + 1


def test_vc_core_saturation_resume(monkeypatch):
    """A clique wider than the palette saturates inside the CORE pass;
    saturated members must stay active and resume under the doubled
    palette with every committed color kept."""
    from gardenia_tpu.solvers import vc as vcmod
    import numpy as np
    from gardenia_tpu.core.graph import Graph
    n = 10
    src = np.repeat(np.arange(n, dtype=np.int32), n - 1)
    dst = np.concatenate(
        [[j for j in range(n) if j != i] for i in range(n)]
    ).astype(np.int32)
    order = np.argsort(src, kind="stable")
    rowptr = np.zeros(n + 1, np.int64)
    np.add.at(rowptr[1:], src, 1)
    rowptr = np.cumsum(rowptr)
    g = Graph(rowptr.astype(np.int64), dst[order], symmetric=True)
    res = vcmod.vc_solver(g, max_color=4)
    assert oracles.vc_check(g, np.asarray(res.colors))
    assert int(res.num_colors) == n


def test_bc_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    res = bc_solver(g, 0)
    expect = oracles.bc_serial(g, 0)
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 4])
def test_bc_random(seed):
    g = random_graph(m=120, avg_deg=4, seed=seed, symmetric=True)
    res = bc_solver(g, 7)
    expect = oracles.bc_serial(g, 7)
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-4)


def test_bc_directed():
    g = random_graph(m=90, avg_deg=3, seed=6)  # directed
    res = bc_solver(g, 1)
    expect = oracles.bc_serial(g, 1)
    np.testing.assert_allclose(np.asarray(res.scores), expect,
                               atol=1e-4, rtol=1e-4)
