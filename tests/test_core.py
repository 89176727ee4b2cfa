"""Core graph build + I/O tests, checked against reference semantics
(include/csr_graph.h fill_data / build_reverse_graph / orientation)."""

import numpy as np
import pytest

from tests.conftest import DATASETS, TEST_GRAPHS, random_graph

from gardenia_tpu import load_graph
from gardenia_tpu.core import build, io


def ref_csr(m, edges):
    """Oracle CSR builder: per-vertex python lists, sort, dedup —
    literal restatement of csr_graph.h:122-168 semantics."""
    adj = [[] for _ in range(m)]
    for s, d in edges:
        adj[s].append(d)
    rowptr = [0]
    colidx = []
    for v in range(m):
        ns = sorted(set(adj[v]))
        colidx.extend(ns)
        rowptr.append(len(colidx))
    return np.array(rowptr), np.array(colidx)


def test_mtx_pr4():
    g = load_graph(f"{TEST_GRAPHS}/pr.mtx", "mtx")
    assert g.m == 4 and g.nnz == 8
    # pr.mtx edges (1-indexed): 2->1 3->1 4->1 3->2 4->2 1->3 1->4 3->4
    assert list(g.out_neigh(0)) == [2, 3]
    assert list(g.out_neigh(1)) == [0]
    assert list(g.out_neigh(2)) == [0, 1, 3]
    assert list(g.out_neigh(3)) == [0, 1]


def test_reverse_graph():
    g = load_graph(f"{TEST_GRAPHS}/pr.mtx", "mtx", need_reverse=True)
    # in-neighbors of vertex 0 = {1,2,3}
    irp, ici = g.in_rowptr, g.in_colidx
    assert list(ici[irp[0]:irp[1]]) == [1, 2, 3]
    assert list(ici[irp[1]:irp[2]]) == [2, 3]
    assert irp[-1] == g.nnz


def test_symmetrize_chesapeake():
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    assert g.m == 39
    # symmetrized: every edge has its reverse
    s, d = build.csr_to_coo(g.rowptr, g.colidx)
    fwd = set(zip(s.tolist(), d.tolist()))
    assert all((b, a) in fwd for (a, b) in fwd)
    assert g.symmetric


def test_dedup_and_self_loops():
    from gardenia_tpu.core.graph import from_edges
    e = io.EdgeListData(4, 4,
                        np.array([0, 0, 0, 1, 2, 2], np.int32),
                        np.array([1, 1, 0, 2, 3, 3], np.int32))
    g = from_edges(e)
    assert g.nnz == 3
    assert list(g.out_neigh(0)) == [1]
    assert list(g.out_neigh(2)) == [3]


def test_random_csr_matches_oracle():
    rng = np.random.default_rng(42)
    m, nnz = 53, 400
    src = rng.integers(0, m, nnz)
    dst = rng.integers(0, m, nnz)
    keep = src != dst
    ref_rp, ref_ci = ref_csr(m, zip(src[keep].tolist(), dst[keep].tolist()))
    s2, d2, _ = build.clean_edges(src, dst, num_rows=m)
    rp, ci, _ = build.coo_to_csr(m, s2, d2, sorted_by_src=True)
    np.testing.assert_array_equal(rp, ref_rp)
    np.testing.assert_array_equal(ci, ref_ci)


def test_orientation():
    g = random_graph(m=60, avg_deg=5, seed=1, symmetric=True)
    dag = g.oriented()
    assert dag.nnz * 2 == g.nnz or dag.nnz <= g.nnz  # ties broken by id
    deg = g.degrees
    s, d = build.csr_to_coo(dag.rowptr, dag.colidx)
    for u, v in zip(s.tolist(), d.tolist()):
        assert (deg[v] > deg[u]) or (deg[v] == deg[u] and v > u)
    # DAG has exactly one direction per undirected edge
    assert dag.nnz == g.nnz // 2


def test_bin_roundtrip(tmp_path):
    g = random_graph(m=40, avg_deg=4, seed=2)
    prefix = str(tmp_path / "g")
    io.write_bin_csr(prefix, g.rowptr, g.colidx)
    g2 = load_graph(prefix, "bin")
    np.testing.assert_array_equal(g.rowptr, g2.rowptr)
    np.testing.assert_array_equal(g.colidx, g2.colidx)


def test_gr_graph_el_formats(tmp_path):
    # same tiny graph in three formats must load identically
    # edges (1-indexed): 1->2 2->3 3->1
    (tmp_path / "t.el").write_text("3 3\n1 2\n2 3\n3 1\n")
    (tmp_path / "t.gr").write_text(
        "c comment\np sp 3 3\na 1 2 5\na 2 3 7\na 3 1 9\n")
    (tmp_path / "t.graph").write_text("3 3\n2\n3\n1\n")
    gs = [load_graph(str(tmp_path / f"t.{ext}"), ext)
          for ext in ("el", "gr", "graph")]
    for g in gs:
        np.testing.assert_array_equal(g.rowptr, gs[0].rowptr)
        np.testing.assert_array_equal(g.colidx, gs[0].colidx)
    # .gr weights preserved
    assert gs[1].weights is not None
    np.testing.assert_array_equal(gs[1].weights, [5, 7, 9])


def test_weighted_mtx():
    g = load_graph(f"{DATASETS}/4w.mtx", "mtx")
    assert g.weights is not None
    assert g.m == 14


def test_gap_command_line_flags():
    """GAP getopt parity (reference include/command_line.h flags)."""
    from gardenia_tpu.core.command_line import (GapFlags, load_from_flags,
                                                parse_gap_args)
    fl = parse_gap_args(["-g", "6", "-k", "4", "-s", "-r", "3",
                         "-d", "8", "-n", "2"])
    assert fl.scale == 6 and fl.degree == 4 and fl.symmetrize
    assert fl.start_vertex == 3 and fl.delta == 8 and fl.num_trials == 2
    g = load_from_flags(fl)
    assert g.m == 64 and g.symmetric
    fl2 = parse_gap_args(["-f", f"{TEST_GRAPHS}/pr.mtx"])
    g2 = load_from_flags(fl2)
    assert g2.m == 4
