"""Native C++ parser parity vs the NumPy reference parsers."""

import os

import numpy as np
import pytest

from tests.conftest import DATASETS, TEST_GRAPHS

from gardenia_tpu import native
from gardenia_tpu.core import io


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

FIXTURES = [
    (f"{DATASETS}/chesapeake.mtx", "mtx"),
    (f"{DATASETS}/4.mtx", "mtx"),
    (f"{DATASETS}/4w.mtx", "mtx"),
    (f"{TEST_GRAPHS}/pr.mtx", "mtx"),
    (f"{DATASETS}/4.gr", "gr"),
    (f"{DATASETS}/4.graph", "graph"),
    (f"{DATASETS}/test_mst.mtx", "mtx"),
]


@pytest.mark.parametrize("path,fmt", FIXTURES)
def test_native_matches_numpy(path, fmt):
    ref = io._PARSERS[fmt](path)
    res = native.parse_edges(path, fmt)
    assert res is not None
    m, n, src, dst, wt = res
    assert (m, n) == (ref.num_rows, ref.num_cols)
    np.testing.assert_array_equal(src, ref.src)
    np.testing.assert_array_equal(dst, ref.dst)
    if ref.wt is None:
        assert wt is None or fmt == "gr"  # numpy gr parser keeps weights
    else:
        np.testing.assert_allclose(wt, ref.wt)


def test_parse_text_uses_native(tmp_path):
    # round-trip through the public loader must be identical either way
    path = f"{DATASETS}/chesapeake.mtx"
    a = io.parse_text(path, "mtx", prefer_native=True)
    b = io.parse_text(path, "mtx", prefer_native=False)
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.dst, b.dst)
    assert a.mtx_symmetric == b.mtx_symmetric


def test_converter_cli(tmp_path):
    from gardenia_tpu.tools.converter import main
    prefix = str(tmp_path / "out")
    main([f"{DATASETS}/chesapeake.mtx", prefix, "--symmetrize",
          "--labels=degree"])
    from gardenia_tpu import load_graph
    g = load_graph(prefix, "bin")
    g2 = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    np.testing.assert_array_equal(g.rowptr, g2.rowptr)
    np.testing.assert_array_equal(g.colidx, g2.colidx)
    assert g.vlabels is not None and len(g.vlabels) == g.m


def test_native_skips_extra_fields(tmp_path):
    """Lines with >3 numeric fields (e.g. MatrixMarket 'complex' with
    real+imag) must not bleed the 4th field into the next edge
    (advisor finding r1); parity with the NumPy per-line parser."""
    p = tmp_path / "cplx.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "3 3 3\n"
        "1 2 0.5 9.0\n"
        "2 3 0.25 8.0\n"
        "3 1 0.125 7.0\n")
    res = native.parse_edges(str(p), "mtx")
    assert res is not None
    m, n, src, dst, wt = res
    assert (m, n) == (3, 3)
    np.testing.assert_array_equal(src, [0, 1, 2])
    np.testing.assert_array_equal(dst, [1, 2, 0])
    np.testing.assert_allclose(wt, [0.5, 0.25, 0.125])


@pytest.mark.skipif(False, reason="")
def test_native_csr_builder_parity():
    """Native radix-sort CSR builder == NumPy clean_edges/coo_to_csr on
    random edge lists across flag combinations."""
    from gardenia_tpu import native
    from gardenia_tpu.core import build
    if not native.builder_available():
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(5)
    m = 200
    src = rng.integers(0, m, 3000).astype(np.int32)
    dst = rng.integers(0, m, 3000).astype(np.int32)
    wt = rng.random(3000)
    for sym in (False, True):
        for use_wt in (False, True):
            w = wt if use_wt else None
            s2, d2, w2 = build.clean_edges(
                src.copy(), dst.copy(),
                None if w is None else w.copy(), num_rows=m,
                symmetrize=sym)
            rp_e, ci_e, w_e = build.coo_to_csr(m, s2, d2, w2,
                                               sorted_by_src=True)
            got = native.build_csr(m, src, dst, w, symmetrize=sym)
            assert got is not None
            rp_g, ci_g, w_g = got
            np.testing.assert_array_equal(rp_g, rp_e)
            np.testing.assert_array_equal(ci_g, ci_e)
            if use_wt:
                np.testing.assert_allclose(w_g, w_e)
            else:
                assert w_g is None


def test_from_edges_uses_native_builder():
    """from_edges through the native builder matches the fixture load."""
    from gardenia_tpu import load_graph
    g = load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)
    assert g.nnz == 340 and g.m == 39
