"""Driver contract: __graft_entry__.entry() must be jittable single-chip
and dryrun_multichip(n) must compile+run the full sharded paths."""

import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, "/root/repo")


def test_entry_jittable():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == args[0].shape
    assert np.isfinite(out).all()
    # a PR step preserves mass up to damping leakage: sum in (0, 1]
    assert 0 < out.sum() <= 1.000001


@pytest.mark.skipif(jax.device_count() < 8,
                    reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_bench_importable_and_kernels_registered():
    import bench
    assert set(bench.KERNELS) >= {"pr", "spmv", "bfs", "cc", "tc", "bc",
                                  "sgd", "sssp", "msbfs"}
