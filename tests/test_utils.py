"""Aux subsystems: timer/report contract, profiler hooks, statistics."""

import re

import numpy as np

from tests.conftest import random_graph

from gardenia_tpu.utils.profiler import profile_region, roi, \
    device_memory_stats
from gardenia_tpu.utils.report import gteps, report_runtime, spmv_bytes
from gardenia_tpu.utils.statistics import env_check, graph_stats, \
    report_stats
from gardenia_tpu.utils.timer import Timer, time_op


def test_report_runtime_format(capsys):
    """The reference's printf contract: 'runtime [v] = X ms.'
    (src/bfs/omp_beamer.cc:164) and the SpMV GFLOP/GB form
    (src/spmv/omp_base.cc:40)."""
    report_runtime("omp_base", 0.00123)
    report_runtime("ell", 0.001, gflops=12.5, gbytes=80.0)
    out = capsys.readouterr().out
    assert re.search(r"runtime \[omp_base\] = 1\.23\d* ms\.", out)
    assert "GFLOP/s" in out and "GB/s" in out


def test_gteps_and_bytes_model():
    assert gteps(2_000_000_000, 1.0) == 2.0
    assert gteps(100, 0.0) == 0.0
    # byte model from spmv_util.h:6-14
    assert spmv_bytes(10, 100) == 2 * 4 * 10 + 4 * 100 + 2 * 4 * 100 \
        + 2 * 4 * 10


def test_timer_and_time_op():
    import jax.numpy as jnp
    t = Timer()
    t.start()
    t.stop()
    assert t.millisecs() >= 0
    r, secs = time_op(lambda: jnp.arange(8).sum(), warmup=1, iters=2)
    assert int(r) == 28 and secs >= 0


def test_profiler_hooks():
    with roi("solve") as stats:
        x = sum(range(100))
    assert stats["seconds"] >= 0 and stats["name"] == "solve"
    with profile_region("region"):   # no log dir -> annotation only
        pass
    mem = device_memory_stats()
    assert isinstance(mem, dict)


def test_graph_stats_and_env():
    g = random_graph(m=50, avg_deg=4, seed=1, symmetric=True)
    s = graph_stats(g)
    assert s["num_vertices"] == 50 and s["num_edges"] == g.nnz
    assert s["max_degree"] >= s["avg_degree"] >= s["min_degree"]
    report_stats(s)
    env = env_check()
    assert env["device_count"] >= 1
