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


def test_time_op_forces_d2h_on_pytrees():
    """time_op's timed region must end with a result-dependent D2H (the
    axon tunnel ignores block_until_ready — CLAUDE.md measured gotcha).
    Exercise the drain across mixed-dtype / nested pytree results."""
    import jax.numpy as jnp
    from gardenia_tpu.utils.timer import _block

    res = {"f": jnp.ones((4, 4)), "i": jnp.arange(3),
           "b": jnp.array([True, False]),
           "nested": (jnp.float32(2.5), [jnp.zeros(0)])}
    out = _block(res)
    assert out is res
    r, secs = time_op(lambda: {"x": jnp.arange(8).sum(),
                               "flag": jnp.array(True)},
                      warmup=0, iters=1)
    assert int(r["x"]) == 28 and secs > 0
    # non-array results pass through untouched
    assert _block(42) == 42


def test_dev_cache_retains_keyed_arrays():
    """id()-keyed runner caches must hold the keyed array alive so a GC'd
    array's id can never alias a fresh array (advisor finding r1)."""
    import gc
    import numpy as np
    from gardenia_tpu.solvers.spmv import spmv_solver

    g = random_graph(m=40, avg_deg=4, seed=3, symmetric=True)
    ax1 = np.random.default_rng(0).random(g.nnz).astype(np.float32)
    y1 = np.asarray(spmv_solver(g, ax1.copy(), np.ones(g.n, np.float32)))
    # drop all external refs to the first weights array; the cache entry
    # must still pin one so subsequent distinct arrays get fresh runners
    del ax1
    gc.collect()
    retained = [v[1] for v in g._device_cache.values() if v[1] is not None]
    assert retained, "cache dropped the keyed weights array"
    for _ in range(50):   # many allocations that could recycle the id
        ax2 = np.random.default_rng(7).random(g.nnz).astype(np.float32)
        y2 = np.asarray(spmv_solver(g, ax2, np.ones(g.n, np.float32)))
    expect = np.zeros(g.m, np.float32)
    src = np.repeat(np.arange(g.m), np.diff(g.rowptr))
    np.add.at(expect, src, ax2[np.arange(g.nnz)])
    assert np.allclose(y2, expect, rtol=1e-5), \
        "stale cached runner served old weights"


def test_segmented_while_matches_while_loop(tmp_path):
    """build_segmented/run_segmented == lax.while_loop, and the carry
    round-trips through the Checkpointer for resume."""
    import jax.numpy as jnp

    from gardenia_tpu.utils.checkpoint import Checkpointer
    from gardenia_tpu.utils.segment import build_segmented, run_segmented

    def cond(c):
        x, it = c
        return it < 37

    def body(c):
        x, it = c
        return x * 1.5 + 1.0, it + 1

    init = (jnp.float32(0.0), jnp.int32(0))
    import jax
    expect = jax.lax.while_loop(cond, body, init)

    seg = build_segmented(cond, body, 5)
    got, nseg = run_segmented(seg, init)
    assert nseg == 8          # ceil(37/5)
    assert float(got[0]) == float(expect[0])
    assert int(got[1]) == 37

    # checkpointed run: kill after 2 segments, resume completes
    ck = Checkpointer(str(tmp_path / "seg"))
    part, n1 = run_segmented(seg, init, checkpointer=ck,
                             checkpoint_every=1, max_segments=2)
    assert n1 == 2 and ck.step() == 2
    got2, n2 = run_segmented(seg, init, checkpointer=ck,
                             checkpoint_every=1)
    assert float(got2[0]) == float(expect[0]) and int(got2[1]) == 37


def test_segmented_args_matches_closure_form():
    """build_segmented_args threads loop-invariant operands as jit
    arguments (closure constants ship in the remote-compile request
    body and die with HTTP 413 at graph scale) — results must match
    the closure form exactly."""
    import jax
    import jax.numpy as jnp

    from gardenia_tpu.utils.segment import (build_segmented,
                                            build_segmented_args)

    table = jnp.arange(16, dtype=jnp.float32)

    def cond(c):
        x, it = c
        return it < 11

    def body_closure(c):
        x, it = c
        return x + table[it % 16], it + 1

    def body_args(c, tbl):
        x, it = c
        return x + tbl[it % 16], it + 1

    init = (jnp.float32(0.0), jnp.int32(0))
    seg_c = build_segmented(cond, body_closure, 4)
    seg_a = build_segmented_args(cond, body_args, 4)

    ca, cb = init, init
    for _ in range(3):
        ca, more_a = seg_a(ca, table)
        cb, more_b = seg_c(cb)
        assert bool(more_a) == bool(more_b)
    assert float(ca[0]) == float(cb[0])
    assert int(ca[1]) == int(cb[1]) == 11
