"""Profiling hooks — counterpart of reference include/profiler.h (PAPI
hardware counters / VTune ITT resume-pause) and include/timer.h TIME_OP.

On TPU the native profiler is XLA's: `profile_region` wraps a region in a
jax.profiler trace (viewable in TensorBoard/XProf), and `roi` mirrors the
reference's gem5 roi_begin/roi_end hooks (include/sim.h:30-47) as trace
annotations.  Set GARDENIA_PROFILE_DIR to capture a trace automatically
around solver calls in the CLI.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_region(name: str, log_dir: Optional[str] = None
                   ) -> Iterator[None]:
    """Capture an XLA profiler trace around a region when log_dir (or
    $GARDENIA_PROFILE_DIR) is set; always annotates the region name."""
    log_dir = log_dir or os.environ.get("GARDENIA_PROFILE_DIR")
    if log_dir:
        jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if log_dir:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def roi(name: str = "roi") -> Iterator[dict]:
    """Region-of-interest timer: gem5 roi_begin/roi_end analog.
    Yields a dict filled with 'seconds' at exit."""
    stats = {"name": name}
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield stats
    finally:
        stats["seconds"] = time.perf_counter() - t0


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (replaces the reference's
    printed cudaMemGetInfo diagnostics)."""
    try:
        d = jax.devices()[0]
        s = d.memory_stats() or {}
        return {"bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit")}
    except Exception:
        return {}
