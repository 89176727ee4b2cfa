"""Wall-clock timing with device completion semantics.

TPU counterpart of reference include/timer.h:6-44.  On an async backend a
timer is only meaningful if the timed region ends with block_until_ready, so
`time_op` takes care of that, and of excluding the one-time XLA compile by
optionally running a warmup call first.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax


class Timer:
    def __init__(self):
        self._start = 0.0
        self.seconds = 0.0

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        self.seconds = time.perf_counter() - self._start
        return self.seconds

    def millisecs(self) -> float:
        return self.seconds * 1e3


def _block(x: Any) -> Any:
    return jax.block_until_ready(x)


def time_op(fn: Callable[[], Any], *, warmup: int = 1,
            iters: int = 1) -> Tuple[Any, float]:
    """Run fn (returning device arrays), return (result, best seconds)."""
    result = None
    for _ in range(max(0, warmup)):
        result = _block(fn())
    best = float("inf")
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        result = _block(fn())
        best = min(best, time.perf_counter() - t0)
    return result, best
