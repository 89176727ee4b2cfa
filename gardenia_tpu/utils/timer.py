"""Wall-clock timing with device completion semantics.

TPU counterpart of reference include/timer.h:6-44 (the reference brackets
the kernel with Timer t; t.Start(); ...; t.Stop() after cudaDeviceSynchronize,
src/spmv/omp_base.cc:36-40).  On an async JAX backend the timed region must
end only after device execution finishes.  `jax.block_until_ready` does NOT
actually block through the axon TPU tunnel (measured; see CLAUDE.md), so
`time_op` instead forces a result-dependent device-to-host transfer: every
device-array leaf of the result is reduced to one scalar on device and that
scalar is converted to a Python float.  The reduction+D2H adds one tunnel
round trip (~24 ms constant) — callers that care subtract `D2H_FLOOR_S`
or amortize over long solves.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

# One extra jit call + D2H per timed region on the tunnel backend.
D2H_FLOOR_S = 0.0


@jax.jit
def _drain_sum(leaves):
    """Single fused scalar that depends on every array leaf."""
    total = jnp.float32(0)
    for leaf in leaves:
        x = leaf
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        # any-dtype -> f32 scalar; values may overflow/inf, irrelevant:
        # only the data dependency matters.
        total = total + jnp.sum(x).astype(jnp.float32)
    return total


def _block(x: Any) -> Any:
    """Force completion of every device array in the pytree.

    On backends where block_until_ready works (cpu, real tpu) that would
    suffice, but on the axon tunnel it returns early; a result-dependent
    D2H is the only reliable barrier, so it is used unconditionally.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if isinstance(l, jax.Array)]
    if leaves:
        float(_drain_sum(leaves))
    return x


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


def time_op(fn: Callable[[], Any], *, warmup: int = 1,
            iters: int = 1) -> Tuple[Any, float]:
    """Run fn (returning device arrays), return (result, best seconds).

    The timed region ends with a forced result-dependent D2H (see module
    docstring) so the number includes actual device execution.
    """
    result = None
    for _ in range(max(0, warmup)):
        result = _block(fn())
    best = float("inf")
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        result = _block(fn())
        best = min(best, time.perf_counter() - t0)
    return result, best
