"""Host-segmented device loops — long solves that outlive the worker.

The axon TPU worker KILLS any single device program running ~2+ minutes
("TPU worker process crashed or restarted") — a fused lax.while_loop
solver is ONE program, so minutes-long solves (sssp on a 1024-side
grid, 10-epoch SGD at RMAT-20) die mid-flight.  The reference's CUDA
binaries have no such ceiling (any src/sssp/main.cc run at road-USA
scale just runs); this module restores that capability the TPU way:

  * `build_segmented(cond, body, K)` compiles ONE reusable program that
    executes at most K iterations of `while_loop(cond, body)` and
    reports whether more work remains;
  * `run_segmented(seg, carry)` drives it from the host.  The carry
    pytree stays DEVICE-RESIDENT between segments — only the one-byte
    `more` flag crosses the tunnel (~24 ms per segment, amortized over
    K rounds) — and can optionally round-trip through
    utils/checkpoint.Checkpointer so a killed process resumes.

Pick K so one segment stays well under the kill ceiling (e.g. measured
~7 ms/round -> K=4096 is ~30 s).  A solve that fits in one segment pays
only the extra cond evaluation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def build_segmented(cond: Callable, body: Callable,
                    rounds_per_segment: int) -> Callable:
    """Jit-compiled `seg(carry) -> (carry, more)` running at most
    `rounds_per_segment` iterations of while_loop(cond, body).

    `cond`/`body` have lax.while_loop semantics over the carry pytree.
    The returned callable is a plain jitted function — cache it like
    any other runner (g._dev) so each graph compiles it once.
    """
    K = int(rounds_per_segment)

    @jax.jit
    def seg(carry):
        def c2(state):
            k, c = state
            return jnp.logical_and(k < K, cond(c))

        def b2(state):
            k, c = state
            return k + 1, body(c)

        _, out = jax.lax.while_loop(c2, b2, (jnp.int32(0), carry))
        return out, cond(out)

    return seg


def build_segmented_args(cond: Callable, body: Callable,
                         rounds_per_segment: int) -> Callable:
    """build_segmented, but `seg(carry, *consts)` threads loop-invariant
    device arrays through as jit ARGUMENTS.  Closure-captured device
    arrays become jaxpr CONSTANTS and ship inside the remote-compile
    request body — a graph-sized table (the VC padded COO is 256 MB at
    RMAT-20) dies with HTTP 413 (CLAUDE.md gotcha).  `cond(carry)` as
    before; `body(carry, *consts)`."""
    K = int(rounds_per_segment)

    @jax.jit
    def seg(carry, *consts):
        def c2(state):
            k, c = state
            return jnp.logical_and(k < K, cond(c))

        def b2(state):
            k, c = state
            return k + 1, body(c, *consts)

        _, out = jax.lax.while_loop(c2, b2, (jnp.int32(0), carry))
        return out, cond(out)

    return seg


def run_segmented(seg: Callable, carry: Any, *,
                  checkpointer: Optional[Any] = None,
                  checkpoint_every: int = 0,
                  max_segments: Optional[int] = None
                  ) -> Tuple[Any, int]:
    """Drive a `build_segmented` program until cond is exhausted.

    Returns (final carry, segments executed).  When `checkpointer`
    (utils/checkpoint.Checkpointer) is given, the carry is restored
    from its last save before starting and saved every
    `checkpoint_every` segments (and at completion), so a killed
    process resumes mid-solve.
    """
    n = 0
    if checkpointer is not None:
        restored = checkpointer.restore(like=carry)
        if restored is not None:
            saved, n = restored
            carry = jax.tree_util.tree_map(jnp.asarray, saved)
    more = True
    while more:
        if max_segments is not None and n >= max_segments:
            break
        carry, more_d = seg(carry)
        # bool() is a result-dependent D2H — the only sync that
        # actually blocks through the axon tunnel (utils/timer.py)
        more = bool(more_d)
        n += 1
        if checkpointer is not None and checkpoint_every and \
                (n % checkpoint_every == 0 or not more):
            checkpointer.save(
                jax.tree_util.tree_map(np.asarray, carry), step=n)
    return carry, n
