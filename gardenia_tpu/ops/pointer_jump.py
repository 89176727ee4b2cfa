"""Pointer jumping — the TPU replacement for the reference's lock-free
union-find (include/component.h ComponentSpace, and the Link/Compress pair
in src/cc/omp_afforest.cc:12-35).

On TPU, a parent forest is an i32 vector and full path compression is
log-depth: comp = comp[comp] until fixpoint — each step is one gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gardenia_tpu.ops import rowsel


def pointer_jump(comp: jax.Array) -> jax.Array:
    """Fully compress a parent forest: comp[v] -> root of v.

    One gather per step: the naive cond/body split re-gathered comp[comp]
    in BOTH the predicate and the body (2x m-sized gathers per jump level
    — ~8 ms/level at RMAT-20, and CC compresses after every round)."""
    def cond(state):
        return state[1]

    def body(state):
        c, _ = state
        c2 = rowsel.take(c, c)
        return c2, jnp.any(c2 != c)

    c, _ = jax.lax.while_loop(cond, body, (comp, jnp.bool_(True)))
    return c


def pointer_jump_n(comp: jax.Array, n: int) -> jax.Array:
    """Fixed-count jumping (cheaper when depth bound is known)."""
    for _ in range(n):
        comp = rowsel.take(comp, comp)
    return comp
