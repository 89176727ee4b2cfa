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
    """Fully compress a parent forest: comp[v] -> root of v."""
    def cond(c):
        return jnp.any(rowsel.take(c, c) != c)

    def body(c):
        return rowsel.take(c, c)

    return jax.lax.while_loop(cond, body, comp)


def pointer_jump_n(comp: jax.Array, n: int) -> jax.Array:
    """Fixed-count jumping (cheaper when depth bound is known)."""
    for _ in range(n):
        comp = rowsel.take(comp, comp)
    return comp
