"""Graph sampling — batched uniform random walks.

Reference src/sampling is an empty loop skeleton
(SURVEY.md §2.3 "stubs"); this is a real TPU implementation: W walkers
advance in lockstep, each step one row-gather of the walker's CSR row
slot chosen by a per-walker uniform draw — fully vectorized, the
building block for node2vec/GraphSAGE-style samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_walks(g, starts, length: int, seed: int = 0) -> jax.Array:
    """walks[w, t]: vertex of walker w at step t (t=0 is the start).
    Walkers at sink vertices (no out-edges) stay in place."""
    rowptr, colidx = g.device_csr()
    starts = jnp.asarray(np.asarray(starts, np.int32))
    W = starts.shape[0]
    nnz = g.nnz

    def build():
        @jax.jit
        def run(starts, key):
            from gardenia_tpu.ops import rowsel

            def step(carry, _):
                pos, key = carry
                key, sub = jax.random.split(key)
                lo = rowsel.take(rowptr, pos)
                deg = rowsel.take(rowptr, pos + 1) - lo
                r = jax.random.uniform(sub, (W,))
                pick = lo + jnp.floor(
                    r * jnp.maximum(deg, 1)).astype(jnp.int32)
                nxt = rowsel.take(colidx,
                                  jnp.clip(pick, 0, max(nnz - 1, 0)))
                nxt = jnp.where(deg > 0, nxt, pos)
                return (nxt, key), nxt

            (_, _), trail = jax.lax.scan(
                step, (starts, key), None, length=length)
            return jnp.concatenate([starts[None, :], trail],
                                   axis=0).T      # (W, length+1)
        return run

    run = g._dev(("walk_run", W, length), build)
    return run(starts, jax.random.PRNGKey(seed))
