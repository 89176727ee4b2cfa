"""Sorted-adjacency set intersection — TPU counterpart of the reference's
warp-cooperative merge / binary-search intersections
(include/operations.cuh:142-343, include/set_intersect.cuh).

The core primitive is membership counting by vectorized binary search:
given per-query (element w, target row v), count how many w appear in the
sorted neighbor list N(v).  A batch of queries runs log(max_degree)
rounds of gathers — each round is one dense gather + compare, which the
VPU streams at HBM bandwidth (no divergence, unlike warp merges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def membership_counts(rowptr: jax.Array,
                      colidx: jax.Array,
                      queries: jax.Array,
                      rows: jax.Array,
                      valid: jax.Array,
                      search_rounds: int = 32) -> jax.Array:
    """sum over i of [queries[i] in N(rows[i])] (only where valid).

    rowptr i32[m+1], colidx i32[nnz] with SORTED neighbor lists;
    queries/rows/valid are equal-length 1D arrays.
    """
    nnz = colidx.shape[0]
    from gardenia_tpu.ops import rowsel

    col2d = rowsel.to_rows(colidx, nnz, 0)
    lo = rowsel.take(rowptr, rows)
    end = rowsel.take(rowptr, rows + 1)
    hi = end

    def body(_, state):
        # lower_bound: invariant colidx[lo-1] < q <= colidx[hi]
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) // 2
        v = rowsel.gather(col2d, jnp.clip(mid, 0, max(nnz - 1, 0)),
                          acc_dtype=jnp.int32)
        go_right = v < queries
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, search_rounds, body, (lo, hi))
    found = (lo < end) & \
        (rowsel.gather(col2d, jnp.clip(lo, 0, max(nnz - 1, 0)),
                       acc_dtype=jnp.int32) == queries)
    # int32 partial: callers accumulate partials in >=64-bit on the host
    # (a query batch is < 2^31 by construction)
    return jnp.sum(jnp.where(valid & found, 1, 0))
