"""Frontier primitives — dense masks + compaction/expansion.

The reference keeps frontiers in atomics-based queues (Worklist2
include/worklistc.h:63, SlidingQueue include/sliding_queue.h:28, Bitmap
include/bitmap.h:21).  On TPU a frontier is a dense vector; a "push" is a
scatter, "queue size" is a popcount, and turning a mask back into a
compact id list is a sort/cumsum — `jnp.nonzero` with a static size.

`expand_frontier_edges` is the TPU version of the reference's
CTA+warp+scan three-level load-balanced gather (src/bfs/linear_lb.cu:24-182):
given a compact frontier, produce the flat list of (src, dst) pairs of all
out-edges of frontier vertices, via cumsum + vectorized binary search
instead of intra-block scans.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compact_mask(mask: jax.Array, size: int, fill: int) -> jax.Array:
    """Indices where mask is true, padded with `fill` to static `size`."""
    return jnp.nonzero(mask, size=size, fill_value=fill)[0].astype(jnp.int32)


def frontier_degree_sum(mask: jax.Array, deg: jax.Array) -> jax.Array:
    """Total out-edges leaving the frontier (scout_count,
    src/bfs/omp_beamer.cc:40-49)."""
    return jnp.sum(jnp.where(mask, deg, 0))


def expand_frontier_edges(rowptr: jax.Array,
                          colidx: jax.Array,
                          frontier_ids: jax.Array,
                          capacity: int
                          ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array]:
    """Flatten the out-edges of `frontier_ids` into padded arrays.

    frontier_ids: i32[P], padded with m (sentinel row with 0 edges).
    Returns (src i32[capacity], dst i32[capacity], valid bool[capacity],
    eid i32[capacity] — the CSR edge slot, for weight lookups).
    Requires rowptr to have an m-th entry (it does: rowptr[m] = nnz).
    """
    from gardenia_tpu.ops import rowsel

    nnz = colidx.shape[0]
    starts = rowsel.take(rowptr, frontier_ids)
    ends = rowsel.take(rowptr,
                       jnp.minimum(frontier_ids + 1,
                                   rowptr.shape[0] - 1))
    lens = jnp.maximum(ends - starts, 0)
    cum_ends = jnp.cumsum(lens)
    total = cum_ends[-1] if lens.shape[0] else jnp.int32(0)
    offsets = cum_ends - lens
    # owner f of edge slot j = the load-balanced search.  searchsorted
    # runs on XLA's sequential-scan path (measured ~unusable at
    # capacity ~ E/alpha); instead scatter each row's owner index at its
    # start offset and take a running max — both vectorized.  Rows of
    # length 0 share an offset with their successor; the max keeps the
    # largest index, which is the first non-empty owner of that slot.
    p = jnp.arange(frontier_ids.shape[0], dtype=jnp.int32)
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].max(
        p, mode="drop")
    f = jax.lax.cummax(marks)
    e = rowsel.take(starts, f) + \
        (jnp.arange(capacity, dtype=jnp.int32) - rowsel.take(offsets, f))
    valid = jnp.arange(capacity, dtype=jnp.int32) < total
    e = jnp.clip(e, 0, max(nnz - 1, 0))
    return rowsel.take(frontier_ids, f), rowsel.take(colidx, e), valid, e


def expand_frontier_edges_tbl(rowptr_t: jax.Array,
                              colidx_t: jax.Array,
                              nnz: int,
                              frontier_ids: jax.Array,
                              capacity: int
                              ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                         jax.Array]:
    """expand_frontier_edges over PREBUILT row tables (rowsel.to_rows)
    of rowptr and colidx.  Inside a fused loop the plain form rebuilds
    both tables per call — an O(m + nnz) copy stream that dwarfs the
    O(frontier) expansion itself; with the tables loop-invariant (in
    the carry or closure) a round touches only capacity-sized arrays.

    rowptr_t must be built with pad_value=nnz covering index m+1
    (to_rows(rowptr, m+1, nnz)): the sentinel id m then reads
    [nnz, nnz) — an empty row — without any clamping.
    """
    from gardenia_tpu.ops import rowsel

    starts = rowsel.take2d(rowptr_t, frontier_ids)
    ends = rowsel.take2d(rowptr_t, frontier_ids + 1)
    lens = jnp.maximum(ends - starts, 0)
    cum_ends = jnp.cumsum(lens)
    total = cum_ends[-1] if lens.shape[0] else jnp.int32(0)
    offsets = cum_ends - lens
    p = jnp.arange(frontier_ids.shape[0], dtype=jnp.int32)
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].max(
        p, mode="drop")
    f = jax.lax.cummax(marks)
    e = rowsel.take(starts, f) + \
        (jnp.arange(capacity, dtype=jnp.int32) - rowsel.take(offsets, f))
    valid = jnp.arange(capacity, dtype=jnp.int32) < total
    e = jnp.clip(e, 0, max(nnz - 1, 0))
    return (rowsel.take(frontier_ids, f), rowsel.take2d(colidx_t, e),
            valid, e)
