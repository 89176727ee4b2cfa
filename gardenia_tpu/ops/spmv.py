"""Generalized sparse matrix-vector products over the ELL slab layout.

This is the single compute primitive that PR / SpMV / BFS / SSSP / BC /
SymGS / CC all reduce to (the reference instead hand-writes one edge loop
per kernel; see SURVEY.md §2.3).  Two device implementations:

  spmv_ell      — gather x along each slab's column tile, combine with the
                  semiring, reduce across the width (sublane) axis, scatter
                  partials into y.  All shapes static; XLA fuses the
                  gather+mul+reduce per slab.
  spmv_segment  — COO segment-reduce fallback (also the push-direction
                  primitive for scatter-style updates).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gardenia_tpu.ops.ell import EllMatrix
from gardenia_tpu.ops.semiring import Semiring, F32_PLUS_TIMES


def spmv_ell(ell: EllMatrix,
             x: jax.Array,
             *,
             semiring: Semiring = F32_PLUS_TIMES,
             num_rows: int,
             init: Optional[jax.Array] = None,
             row_mask: Optional[jax.Array] = None,
             gather_mode: str = "auto",
             table_dtype=None) -> jax.Array:
    """y[i] = add_j mul(A[i,j], x[j]), combined into `init` (default: zero).

    row_mask (bool[m+?], optional): rows where mask is False keep their init
    value (used for masked sweeps, e.g. bottom-up BFS over unvisited rows,
    SymGS per-color sweeps).
    gather_mode: 'rowsel' (row gather + one-hot lane select — the fast
    path on TPU, see ops/rowsel.py) or 'direct' (plain XLA gather).
    table_dtype: narrow the gathered operand's storage (e.g. bfloat16 for
    BFS frontier counts) to halve gather traffic.
    """
    from gardenia_tpu.ops import rowsel

    x = jnp.asarray(x)
    dt = semiring.dtype
    pad = jnp.asarray(semiring.pad_x, dtype=dt)
    if gather_mode == "auto":
        gather_mode = "rowsel" if rowsel.enabled() else "direct"
    use_rowsel = gather_mode == "rowsel"
    if use_rowsel:
        n = x.shape[0]
        x2d = rowsel.to_rows(x.astype(dt), n, pad,
                             dtype=table_dtype or dt)
    else:
        x_ext = jnp.concatenate([x.astype(dt), pad[None]])
    if init is None:
        y = jnp.full((num_rows,), semiring.zero, dtype=dt)
    else:
        y = init.astype(dt)
    for b in ell.buckets:
        if use_rowsel:
            gathered = rowsel.gather(x2d, b.cols, acc_dtype=dt)  # (W, R)
        else:
            gathered = x_ext[b.cols]                   # (W, R)
        if b.vals is not None:
            prod = semiring.mul(jnp.asarray(b.vals, dtype=dt), gathered)
        else:
            prod = gathered
        partial = semiring.reduce(prod, axis=0)        # (R,)
        if row_mask is not None:
            keep = row_mask[jnp.minimum(b.row_ids, num_rows - 1)]
            partial = jnp.where(keep, partial,
                                jnp.asarray(semiring.zero, dtype=dt))
        y = semiring.scatter_into(y, b.row_ids, partial)
    return y


def spmv_batched(row_ids_sorted: jax.Array,
                 col_ids: jax.Array,
                 x2d: jax.Array,
                 *,
                 num_rows: int) -> jax.Array:
    """Multi-vector plus-times SpMV: y[i, :] = sum_j A[i,j] x[j, :].

    x2d: (n, S) operand with S problems in the lane dimension.  The per
    -edge gather fetches whole (S,)-rows — 100% useful bytes, unlike the
    single-vector case — measured ~0.085 ns per edge-problem at S=128 on
    v5e, two orders of magnitude past the single-source rate.  This is
    the TPU-native replacement for the reference's multi-source hybrid
    variants (src/bc/bc.h num_iters, bfs hybrid_*): batch sources, don't
    iterate them.

    row_ids_sorted: i32[nnz] destination row per edge, NON-DECREASING
    (CSR order).  col_ids: i32[nnz] operand row per edge.
    """
    gathered = x2d[col_ids]                     # (nnz, S) row gather
    return jax.ops.segment_sum(gathered, row_ids_sorted,
                               num_segments=num_rows,
                               indices_are_sorted=True)


def make_push_pb(g, weights=None):
    """Propagation-blocking push SpMV (reference include/prop_blocking.h
    + src/pr/pb.cc): the preprocessing step computes, once, where each
    source-ordered edge product lands in destination-bin order (the
    reference's pos/addr scatter maps).  On TPU that map is a STATIC
    permutation, so the binning phase becomes a rowsel gather (no
    scatter), and the accumulate phase a sorted segment-sum:

      phase 1: products in src order   = repeat contrib along out-CSR
      phase 2: y = segment_sum(products[perm], dst_sorted)

    weights: optional edge values in forward-CSR edge order.
    Returns a jit-ready fn(x) -> y computing y[i] = sum A[j,i] x[j]
    (push along out-edges, i.e. the transpose product)."""
    import numpy as np_

    from gardenia_tpu.core import build as _build
    from gardenia_tpu.ops import rowsel

    src, dst = _build.csr_to_coo(g.rowptr, g.colidx)
    order = np_.argsort(dst, kind="stable")     # dst-bin order
    perm = jnp.asarray(order.astype(np_.int32))
    dst_sorted = jnp.asarray(dst[order].astype(np_.int32))
    src_d = jnp.asarray(src.astype(np_.int32))
    # weights arrive in forward-CSR (source) edge order
    w = None if weights is None else \
        jnp.asarray(np_.asarray(weights, np_.float32))
    n_rows = g.n

    def push(x):
        contrib = rowsel.take(x.astype(jnp.float32), src_d)  # src order
        if w is not None:
            contrib = contrib * w
        binned = rowsel.take(contrib, perm)                  # dst order
        return jax.ops.segment_sum(binned, dst_sorted,
                                   num_segments=n_rows,
                                   indices_are_sorted=True)

    return push


def spmv_segment(row_ids: jax.Array,
                 col_ids: jax.Array,
                 vals: Optional[jax.Array],
                 x: jax.Array,
                 *,
                 semiring: Semiring = F32_PLUS_TIMES,
                 num_rows: int,
                 init: Optional[jax.Array] = None) -> jax.Array:
    """COO-form generalized SpMV: scatter-combine per edge.

    Also serves as the push-direction primitive (reference push variants,
    e.g. src/pr/push.cu): call with (row_ids=dst, col_ids=src).
    """
    from gardenia_tpu.ops import rowsel

    dt = semiring.dtype
    gathered = rowsel.take(x.astype(dt), col_ids,
                           pad_value=semiring.pad_x)
    prod = semiring.mul(vals.astype(dt), gathered) if vals is not None \
        else gathered
    if init is None:
        y = jnp.full((num_rows,), semiring.zero, dtype=dt)
    else:
        y = init.astype(dt)
    return semiring.scatter_into(y, row_ids, prod)
