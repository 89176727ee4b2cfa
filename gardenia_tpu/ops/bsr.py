"""Hybrid block-sparse SpMV — the production locality path on TPU.

This is the TPU-native answer to the reference's locality machinery
(CSR segmenting include/segmenting.h:31-184, propagation blocking
include/prop_blocking.h:29-65, tiling src/pr/partition.cu:279-372):
instead of segmenting CSR ranges per SM, edges are grouped by
(dst_block, src_block) pairs of 128 vertices and each pair is stored in
the cheapest of two layouts:

  * dense block  — pairs with >= `dense_threshold` edges become one
    128x128 block (int8 edge counts when unweighted — half the HBM
    stream of bf16, upcast at use; f32 when weighted) and ride the MXU
    as a batched matmul.  Operand traffic: 16-32 KB per block
    regardless of edge count, streamed sequentially at HBM bandwidth.
  * ELL remainder — sparser pairs fall back to the degree-bucketed slab
    layout (ops/ell.py) with rowsel gathers (512 B/edge, ~2.2 ns/row
    measured), plus a dst-sorted COO copy for the batched multi-source
    path (whole-row gathers are 100% useful bytes at S lanes).

The dense blocks are dst-sorted, padded so every destination row is
visited, and SPLIT INTO CHUNKS cut at dst-row boundaries: the Pallas
kernels (ops/pallas_bsr.py) receive per-block metadata through
scalar-prefetch SMEM, whose ~1 MB capacity bounds a single grid to
~32K blocks (RMAT-20 has 239K).  Each chunk computes its own row range
completely, so chunk outputs concatenate — no cross-chunk accumulation.
Chunk row spans are STATIC pytree aux data (they define kernel shapes).

Block locality requires hub clustering in the vertex ids — see
gardenia_tpu/core/relabel.py (degree-sorted relabeling), without which
scale-free graphs have ~1.45 edges per pair and the layout degenerates.

Numerics: dense-block matmuls split the f32 operand into hi + lo
bfloat16 halves (extra RHS lanes, same A stream), so products are exact
to ~2^-16 relative — inside PageRank's 1e-4 L1 tolerance and the SpMV
test tolerances; weighted (f32-block) matmuls keep A exact and split
only the operand.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128
LANE_BITS = 7

# scalar-prefetch metadata lives in SMEM (~1 MB on v5e); 3 x i32 per
# block -> stay well under it (measured: 240K blocks = 2.75 MB FAILS)
CHUNK_BLOCKS = 32768


@jax.tree_util.register_pytree_node_class
class DenseChunk:
    """One dst-row range of the dense block stream.  `rows` (static)
    is the chunk's destination-row count; `dst` is RELATIVE to the
    chunk's first row.  Every row in the span has >= 1 block (zero
    blocks pad the gaps) and `first` marks each row's first block."""

    def __init__(self, blk, src, dst, first, rows: int):
        self.blk = blk        # int8|bf16|f32 [B,128,128]
        self.src = src        # i32[B] source block column
        self.dst = dst        # i32[B] dst block row - row_base, sorted
        self.first = first    # i32[B] 1 on each dst row's first block
        self.rows = int(rows)

    def tree_flatten(self):
        return (self.blk, self.src, self.dst, self.first), self.rows

    @classmethod
    def tree_unflatten(cls, rows, children):
        return cls(*children, rows=rows)


class HybridMatrix(NamedTuple):
    """Device (or host) arrays of the hybrid layout: dense chunks plus
    an ELL-slab + dst-sorted-COO remainder (either may be empty)."""
    dense: Tuple[DenseChunk, ...]
    rem: object           # ops.ell.EllMatrix over the remainder edges
    rem_dst: jax.Array    # i32[R] remainder dst, NON-DECREASING
    rem_src: jax.Array    # i32[R] remainder src
    rem_w: object         # f32[R] remainder weights, or None (unweighted)

    @property
    def num_blocks(self) -> int:
        return sum(c.blk.shape[0] for c in self.dense)


# Measured on v5e (PERFORMANCE.md): the Pallas kernel's per-grid-step
# cost is ~300 ns/block, so it needs many lanes to amortize — at S=128
# it beats the batched XLA einsum ~2x (the VMEM-resident output row
# never spills (128, S) partials to HBM), but at S=1 it loses ~10x to
# the XLA int8 einsum (8.3 vs 83 ms/apply on RMAT-20).  The XLA
# einsum+segment-sum paths also serve CPU tests and virtual meshes.
USE_PALLAS_DENSE = False
USE_PALLAS_BATCHED = True


def _pallas_ok() -> bool:
    import jax
    return jax.default_backend() in ("tpu", "axon")


def build_hybrid(rowptr: np.ndarray,
                 colidx: np.ndarray,
                 weights: Optional[np.ndarray] = None,
                 *,
                 num_cols: int,
                 dense_threshold: int = 16,
                 block_dtype: str = "auto") -> HybridMatrix:
    """Host-side grouping of a CSR matrix into the hybrid layout.

    weights None -> unweighted; dense blocks hold small-int edge counts
    and default to int8 storage (half the HBM stream of bf16; consumers
    upcast at use — the MXU still runs bf16).  Weighted matrices store
    f32 blocks.  block_dtype: 'auto' | 'int8' | 'bfloat16' | 'float32'.
    Duplicate edges accumulate additively in both layouts.
    """
    from gardenia_tpu.core import build as _build
    from gardenia_tpu.ops.ell import build_ell

    num_rows = len(rowptr) - 1
    nnz = len(colidx)
    rowptr = np.asarray(rowptr, np.int64)
    dst = np.repeat(np.arange(num_rows, dtype=np.int64), np.diff(rowptr))
    src = np.asarray(colidx, np.int64)
    w = np.ones(nnz, np.float32) if weights is None else \
        np.asarray(weights, np.float32)
    db, dr = dst >> LANE_BITS, (dst & (LANES - 1)).astype(np.int32)
    sb, sr = src >> LANE_BITS, (src & (LANES - 1)).astype(np.int32)
    sb_span = (num_cols >> LANE_BITS) + 2
    key = db * sb_span + sb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, cnt = np.unique(key_s, return_counts=True)
    dense_sel = cnt >= dense_threshold
    if block_dtype == "auto":
        blk_dtype = np.float32 if weights is not None else np.dtype("int8")
    else:
        blk_dtype = np.dtype(block_dtype)
    try:
        import ml_dtypes  # noqa: F401
    except Exception:                                # pragma: no cover
        blk_dtype = np.float32

    # ---- dense blocks ------------------------------------------------------
    nB = int(dense_sel.sum())
    gid = np.searchsorted(uniq, key_s)               # group of each edge
    edge_dense = dense_sel[gid]
    mb = (num_rows + LANES - 1) // LANES
    if nB:
        dkeys = uniq[dense_sel]
        blk_dst_h = (dkeys // sb_span).astype(np.int32)
        blk_src_h = (dkeys % sb_span).astype(np.int32)
        bofe = np.searchsorted(dkeys, key_s[edge_dense])  # block of edge
        eo = order[edge_dense]
        # pallas-ready dense layout FIRST (every dst row visited, first
        # flags), so cells are stored once at their final positions —
        # no GB-scale concatenate + row-permute passes (the host build
        # is memory-bandwidth-bound)
        from gardenia_tpu.ops.pallas_bsr import pad_blocks_for_pallas
        blk_src_h, blk_dst_h, first_h, order2, n_missing = \
            pad_blocks_for_pallas(blk_src_h, blk_dst_h, mb)
        pos = np.empty(nB + n_missing, np.int64)      # concat idx -> slot
        pos[order2] = np.arange(nB + n_missing)

        # sort-by-cell fill: group duplicate cells with one argsort +
        # add.reduceat, then a single fancy store into the staging
        # array — no per-chunk gigabyte float64 bincounts
        cells = LANES * LANES
        gidx = pos[bofe] * cells \
            + (dr[eo].astype(np.int64) * LANES + sr[eo])
        o3 = np.argsort(gidx, kind="stable")
        gi = gidx[o3]
        boundary = np.empty(len(gi), bool)
        boundary[0] = True
        np.not_equal(gi[1:], gi[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        if weights is None and len(starts) == len(gi):
            vals = np.ones(len(starts), np.float32)   # all cells unique
        else:
            vals = np.add.reduceat(w[eo][o3], starts)
        if blk_dtype == np.int8 and (vals.max(initial=0) > 127
                                     or vals.min(initial=0) < -128
                                     or (vals != np.round(vals)).any()):
            blk_dtype = np.dtype("bfloat16")          # counts overflow int8
        blk_h = np.zeros((nB + n_missing, LANES, LANES), blk_dtype)
        blk_h.reshape(-1)[gi[starts]] = vals.astype(blk_dtype)
        dense = _cut_chunks(blk_h, blk_src_h, blk_dst_h, first_h, mb)
    else:
        dense = ()

    # ---- ELL remainder -----------------------------------------------------
    eo = order[~edge_dense]
    rs, rd, rw = src[eo], dst[eo], w[eo]
    ro = np.lexsort((rs, rd))
    rs, rd, rw = rs[ro].astype(np.int32), rd[ro].astype(np.int32), rw[ro]
    rem_rp, rem_ci, rem_wc = _build.coo_to_csr(
        num_rows, rd, rs, rw if weights is not None else None,
        sorted_by_src=True)
    rem = build_ell(rem_rp, rem_ci, rem_wc, num_cols=num_cols)
    return HybridMatrix(dense, rem, rd, rs,
                        rw if weights is not None else None)


def _cut_chunks(blk, src, dst, first, mb: int,
                chunk_blocks: Optional[int] = None
                ) -> Tuple[DenseChunk, ...]:
    """Split the dst-sorted padded block stream at dst-row boundaries
    into runs of <= chunk_blocks (SMEM budget for scalar prefetch).
    Each chunk's rows are complete, so outputs concatenate.  A single
    row with more blocks than the budget becomes its own (oversized)
    chunk — only possible when num_cols/128 > chunk_blocks."""
    if chunk_blocks is None:
        chunk_blocks = CHUNK_BLOCKS
    nB = len(dst)
    chunks = []
    lo = 0
    row_lo = 0
    while lo < nB:
        hi = min(lo + chunk_blocks, nB)
        if hi < nB:
            # retreat to the first block of dst[hi]'s row so the row
            # stays whole; if the row itself starts at/before lo, it is
            # oversized — advance to its end instead
            cut_row = dst[hi]
            first_of_row = int(np.searchsorted(dst, cut_row, side="left"))
            if first_of_row > lo:
                hi = first_of_row
                row_hi = int(cut_row)
            else:
                hi = int(np.searchsorted(dst, cut_row, side="right"))
                row_hi = int(cut_row) + 1
        else:
            row_hi = mb
        chunks.append(DenseChunk(
            blk[lo:hi], src[lo:hi],
            (dst[lo:hi] - row_lo).astype(np.int32),
            np.ascontiguousarray(first[lo:hi]), rows=row_hi - row_lo))
        lo, row_lo = hi, row_hi
    return tuple(chunks)


def _pad_operand(x: jax.Array, num_cols: int) -> jax.Array:
    qx = (num_cols + LANES - 1) // LANES
    flat = jnp.zeros((qx * LANES,), jnp.float32)
    return flat.at[:num_cols].set(x.astype(jnp.float32)).reshape(qx, LANES)


def _dense_apply(dense: Tuple[DenseChunk, ...], x3d: jax.Array, S: int,
                 split: bool, use_pallas: bool) -> jax.Array:
    """(sum of chunk results stacked by rows) — (mb, 128, S) f32."""
    parts = []
    for c in dense:
        a = c.blk
        if use_pallas:
            from gardenia_tpu.ops.pallas_bsr import dense_block_spmv_batched
            yc = dense_block_spmv_batched(a, c.src, c.dst, c.first,
                                          x3d, c.rows, split=split)
        else:
            if a.dtype == jnp.int8:
                a = a.astype(jnp.bfloat16)
            xg = x3d[c.src]                            # (B,128,K)
            if a.dtype == jnp.float32:
                xg = xg.astype(jnp.float32)
            part = jnp.einsum("bij,bjk->bik", a, xg,
                              preferred_element_type=jnp.float32)
            if split:
                part = part[..., :S] + part[..., S:]
            yc = jax.ops.segment_sum(part, c.dst, num_segments=c.rows,
                                     indices_are_sorted=True)
        parts.append(yc)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def spmv_hybrid(hyb: HybridMatrix, x: jax.Array, *, num_rows: int,
                init: Optional[jax.Array] = None,
                use_pallas: Optional[bool] = None) -> jax.Array:
    """y = A x (plus-times, f32) over the hybrid layout.

    Equivalent to spmv_ell(..., F32_PLUS_TIMES) on the same matrix; this
    is the bandwidth-optimal production path for PR/SpMV-class kernels.
    use_pallas selects the hand-fused dense-block kernel
    (ops/pallas_bsr.py, via the batched kernel at S=1 — legal
    (1,128,1) blocks, no dynamic sublane indexing) over the XLA
    einsum+segment-sum lowering (None -> module default).
    """
    if use_pallas is None:
        use_pallas = USE_PALLAS_DENSE and _pallas_ok()
    num_cols = int(x.shape[0])
    x2d = _pad_operand(x, num_cols)
    mb = (num_rows + LANES - 1) // LANES

    if hyb.dense:
        qx = x2d.shape[0]
        f32_blocks = hyb.dense[0].blk.dtype == jnp.float32
        flat = x2d.reshape(-1, 1)
        if f32_blocks:
            x3d = flat.reshape(qx, LANES, 1)           # weighted: exact
            split = False
        else:
            hi = flat.astype(jnp.bfloat16)
            lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            x3d = jnp.concatenate([hi, lo], axis=1).reshape(qx, LANES, 2)
            split = True
        y2d = _dense_apply(hyb.dense, x3d, 1, split, use_pallas)[..., 0]
        y = y2d.reshape(-1)[:num_rows]
    else:
        y = jnp.zeros((num_rows,), jnp.float32)

    if hyb.rem.buckets:
        from gardenia_tpu.ops.semiring import F32_PLUS_TIMES
        from gardenia_tpu.ops.spmv import spmv_ell
        y = spmv_ell(hyb.rem, x, semiring=F32_PLUS_TIMES,
                     num_rows=num_rows, init=y)
    return y if init is None else y + init.astype(jnp.float32)


def _pad_operand_batched(x2d: jax.Array, num_cols: int,
                         exact: bool) -> jax.Array:
    """(n, S) operand -> (nb, 128, K) block table for the dense kernels.
    exact -> K = 2S bf16 hi/lo halves ([:, :S] hi, [:, S:] lo);
    otherwise K = S in bf16 (callers pick this when products need only
    sign/zero fidelity, e.g. frontier counts)."""
    n, S = x2d.shape
    qx = (num_cols + LANES - 1) // LANES
    x = x2d.astype(jnp.float32)
    flat = jnp.zeros((qx * LANES, S), jnp.float32).at[:num_cols].set(x)
    if exact:
        hi = flat.astype(jnp.bfloat16)
        lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        flat = jnp.concatenate([hi, lo], axis=1)       # (rows, 2S)
        return flat.reshape(qx, LANES, 2 * S)
    return flat.astype(jnp.bfloat16).reshape(qx, LANES, S)


def spmv_hybrid_batched(hyb: HybridMatrix, x2d: jax.Array, *,
                        num_rows: int, exact: bool = True,
                        use_pallas: Optional[bool] = None) -> jax.Array:
    """Multi-vector plus-times SpMV over the hybrid layout:
    y[i, s] = sum_j A[i, j] x2d[j, s] for S problems in the lane dim.

    One pass over the dense blocks serves all S problems — the MXU runs
    (128,128)@(128,S) per block, so per-problem A traffic is 1/S of the
    single-vector case.  This is the production multi-source path
    (MS-BFS, batched Brandes BC, multi-vector SpMV) replacing per-edge
    whole-row gathers (ops/spmv.spmv_batched) on the dense part; the
    sparse remainder still pays the per-edge row gather, which IS
    100%-useful traffic at S lanes.

    exact=False computes dense products in bf16 (single pass, half the
    operand traffic) — safe when only zero/nonzero or ~3-digit accuracy
    is consumed (BFS frontier counts); exact=True splits f32 into hi+lo
    bf16 halves (~2^-16 relative, exact for 0/1 A and small-int x).
    """
    if use_pallas is None:
        use_pallas = USE_PALLAS_BATCHED and _pallas_ok()
    n, S = x2d.shape

    if hyb.dense:
        f32_blocks = hyb.dense[0].blk.dtype == jnp.float32
        x3d = _pad_operand_batched(x2d, n, exact=exact or f32_blocks)
        if f32_blocks:
            x3d = x3d.astype(jnp.float32)   # weighted: keep A exact
        split = x3d.shape[2] == 2 * S
        y3d = _dense_apply(hyb.dense, x3d, S, split, use_pallas)
        y = y3d.reshape(-1, S)[:num_rows]
    else:
        y = jnp.zeros((num_rows, S), jnp.float32)

    if hyb.rem_dst.shape[0]:
        gathered = x2d.astype(jnp.float32)[hyb.rem_src]   # (R, S) rows
        if hyb.rem_w is not None:
            gathered = gathered * hyb.rem_w[:, None]
        y = y + jax.ops.segment_sum(gathered, hyb.rem_dst,
                                    num_segments=num_rows,
                                    indices_are_sorted=True)
    return y
