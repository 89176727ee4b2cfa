"""Hybrid block-sparse SpMV — the production locality path on TPU.

This is the TPU-native answer to the reference's locality machinery
(CSR segmenting include/segmenting.h:31-184, propagation blocking
include/prop_blocking.h:29-65, tiling src/pr/partition.cu:279-372):
instead of segmenting CSR ranges per SM, edges are grouped by
(dst_block, src_block) pairs of 128 vertices and each pair is stored in
the cheapest of two layouts:

  * dense block  — pairs with >= `dense_threshold` edges become one
    128x128 bfloat16 block (exact for 0/1 adjacency; f32 when weighted)
    and ride the MXU as a batched matmul.  Operand traffic: 32 KB per
    block regardless of edge count, streamed sequentially at full HBM
    bandwidth.
  * ELL remainder — sparser pairs fall back to the degree-bucketed slab
    layout (ops/ell.py) with rowsel gathers (512 B/edge, ~2.2 ns/row
    measured).  A one-hot tile layout (x row gathered once per tile,
    lanes selected by fused compares) was prototyped and measured 5x
    WORSE on v5e: XLA materializes the (T, W, 128) broadcast compare
    instead of fusing it into the reduction, so the "shared" gather
    costs 15 GB of intermediate traffic.  Revisit only as a hand-fused
    Pallas kernel.

Dense partials land in a (m/128, 128) output via a sorted row-segment
sum (vectorized on TPU).  On RMAT-20 at threshold 16 the dense part
covers 76% of edges at 7.7 GB streamed near peak HBM bandwidth
(~600 GB/s measured through the einsum) and the remainder 24% pays the
gather path — ~3.5x less wall-clock per iteration than all-rowsel.

Block locality requires hub clustering in the vertex ids — see
gardenia_tpu/core/relabel.py (degree-sorted relabeling), without which
scale-free graphs have ~1.45 edges per pair and the layout degenerates.

Numerics: the dense-block matmul splits the f32 operand into
hi + lo bfloat16 halves (one extra lane in the RHS, same A stream), so
products are exact to ~2^-16 relative — well inside PageRank's 1e-4 L1
tolerance and the SpMV test tolerances.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128
LANE_BITS = 7


class HybridMatrix(NamedTuple):
    """Device (or host) arrays of the hybrid layout.  B dense blocks +
    an ELL-slab remainder (possibly empty: B==0 / rem.buckets==()).
    Dense blocks are dst-sorted with every destination row visited at
    least once (zero blocks pad the gaps) and carry first-visit flags —
    the layout the Pallas kernels (ops/pallas_bsr.py) consume; the XLA
    segment-sum path uses the same arrays.  The remainder is stored
    twice: ELL slabs for single-vector rowsel sweeps, and dst-sorted COO
    for the batched multi-source path (whole-row gathers)."""
    blk: jax.Array        # bf16|f32 [B,128,128]; blk[b,i,j] = A[db*128+i, sb*128+j]
    blk_src: jax.Array    # i32[B] source block column
    blk_dst: jax.Array    # i32[B] destination block row (non-decreasing)
    blk_first: jax.Array  # i32[B] 1 on the first block of each dst row
    rem: object           # ops.ell.EllMatrix over the remainder edges
    rem_dst: jax.Array    # i32[R] remainder dst, NON-DECREASING
    rem_src: jax.Array    # i32[R] remainder src
    rem_w: object         # f32[R] remainder weights, or None (unweighted)


# Measured on v5e (PERFORMANCE.md): the single-vector Pallas kernel
# loses to the XLA einsum (grid-step overhead ~260 ns/block dwarfs the
# 32 KB stream), while the BATCHED kernel wins ~2x over the batched
# einsum (the VMEM-resident output row never spills the (128, S)
# partials to HBM).  The XLA einsum+segment-sum paths are the
# always-available fallbacks (CPU tests, virtual meshes).
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

    # ---- dense blocks ----------------------------------------------------
    nB = int(dense_sel.sum())
    gid = np.searchsorted(uniq, key_s)               # group of each edge
    edge_dense = dense_sel[gid]
    if nB:
        dkeys = uniq[dense_sel]
        blk_dst_h = (dkeys // sb_span).astype(np.int32)
        blk_src_h = (dkeys % sb_span).astype(np.int32)
        bofe = np.searchsorted(dkeys, key_s[edge_dense])  # block of edge
        eo = order[edge_dense]
        # sort-by-cell fill: group duplicate cells with one argsort +
        # add.reduceat, then a single fancy store into the bf16|f32
        # staging array — no per-chunk gigabyte float64 bincounts
        cells = LANES * LANES
        gidx = bofe * cells + (dr[eo].astype(np.int64) * LANES + sr[eo])
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
        blk_h = np.zeros((nB, LANES, LANES), blk_dtype)
        blk_h.reshape(-1)[gi[starts]] = vals.astype(blk_dtype)
    else:
        blk_dst_h = np.zeros(0, np.int32)
        blk_src_h = np.zeros(0, np.int32)
        blk_h = np.zeros((0, LANES, LANES), blk_dtype)

    # pallas-ready dense layout: every dst row visited, first flags
    if nB:
        from gardenia_tpu.ops.pallas_bsr import pad_blocks_for_pallas
        mb = (num_rows + LANES - 1) // LANES
        blk_src_h, blk_dst_h, first_h, order2, pad_blk = \
            pad_blocks_for_pallas(blk_src_h, blk_dst_h, mb, blk_dtype)
        blk_h = np.concatenate([blk_h, pad_blk], axis=0)[order2]
    else:
        first_h = np.zeros(0, np.int32)

    # ---- ELL remainder ----------------------------------------------------
    eo = order[~edge_dense]
    rs, rd, rw = src[eo], dst[eo], w[eo]
    ro = np.lexsort((rs, rd))
    rs, rd, rw = rs[ro].astype(np.int32), rd[ro].astype(np.int32), rw[ro]
    rem_rp, rem_ci, rem_wc = _build.coo_to_csr(
        num_rows, rd, rs, rw if weights is not None else None,
        sorted_by_src=True)
    rem = build_ell(rem_rp, rem_ci, rem_wc, num_cols=num_cols)
    return HybridMatrix(blk_h, blk_src_h, blk_dst_h, first_h, rem,
                        rd, rs, rw if weights is not None else None)


def _pad_operand(x: jax.Array, num_cols: int) -> jax.Array:
    qx = (num_cols + LANES - 1) // LANES
    flat = jnp.zeros((qx * LANES,), jnp.float32)
    return flat.at[:num_cols].set(x.astype(jnp.float32)).reshape(qx, LANES)


def spmv_hybrid(hyb: HybridMatrix, x: jax.Array, *, num_rows: int,
                init: Optional[jax.Array] = None,
                use_pallas: Optional[bool] = None) -> jax.Array:
    """y = A x (plus-times, f32) over the hybrid layout.

    Equivalent to spmv_ell(..., F32_PLUS_TIMES) on the same matrix; this
    is the bandwidth-optimal production path for PR/SpMV-class kernels.
    use_pallas selects the hand-fused dense-block kernel
    (ops/pallas_bsr.py) over the XLA einsum+segment-sum lowering
    (None -> module default USE_PALLAS_DENSE).
    """
    if use_pallas is None:
        use_pallas = USE_PALLAS_DENSE and _pallas_ok()
    num_cols = int(x.shape[0])
    x2d = _pad_operand(x, num_cols)
    mb = (num_rows + LANES - 1) // LANES
    y2d = jnp.zeros((mb, LANES), jnp.float32)

    nB = hyb.blk.shape[0]
    if nB and use_pallas:
        # the batched kernel at S=1: (1,128,1)/(1,128,2) blocks are
        # legal (last dim equals the full array dim) and the BlockSpec
        # pipeline streams x/y rows without dynamic sublane indexing —
        # measured ~2x over the dynamic-index single-vector kernel
        from gardenia_tpu.ops.pallas_bsr import dense_block_spmv_batched
        a = hyb.blk
        flat = x2d.reshape(-1, 1)
        qx = flat.shape[0] // LANES
        if a.dtype == jnp.float32:
            x3d = flat.reshape(qx, LANES, 1)
            split = False
        else:
            hi = flat.astype(jnp.bfloat16)
            lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            x3d = jnp.concatenate([hi, lo], axis=1).reshape(qx, LANES, 2)
            split = True
        y2d = dense_block_spmv_batched(
            a, hyb.blk_src, hyb.blk_dst, hyb.blk_first, x3d, mb,
            split=split)[..., 0]
    elif nB:
        xg = x2d[hyb.blk_src]                          # (B,128) row gather
        # split-f32 operand: hi + lo bf16 halves share one pass over A
        x_hi = xg.astype(jnp.bfloat16)
        x_lo = (xg - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jnp.stack([x_hi, x_lo], axis=-1)          # (B,128,2)
        a = hyb.blk
        if a.dtype == jnp.int8:
            a = a.astype(jnp.bfloat16)    # int8 stream, bf16 MXU operand
        if a.dtype == jnp.float32:
            # weighted path: keep A exact, split only the operand
            part = jnp.einsum("bij,bjk->bik", a, xs.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        else:
            part = jnp.einsum("bij,bjk->bik", a, xs,
                              preferred_element_type=jnp.float32)
        partial = part[..., 0] + part[..., 1]          # (B,128)
        y2d = y2d + jax.ops.segment_sum(partial, hyb.blk_dst,
                                        num_segments=mb,
                                        indices_are_sorted=True)

    y = y2d.reshape(-1)[:num_rows]
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
    mb = (num_rows + LANES - 1) // LANES
    y3d = jnp.zeros((mb, LANES, S), jnp.float32)

    nB = hyb.blk.shape[0]
    if nB:
        a = hyb.blk
        x3d = _pad_operand_batched(
            x2d, n, exact=exact or a.dtype == jnp.float32)
        if a.dtype == jnp.float32:
            x3d = x3d.astype(jnp.float32)   # weighted: keep A exact
        if a.dtype == jnp.int8 and not use_pallas:
            a = a.astype(jnp.bfloat16)      # kernel converts in-VMEM
        if use_pallas:
            from gardenia_tpu.ops.pallas_bsr import dense_block_spmv_batched
            y3d = dense_block_spmv_batched(
                a, hyb.blk_src, hyb.blk_dst, hyb.blk_first, x3d, mb,
                split=x3d.shape[2] == 2 * S)
        else:
            xg = x3d[hyb.blk_src]                      # (B,128,K)
            part = jnp.einsum("bij,bjk->bik", a, xg,
                              preferred_element_type=jnp.float32)
            if part.shape[2] == 2 * S:
                part = part[..., :S] + part[..., S:]
            y3d = jax.ops.segment_sum(part, hyb.blk_dst,
                                      num_segments=mb,
                                      indices_are_sorted=True)

    y = y3d.reshape(-1, S)[:num_rows]
    if hyb.rem_dst.shape[0]:
        gathered = x2d.astype(jnp.float32)[hyb.rem_src]   # (R, S) rows
        if hyb.rem_w is not None:
            gathered = gathered * hyb.rem_w[:, None]
        y = y + jax.ops.segment_sum(gathered, hyb.rem_dst,
                                    num_segments=num_rows,
                                    indices_are_sorted=True)
    return y
