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
  * one-hot tile — sparser pairs become (W=8)-slot tiles; the operand
    128-lane row is gathered ONCE per tile (vs once per edge on the
    rowsel path) and slots select their lane with a fused one-hot
    compare on the VPU.  Traffic: 512 B + ~70 B per tile.

Both partials land in a (m/128, 128) output via sorted row-segment sums
(vectorized on TPU).  On RMAT-20 this cuts per-iteration traffic from
16 GB (rowsel: 512 B/edge) to ~4.4 GB.

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
    """Device (or host) arrays of the hybrid layout.  B dense blocks,
    T one-hot tiles of W slots.  Either part may be empty (B==0/T==0
    encoded as zero-length leading dims)."""
    blk: jax.Array        # bf16|f32 [B,128,128]; blk[b,i,j] = A[db*128+i, sb*128+j]
    blk_src: jax.Array    # i32[B] source block column
    blk_dst: jax.Array    # i32[B] destination block row (non-decreasing)
    t_src: jax.Array      # i32[T] tile source block
    t_dst: jax.Array      # i32[T] tile destination block (non-decreasing)
    t_sres: jax.Array     # i32[T,W] source lane residue (0 on padding)
    t_dres: jax.Array     # i32[T,W] destination lane residue
    t_vals: jax.Array     # f32[T,W] edge value (0 on padding)


def build_hybrid(rowptr: np.ndarray,
                 colidx: np.ndarray,
                 weights: Optional[np.ndarray] = None,
                 *,
                 num_cols: int,
                 dense_threshold: int = 64,
                 tile_w: int = 8) -> HybridMatrix:
    """Host-side grouping of a CSR matrix into the hybrid layout.

    weights None -> unweighted (A entries 0/1, dense blocks bfloat16).
    Duplicate edges accumulate additively in both layouts.
    """
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
    uniq, grp_start, cnt = np.unique(key_s, return_index=True,
                                     return_counts=True)
    dense_sel = cnt >= dense_threshold
    blk_dtype = np.float32 if weights is not None else np.dtype("bfloat16")
    # build via ml_dtypes if available; fall back to f32 blocks
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
        blk_h = np.zeros((nB, LANES, LANES), np.float32)
        eo = order[edge_dense]
        np.add.at(blk_h, (bofe, dr[eo], sr[eo]), w[eo])
        blk_h = blk_h.astype(blk_dtype)
    else:
        blk_dst_h = np.zeros(0, np.int32)
        blk_src_h = np.zeros(0, np.int32)
        blk_h = np.zeros((0, LANES, LANES), blk_dtype)

    # ---- one-hot tiles for the remainder ---------------------------------
    rem = ~edge_dense
    eo = order[rem]
    nrem = len(eo)
    if nrem:
        rgid = gid[rem]
        # position of each edge within its group
        rstart = np.full(len(uniq), nnz, np.int64)
        np.minimum.at(rstart, rgid, np.arange(nnz)[rem])
        pos = np.arange(nnz)[rem] - rstart[rgid]
        tile_in_grp = pos // tile_w
        slot = pos % tile_w
        tiles_per_grp = np.zeros(len(uniq), np.int64)
        np.maximum.at(tiles_per_grp, rgid, tile_in_grp + 1)
        tile_base = np.concatenate([[0], np.cumsum(tiles_per_grp)[:-1]])
        tid = (tile_base[rgid] + tile_in_grp).astype(np.int64)
        nT = int(tiles_per_grp.sum())
        t_sres_h = np.zeros((nT, tile_w), np.int32)
        t_dres_h = np.zeros((nT, tile_w), np.int32)
        t_vals_h = np.zeros((nT, tile_w), np.float32)
        t_sres_h[tid, slot] = sr[eo]
        t_dres_h[tid, slot] = dr[eo]
        t_vals_h[tid, slot] = w[eo]
        t_src_h = np.zeros(nT, np.int32)
        t_dst_h = np.zeros(nT, np.int32)
        t_src_h[tid] = (key_s[rem] % sb_span).astype(np.int32)
        t_dst_h[tid] = (key_s[rem] // sb_span).astype(np.int32)
    else:
        nT = 0
        t_sres_h = np.zeros((0, tile_w), np.int32)
        t_dres_h = np.zeros((0, tile_w), np.int32)
        t_vals_h = np.zeros((0, tile_w), np.float32)
        t_src_h = np.zeros(0, np.int32)
        t_dst_h = np.zeros(0, np.int32)

    return HybridMatrix(blk_h, blk_src_h, blk_dst_h, t_src_h, t_dst_h,
                        t_sres_h, t_dres_h, t_vals_h)


def _pad_operand(x: jax.Array, num_cols: int) -> jax.Array:
    qx = (num_cols + LANES - 1) // LANES
    flat = jnp.zeros((qx * LANES,), jnp.float32)
    return flat.at[:num_cols].set(x.astype(jnp.float32)).reshape(qx, LANES)


def spmv_hybrid(hyb: HybridMatrix, x: jax.Array, *, num_rows: int,
                init: Optional[jax.Array] = None) -> jax.Array:
    """y = A x (plus-times, f32) over the hybrid layout.

    Equivalent to spmv_ell(..., F32_PLUS_TIMES) on the same matrix; this
    is the bandwidth-optimal production path for PR/SpMV-class kernels.
    """
    num_cols = int(x.shape[0])
    x2d = _pad_operand(x, num_cols)
    mb = (num_rows + LANES - 1) // LANES
    y2d = jnp.zeros((mb, LANES), jnp.float32)

    nB = hyb.blk.shape[0]
    if nB:
        xg = x2d[hyb.blk_src]                          # (B,128) row gather
        # split-f32 operand: hi + lo bf16 halves share one pass over A
        x_hi = xg.astype(jnp.bfloat16)
        x_lo = (xg - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jnp.stack([x_hi, x_lo], axis=-1)          # (B,128,2)
        a = hyb.blk
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

    nT = hyb.t_src.shape[0]
    if nT:
        lane = jnp.arange(LANES, dtype=jnp.int32)
        xr = x2d[hyb.t_src]                            # (T,128) row gather
        # ev[t,w] = x[tile t's src row][sres[t,w]]  (fused one-hot select)
        ev = jnp.sum(jnp.where(hyb.t_sres[:, :, None] == lane,
                               xr[:, None, :], 0.0), axis=2)     # (T,W)
        contrib = ev * hyb.t_vals                      # 0 on padding
        upd = jnp.sum(jnp.where(hyb.t_dres[:, :, None] == lane,
                                contrib[:, :, None], 0.0), axis=1)  # (T,128)
        y2d = y2d + jax.ops.segment_sum(upd, hyb.t_dst,
                                        num_segments=mb,
                                        indices_are_sorted=True)

    y = y2d.reshape(-1)[:num_rows]
    return y if init is None else y + init.astype(jnp.float32)
