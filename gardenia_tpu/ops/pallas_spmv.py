"""Pallas tiled SpMV — the locality-blocked TPU kernel (EXPERIMENTAL).

Status: algorithmically correct (validated in interpret mode, see
tests/test_pallas.py) but not yet the production path.  Two Mosaic
blockers measured on the current toolchain: (1) per-tile (1, W) edge
blocks violate the (8, 128) minimum block-shape rule, so edge streams
need a transposed (W, T·128) layout; (2) tpu.DynamicGatherOp
(jnp.take_along_axis inside kernels) fails to lower, ruling out
vectorized VMEM gathers for now.  The production gather path is
ops/rowsel.py; this kernel is the planned ~2-5x follow-up once edges
stream in lane-major layout with per-tile one-hot selects.


The rowsel gather (ops/rowsel.py) fetches one 512-byte row of the
operand per edge (~3 ns/edge, bandwidth-amplified 128x).  This kernel
restores locality the way the reference's CSR segmenting does
(include/segmenting.h): edges are grouped into (dst-block, src-block)
tiles of 128x128 vertices; each grid step DMAs ONE 128-wide operand row
into VMEM (driven by a scalar-prefetched block-column list, the Pallas
PrefetchScalarGridSpec pattern) and processes ALL of the tile's edges
from VMEM with one-hot selects — operand traffic drops from
512 B/edge to 512 B/tile.

Tiles are ordered by destination block; the 128-lane output row stays
resident in VMEM across consecutive tiles of the same block and is
zeroed on the first visit (prefetched first-visit flag).

Edge storage per tile row: src lane residue, dst lane residue, value —
6-10 B/edge after padding.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gardenia_tpu.core import types as T

LANES = 128


class TiledMatrix(NamedTuple):
    """Host/device arrays describing the tile stream (leading dim = T
    tiles, W edge slots per tile)."""
    src_blk: np.ndarray      # i32[T]   operand block column
    dst_blk: np.ndarray      # i32[T]   output block row (non-decreasing)
    first: np.ndarray        # i32[T]   1 on first tile of a dst block
    src_res: np.ndarray      # i32[T,W] lane of the operand element
    dst_res: np.ndarray      # i32[T,W] lane of the output element
    vals: np.ndarray         # f32[T,W] edge values (0 on padding)
    valid: np.ndarray        # i32[T,W] 1 = real edge


def build_tiles(rowptr: np.ndarray, colidx: np.ndarray,
                weights: Optional[np.ndarray], *, num_rows: int,
                num_cols: int, tile_w: int = 8) -> TiledMatrix:
    """Group edges into (dst_block, src_block) tiles with <= tile_w
    edges each (vectorized NumPy)."""
    nnz = len(colidx)
    dst = np.repeat(np.arange(num_rows, dtype=np.int64), np.diff(rowptr))
    src = colidx.astype(np.int64)
    db, dr = dst >> 7, (dst & 127).astype(np.int32)
    sb, sr = src >> 7, (src & 127).astype(np.int32)
    key = db * ((num_cols >> 7) + 2) + sb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    # group boundaries
    new_grp = np.empty(nnz, bool)
    if nnz:
        new_grp[0] = True
        new_grp[1:] = key_s[1:] != key_s[:-1]
    gid = np.cumsum(new_grp) - 1
    # position within group -> tile index within group
    n_grp = int(gid[-1]) + 1 if nnz else 0
    grp_start = np.full(n_grp, nnz, np.int64)
    np.minimum.at(grp_start, gid, np.arange(nnz))
    pos = np.arange(nnz) - grp_start[gid]
    tile_in_grp = pos // tile_w
    slot = (pos % tile_w).astype(np.int64)
    # global tile id: count tiles per group, prefix sum
    tiles_per_grp = np.zeros(len(grp_start), np.int64)
    np.maximum.at(tiles_per_grp, gid, tile_in_grp + 1)
    tile_base = np.concatenate([[0], np.cumsum(tiles_per_grp)[:-1]])
    tid = tile_base[gid] + tile_in_grp
    n_tiles = int(tiles_per_grp.sum()) if nnz else 0

    src_res = np.zeros((n_tiles, tile_w), np.int32)
    dst_res = np.zeros((n_tiles, tile_w), np.int32)
    vals = np.zeros((n_tiles, tile_w), np.float32)
    valid = np.zeros((n_tiles, tile_w), np.int32)
    src_blk = np.zeros(n_tiles, np.int32)
    dst_blk = np.zeros(n_tiles, np.int32)
    w = weights.astype(np.float32) if weights is not None \
        else np.ones(nnz, np.float32)
    src_res[tid, slot] = sr[order]
    dst_res[tid, slot] = dr[order]
    vals[tid, slot] = w[order]
    valid[tid, slot] = 1
    src_blk[tid] = sb[order].astype(np.int32)
    dst_blk[tid] = db[order].astype(np.int32)
    # every output block must be visited at least once (so it gets
    # zeroed): append an empty tile for each dst block with no edges
    mb = (num_rows + LANES - 1) // LANES
    present = np.zeros(mb, bool)
    if n_tiles:
        present[dst_blk] = True
    missing = np.nonzero(~present)[0].astype(np.int32)
    if len(missing):
        k = len(missing)
        src_blk = np.concatenate([src_blk, np.zeros(k, np.int32)])
        dst_blk = np.concatenate([dst_blk, missing])
        src_res = np.concatenate([src_res, np.zeros((k, tile_w),
                                                    np.int32)])
        dst_res = np.concatenate([dst_res, np.zeros((k, tile_w),
                                                    np.int32)])
        vals = np.concatenate([vals, np.zeros((k, tile_w), np.float32)])
        valid = np.concatenate([valid, np.zeros((k, tile_w), np.int32)])
        order2 = np.argsort(dst_blk, kind="stable")
        src_blk, dst_blk = src_blk[order2], dst_blk[order2]
        src_res, dst_res = src_res[order2], dst_res[order2]
        vals, valid = vals[order2], valid[order2]
        n_tiles += k
    firsts = np.zeros(n_tiles, np.int32)
    if n_tiles:
        firsts[0] = 1
        firsts[1:] = (dst_blk[1:] != dst_blk[:-1]).astype(np.int32)
    return TiledMatrix(src_blk, dst_blk, firsts, src_res, dst_res,
                       vals, valid)


def spmv_tiled(tiles, x: jax.Array, *, num_rows: int,
               op: str = "add", interpret: bool = False) -> jax.Array:
    """y = A x over the tile stream.  op: 'add' (plus-times) or 'min'
    (min-plus; x and vals must be int32-valued f32 with MYINFINITY
    sentinels).  tiles: TiledMatrix of device arrays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, tile_w = tiles.src_res.shape
    qx = (x.shape[0] + LANES - 1) // LANES
    x2d = jnp.zeros((qx * LANES,), jnp.float32).at[:x.shape[0]].set(
        x.astype(jnp.float32)).reshape(qx, LANES)
    mb = (num_rows + LANES - 1) // LANES

    is_min = op == "min"
    zero = np.float32(T.MYINFINITY) if is_min else np.float32(0)

    def kernel(sb_ref, db_ref, first_ref, sres_ref, dres_ref, val_ref,
               valid_ref, x_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            y_ref[0, :] = jnp.full((LANES,), zero, jnp.float32)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]
        xv = x_ref[0, :]                                   # (128,)
        sres = sres_ref[0]                                 # (W,)
        dres = dres_ref[0]
        vals = val_ref[0]
        valid = valid_ref[0] == 1
        sel = sres[:, None] == lane_iota[None, :]          # (W,128)
        ev = jnp.sum(jnp.where(sel, xv[None, :], 0.0), axis=1)  # (W,)
        if is_min:
            contrib = ev + vals
            dsel = (dres[:, None] == lane_iota[None, :]) & valid[:, None]
            upd = jnp.min(jnp.where(dsel, contrib[:, None],
                                    np.float32(T.MYINFINITY)), axis=0)
            y_ref[0, :] = jnp.minimum(y_ref[0, :], upd)
        else:
            contrib = ev * vals
            dsel = (dres[:, None] == lane_iota[None, :]) & valid[:, None]
            upd = jnp.sum(jnp.where(dsel, contrib[:, None], 0.0), axis=0)
            y_ref[0, :] = y_ref[0, :] + upd

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # src_blk, dst_blk, first
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile_w), lambda i, sb, db, fs: (i, 0)),
            pl.BlockSpec((1, tile_w), lambda i, sb, db, fs: (i, 0)),
            pl.BlockSpec((1, tile_w), lambda i, sb, db, fs: (i, 0)),
            pl.BlockSpec((1, tile_w), lambda i, sb, db, fs: (i, 0)),
            pl.BlockSpec((1, LANES), lambda i, sb, db, fs: (sb[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES),
                               lambda i, sb, db, fs: (db[i], 0)),
    )
    y2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, LANES), jnp.float32),
        interpret=interpret,
    )(tiles.src_blk, tiles.dst_blk, tiles.first,
      tiles.src_res, tiles.dst_res, tiles.vals, tiles.valid, x2d)
    return y2d.reshape(-1)[:num_rows]
