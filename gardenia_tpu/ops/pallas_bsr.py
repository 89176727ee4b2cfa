"""Pallas dense-block SpMV kernel for the hybrid layout (ops/bsr.py).

One hand-fused MXU kernel over a dst-sorted 128x128 block stream:
blocks (1, 128, S) are legal Mosaic shapes natively; the operand row
arrives via a scalar-prefetched index map (the PrefetchScalarGridSpec
gather pattern) and the output row dst[i] stays VMEM-resident across
consecutive blocks of the same destination row (a prefetched
first-visit flag zeroes it), so the (128, S) partials NEVER spill to
HBM — the measured ~2x win over the XLA einsum+segment-sum lowering.

The same kernel serves every production shape:
  S = 1          — single-vector PR/SpMV (the (…,1) last dim equals the
                   full array dim, so the block shape stays legal; a
                   (1, 128) row BlockSpec would violate Mosaic's
                   (8, 128) minimum — the round-1/2 kernels never
                   compiled for exactly that reason).
  S = 128+       — multi-source BFS / batched Brandes BC / multi-vector
                   SpMV: one pass over A serves all S problems, the MXU
                   runs (128,128)@(128,S).

Numerics: `split=True` treats the operand's last dim as hi/lo bf16
halves of an f32 vector ([:, :S] + [:, S:] after the matmul — exact to
~2^-16 relative); int8 blocks (unweighted edge counts) upcast to the
operand dtype in VMEM, halving the HBM stream.

Block metadata travels through scalar-prefetch SMEM (~1 MB on v5e), so
grids are bounded to ~32K blocks — ops/bsr.py cuts the block stream
into DenseChunks at dst-row boundaries and concatenates chunk outputs.

Reference analog: src/pr/partition.cu:279-372 / include/segmenting.h
(SM-cache-sized column blocking); here the block IS the MXU tile.
The sparse remainder stays on the XLA rowsel path (Mosaic has no
vectorized VMEM gather on this toolchain — see ops/pallas_spmv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def dense_block_spmv_batched(blk: jax.Array, blk_src: jax.Array,
                             blk_dst: jax.Array, first: jax.Array,
                             x3d: jax.Array, mb: int, *,
                             split: bool = False,
                             pregather: bool = True,
                             interpret: bool = False) -> jax.Array:
    """y3d (mb,128,S) = sum of blk[b] @ x3d[blk_src[b]] into block rows
    blk_dst[b].  blk (B,128,128) int8|bf16|f32, dst-sorted with every
    destination row in [0, mb) visited (ops/bsr pads) and first[b]=1 on
    each row's first block; x3d (mb_x,128,K).

    split=False: K == S, plain product (bf16 operand is the caller's
                 accuracy choice).
    split=True:  K == 2*S, hi/lo split-f32 operand — halves [0:S] and
                 [S:2S] are summed after the matmul, so bf16 A x bf16
                 halves is exact to ~2^-16 relative (exact for 0/1
                 adjacency).
    pregather:   gather the operand rows with XLA (xg = x3d[blk_src])
                 so BOTH kernel input streams are sequential and the
                 pipeline prefetches deep; the scalar-dependent form
                 (index map sb[i]) issues one latency-bound DMA per
                 step (~750 ns measured at RMAT-20) because the fetch
                 can't run ahead of the grid.  The gather materializes
                 B x 128 x K once — cheap next to the per-step stall.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nB = blk.shape[0]
    K = x3d.shape[2]
    S = K // 2 if split else K

    def kernel(db_ref, first_ref, a_ref, x_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        a = a_ref[0]                                  # (128, 128)
        xs = x_ref[0]                                 # (128, K)
        if a.dtype != xs.dtype:
            a = a.astype(xs.dtype)    # int8/bf16 HBM stream -> MXU dtype
        acc = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        if K != S:
            acc = acc[:, :S] + acc[:, S:]
        y_ref[0] += acc

    if pregather:
        xg = x3d[blk_src]                             # (B, 128, K) rows
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,      # blk_dst, first
            grid=(nB,),
            in_specs=[
                pl.BlockSpec((1, LANES, LANES), lambda i, db, fs: (i, 0, 0)),
                pl.BlockSpec((1, LANES, K), lambda i, db, fs: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, LANES, S),
                                   lambda i, db, fs: (db[i], 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mb, LANES, S), jnp.float32),
            interpret=interpret,
        )(blk_dst, first, blk, xg)

    def kernel_sb(sb_ref, db_ref, first_ref, a_ref, x_ref, y_ref):
        kernel(db_ref, first_ref, a_ref, x_ref, y_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # blk_src, blk_dst, first
        grid=(nB,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i, sb, db, fs: (i, 0, 0)),
            pl.BlockSpec((1, LANES, K), lambda i, sb, db, fs: (sb[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES, S),
                               lambda i, sb, db, fs: (db[i], 0, 0)),
    )
    return pl.pallas_call(
        kernel_sb,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, LANES, S), jnp.float32),
        interpret=interpret,
    )(blk_src, blk_dst, first, blk, x3d)


def pad_blocks_for_pallas(blk_src: np.ndarray, blk_dst: np.ndarray,
                          mb: int) -> tuple:
    """Every output row must be visited so it gets zeroed: append a
    zero block (all callers' block buffers start zeroed) for each
    destination row with none, dst-sort, and compute first-visit flags.
    Returns (src, dst, first, order, n_missing) where `order` permutes
    the concatenation [original blocks, missing-row pads] into dst
    order — callers place block data at position order^-1[b]."""
    nB = len(blk_dst)
    present = np.zeros(mb, bool)
    if nB:
        present[blk_dst] = True
    missing = np.nonzero(~present)[0].astype(np.int32)
    dst = np.concatenate([blk_dst, missing])
    src = np.concatenate([blk_src, np.zeros(len(missing), np.int32)])
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    first = np.zeros(len(dst), np.int32)
    if len(dst):
        first[0] = 1
        first[1:] = (dst[1:] != dst[:-1]).astype(np.int32)
    return src, dst, first, order, len(missing)
