"""Pallas dense-block SpMV — the hand-fused MXU kernel for the hybrid
layout's dense part (ops/bsr.py).

One grid step per 128x128 block: the block streams HBM->VMEM through
the BlockSpec pipeline, the operand's 128-lane row arrives via a
scalar-prefetched index map (x row sb[i] — the PrefetchScalarGridSpec
gather pattern), and the output row db[i] stays VMEM-resident across
consecutive blocks of the same destination row (blocks are dst-sorted;
a prefetched first-visit flag zeroes it).  The f32 operand is split
into hi+lo bfloat16 halves inside the kernel so one pass over A yields
exact-to-2^-16 products.

This is the production Pallas path round 1 staged but could not land:
its (1, W) edge tiles violated Mosaic's (8, 128) minimum block shape,
while dense 128x128 blocks satisfy it natively.  Reference analog:
src/pr/partition.cu:279-372 / include/segmenting.h (SM-cache-sized
column blocking); here the block IS the MXU tile.

The sparse remainder stays on the XLA rowsel path (Mosaic has no
vectorized VMEM gather on this toolchain — see ops/pallas_spmv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def dense_block_spmv(blk: jax.Array, blk_src: jax.Array,
                     blk_dst: jax.Array, first: jax.Array,
                     x2d: jax.Array, mb: int, *,
                     interpret: bool = False) -> jax.Array:
    """y2d (mb,128) = sum of blk[b] @ x2d[blk_src[b]] into rows
    blk_dst[b].  blk (B,128,128) bf16|f32, blk_dst non-decreasing,
    first[b]=1 on the first block of each destination row.  Every
    destination row must be visited (callers pad with empty blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nB = blk.shape[0]

    def kernel(sb_ref, db_ref, first_ref, a_ref, x_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        x = x_ref[0].astype(jnp.float32)               # (128,)
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jnp.stack([xh, xl], axis=-1)              # (128, 2)
        a = a_ref[0]
        if a.dtype != jnp.bfloat16:
            xs = xs.astype(a.dtype)
        acc = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        y_ref[0, :] = y_ref[0, :] + acc[:, 0] + acc[:, 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # blk_src, blk_dst, first
        grid=(nB,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i, sb, db, fs: (i, 0, 0)),
            pl.BlockSpec((1, LANES), lambda i, sb, db, fs: (sb[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i, sb, db, fs: (db[i], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, LANES), jnp.float32),
        interpret=interpret,
    )(blk_src, blk_dst, first, blk, x2d)


def pad_blocks_for_pallas(blk_src: np.ndarray, blk_dst: np.ndarray,
                          mb: int, blk_dtype) -> tuple:
    """Every output row must be visited so it gets zeroed: compute the
    first-visit flags and the ids of destination rows with no blocks
    (callers append all-zero blocks for those)."""
    nB = len(blk_dst)
    present = np.zeros(mb, bool)
    if nB:
        present[blk_dst] = True
    missing = np.nonzero(~present)[0].astype(np.int32)
    dst = np.concatenate([blk_dst, missing])
    src = np.concatenate([blk_src, np.zeros(len(missing), np.int32)])
    pad_blk = np.zeros((len(missing), LANES, LANES), blk_dtype)
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    first = np.zeros(len(dst), np.int32)
    if len(dst):
        first[0] = 1
        first[1:] = (dst[1:] != dst[:-1]).astype(np.int32)
    return src, dst, first, order, pad_blk
