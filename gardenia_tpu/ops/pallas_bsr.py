"""Pallas dense-block SpMV kernels for the hybrid layout (ops/bsr.py).

Two hand-fused MXU kernels over the dst-sorted 128x128 block stream:

  dense_block_spmv          — single operand vector.  The operand table
      x2d (mb_x, 128) and the output y2d (mb, 128) live WHOLE in VMEM
      (4 MB each at |V|=1M — v5e VMEM is ~16 MB) while the A blocks
      stream HBM->VMEM through the BlockSpec pipeline; per block the
      kernel reads x row sb[i] and accumulates into y row db[i] with
      dynamic sublane indexing.  This sidesteps Mosaic's (8, 128)
      minimum block rule that a (1, 128) row BlockSpec violates (the
      round-1 kernel never compiled for exactly that reason).
  dense_block_spmv_batched  — S operand vectors in the lane dimension
      (the multi-source BFS/BC/batched-SpMV production path).  Blocks
      (1, 128, S) are legal natively; the operand row arrives via a
      scalar-prefetched index map (the PrefetchScalarGridSpec gather
      pattern) and the output row db[i] stays VMEM-resident across
      consecutive blocks of the same destination row (blocks are
      dst-sorted; a prefetched first-visit flag zeroes it).  One pass
      over A serves all S problems — the MXU runs (128,128)@(128,S).

The f32 operand is split into hi+lo bfloat16 halves (outside the
batched kernel, inside the single-vector one) so products against the
bf16 A are exact to ~2^-16 relative.  Reference analog:
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

# VMEM budget for the single-vector kernel's resident x + y tables
# (v5e ~16 MB/core; leave room for the double-buffered A stream)
_RESIDENT_BYTES_MAX = 12 * (1 << 20)


def dense_block_spmv(blk: jax.Array, blk_src: jax.Array,
                     blk_dst: jax.Array, first: jax.Array,
                     x2d: jax.Array, mb: int, *,
                     interpret: bool = False) -> jax.Array:
    """y2d (mb,128) = sum of blk[b] @ x2d[blk_src[b]] into rows
    blk_dst[b].  blk (B,128,128) bf16|f32; x2d (mb_x,128) f32.  x2d and
    y2d are VMEM-resident so block order is unconstrained (`first` is
    accepted for interface parity but unused)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nB = blk.shape[0]
    mb_x = x2d.shape[0]
    if (mb + mb_x) * LANES * 4 > _RESIDENT_BYTES_MAX:
        raise ValueError("operand+output exceed the VMEM-resident budget; "
                         "use the XLA einsum path (ops/bsr.spmv_hybrid)")

    def kernel(sb_ref, db_ref, a_ref, x_ref, y_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        sb = sb_ref[i]
        db = db_ref[i]
        x = x_ref[pl.ds(sb, 1), :].astype(jnp.float32)  # (1, 128)
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        a = a_ref[0]                                    # (128, 128)
        if a.dtype == jnp.int8:
            a = a.astype(jnp.bfloat16)    # int8 HBM stream, bf16 MXU
        if a.dtype == jnp.float32:
            acc = jnp.dot(a, x.reshape(LANES, 1),
                          preferred_element_type=jnp.float32)
        else:
            xs = jnp.concatenate([xh, xl], axis=0)      # (2, 128)
            acc = jnp.dot(a, xs.T.astype(a.dtype),
                          preferred_element_type=jnp.float32)  # (128, 2)
            acc = jnp.sum(acc, axis=1, keepdims=True)
        y_ref[pl.ds(db, 1), :] += acc.reshape(1, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # blk_src, blk_dst
        grid=(nB,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i, sb, db: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x2d resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # y2d resident
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, LANES), jnp.float32),
        interpret=interpret,
    )(blk_src, blk_dst, blk, x2d)


def dense_block_spmv_batched(blk: jax.Array, blk_src: jax.Array,
                             blk_dst: jax.Array, first: jax.Array,
                             x3d: jax.Array, mb: int, *,
                             split: bool = False,
                             interpret: bool = False) -> jax.Array:
    """y3d (mb,128,S) = sum of blk[b] @ x3d[blk_src[b]] into block rows
    blk_dst[b].  blk (B,128,128) bf16|f32, dst-sorted with every
    destination row visited (ops/bsr pads) and first[b]=1 on each row's
    first block; x3d (mb_x,128,K).

    split=False: K == S, plain product (bf16 operand is the caller's
                 accuracy choice).
    split=True:  K == 2*S, hi/lo split-f32 operand — halves [0:S] and
                 [S:2S] are summed after the matmul, so bf16 A x bf16
                 halves is exact to ~2^-16 relative (exact for 0/1
                 adjacency).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nB = blk.shape[0]
    K = x3d.shape[2]
    S = K // 2 if split else K

    def kernel(sb_ref, db_ref, first_ref, a_ref, x_ref, y_ref):
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
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mb, LANES, S), jnp.float32),
        interpret=interpret,
    )(blk_src, blk_dst, first, blk, x3d)


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
