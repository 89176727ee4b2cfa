"""Pallas dense-panel matmul kernel for the hybrid layout (ops/bsr.py).

The dense part of the hybrid layout arrives as width-bucketed ROW
PANELS: a (R, 128, W*128) slab whose slot r is the concatenation of
dst-row rows[r]'s W operand blocks, plus the XLA-pregathered operand
(R, W*128, K).  The kernel is then a plain tiled batched matmul —
EVERY index map is static, which is the entire point:

  * a scalar-prefetch-dependent OUTPUT BlockSpec makes Mosaic write
    back + refetch the output block on every grid step (~750 ns/step
    measured at RMAT-20 — 10x over the einsum), because it cannot
    prove consecutive steps revisit the same block;
  * scalar-prefetch metadata lives in SMEM (~1 MB), capping grids at
    ~32K blocks (RMAT-20 has 239K) — "Program smem requirement 2.75M"
    fails to compile;
  * a (1, 128) row BlockSpec violates Mosaic's (8, 128) minimum block
    rule outright (the round-1 kernel never compiled).

With static maps the (128, S) output stays VMEM-resident across the
width tiles of a slot and is written exactly once — the per-slot
partials never spill to HBM, which is what the pure-XLA einsum path
pays (it materializes (R, 128, K) partials before the scatter-add).

Numerics: `split=True` treats the operand's last dim as hi/lo bf16
halves of an f32 vector ([:, :S] + [:, S:] after the matmul — exact to
~2^-16 relative); int8 panels (unweighted edge counts) upcast to the
operand dtype in VMEM, halving the HBM stream.

Reference analog: src/pr/partition.cu:279-372 / include/segmenting.h
(SM-cache-sized column blocking); here the panel row IS the MXU tile.
The sparse remainder stays on the XLA rowsel path (Mosaic has no
vectorized VMEM gather on this toolchain — see ops/pallas_spmv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128

# width-tile: blocks of operand columns processed per grid step.  Caps
# VMEM at ~(A 8x16KB int8 + xg 8x32KB bf16@K=128) x 2 buffers ~ 1.5 MB.
WIDTH_TILE = 8


def dense_panel_matmul(panel: jax.Array, xg: jax.Array, S: int, *,
                       split: bool = False,
                       interpret: bool = False) -> jax.Array:
    """(R, 128, S) f32 = panel[r] @ xg[r] per row slot.

    panel: (R, 128, W*128) int8|bf16|f32 — W operand blocks per slot.
    xg:    (R, W*128, K) operand rows, pregathered (K = 2S if split).
    """
    from jax.experimental import pallas as pl

    R, _, WC = panel.shape
    K = xg.shape[2]
    W = WC // LANES
    Wt = min(W, WIDTH_TILE)
    nT = W // Wt                     # widths are powers of two

    def kernel(a_ref, x_ref, y_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        a = a_ref[0]                                  # (128, Wt*128)
        xs = x_ref[0]                                 # (Wt*128, K)
        if a.dtype != xs.dtype:
            a = a.astype(xs.dtype)    # int8/bf16 HBM stream -> MXU dtype
        acc = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        if split:
            acc = acc[:, :S] + acc[:, S:]
        y_ref[0] += acc

    return pl.pallas_call(
        kernel,
        grid=(R, nT),
        in_specs=[
            pl.BlockSpec((1, LANES, Wt * LANES),
                         lambda r, t: (r, 0, t)),
            pl.BlockSpec((1, Wt * LANES, K), lambda r, t: (r, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES, S), lambda r, t: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, LANES, S), jnp.float32),
        interpret=interpret,
    )(panel, xg)
