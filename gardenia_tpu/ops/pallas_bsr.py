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
The sparse remainder stays on the XLA rowsel path: two Mosaic
limits measured on this toolchain rule out an in-kernel gather —
tpu.DynamicGatherOp (jnp.take_along_axis inside kernels) fails to
lower, and per-tile (1, W) edge blocks violate the (8, 128) minimum
block-shape rule (the round-2 tiled-SpMV experiment that hit both
was culled in round 3; the panel layout here is its successor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128

# width-tile: blocks of operand columns processed per grid step.  Caps
# VMEM at ~(A 8x16KB int8 + xg 8x32KB bf16@K=128) x 2 buffers ~ 1.5 MB.
WIDTH_TILE = 8


def available() -> bool:
    """True when pallas_call will actually lower here: a real TPU
    backend, or the pltpu.force_tpu_interpret_mode() testing context.
    Callers use this to fall back to XLA paths instead of letting
    pallas_call die with an opaque unsupported-backend error."""
    from gardenia_tpu.ops import rowsel
    if rowsel.enabled():
        return True
    try:
        from jax._src import config as _jcfg
        return _jcfg.pallas_tpu_interpret_mode_context_manager.value \
            is not None
    except Exception:                                # pragma: no cover
        return False


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


def dense_panel_minselect(panel: jax.Array, xg: jax.Array,
                          sentinel: int, *,
                          interpret: bool = False) -> jax.Array:
    """(R, 128, 1) i32: y[r, i] = min over panel columns j with
    A[r, i, j] != 0 of xg[r, j] — the min-select semiring (CC label
    propagation, ops/semiring.I32_MIN_SELECT2) over the dense panels.

    The MXU serves only plus-times; min rides the VPU as a masked
    broadcast + lane reduction that stays in VMEM — the equivalent
    XLA lowering materializes the (R, 128, W*128) broadcast compare
    in HBM (the measured one-hot-tile failure), so this path is
    Pallas-only and callers fall back to the ELL slabs off-TPU.

    panel: (R, 128, W*128) any dtype, zero = absent edge.
    xg:    (R, W*128, 1) i32 operand labels (pad slots may hold
           anything — absent columns are masked by the panel).
    """
    from jax.experimental import pallas as pl

    R, _, WC = panel.shape
    W = WC // LANES
    Wt = min(W, WIDTH_TILE)
    nT = W // Wt
    snt = int(sentinel)    # python literal — traced captures are
    #                        rejected by pallas_call

    # 8 row slots per grid step: a (1, 128, 1) output block forced a
    # 1-lane layout (measured ~6x slower than the ELL path at RMAT-16);
    # (8, 128) output blocks are the legal Mosaic tile
    SLOTS = 8
    R8 = ((R + SLOTS - 1) // SLOTS) * SLOTS
    if R8 != R:
        panel = jnp.concatenate(
            [panel, jnp.zeros((R8 - R,) + panel.shape[1:],
                              panel.dtype)], axis=0)
        xg = jnp.concatenate(
            [xg, jnp.zeros((R8 - R,) + xg.shape[1:], xg.dtype)],
            axis=0)

    def kernel(a_ref, x_ref, y_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            y_ref[...] = jnp.full_like(y_ref, snt)

        # one 128-column sub-block at a time: the single-shot masked
        # broadcast allocated a 512 KB+ i32 stack temp per step, which
        # ran VMEM out of stack space once the fused CC while_loop held
        # several width buckets' kernels; (8, 128, 128) temps keep the
        # step bounded
        acc = y_ref[...]
        for wl in range(Wt):
            aw = a_ref[:, :, wl * LANES:(wl + 1) * LANES]
            xw = x_ref[:, wl * LANES:(wl + 1) * LANES, 0]
            cand = jnp.where(aw != 0, xw[:, None, :], jnp.int32(snt))
            acc = jnp.minimum(acc, jnp.min(cand, axis=2))
        y_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        grid=(R8 // SLOTS, nT),
        in_specs=[
            pl.BlockSpec((SLOTS, LANES, Wt * LANES),
                         lambda r, t: (r, 0, t)),
            pl.BlockSpec((SLOTS, Wt * LANES, 1), lambda r, t: (r, t, 0)),
        ],
        out_specs=pl.BlockSpec((SLOTS, LANES), lambda r, t: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((R8, LANES), jnp.int32),
        interpret=interpret,
    )(panel, xg)
    return out[:R, :, None]
