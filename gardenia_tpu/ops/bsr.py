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

Dense blocks are stored as ROW PANELS bucketed by per-destination-row
block count (the ELL idea lifted to 128x128-block granularity): a
width-W bucket holds R row slots as one (R, 128, W*128) panel plus a
(R, W) operand-block table and a (R,) destination-row list.  Rows with
more than MAX_PANEL_WIDTH blocks split across slots (outputs
scatter-ADD).  Every index map in the Pallas kernel is then STATIC —
measured on v5e, any scalar-prefetch-dependent OUTPUT BlockSpec costs
~750 ns/step in conservative writebacks, and per-block metadata in
SMEM caps grids at ~32K blocks; panels have neither problem.

Block locality requires hub clustering in the vertex ids — see
gardenia_tpu/core/relabel.py (degree-sorted relabeling), without which
scale-free graphs have ~1.45 edges per pair and the layout degenerates.

Numerics: dense-panel matmuls split the f32 operand into hi + lo
bfloat16 halves (extra RHS lanes, same A stream), so products are exact
to ~2^-16 relative — inside PageRank's 1e-4 L1 tolerance and the SpMV
test tolerances; weighted (f32-panel) matmuls keep A exact and split
only the operand.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128
LANE_BITS = 7

MAX_PANEL_WIDTH = 32     # blocks per row slot; wider rows split slots

# blocks per panel array: bounds the batched apply's per-panel operand
# materialization (xg = blocks x 128 x K; at K=256 bf16 a 225K-block
# panel wants 14.7 GB > HBM — the remote compiler aborts)
MAX_PANEL_BLOCKS = 49152


@jax.tree_util.register_pytree_node_class
class DensePanel:
    """One width bucket of the dense layout.  `width` (static) is the
    padded blocks-per-slot; panel[r, i, w*128 + j] holds
    A[rows[r]*128 + i, src[r, w]*128 + j] (zero-padded slots)."""

    def __init__(self, panel, src, rows, width: int):
        self.panel = panel    # int8|bf16|f32 [R, 128, width*128]
        self.src = src        # i32[R, width] operand block column
        self.rows = rows      # i32[R] destination block row (may repeat)
        self.width = int(width)

    def tree_flatten(self):
        return (self.panel, self.src, self.rows), self.width

    @classmethod
    def tree_unflatten(cls, width, children):
        return cls(*children, width=width)


@jax.tree_util.register_pytree_node_class
class HybridMatrix:
    """Device (or host) arrays of the hybrid layout: dense row panels
    plus an ELL-slab + dst-sorted-COO remainder (either may be empty).

    scale: CONSTANT-VALUE factorization (round 3) — a matrix whose
    weights are all w0 stores the unweighted int8 count layout (1/4 the
    A stream of f32 panels, threshold 16 instead of 64) and consumers
    multiply y by `scale` once; value-compressed sparse matrices
    (binary/affinity/uniform-weight) are common in the reference's
    SpMV workloads (src/spmv/main.cc synthesizes uniform weights).
    scale is STATIC pytree aux data, so the `scale == 1.0` no-op check
    stays a compile-time branch under jit."""

    def __init__(self, dense, rem, rem_dst, rem_src, rem_w,
                 scale: float = 1.0):
        self.dense = tuple(dense)   # DensePanel width buckets
        self.rem = rem              # ops.ell.EllMatrix over remainder
        self.rem_dst = rem_dst      # i32[R] remainder dst, NON-DECREASING
        self.rem_src = rem_src      # i32[R] remainder src
        self.rem_w = rem_w          # f32[R] weights, or None (unweighted)
        self.scale = float(scale)

    def tree_flatten(self):
        return ((self.dense, self.rem, self.rem_dst, self.rem_src,
                 self.rem_w), self.scale)

    @classmethod
    def tree_unflatten(cls, scale, children):
        return cls(*children, scale=scale)

    def _replace(self, **kw):
        """NamedTuple-compatible copy-with-overrides."""
        fields = dict(dense=self.dense, rem=self.rem,
                      rem_dst=self.rem_dst, rem_src=self.rem_src,
                      rem_w=self.rem_w, scale=self.scale)
        fields.update(kw)
        return HybridMatrix(**fields)

    @property
    def num_blocks(self) -> int:
        return sum(p.panel.shape[0] * p.width for p in self.dense)


# Measured on v5e (PERFORMANCE.md): panel matmuls with static index
# maps stream near HBM bandwidth on both lowerings; the Pallas kernel
# additionally keeps the (128, S) output resident across width tiles
# instead of spilling per-panel partials.  The XLA einsum paths also
# serve CPU tests and virtual meshes.
USE_PALLAS_DENSE = False
USE_PALLAS_BATCHED = True


def _pallas_ok() -> bool:
    from gardenia_tpu.ops import rowsel
    return rowsel.enabled()     # same TPU-backend policy as the gathers


def _pow2ceil(x: np.ndarray) -> np.ndarray:
    out = np.ones_like(x)
    while True:
        need = out < x
        if not need.any():
            return out
        out[need] *= 2


def build_hybrid(rowptr: np.ndarray,
                 colidx: np.ndarray,
                 weights: Optional[np.ndarray] = None,
                 *,
                 num_cols: int,
                 dense_threshold: int = 16,
                 block_dtype: str = "auto",
                 factor_scale: bool = True) -> HybridMatrix:
    """Host-side grouping of a CSR matrix into the hybrid layout.

    weights None -> unweighted; dense panels hold small-int edge counts
    and default to int8 storage (half the HBM stream of bf16; consumers
    upcast at use — the MXU still runs bf16).  Weighted matrices store
    f32 panels.  block_dtype: 'auto' | 'int8' | 'bfloat16' | 'float32'.
    Duplicate edges accumulate additively in both layouts.
    """
    from gardenia_tpu.core import build as _build
    from gardenia_tpu.ops.ell import build_ell

    num_rows = len(rowptr) - 1
    nnz = len(colidx)
    rowptr = np.asarray(rowptr, np.int64)
    dst = np.repeat(np.arange(num_rows, dtype=np.int64), np.diff(rowptr))
    src = np.asarray(colidx, np.int64)
    # constant-value factorization: A = w0 * structure rides the
    # unweighted int8 count layout (1/4 the f32 A stream) and consumers
    # scale y once.  Uniform weights are the reference SpMV driver's
    # own synthesis (src/spmv/main.cc rand weights aside, the verifier
    # contract is value-agnostic).
    # factor_scale=False keeps uniform weights in the panels (the
    # stacked multichip partition needs ONE static scale across shards)
    scale = 1.0
    if factor_scale and weights is not None and nnz:
        w0 = np.asarray(weights).flat[0]
        if w0 != 0 and np.all(weights == w0):
            scale = float(w0)
            weights = None
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
        # always TRY int8 — the value guard below demotes weighted
        # panels whose accumulated cells don't fit (int-valued edge
        # weights, the .gr/generator convention, ride the same 1/4
        # -traffic stream as unweighted counts)
        blk_dtype = np.dtype("int8")
    else:
        blk_dtype = np.dtype(block_dtype)
    try:
        import ml_dtypes  # noqa: F401
    except Exception:                                # pragma: no cover
        blk_dtype = np.float32

    # ---- dense panels ------------------------------------------------------
    nB = int(dense_sel.sum())
    gid = np.searchsorted(uniq, key_s)               # group of each edge
    edge_dense = dense_sel[gid]
    if nB:
        dkeys = uniq[dense_sel]
        blk_dst = (dkeys // sb_span).astype(np.int64)  # non-decreasing
        blk_src = (dkeys % sb_span).astype(np.int32)

        # slot assignment: blocks of one dst row are consecutive; rows
        # wider than MAX_PANEL_WIDTH split into multiple slots
        row_change = np.empty(nB, bool)
        row_change[0] = True
        np.not_equal(blk_dst[1:], blk_dst[:-1], out=row_change[1:])
        row_start_idx = np.flatnonzero(row_change)
        row_of_block = np.cumsum(row_change) - 1
        w_global = np.arange(nB, dtype=np.int64) \
            - row_start_idx[row_of_block]
        slot_change = row_change | (w_global % MAX_PANEL_WIDTH == 0)
        slot_of_block = np.cumsum(slot_change) - 1     # global slot id
        w_in_slot = (w_global % MAX_PANEL_WIDTH).astype(np.int64)
        slot_starts = np.flatnonzero(slot_change)
        slot_cnt = np.diff(np.r_[slot_starts, nB])
        slot_row = blk_dst[slot_starts].astype(np.int32)
        slot_width = _pow2ceil(slot_cnt.astype(np.int64))

        # dedup cells once, keyed (block, dr, sr)
        bofe = np.searchsorted(dkeys, key_s[edge_dense])
        eo = order[edge_dense]
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
            if (vals == np.round(vals)).all() and \
                    np.abs(vals).max(initial=0) <= 256:
                # integers up to 256 are exact in bfloat16 (2 B/entry,
                # half the f32 stream) — covers 1..255 edge weights
                try:
                    import ml_dtypes
                    blk_dtype = np.dtype(ml_dtypes.bfloat16)
                except Exception:            # pragma: no cover
                    blk_dtype = np.dtype("float32")
            else:
                # f32: counts > 256 / fractional values must stay
                # exact (bf16 rounds 257 to 256)
                blk_dtype = np.dtype("float32")
        cell_b = (gi[starts] // cells).astype(np.int64)
        cell_loc = gi[starts] % cells                  # dr*128 + sr
        cell_dr = cell_loc // LANES
        cell_sr = cell_loc % LANES

        panels = []
        n_slots_total = len(slot_cnt)
        slot_pos = np.full(n_slots_total, -1, np.int64)
        for width in np.unique(slot_width):
            idxs = np.flatnonzero(slot_width == width)
            spp = max(1, MAX_PANEL_BLOCKS // int(width))
            for g0 in range(0, len(idxs), spp):
                sub = idxs[g0:g0 + spp]
                n_slots = len(sub)
                slot_pos[:] = -1
                slot_pos[sub] = np.arange(n_slots)
                bpos = slot_pos[slot_of_block]
                bsel = bpos >= 0
                src_tbl = np.zeros((n_slots, width), np.int32)
                src_tbl[bpos[bsel], w_in_slot[bsel]] = blk_src[bsel]
                rows_tbl = slot_row[sub]
                panel = np.zeros((n_slots, LANES, width * LANES),
                                 blk_dtype)
                csel = bsel[cell_b]
                cb = cell_b[csel]
                flat = (bpos[cb] * LANES + cell_dr[csel]) \
                    * (width * LANES) \
                    + w_in_slot[cb] * LANES + cell_sr[csel]
                panel.reshape(-1)[flat] = vals[csel].astype(blk_dtype)
                panels.append(DensePanel(panel, src_tbl, rows_tbl,
                                         int(width)))
        dense = tuple(panels)
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
                        rw if weights is not None else None, scale)


def _pad_operand(x: jax.Array, num_cols: int) -> jax.Array:
    qx = (num_cols + LANES - 1) // LANES
    flat = jnp.zeros((qx * LANES,), jnp.float32)
    return flat.at[:num_cols].set(x.astype(jnp.float32)).reshape(qx, LANES)


def _split_bf16(flat: jax.Array):
    """f32 -> (hi, lo) bf16 halves with hi + lo == x to ~2^-16 relative.

    hi is the mantissa TRUNCATION of x through integer bit masking
    (exactly bf16-representable), lo = bf16(x - hi).  The masking
    matters: the obvious formulation `lo = (x - f32(bf16(x)))
    .astype(bf16)` MISCOMPILES on the axon toolchain — under
    xla_allow_excess_precision the convert round-trip folds into bf16
    arithmetic and lo materializes as ZERO (measured: chesapeake PR
    stalled at 6.4e-4 L1 with every dense product silently
    single-bf16).  Here hi_f carries no bf16 provenance (it comes from
    a bitcast), so the subtraction is honest f32 and lo survives."""
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        bits & np.uint32(0xFFFF0000), jnp.float32)
    return hi_f.astype(jnp.bfloat16), (flat - hi_f).astype(jnp.bfloat16)


# XLA:TPU does not guarantee f32-faithful math under the DEFAULT
# matmul precision: measured on v5e/axon, a single (1,128,128)@(128,2)
# split-bf16 einsum errs 7.7e-3 abs (the f32 accumulation type is not
# honored for small/odd shapes), and f32@f32 matmuls default to lossy
# bf16 MXU passes unlike CPU's true f32 — chesapeake PR stalled at
# 6.4e-4 L1 until the small-dense branch forced f32 operands at
# Precision.HIGHEST.  Policy:
#   * small dense parts (< SMALL_DENSE_F32_BLOCKS blocks, XLA path):
#     plain f32 operand (no split), Precision.HIGHEST — the traffic
#     penalty is irrelevant at that size;
#   * f32 (weighted) panels at any size: Precision.HIGHEST — weighted
#     products must not silently drop to one bf16 pass; the dense part
#     is bandwidth-dominated so the extra MXU passes hide;
#   * large int8/bf16 panels: split-bf16 operand, DEFAULT precision —
#     bf16 x bf16 with f32 accumulation is empirically exact at these
#     shapes (RMAT-20 PR converges to 1e-4 L1, matching CPU).
# The Pallas kernel is unaffected (Mosaic jnp.dot with
# preferred_element_type=f32 accumulates in f32).
SMALL_DENSE_F32_BLOCKS = 4096


def _small_dense(dense: Tuple[DensePanel, ...], use_pallas: bool) -> bool:
    """True when the XLA path should run plain f32 at HIGHEST."""
    return not use_pallas and _pallas_ok() and \
        sum(p.src.size for p in dense) < SMALL_DENSE_F32_BLOCKS


def _dense_apply(dense: Tuple[DensePanel, ...], x3d: jax.Array, mb: int,
                 S: int, split: bool, use_pallas: bool) -> jax.Array:
    """sum over panels of panel @ x rows, assembled into (mb, 128, S)
    f32 by row scatter-add (split slots of one row may repeat)."""
    y3d = jnp.zeros((mb, LANES, S), jnp.float32)
    force_f32 = _small_dense(dense, use_pallas)
    for p in dense:
        R, W = p.src.shape
        a = p.panel
        xg = x3d[p.src]                                # (R, W, 128, K)
        K = x3d.shape[2]
        xg = xg.reshape(R, W * LANES, K)
        if use_pallas:
            from gardenia_tpu.ops.pallas_bsr import dense_panel_matmul
            part = dense_panel_matmul(a, xg, S, split=split)
        else:
            precision = None
            if force_f32:
                a = a.astype(jnp.float32)
            elif a.dtype == jnp.int8:
                a = a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32:
                xg = xg.astype(jnp.float32)
                precision = jax.lax.Precision.HIGHEST
            part = jnp.einsum("riw,rwk->rik", a, xg,
                              precision=precision,
                              preferred_element_type=jnp.float32)
            if split:
                part = part[..., :S] + part[..., S:]
        y3d = y3d.at[p.rows].add(part)
    return y3d


def spmv_hybrid(hyb: HybridMatrix, x: jax.Array, *, num_rows: int,
                init: Optional[jax.Array] = None,
                use_pallas: Optional[bool] = None,
                exact: bool = True) -> jax.Array:
    """y = A x (plus-times, f32) over the hybrid layout.

    Equivalent to spmv_ell(..., F32_PLUS_TIMES) on the same matrix; this
    is the bandwidth-optimal production path for PR/SpMV-class kernels.
    use_pallas selects the hand-fused panel kernel (ops/pallas_bsr.py,
    S=1) over the XLA einsum lowering (None -> module default).
    exact=False runs the dense part with a single bf16 operand pass
    (half the work of the hi/lo split) — safe when only sign/zero or
    ~3-digit accuracy is consumed, e.g. BFS frontier counting sweeps.
    """
    if use_pallas is None:
        use_pallas = USE_PALLAS_DENSE and _pallas_ok()
    num_cols = int(x.shape[0])
    x2d = _pad_operand(x, num_cols)
    mb = (num_rows + LANES - 1) // LANES

    if hyb.dense:
        qx = x2d.shape[0]
        f32_panels = hyb.dense[0].panel.dtype == jnp.float32
        flat = x2d.reshape(-1, 1)
        if f32_panels or _small_dense(hyb.dense, use_pallas):
            # plain f32 operand (K=1): exact and half the work of a
            # split — taken by weighted panels and by the small-dense
            # accuracy branch (which upcasts A to f32 too)
            x3d = flat.reshape(qx, LANES, 1)
            split = False
        elif not exact:
            x3d = flat.astype(jnp.bfloat16).reshape(qx, LANES, 1)
            split = False
        else:
            hi, lo = _split_bf16(flat)
            x3d = jnp.concatenate([hi, lo], axis=1).reshape(qx, LANES, 2)
            split = True
        y2d = _dense_apply(hyb.dense, x3d, mb, 1, split,
                           use_pallas)[..., 0]
        y = y2d.reshape(-1)[:num_rows]
    else:
        y = jnp.zeros((num_rows,), jnp.float32)

    if hyb.rem.buckets:
        from gardenia_tpu.ops.semiring import F32_PLUS_TIMES
        from gardenia_tpu.ops.spmv import spmv_ell
        y = spmv_ell(hyb.rem, x, semiring=F32_PLUS_TIMES,
                     num_rows=num_rows, init=y)
    if hyb.scale != 1.0:       # constant-value factorization (static)
        y = y * jnp.float32(hyb.scale)
    return y if init is None else y + init.astype(jnp.float32)


def spmv_hybrid_min_select(hyb: HybridMatrix, x: jax.Array, *,
                           num_rows: int, sentinel: int) -> jax.Array:
    """y[i] = min over A[i,j] != 0 of x[j] (the min-select semiring —
    CC label propagation) over the hybrid layout; entries with no
    neighbors return `sentinel`.

    Dense panels run an XLA masked reduce-min: where(panel != 0, x, S)
    is a fused INPUT of the reduction, so the (R, 128, W*128) broadcast
    never materializes and the pass streams the int8 panels at HBM
    bandwidth (measured round 4: correct and ~floor-cost at RMAT-16 —
    unlike the one-hot-tile failure, which built the operand itself
    from broadcast compares, and unlike the retired Pallas min-select
    kernel which lost 6x to ELL at RMAT-16).  Works on every backend
    (CPU tests included)."""
    from gardenia_tpu.ops.semiring import I32_MIN_SELECT2
    from gardenia_tpu.ops.spmv import spmv_ell

    num_cols = int(x.shape[0])
    qx = (num_cols + LANES - 1) // LANES
    mb = (num_rows + LANES - 1) // LANES
    snt = jnp.int32(sentinel)
    flat = jnp.full((qx * LANES,), snt)
    x2d = flat.at[:num_cols].set(x.astype(jnp.int32)) \
        .reshape(qx, LANES)
    y2d = jnp.full((mb, LANES), snt)
    for p in hyb.dense:
        R, W = p.src.shape
        xg = x2d[p.src].reshape(R, 1, W * LANES)
        part = jnp.min(jnp.where(p.panel != 0, xg, snt), axis=2)
        y2d = y2d.at[p.rows].min(part)
    y = y2d.reshape(-1)[:num_rows]
    if hyb.rem.buckets:
        y = spmv_ell(hyb.rem, x.astype(jnp.int32),
                     semiring=I32_MIN_SELECT2, num_rows=num_rows,
                     init=y)
    return y


def spmv_hybrid_min_plus(hyb: HybridMatrix, x: jax.Array, *,
                         num_rows: int, sentinel: int) -> jax.Array:
    """y[i] = min over A[i,j] != 0 of (x[j] + w[i,j]) — int32 min-plus
    (SSSP relaxation, reference src/sssp/omp_base.cc:45-58) over the
    WEIGHTED hybrid layout.  Same masked-reduce-min structure as
    spmv_hybrid_min_select: where(panel != 0, x + w, S) fuses into the
    reduction input, so the int8/bf16/f32 weight panels stream at HBM
    bandwidth and the (R, 128, W*128) broadcast never materializes.

    Contract: edges DEDUPED (dense cells accumulate duplicates
    additively — min-plus would see summed weights) and weights
    positive integral (cell value 0 means "no edge"; the reference's
    generated weights are 1..64, common.h).  A constant-value
    factorization (hyb.scale, integral) folds back as a multiplier on
    the stored counts."""
    from gardenia_tpu.ops.semiring import I32_MIN_PLUS, I32_MIN_SELECT2
    from gardenia_tpu.ops.spmv import spmv_ell

    num_cols = int(x.shape[0])
    qx = (num_cols + LANES - 1) // LANES
    mb = (num_rows + LANES - 1) // LANES
    snt = jnp.int32(sentinel)
    scale = int(round(hyb.scale))
    assert scale == hyb.scale, \
        "min-plus needs integral weights (fractional scale factored)"
    flat = jnp.full((qx * LANES,), snt)
    x2d = flat.at[:num_cols].set(x.astype(jnp.int32)).reshape(qx, LANES)
    y2d = jnp.full((mb, LANES), snt)
    for p in hyb.dense:
        R, W = p.src.shape
        xg = x2d[p.src].reshape(R, 1, W * LANES)
        w = p.panel.astype(jnp.int32)
        if scale != 1:
            w = w * jnp.int32(scale)
        part = jnp.min(jnp.where(p.panel != 0, xg + w, snt), axis=2)
        y2d = y2d.at[p.rows].min(part)
    y = y2d.reshape(-1)[:num_rows]
    if hyb.rem.buckets:
        if hyb.rem.buckets[0].vals is not None:
            y = spmv_ell(hyb.rem, x.astype(jnp.int32),
                         semiring=I32_MIN_PLUS, num_rows=num_rows,
                         init=y)
        else:
            # scale-factored uniform weights: min_j(x[j] + c) =
            # min_j(x[j]) + c on rows with remainder neighbors
            imax = jnp.int32(np.iinfo(np.int32).max)
            ysel = spmv_ell(hyb.rem, x.astype(jnp.int32),
                            semiring=I32_MIN_SELECT2, num_rows=num_rows)
            y = jnp.minimum(y, jnp.where(ysel == imax, snt,
                                         ysel + jnp.int32(scale)))
    return y


def _pad_operand_batched(x2d: jax.Array, num_cols: int,
                         exact: bool) -> jax.Array:
    """(n, S) operand -> (nb, 128, K) block table for the dense panels.
    exact -> K = 2S bf16 hi/lo halves ([:, :S] hi, [:, S:] lo);
    otherwise K = S in bf16 (callers pick this when products need only
    sign/zero fidelity, e.g. frontier counts)."""
    n, S = x2d.shape
    qx = (num_cols + LANES - 1) // LANES
    x = x2d.astype(jnp.float32)
    flat = jnp.zeros((qx * LANES, S), jnp.float32).at[:num_cols].set(x)
    if exact:
        hi, lo = _split_bf16(flat)
        flat = jnp.concatenate([hi, lo], axis=1)       # (rows, 2S)
        return flat.reshape(qx, LANES, 2 * S)
    return flat.astype(jnp.bfloat16).reshape(qx, LANES, S)


def spmv_hybrid_batched(hyb: HybridMatrix, x2d: jax.Array, *,
                        num_rows: int, exact: bool = True,
                        use_pallas: Optional[bool] = None) -> jax.Array:
    """Multi-vector plus-times SpMV over the hybrid layout:
    y[i, s] = sum_j A[i, j] x2d[j, s] for S problems in the lane dim.

    One pass over the dense panels serves all S problems — the MXU runs
    (128, W*128)@(W*128, S) per row slot, so per-problem A traffic is
    1/S of the single-vector case.  This is the production multi-source
    path (MS-BFS, batched Brandes BC, multi-vector SpMV) replacing
    per-edge whole-row gathers (ops/spmv.spmv_batched) on the dense
    part; the sparse remainder still pays the per-edge row gather,
    which IS 100%-useful traffic at S lanes.

    exact=False computes dense products in bf16 (single pass, half the
    operand traffic) — safe when only zero/nonzero or ~3-digit accuracy
    is consumed (BFS frontier counts); exact=True splits f32 into hi+lo
    bf16 halves (~2^-16 relative, exact for 0/1 A and small-int x).
    """
    if use_pallas is None:
        use_pallas = USE_PALLAS_BATCHED and _pallas_ok()
    n, S = x2d.shape
    mb = (num_rows + LANES - 1) // LANES

    if hyb.dense:
        f32_panels = hyb.dense[0].panel.dtype == jnp.float32
        if f32_panels or _small_dense(hyb.dense, use_pallas):
            # plain f32 operand, K = S — exact and half the
            # traffic/FLOPs of a split operand (weighted panels, and
            # the small-dense accuracy branch which upcasts A too)
            qx = (n + LANES - 1) // LANES
            flat = jnp.zeros((qx * LANES, S), jnp.float32) \
                .at[:n].set(x2d.astype(jnp.float32))
            x3d = flat.reshape(qx, LANES, S)
            split = False
        else:
            x3d = _pad_operand_batched(x2d, n, exact=exact)
            split = x3d.shape[2] == 2 * S
        y3d = _dense_apply(hyb.dense, x3d, mb, S, split, use_pallas)
        y = y3d.reshape(-1, S)[:num_rows]
    else:
        y = jnp.zeros((num_rows, S), jnp.float32)

    if hyb.rem_dst.shape[0]:
        # per-edge whole-row gather + sorted segment-sum.  Measured
        # ALTERNATIVES both lose at RMAT-20 S=128: ELL-slab reduction
        # (whole-row gathers + dense width reduce + per-row scatter)
        # = 165 ms vs 105 ms here — the (S,)-row gather's ~14 ns/row
        # dispatch cost dominates both forms and slabs add ~30% pad
        # slots.  Only a vectorized in-kernel gather would move this.
        gathered = x2d.astype(jnp.float32)[hyb.rem_src]   # (R, S) rows
        if hyb.rem_w is not None:
            gathered = gathered * hyb.rem_w[:, None]
        y = y + jax.ops.segment_sum(gathered, hyb.rem_dst,
                                    num_segments=num_rows,
                                    indices_are_sorted=True)
    if hyb.scale != 1.0:       # constant-value factorization (static)
        y = y * jnp.float32(hyb.scale)
    return y
