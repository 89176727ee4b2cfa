"""Degree-bucketed ELL ("slab") layout — the TPU-resident graph format.

This replaces three reference mechanisms at once:
  * the warp/vector/scalar row mappings of Bell-Garland SpMV
    (src/spmv/{base,warp,vector}.cu) — here, rows are split into
    fixed-width virtual rows and grouped into power-of-two-width slabs, so
    every slab is a dense (W, R) tile the VPU sweeps without divergence;
  * the three-level load-balanced gather of *_lb variants
    (src/bfs/linear_lb.cu:24-182) — width bucketing IS the load balancing,
    done once at graph build time instead of per-kernel-launch scans;
  * CSR segmenting / propagation blocking (include/segmenting.h,
    include/prop_blocking.h) — slabs are laid out minor-dim=rows so XLA
    tiles them onto (8,128) vregs; per-slab partials merge by scatter-add,
    the analog of the reference's merge kernels (src/pr/partition.cu:279).

Layout: each bucket holds
  row_ids i32[R]      destination row of each virtual row (sentinel m = pad)
  cols    i32[W, R]   gather indices into x (sentinel n = pad slot)
  vals    f32[W, R]   edge values (optional; pad 0)
with R padded to a multiple of 128 (VPU lanes) so the minor dimension is
lane-aligned, and the reduction over W runs across sublanes (cheap).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from gardenia_tpu.core import types as T


class EllBucket(NamedTuple):
    row_ids: np.ndarray          # i32[R]
    cols: np.ndarray             # i32[W, R]
    vals: Optional[np.ndarray]   # f32[W, R] or None


class EllMatrix(NamedTuple):
    """A pytree of slabs. Static shape info lives in the array shapes."""
    buckets: Tuple[EllBucket, ...]


def build_ell(rowptr: np.ndarray,
              colidx: np.ndarray,
              weights: Optional[np.ndarray] = None,
              *,
              num_cols: int,
              width_cap: int = T.ELL_WIDTH_CAP,
              min_width: int = T.ELL_MIN_WIDTH,
              lane_align: int = T.LANES) -> EllMatrix:
    """Host-side blocking of a CSR matrix into degree-bucketed ELL slabs."""
    m = len(rowptr) - 1
    rowptr = np.asarray(rowptr, dtype=np.int64)
    deg = np.diff(rowptr)
    # --- split rows into virtual rows of width <= width_cap ---------------
    n_chunks = -(-deg // width_cap)          # ceil; deg 0 -> 0 chunks
    total = int(n_chunks.sum())
    if total == 0:
        return EllMatrix(buckets=())
    vrow_dst = np.repeat(np.arange(m, dtype=T.VID_DTYPE), n_chunks)
    row_first = np.repeat(rowptr[:-1], n_chunks)
    chunk_base = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    cc = np.arange(total, dtype=np.int64) - chunk_base
    starts = row_first + cc * width_cap
    widths = np.minimum(np.repeat(deg, n_chunks) - cc * width_cap,
                        width_cap).astype(np.int64)
    # --- bucket by padded width: exact narrow widths, pow2 beyond ---------
    pow2_w = 1 << np.ceil(np.log2(np.maximum(widths, 1))).astype(np.int64)
    pad_w = np.maximum(min_width,
                       np.where(widths <= T.ELL_EXACT_WIDTH, widths,
                                pow2_w))
    buckets = []
    col_sentinel = T.VID_DTYPE(num_cols)
    row_sentinel = T.VID_DTYPE(m)
    for w in np.unique(pad_w):
        sel = pad_w == w
        r = int(sel.sum())
        rp = T.round_up(r, lane_align)
        b_starts = starts[sel]
        b_widths = widths[sel]
        offs = np.arange(w, dtype=np.int64)
        gather_idx = b_starts[:, None] + offs[None, :]        # (r, w)
        valid = offs[None, :] < b_widths[:, None]
        np.clip(gather_idx, 0, len(colidx) - 1, out=gather_idx)
        cols = np.where(valid, colidx[gather_idx], col_sentinel)
        cols = np.concatenate(
            [cols, np.full((rp - r, w), col_sentinel, T.VID_DTYPE)], axis=0)
        row_ids = np.concatenate(
            [vrow_dst[sel], np.full(rp - r, row_sentinel, T.VID_DTYPE)])
        vals = None
        if weights is not None:
            vals = np.where(valid, weights[gather_idx], 0).astype(np.float32)
            vals = np.concatenate(
                [vals, np.zeros((rp - r, w), np.float32)], axis=0)
            vals = np.ascontiguousarray(vals.T)               # (w, rp)
        buckets.append(EllBucket(
            row_ids=np.ascontiguousarray(row_ids, dtype=T.VID_DTYPE),
            cols=np.ascontiguousarray(cols.T.astype(T.VID_DTYPE)),  # (w, rp)
            vals=vals))
    return EllMatrix(buckets=tuple(buckets))


def ell_stats(ell: EllMatrix) -> dict:
    """Padding efficiency diagnostics."""
    slots = sum(int(b.cols.size) for b in ell.buckets)
    rows = sum(int(b.row_ids.size) for b in ell.buckets)
    return {"buckets": len(ell.buckets), "virtual_rows": rows,
            "slots": slots}
