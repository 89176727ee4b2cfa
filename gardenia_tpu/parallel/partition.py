"""1D row-range partitioning of a graph into per-shard ELL slabs.

The TPU scale-out analog of the reference's CSR segmenting
(include/segmenting.h:31-184): there, the graph is split into column-range
subgraphs sized to L2/scratchpad with a partial-sum merge; here, rows
(destination vertices) are split into contiguous ranges — one per chip —
each chip owns the in-edges of its range, the operand vector is all-gathered
over ICI, and partial results stay resident (no merge needed because the
partition is by output row).

Arrays are stacked with a leading shard axis so they drop straight into
shard_map with in_specs=P('v').
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops.ell import build_ell


class ShardedEll(NamedTuple):
    """Per-bucket arrays stacked over shards.

    row_ids: i32[n, R]     LOCAL row index within the shard (sentinel =
                            rows_per_shard, dropped by scatter)
    cols:    i32[n, W, R]  GLOBAL column index (sentinel = num_cols)
    vals:    f32[n, W, R]  optional
    """
    buckets: Tuple[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]], ...]


def partition_ell_1d(g, n_shards: int, *, reverse: bool = False,
                     weighted: bool = False,
                     width_cap: int = T.ELL_WIDTH_CAP
                     ) -> Tuple[ShardedEll, int]:
    """Split g's rows into n contiguous ranges and ELL-block each range.

    Returns (sharded_ell, rows_per_shard); global row r lives on shard
    r // rows_per_shard at local index r % rows_per_shard.
    """
    rp = g.in_rowptr if reverse else g.rowptr
    ci = g.in_colidx if reverse else g.colidx
    w = (g.in_weights if reverse else g.weights) if weighted else None
    if weighted and w is None:
        w = np.ones(len(ci), np.float32)
    m = g.m
    mb = T.round_up(max(1, -(-m // n_shards)), T.SUBLANES)
    shard_mats = []
    for s in range(n_shards):
        lo, hi = min(s * mb, m), min((s + 1) * mb, m)
        sub_rp = rp[lo:hi + 1] - rp[lo]
        sub_ci = ci[rp[lo]:rp[hi]]
        sub_w = None if w is None else np.asarray(
            w[rp[lo]:rp[hi]], np.float32)
        if hi <= lo:
            sub_rp = np.zeros(1, rp.dtype)
        shard_mats.append(build_ell(sub_rp, sub_ci, sub_w,
                                    num_cols=g.n, width_cap=width_cap))
    # unify bucket shapes across shards: same widths, same padded R
    widths = sorted({b.cols.shape[0] for em in shard_mats
                     for b in em.buckets})
    buckets = []
    for wdt in widths:
        per = []
        for s, em in enumerate(shard_mats):
            hit = [b for b in em.buckets if b.cols.shape[0] == wdt]
            per.append(hit[0] if hit else None)
        rmax = max((b.row_ids.shape[0] for b in per if b is not None),
                   default=0)
        rmax = T.round_up(max(rmax, T.LANES), T.LANES)
        rids = np.full((n_shards, rmax), mb, T.VID_DTYPE)
        cols = np.full((n_shards, wdt, rmax), g.n, T.VID_DTYPE)
        vals = np.zeros((n_shards, wdt, rmax), np.float32) \
            if weighted else None
        for s, b in enumerate(per):
            if b is None:
                continue
            r = b.row_ids.shape[0]
            rids[s, :r] = b.row_ids  # local ids already (sub matrix)
            # local sentinel from build_ell is hi-lo; remap to mb
            rids[s, :r][b.row_ids >= (min((s + 1) * mb, m) - s * mb)] = mb
            cols[s, :, :r] = b.cols
            if weighted:
                vals[s, :, :r] = b.vals
        buckets.append((rids, cols, vals))
    return ShardedEll(buckets=tuple(buckets)), mb
