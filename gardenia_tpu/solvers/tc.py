"""TC — triangle counting over the DAG orientation.

Reference: src/tc/{omp_base.cc,gpu_base.cu}, main applies the degree-order
DAG first (src/tc/main.cc:13 USE_DAG), then
total = sum over DAG edges (u,v) of |N+(u) ∩ N+(v)| (omp_base.cc:16-21);
with the DAG each triangle is counted exactly once.

TPU variants:
  'rotate' (default) — per-EDGE all-pairs intersection by lane rotation:
      adjacency lists live in 128-wide padded chunk rows; for each DAG
      edge, gather N+(u)'s and N+(v)'s chunk rows and count equal pairs
      by comparing A against all 128 lane rotations of B
      (sum_s sum_i [A_i == roll(B, s)_i]) — every op is a full-width VPU
      compare, no per-element gathers, no big outer-product intermediate.
      Vertices wider than one chunk contribute all chunk pairs.  This is
      the TPU answer to the reference's warp-cooperative merge
      (include/operations.cuh:142-343): rotation replaces the merge lanes.
  'bsearch' — chunked wedge enumeration with vectorized binary-search
      membership (ops/intersect.py); general but probe-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops.intersect import membership_counts

LANES = 128
# per-slice wedge budget for the bsearch variant (tests shrink this to
# exercise multi-slice processing)
WEDGE_SLICE_LIMIT = 2 ** 31
# per-slice chunk-pair budget for the rotate variant: totals beyond this
# are processed in host-side edge-range slices so device indices stay
# int32 (the reference streams per-warp with 64-bit totals,
# include/set_intersect.cuh; here slicing restores the headroom)
PAIR_SLICE_LIMIT = 2 ** 31 - (1 << 22)


def _chunk_table(dag):
    """Pack the DAG adjacency into (C, 128) rows padded with -1; vertex v
    owns rows [cstart[v], cstart[v+1])."""
    deg = np.diff(dag.rowptr)
    n_chunks = -(-deg // LANES)
    cstart = np.concatenate([[0], np.cumsum(n_chunks)])
    C = int(cstart[-1])
    table = np.full((max(C, 1), LANES), -1, np.int32)
    # scatter edges into rows
    eidx = np.arange(dag.nnz, dtype=np.int64)
    src = np.repeat(np.arange(dag.m, dtype=np.int64), deg)
    off = eidx - dag.rowptr[src]
    rows = cstart[src] + off // LANES
    lanes = off % LANES
    table[rows, lanes] = np.asarray(dag.colidx)
    return table, cstart.astype(np.int64), n_chunks.astype(np.int64)


def _win_searchsorted(arr, starts, lens, vals, side):
    """Vectorized windowed searchsorted: for each i, the insertion
    point of vals[i] in the ascending window arr[starts[i] :
    starts[i]+lens[i]].  Manual binary search — numpy has no windowed
    form; ~log2(max window) vectorized passes."""
    lo = np.zeros(len(vals), np.int64)
    hi = lens.astype(np.int64).copy()
    while True:
        active = lo < hi
        if not active.any():
            return lo
        mid = (lo + hi) >> 1
        # clamp: empty windows (lens 0) are inactive but still indexed,
        # and a trailing zero-chunk vertex has starts == len(arr)
        a = arr[np.minimum(starts + np.minimum(mid,
                                               np.maximum(lens - 1, 0)),
                           len(arr) - 1)]
        go_right = (a < vals) if side == "left" else (a <= vals)
        lo = np.where(active & go_right, mid + 1, lo)
        hi = np.where(active & ~go_right, mid, hi)


def _pair_stream_range(dag, cstart, n_chunks, clo, chi,
                       e_lo: int, e_hi: int):
    """Host-precomputed chunk-pair index arrays (cu, cv) for the DAG
    edge range [e_lo, e_hi) — the pair -> (edge, sub-chunk)
    demultiplexing is pure address arithmetic, so it is done ONCE here
    instead of a per-pair device searchsorted (which measured
    ~170 ns/pair, dominating the kernel).

    STAIRCASE PRUNING (round 3): adjacency rows are sorted, so the
    chunks of one vertex cover strictly increasing disjoint value
    ranges — chunk i of N+(u) can only intersect the chunks of N+(v)
    whose [min, max] range overlaps it.  The overlapping (i, j) pairs
    form a monotone staircase of size <= c(u)+c(v)-1, vs c(u)*c(v)
    all-pairs; on RMAT-20 this cuts the pair stream 74.3M -> ~33M.
    The reference's merge-based warp intersection
    (include/operations.cuh:142-343) gets the same effect from the
    merge pointers; here the pruning happens once on the host and the
    device kernel stays the pure lane-rotation compare."""
    m = dag.m
    deg = np.diff(dag.rowptr)
    src = np.repeat(np.arange(m, dtype=np.int64), deg)[e_lo:e_hi]
    dst = np.asarray(dag.colidx, dtype=np.int64)[e_lo:e_hi]
    cu_n = n_chunks[src]
    # expand per (edge, u-chunk): E2 = sum cu_n
    e2 = np.repeat(np.arange(len(src), dtype=np.int64), cu_n)
    i2 = np.arange(len(e2), dtype=np.int64) - \
        np.repeat(np.cumsum(cu_n) - cu_n, cu_n)
    urow = cstart[src[e2]] + i2
    vs = cstart[dst[e2]]
    cvn = n_chunks[dst[e2]]
    jlo = _win_searchsorted(chi, vs, cvn, clo[urow], "left")
    jhi = _win_searchsorted(clo, vs, cvn, chi[urow], "right")
    cnt = np.maximum(jhi - jlo, 0)
    total = int(cnt.sum())
    assert total < 2 ** 31, "pair-slice budget exceeded (internal)"
    base = np.cumsum(cnt) - cnt
    p = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    off = np.arange(total, dtype=np.int64) - base[p]
    cu = urow[p].astype(np.int32)
    cv = (vs[p] + jlo[p] + off).astype(np.int32)
    return cu, cv, total


def tc_rotate(g, *, chunk: int = 1 << 13, presorted_dag: bool = False
              ) -> int:
    dag = g if presorted_dag else g._dev(("oriented",), g.oriented)
    if dag.nnz == 0:
        return 0

    def prep_table():
        table_h, cstart, n_chunks = _chunk_table(dag)
        # per-chunk value ranges for the staircase pruning: rows are
        # sorted and front-packed, so lane 0 is the min and the row
        # max ignores the -1 padding
        clo = table_h[:, 0].astype(np.int64)
        chi = table_h.max(axis=1).astype(np.int64)
        th = np.concatenate(
            [table_h, np.full((1, LANES), -1, np.int32)], axis=0)
        return jnp.asarray(th), cstart, n_chunks, clo, chi, len(th) - 1

    table, cstart, n_chunks, clo, chi, sent = dag._dev(
        ("tc_rotate_table",), prep_table)

    def pack(e_lo: int, e_hi: int):
        """Pair stream for an edge slice, padded to whole chunks; padded
        pairs compare the all--1 sentinel row against row 0 (no match).
        The step dimension is snapped to a power of two so multi-slice
        runs reuse one compiled executable (the real step count is
        passed dynamically; padded steps are never visited)."""
        cu_h, cv_h, total_pairs = _pair_stream_range(
            dag, cstart, n_chunks, clo, chi, e_lo, e_hi)
        n_steps = max(1, -(-total_pairs // chunk))
        n_alloc = T.next_pow2(n_steps)
        pad = n_alloc * chunk - total_pairs
        cu = np.concatenate([cu_h, np.full(pad, sent, np.int32)])
        cv = np.concatenate([cv_h, np.zeros(pad, np.int32)])
        return (jnp.asarray(cu.reshape(n_alloc, chunk)),
                jnp.asarray(cv.reshape(n_alloc, chunk)), n_steps)

    def build():
        # table rides as a jit ARGUMENT: baked-in it blows the remote
        # -compile request size limit at scale 20 (HTTP 413)
        @jax.jit
        def run(table, cu_d, cv_d, n_real):
            def body(c, partials):
                A = table[cu_d[c]]                     # (chunk, 128)
                B = table[cv_d[c]]
                # pad sentinels must never match: A keeps -1, B gets -2
                B = jnp.where(B == -1, -2, B)

                # accumulate hits elementwise and reduce ONCE: a scalar
                # reduce per rotation costs a full tree each time and
                # dominated the kernel (790 -> 119 ms on RMAT-16)
                def rot_body(s, acc):
                    return acc + (A == jnp.roll(B, s, axis=1)) \
                        .astype(jnp.int32)

                acc = jax.lax.fori_loop(0, LANES, rot_body,
                                        jnp.zeros(A.shape, jnp.int32))
                return partials.at[c].set(jnp.sum(acc))

            return jax.lax.fori_loop(
                0, n_real, body,
                jnp.zeros((cu_d.shape[0],), jnp.int32))
        return run

    run = dag._dev(("tc_rotate_run", chunk), build)

    # slice the DAG edge range so each slice's chunk-pair count stays
    # within int32 device indexing (>2^31 pair spaces just take more
    # slices); the single-slice common case caches its device stream
    deg = np.diff(dag.rowptr)
    src_all = np.repeat(np.arange(dag.m, dtype=np.int64), deg)
    ppe_all = n_chunks[src_all] * n_chunks[np.asarray(dag.colidx,
                                                      np.int64)]
    cum_all = np.cumsum(ppe_all)
    grand_total = int(cum_all[-1]) if len(cum_all) else 0
    if grand_total == 0:
        return 0
    if grand_total <= PAIR_SLICE_LIMIT:
        cu_d, cv_d, n_steps = dag._dev(("tc_rotate_data", chunk),
                                       lambda: pack(0, dag.nnz))
        out = run(table, cu_d, cv_d, jnp.int32(n_steps))
        return int(np.asarray(out).astype(np.int64).sum())
    total = 0
    e_lo = 0
    while e_lo < dag.nnz:
        base_p = cum_all[e_lo - 1] if e_lo else 0
        e_hi = int(np.searchsorted(cum_all, base_p + PAIR_SLICE_LIMIT,
                                   side="right"))
        e_hi = max(e_hi, e_lo + 1)
        cu_d, cv_d, n_steps = pack(e_lo, e_hi)
        out = run(table, cu_d, cv_d, jnp.int32(n_steps))
        total += int(np.asarray(out).astype(np.int64).sum())
        e_lo = e_hi
    return total


def tc_bsearch(g, *, chunk: int = 1 << 20, presorted_dag: bool = False
               ) -> int:
    """Wedge-space binary-search variant (kept for parity/fallback).

    The wedge space is processed in edge-range SLICES so per-slice wedge
    counts stay within int32 device indexing — graphs with > 2^31 total
    wedges just take more slices."""
    dag = g if presorted_dag else g._dev(("oriented",), g.oriented)
    m, nnz = dag.m, dag.nnz
    if nnz == 0:
        return 0
    rowptr, colidx = dag.device_csr()
    deg = np.diff(dag.rowptr)
    src_host = np.repeat(np.arange(m), deg)
    wpe = deg[src_host].astype(np.int64)
    cum_all = np.cumsum(wpe)
    max_rounds = max(1, int(np.ceil(np.log2(max(2, deg.max() + 1)))) + 1)
    limit = WEDGE_SLICE_LIMIT - chunk

    def make_step(n_edges_static):
        @jax.jit
        def step(cum_d, src_sl, col_sl, total):
            from gardenia_tpu.ops import rowsel

            def body(c, acc):
                j = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                e = jnp.searchsorted(cum_d, j, side="right") \
                    .astype(jnp.int32)
                e = jnp.minimum(e, n_edges_static - 1)
                base = jnp.where(e > 0, cum_d[jnp.maximum(e - 1, 0)], 0)
                k = (j - base).astype(jnp.int32)
                u = rowsel.take(src_sl, e)
                v = rowsel.take(col_sl, e)
                w = rowsel.take(colidx,
                                jnp.minimum(rowsel.take(rowptr, u) + k,
                                            nnz - 1))
                valid = j < total
                return acc + membership_counts(
                    rowptr, colidx, w, v, valid,
                    search_rounds=max_rounds)

            n_ch = (total + chunk - 1) // chunk
            return jax.lax.fori_loop(0, n_ch, body, jnp.int32(0))
        return step

    total = 0
    e_lo = 0
    while e_lo < nnz:
        base_w = cum_all[e_lo - 1] if e_lo else 0
        e_hi = int(np.searchsorted(cum_all, base_w + limit,
                                   side="right"))
        e_hi = max(e_hi, e_lo + 1)
        sl = slice(e_lo, e_hi)
        n_edges = e_hi - e_lo
        cum_d = jnp.asarray((cum_all[sl] - base_w).astype(np.int32))
        src_sl = jnp.asarray(src_host[sl].astype(np.int32))
        col_sl = jnp.asarray(np.asarray(dag.colidx)[sl])
        slice_wedges = int(cum_all[e_hi - 1] - base_w)
        step = dag._dev(("tc_bs_step", chunk, n_edges),
                        lambda: make_step(n_edges))
        total += int(step(cum_d, src_sl, col_sl,
                          jnp.int32(slice_wedges)))
        e_lo = e_hi
    return total


def tc_solver(g, *, variant: str = "rotate", **kw) -> int:
    """Reference entry TCSolver(g, total) (src/tc/tc.h:7).
    g must be symmetric (undirected); the DAG orientation is applied
    internally. Returns a python int triangle count."""
    if variant == "rotate":
        return tc_rotate(g, **kw)
    return tc_bsearch(g, **kw)
