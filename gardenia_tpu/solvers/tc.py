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


HUB_THRESHOLD = 128        # deg+ >= this -> bitmap intersection path
BITMAP_BUDGET_WORDS = 1 << 27   # <= 512 MB of uint32 bitmap rows
ROT_WIDTHS = (8, 16, 32, 64, 128)


def _pow2ceil_arr(x):
    return (2 ** np.ceil(np.log2(np.maximum(x, 1)))).astype(np.int64)


def _pair_streams(dag, cstart, n_chunks, clo, chi, fill, edge_sel):
    """Pruned, width-classed chunk-pair streams for the DAG edges in
    `edge_sel` (bool mask).

    STAIRCASE PRUNING: adjacency rows are sorted, so the chunks of one
    vertex cover strictly increasing disjoint value ranges — chunk i
    of N+(u) can only intersect the chunks of N+(v) whose [min, max]
    range overlaps it; the surviving (i, j) pairs form a monotone
    staircase of size <= c(u)+c(v)-1 vs c(u)*c(v) all-pairs (RMAT-20:
    74.3M -> 44.7M pairs).  The reference's merge-based warp
    intersection (include/operations.cuh:142-343) gets the same effect
    from its merge pointers.

    WIDTH CLASSES: each pair is swapped so cu is the side with the
    smaller lane fill, and classed by W = pow2ceil(min fill) (>= 8).
    The kernel replicates the W-lane prefix of A across the row and
    needs only W rotations of B to compare every (a_j, b_k) pair
    exactly once: for lane i = (k + s) mod 128 with s = (j - k) mod W,
    A_rep[i] = a_{i mod W} = a_j meets roll(B, s)[i] = b_k, and no
    other (s, i) maps to the same (j, k).  Cost drops from 128 to W
    rotations per pair — the min-side merge length, like the
    reference's shorter-list-iterates convention (omp_base.cc:16-21).
    """
    m = dag.m
    deg = np.diff(dag.rowptr)
    src = np.repeat(np.arange(m, dtype=np.int64), deg)[edge_sel]
    dst = np.asarray(dag.colidx, np.int64)[edge_sel]
    cu_n = n_chunks[src]
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
    base = np.cumsum(cnt) - cnt
    pp = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    off = np.arange(total, dtype=np.int64) - base[pp]
    cu = urow[pp]
    cv = vs[pp] + jlo[pp] + off
    fu, fv = fill[cu], fill[cv]
    swap = fu > fv
    cu2 = np.where(swap, cv, cu).astype(np.int32)
    cv2 = np.where(swap, cu, cv).astype(np.int32)
    W = np.maximum(8, _pow2ceil_arr(np.minimum(fu, fv)))
    out = {}
    for w in ROT_WIDTHS:
        sel = W == w
        if sel.any():
            out[int(w)] = (cu2[sel], cv2[sel])
    return out


def _build_bitmap(dag, src, dst, deg):
    """Hub-hub edges go through exact BITMAP intersection: after degree
    relabeling every out-neighbor of a vertex with deg+ >= HUB_THRESHOLD
    is itself a top-degree vertex, so ALL hub out-lists live in a tiny
    id prefix [0, U) (RMAT-20: U = 21723 for 21.6K hubs).  N+(u) cap
    N+(v) is then popcount(bmp[u] & bmp[v]) over U bits — ~679 words vs
    16K lane-ops per 128x128 chunk pair, and hub-hub pairs are 59% of
    the pruned rotation cost.  TPU take on the reference's hash-index
    intersection (include/operations.cuh:295 intersect_warp_hindex).

    Returns (bmp uint32[H+1, wpad], hu, hv, hh_edge_mask) or None when
    no hubs exist / the bitmap would blow the budget (e.g. natural ids
    without relabeling, or near-regular graphs)."""
    hub = deg >= HUB_THRESHOLD
    if not hub.any():
        return None
    sel = hub[src]
    if not sel.any():
        return None
    U = int(dst[sel].max()) + 1
    words = -(-U // 32)
    wpad = -(-words // LANES) * LANES
    H = int(hub.sum())
    if (H + 1) * wpad > BITMAP_BUDGET_WORDS:
        return None
    rank = (np.cumsum(hub) - 1).astype(np.int64)
    bmp = np.zeros((H + 1, wpad), np.uint32)   # +1: zero sentinel row
    v = dst[sel]
    np.bitwise_or.at(bmp, (rank[src[sel]], v >> 5),
                     np.uint32(1) << (v & 31).astype(np.uint32))
    hh = hub[src] & hub[dst]
    hu = rank[src[hh]].astype(np.int32)
    hv = rank[dst[hh]].astype(np.int32)
    return bmp, hu, hv, hh


def _pack_stream(a, b, chunk, pad_a, pad_b):
    """(n,) index pair -> (n_alloc, chunk) device arrays + real step
    count; the step dim snaps to a power of two so multi-slice runs
    reuse one compiled executable."""
    n = len(a)
    n_steps = max(1, -(-n // chunk))
    n_alloc = T.next_pow2(n_steps)
    tot = n_alloc * chunk
    aa = np.concatenate([a, np.full(tot - n, pad_a, np.int32)])
    bb = np.concatenate([b, np.full(tot - n, pad_b, np.int32)])
    return (jnp.asarray(aa.reshape(n_alloc, chunk)),
            jnp.asarray(bb.reshape(n_alloc, chunk)), n_steps)


def _rot_count_pallas(A, B, W: int, interpret: bool = False):
    """Per-tile VMEM-resident rotation count: the XLA fori formulation
    re-reads A/B from HBM on every rotation (~54 KB of HBM traffic per
    pair at W=128 — the round-2 kernel was bandwidth-bound on exactly
    that); here each (T, 128) tile is read ONCE and all W rotations run
    against VMEM."""
    from jax.experimental import pallas as pl

    P = A.shape[0]
    Tt = min(1024, P)
    nsub = P // Tt

    def kernel(a_ref, b_ref, y_ref):
        from jax.experimental.pallas import tpu as pltpu
        a = a_ref[...]

        # fori (not an unrolled python loop): unrolling W=128 chained
        # rolls left ~45 (T,128) temporaries live at once — 22.5 MB of
        # VMEM stack ("exceeded scoped vmem limit"); the loop carry
        # keeps exactly two buffers resident
        def rot(s, carry):
            acc, br = carry
            acc = acc + (a == br).astype(jnp.int32)
            return acc, pltpu.roll(br, shift=1, axis=1)

        acc, _ = jax.lax.fori_loop(
            0, W, rot, (jnp.zeros(a.shape, jnp.int32), b_ref[...]))
        y_ref[...] = acc.reshape(8, Tt // 8, LANES).sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=(nsub,),
        in_specs=[pl.BlockSpec((Tt, LANES), lambda i: (i, 0)),
                  pl.BlockSpec((Tt, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub * 8, LANES), jnp.int32),
        interpret=interpret,
    )(A, B)


def _make_rot_run(W: int, chunk: int, use_pallas: bool):
    @jax.jit
    def run(table, cu_d, cv_d, n_real):
        def body(c, partials):
            Araw = table[cu_d[c]]                       # (chunk, 128)
            A = jnp.tile(Araw[:, :W], (1, LANES // W)) if W < LANES \
                else Araw
            B = table[cv_d[c]]
            # pad sentinels must never match: A keeps -1, B gets -2
            B = jnp.where(B == -1, -2, B)
            if use_pallas:
                part = jnp.sum(_rot_count_pallas(A, B, W))
            else:
                def rot_body(s, acc):
                    return acc + (A == jnp.roll(B, s, axis=1)) \
                        .astype(jnp.int32)
                part = jnp.sum(jax.lax.fori_loop(
                    0, W, rot_body, jnp.zeros(A.shape, jnp.int32)))
            return partials.at[c].set(part)

        return jax.lax.fori_loop(
            0, n_real, body, jnp.zeros((cu_d.shape[0],), jnp.int32))
    return run


# width classes at or above this ride the bitonic merge kernel: the
# merge costs ~15 fixed shuffle stages per pair regardless of W, the
# rotation kernel W rotations.  Measured crossover on v5e at RMAT-20:
# W=32 81 vs 102 ms, W=64 218 vs 366, W=128 303 vs 760 (merge vs
# rotation); W=8/16 tie — every class lands at a ~30 M pairs/s
# gather+dispatch floor once compute stops binding
MERGE_MIN_W = 32


def _bitonic_intersect(a, b_rev, roll, lane):
    """|set(a) cap set(b)| per row via one bitonic merge of the 256-lane
    concatenation — the TPU take on the reference's merge-path warp
    intersection (include/operations.cuh:142-343): 7 fixed-stride
    compare-exchange stages replace data-dependent merge pointers.

    a: (T, 128) ascending rows, -1 pads trailing.  b_rev: (T, 128)
    DESCENDING rows (gathered from a lane-reversed chunk table), -1 pads
    leading.  Pads are remapped to unique out-of-range keys so they can
    never create equal-adjacent pairs.  roll(x, s)[i] = x[(i-s) mod 128].
    """
    big = jnp.int32(1 << 28)
    a = jnp.where(a < 0, big + lane, a)
    b = jnp.where(b_rev < 0, big + jnp.int32(1 << 20) - lane, b_rev)
    # cross stage of merging [a, rev(b)]: position i pairs with i+128
    mn = jnp.minimum(a, b)
    mx = jnp.maximum(a, b)
    for s in (64, 32, 16, 8, 4, 2, 1):
        keep_lo = (lane & s) == 0
        mn = jnp.where(keep_lo, jnp.minimum(mn, roll(mn, 128 - s)),
                       jnp.maximum(mn, roll(mn, s)))
        mx = jnp.where(keep_lo, jnp.minimum(mx, roll(mx, 128 - s)),
                       jnp.maximum(mx, roll(mx, s)))
    one = jnp.int32(1)
    zero = jnp.int32(0)
    eq = jnp.where((mn == roll(mn, 1)) & (lane > 0), one, zero)
    eq = eq + jnp.where((mx == roll(mx, 1)) & (lane > 0), one, zero)
    # sorted-sequence boundary: mn[127] (roll(mn,1) at lane 0) vs mx[0]
    eq = eq + jnp.where((mx == roll(mn, 1)) & (lane == 0), one, zero)
    return eq


def _merge_count_pallas(A, Brev, interpret: bool = False):
    """VMEM-resident bitonic-merge intersection counts per row."""
    from jax.experimental import pallas as pl

    P = A.shape[0]
    Tt = min(1024, P)
    nsub = P // Tt

    def kernel(a_ref, b_ref, y_ref):
        from jax.experimental.pallas import tpu as pltpu
        lane = jax.lax.broadcasted_iota(jnp.int32, (Tt, LANES), 1)
        eq = _bitonic_intersect(
            a_ref[...], b_ref[...],
            lambda x, s: pltpu.roll(x, shift=s, axis=1), lane)
        y_ref[...] = eq.reshape(8, Tt // 8, LANES).sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=(nsub,),
        in_specs=[pl.BlockSpec((Tt, LANES), lambda i: (i, 0)),
                  pl.BlockSpec((Tt, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub * 8, LANES), jnp.int32),
        interpret=interpret,
    )(A, Brev)


def _make_merge_run(chunk: int, use_pallas: bool):
    @jax.jit
    def run(table, table_rev, cu_d, cv_d, n_real):
        def body(c, partials):
            A = table[cu_d[c]]                          # (chunk, 128)
            Brev = table_rev[cv_d[c]]
            if use_pallas:
                part = jnp.sum(_merge_count_pallas(A, Brev))
            else:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, A.shape, 1)
                part = jnp.sum(_bitonic_intersect(
                    A, Brev,
                    lambda x, s: jnp.roll(x, s, axis=1), lane))
            return partials.at[c].set(part)

        return jax.lax.fori_loop(
            0, n_real, body, jnp.zeros((cu_d.shape[0],), jnp.int32))
    return run


def _make_bm_run(bchunk: int):
    @jax.jit
    def run(bmp, hu_d, hv_d, n_real):
        def body(c, partials):
            a = bmp[hu_d[c]]                     # (bchunk, wpad) u32
            b = bmp[hv_d[c]]
            return partials.at[c].set(jnp.sum(
                jax.lax.population_count(a & b).astype(jnp.int32)))
        return jax.lax.fori_loop(
            0, n_real, body, jnp.zeros((hu_d.shape[0],), jnp.int32))
    return run


def tc_rotate(g, *, chunk: int = 1 << 13, presorted_dag: bool = False,
              use_bitmap: bool = True, use_relabel: bool = True) -> int:
    """Hybrid bitmap + width-classed rotation triangle count.

    Triangle counts are invariant under vertex relabeling, so the graph
    is degree-relabeled first (core/relabel.py) — that is what compacts
    hub out-lists into the bitmap id prefix (_build_bitmap) and gives
    mid-degree lists block locality for the staircase pruning."""
    if not presorted_dag and use_relabel:
        from gardenia_tpu.core.relabel import relabeled
        g = relabeled(g).graph
    dag = g if presorted_dag else g._dev(("oriented",), g.oriented)
    if dag.nnz == 0:
        return 0
    chunk = max(8, chunk - chunk % 8)

    def prep():
        table_h, cstart, n_chunks = _chunk_table(dag)
        clo = table_h[:, 0].astype(np.int64)
        chi = table_h.max(axis=1).astype(np.int64)
        fill = (table_h >= 0).sum(axis=1).astype(np.int64)
        deg = np.diff(dag.rowptr)
        src = np.repeat(np.arange(dag.m, dtype=np.int64), deg)
        dst = np.asarray(dag.colidx, np.int64)
        bm = _build_bitmap(dag, src, dst, deg) if use_bitmap else None
        hh = bm[3] if bm is not None else np.zeros(dag.nnz, bool)
        streams = _pair_streams(dag, cstart, n_chunks, clo, chi, fill,
                                ~hh)
        th = np.concatenate(
            [table_h, np.full((1, LANES), -1, np.int32)], axis=0)
        return th, streams, (bm[0], bm[1], bm[2]) if bm is not None \
            else None, len(th) - 1

    th_h, streams, bm, sent = dag._dev(("tc_rot3_prep", use_bitmap),
                                       prep)
    from gardenia_tpu.ops import rowsel
    use_pallas = rowsel.enabled()
    total = 0

    if bm is not None and len(bm[1]):
        bmp_h, hu, hv = bm
        H = bmp_h.shape[0] - 1
        bchunk = max(8, min(chunk, 2048))
        bmp_d = dag._dev(("tc_bm_table",), lambda: jnp.asarray(bmp_h))
        run_bm = dag._dev(("tc_bm_run", bchunk),
                          lambda: _make_bm_run(bchunk))
        for lo in range(0, len(hu), PAIR_SLICE_LIMIT):
            sl = slice(lo, lo + PAIR_SLICE_LIMIT)
            if lo == 0 and len(hu) <= PAIR_SLICE_LIMIT:
                hu_d, hv_d, n_steps = dag._dev(
                    ("tc_bm_data", bchunk),
                    lambda: _pack_stream(hu, hv, bchunk, H, H))
            else:
                hu_d, hv_d, n_steps = _pack_stream(hu[sl], hv[sl],
                                                   bchunk, H, H)
            out = run_bm(bmp_d, hu_d, hv_d, jnp.int32(n_steps))
            total += int(np.asarray(out).astype(np.int64).sum())

    table = dag._dev(("tc_rot3_table",), lambda: jnp.asarray(th_h))
    merge_ws = [W for W in streams if W >= MERGE_MIN_W]
    if merge_ws:
        # _bitonic_intersect remaps pads to keys starting at 1<<28: a
        # real vertex id >= 2^28 would collide with pad keys and corrupt
        # counts (the rotation path has no such ceiling)
        assert dag.m < (1 << 28), \
            "merge kernel pad keys collide with vertex ids >= 2^28"
        table_rev = dag._dev(
            ("tc_merge_tablerev",),
            lambda: jnp.asarray(np.ascontiguousarray(th_h[:, ::-1])))
    for W in sorted(streams):
        cu, cv = streams[W]
        merge = W >= MERGE_MIN_W
        if merge:
            run = dag._dev(("tc_merge_run", chunk, use_pallas),
                           lambda: _make_merge_run(chunk, use_pallas))
        else:
            run = dag._dev(("tc_rot3_run", W, chunk, use_pallas),
                           lambda W=W: _make_rot_run(W, chunk,
                                                     use_pallas))
        for lo in range(0, len(cu), PAIR_SLICE_LIMIT):
            sl = slice(lo, lo + PAIR_SLICE_LIMIT)
            if lo == 0 and len(cu) <= PAIR_SLICE_LIMIT:
                cu_d, cv_d, n_steps = dag._dev(
                    ("tc_rot3_data", W, chunk),
                    lambda W=W, cu=cu, cv=cv: _pack_stream(
                        cu, cv, chunk, sent, 0))
            else:
                cu_d, cv_d, n_steps = _pack_stream(cu[sl], cv[sl],
                                                   chunk, sent, 0)
            if merge:
                out = run(table, table_rev, cu_d, cv_d,
                          jnp.int32(n_steps))
            else:
                out = run(table, cu_d, cv_d, jnp.int32(n_steps))
            total += int(np.asarray(out).astype(np.int64).sum())
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
