"""kCL — k-clique counting on the degree-ordered DAG.

Reference: mining/kcl_dfs/{kcl.h,omp_base.cc} (DFS with cmap + EmbList),
mining/kcl_bfs/base.cu (BFS-style embedding expansion with CUB scans).
The BFS formulation is the TPU-friendly one (SURVEY.md §7.7): fixed-width
embedding arrays, expansion + filter + prefix-sum compaction per level —
the thread-local cmap8_t connectivity map becomes vectorized binary-search
membership tests (ops/intersect.py).

Key invariant: in the DAG every k-clique has exactly one topological
order a->b->...->z, and all later members lie in N+(a).  So a level-l
embedding (v1..vl) extends with x in N+(v1) such that x in N+(vi) for all
i >= 2 — each clique is generated exactly once (no canonicality checks
needed, same argument as kcl.h:17-21).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T

# per-slice wedge budget: embedding frontiers whose total expansion
# space exceeds this are processed in host-side embedding-range slices
# so all device indices stay int32 (x64 is disabled; the previous
# jnp.int64 annotations silently truncated — advisor finding r1).
# Headroom of one max chunk keeps start+chunk inside int32.
EMB_WEDGE_LIMIT = 2 ** 31 - (1 << 23)


def wedge_slices(counts: np.ndarray, limit: int) -> List[tuple]:
    """Split range(len(counts)) into [lo, hi) slices whose count sums
    stay <= limit (greedy; one count alone never exceeds it because
    counts are vertex degrees < 2^31)."""
    n = len(counts)
    if n == 0:
        return []
    cum = np.cumsum(counts, dtype=np.int64)
    out = []
    lo = 0
    while lo < n:
        base = cum[lo - 1] if lo else 0
        hi = int(np.searchsorted(cum, base + limit, side="right"))
        hi = max(hi, lo + 1)
        out.append((lo, hi))
        lo = hi
    return out


def _chunk_member_data(dag):
    """Cached 128-wide adjacency chunk table (shared with tc_rotate):
    (table (C+1,128) w/ sentinel row, cstart i32[m], nchunk i32[m],
    max_chunks, sentinel_row_index)."""
    from gardenia_tpu.solvers.tc import _chunk_table

    def prep():
        table_h, cstart, nchunk = _chunk_table(dag)
        table_h = np.concatenate(
            [table_h, np.full((1, 128), -1, np.int32)], axis=0)
        return (jnp.asarray(table_h),
                jnp.asarray(cstart[:-1].astype(np.int32)),
                jnp.asarray(nchunk.astype(np.int32)),
                int(nchunk.max()) if len(nchunk) else 1,
                len(table_h) - 1)

    return dag._dev(("kcl_chunk_member",), prep)


def _make_chunk_member(dag):
    """Adjacency-chunk membership: w in N+(v) by comparing w against
    v's 128-wide chunk rows (one vectorized row gather + lane compare
    per chunk — DAG out-degrees are small, so this beats log-degree
    binary-search probing; the same chunk table drives tc_rotate).

    Returns (member(queries, rows, mem_ctx), mem_ctx) — the table rides
    as a jit ARGUMENT because baked-in constants blow the remote
    -compile request size limit at scale 20 (HTTP 413)."""
    table, cstart, nchunk, max_chunks, sent = _chunk_member_data(dag)

    def member(queries, rows, mem_ctx):
        from gardenia_tpu.ops import rowsel
        table_, cstart_, nchunk_ = mem_ctx
        base = rowsel.take(cstart_, rows)
        nc = rowsel.take(nchunk_, rows)
        hit = jnp.zeros(queries.shape, bool)
        for c in range(max_chunks):
            rowsrc = jnp.where(c < nc, base + c, sent)
            row = table_[rowsrc]                     # (N, 128)
            hit = hit | jnp.any(row == queries[:, None], axis=1)
        return hit

    return member, (table, cstart, nchunk)


def _make_last_level_rotate(dag, n_members: int, window: int = 1 << 12,
                            max_chunks_cap: int = None):
    """Final-level clique counting by lane rotation — the kCL analog of
    tc_rotate: per embedding (v1..v_l), count
    |N+(v1) ∩ N+(v2) ∩ ... ∩ N+(v_l)| by gathering each member's
    128-wide chunk rows ONCE per embedding and AND-ing rotation
    -membership masks, instead of one chunk-row gather per (wedge,
    member) probe (measured ~40 s / 134M wedges on RMAT-16 with the
    probe scheme; rotations are full-width VPU compares).

    The windows loop DEVICE-SIDE: one jit call covers the whole
    embedding slice — round 3 found the old one-call-per-4096-embeddings
    form spending 90 of kcl-4's 235 s at RMAT-16 on ~3800 tunnel round
    trips (23.5 ms each), not on compute.

    max_chunks_cap (round 5, the TC width-classing trick applied to the
    final level): a static bound on BOTH chunk loops for windows whose
    embeddings all have <= cap adjacency chunks — class-1 windows (every
    member's N+ fits one 128-wide chunk, the common case on the DAG) run
    1x1x128 rotations per member instead of max_chunks^2 x 128."""
    _, _, _, max_chunks, sent = _chunk_member_data(dag)
    if max_chunks_cap is not None:
        max_chunks = min(max_chunks, max_chunks_cap)

    @jax.jit
    def run(members, nvalid, mem_ctx):
        # members: (n_members, Npad), Npad a multiple of window; padded
        # columns past nvalid are excluded by col_ok
        from gardenia_tpu.ops import rowsel
        table, cstart, nchunk = mem_ctx
        n_w = members.shape[1] // window

        def win(w, partials):
            msl = jax.lax.dynamic_slice(
                members, (0, w * window), (n_members, window))
            col_ok = (w * window
                      + jnp.arange(window, dtype=jnp.int32)) < nvalid
            v1 = msl[0]
            base1 = rowsel.take(cstart, v1)
            nc1 = rowsel.take(nchunk, v1)
            total = jnp.int32(0)
            for c1 in range(max_chunks):
                A = table[jnp.where(c1 < nc1, base1 + c1, sent)]
                ok = (A != -1) & col_ok[:, None]
                for i in range(1, n_members):
                    vi = msl[i]
                    basei = rowsel.take(cstart, vi)
                    nci = rowsel.take(nchunk, vi)
                    memb = jnp.zeros(A.shape, bool)
                    for ci in range(max_chunks):
                        B = table[jnp.where(ci < nci, basei + ci, sent)]
                        B = jnp.where(B == -1, -2, B)

                        def rot(s, mb):
                            return mb | (A == jnp.roll(B, s, axis=1))

                        memb = jax.lax.fori_loop(0, 128, rot, memb)
                    ok = ok & memb
                total = total + jnp.sum(ok.astype(jnp.int32))
            return partials.at[w].set(total)

        return jax.lax.fori_loop(0, n_w, win,
                                 jnp.zeros((n_w,), jnp.int32))

    return run


# class-sort key sweep chunk (module-level so tests can shrink it to
# exercise the multi-chunk path on CPU-sized buffers)
SORT_CHUNK = 1 << 22

# per-stage wall-clock split of the last _kcl_device call, populated
# when GDN_KCL_TIME=1 (wedgestream.LAST_TIMINGS convention)
LAST_TIMINGS = {}

# k=4 candidate-mask engine (round 5): every level-2 embedding (DAG
# edge (v1,v2)) precomputes a packed bitmask over N+(v1)'s adjacency
# lanes marking membership in N+(v2) — the TPU analog of the
# reference's cmap connectivity map (mining/kcl_dfs/omp_base.cc:22-60,
# include/cmap.h).  Downstream the mask replaces per-wedge membership
# probes: the count pass collapses to a popcount over edges (no wedge
# sweep), the fill pass tests one bit per wedge (one narrow row gather
# instead of max_chunks 128-wide chunk compares), and the final level
# rotates only against the NEW member x3 (the v2 constraint is already
# in the parent's mask) — half the rotation work.
USE_EDGE_MASKS = True


def _popcount32(v):
    """Per-lane bit count of int32 words (SWAR; wrap-safe)."""
    sr = jax.lax.shift_right_logical
    v = v - (sr(v, 1) & 0x55555555)
    v = (v & 0x33333333) + (sr(v, 2) & 0x33333333)
    v = (v + sr(v, 4)) & 0x0F0F0F0F
    return sr(v * 0x01010101, 24)


def _make_edge_masks(dag):
    """build(members, nvalid, mem_ctx) -> (cap, max_chunks*4) i32:
    packed candidate masks.  Bit (c*128 + j) of row e is set iff lane j
    of v1(e)'s c-th adjacency chunk holds a real vertex that is also in
    N+(v2(e)).  Invalid columns (>= nvalid) are all-zero."""
    _, _, _, max_chunks, sent = _chunk_member_data(dag)
    n_words = max_chunks * 4

    @jax.jit
    def build(members, nvalid, mem_ctx):
        from gardenia_tpu.ops import rowsel
        table, cstart, nchunk = mem_ctx
        cap = members.shape[1]
        CH = min(SORT_CHUNK >> 3, cap)
        n_ch = -(-cap // CH)
        lanebit = jax.lax.shift_left(
            jnp.int32(1), jnp.arange(32, dtype=jnp.int32))

        def chunkf(i, wtab):
            lo = i * CH
            v1 = jax.lax.dynamic_slice(members[0], (lo,), (CH,))
            v2 = jax.lax.dynamic_slice(members[1], (lo,), (CH,))
            base1 = rowsel.take(cstart, v1)
            nc1 = rowsel.take(nchunk, v1)
            base2 = rowsel.take(cstart, v2)
            nc2 = rowsel.take(nchunk, v2)
            pos = jnp.arange(CH, dtype=jnp.int32) + jnp.minimum(
                lo, cap - CH)
            valid = pos < nvalid
            blocks = []
            for c1 in range(max_chunks):
                A = table[jnp.where((c1 < nc1) & valid,
                                    base1 + c1, sent)]
                memb = jnp.zeros(A.shape, bool)
                for c2 in range(max_chunks):
                    B = table[jnp.where(c2 < nc2, base2 + c2, sent)]
                    B = jnp.where(B == -1, -2, B)

                    def rot(s, mb):
                        return mb | (A == jnp.roll(B, s, axis=1))

                    memb = jax.lax.fori_loop(0, 128, rot, memb)
                memb = memb & (A != -1)
                # disjoint powers of two: the sum IS the bitwise OR
                blocks.append(jnp.sum(
                    jnp.where(memb.reshape(CH, 4, 32), lanebit, 0),
                    axis=2, dtype=jnp.int32))
            wblk = jnp.concatenate(blocks, axis=1)
            return jax.lax.dynamic_update_slice(
                wtab, wblk, (jnp.minimum(lo, cap - CH), 0))

        return jax.lax.fori_loop(
            0, n_ch, chunkf, jnp.zeros((cap, n_words), jnp.int32))

    return build


def _make_mask_count(dag):
    """count(wtab, v1row, nvalid, rowptr) -> (survivors i32, next-level
    wedge-total f32 saturated) — the masked replacement for the count
    pass: a popcount over level-2 embeddings instead of a sweep over
    the full wedge space."""

    @jax.jit
    def count(wtab, v1row, nvalid, rowptr):
        from gardenia_tpu.ops import rowsel
        pc = jnp.sum(_popcount32(wtab), axis=1)
        valid = jnp.arange(wtab.shape[0], dtype=jnp.int32) < nvalid
        pc = jnp.where(valid, pc, 0)
        deg1 = rowsel.take(rowptr, v1row + 1) - rowsel.take(rowptr,
                                                            v1row)
        wsum = jnp.minimum(
            jnp.sum(pc.astype(jnp.float32) * deg1.astype(jnp.float32)),
            jnp.float32(2 ** 31 - 1))
        return jnp.sum(pc, dtype=jnp.int32), wsum

    return count


def _make_fill_masked(nnz, chunk, wins_per_call):
    """Masked fill pass: like _make_expand_dev(fill=True) but the
    per-wedge membership probe is one bit of the parent edge's packed
    mask, and the emitted embedding carries a PARENT row (index into
    the level-2 buffer) so the final level can reuse the mask."""

    @jax.jit
    def run(members, wtab, e_all, koff_all, total, ctx, w0, carry):
        from gardenia_tpu.ops import rowsel
        rowptr, colidx, mem_ctx = ctx
        n_words = wtab.shape[1]
        word_ids = jnp.arange(n_words, dtype=jnp.int32)

        def win(w, carry):
            s = (w0 + w) * chunk
            j = s + jnp.arange(chunk, dtype=jnp.int32)
            e = jax.lax.dynamic_slice(e_all, (s,), (chunk,))
            k_off = jax.lax.dynamic_slice(koff_all, (s,), (chunk,))
            e = jnp.clip(e, 0, members.shape[1] - 1)
            v1 = rowsel.take(members[0], e)
            x = rowsel.take(
                colidx,
                jnp.minimum(rowsel.take(rowptr, v1) + k_off, nnz - 1))
            wrow = wtab[e]                          # (chunk, n_words)
            wsel = jnp.sum(jnp.where(
                word_ids == (k_off >> 5)[:, None], wrow, 0), axis=1)
            bit = jax.lax.shift_right_logical(wsel, k_off & 31) & 1
            ok = (j < total) & (bit == 1)
            buf, offset = carry
            idx = jnp.nonzero(ok, size=chunk, fill_value=chunk - 1)[0]
            rows = jnp.concatenate(
                [jnp.take(members, e[idx], axis=1), x[idx][None, :],
                 e[idx][None, :]], axis=0)
            buf = jax.lax.dynamic_update_slice(buf, rows, (0, offset))
            return buf, offset + jnp.sum(ok.astype(jnp.int32))

        return jax.lax.fori_loop(0, wins_per_call, win, carry)

    return run


def _make_last_level_rotate_masked(dag, window: int = 1 << 12,
                                   max_chunks_cap: int = None):
    """Masked final level for k=4: members rows are (v1, v2, x3,
    parent).  The candidate base is the parent edge's packed mask
    (N+(v1) ∩ N+(v2), computed once per DAG edge) — only the NEW
    member x3 needs a rotation-membership pass, halving the dominant
    rotation work of _make_last_level_rotate."""
    _, _, _, max_chunks, sent = _chunk_member_data(dag)
    if max_chunks_cap is not None:
        max_chunks = min(max_chunks, max_chunks_cap)

    @jax.jit
    def run(members, wtab, nvalid, mem_ctx):
        from gardenia_tpu.ops import rowsel
        table, cstart, nchunk = mem_ctx
        n_w = members.shape[1] // window
        lane = jax.lax.broadcasted_iota(jnp.int32, (window, 128), 1)
        lane_shift = lane & 31

        def win(w, partials):
            msl = jax.lax.dynamic_slice(
                members, (0, w * window), (4, window))
            col_ok = (w * window
                      + jnp.arange(window, dtype=jnp.int32)) < nvalid
            v1, x3, par = msl[0], msl[2], msl[3]
            base1 = rowsel.take(cstart, v1)
            nc1 = rowsel.take(nchunk, v1)
            base3 = rowsel.take(cstart, x3)
            nc3 = rowsel.take(nchunk, x3)
            wrows = wtab[jnp.clip(par, 0, wtab.shape[0] - 1)]
            total = jnp.int32(0)
            for c1 in range(max_chunks):
                A = table[jnp.where(c1 < nc1, base1 + c1, sent)]
                wds = wrows[:, c1 * 4:(c1 + 1) * 4]
                ok = (jax.lax.shift_right_logical(
                    jnp.repeat(wds, 32, axis=1), lane_shift) & 1) == 1
                ok = ok & col_ok[:, None]
                memb = jnp.zeros(A.shape, bool)
                for c3 in range(max_chunks):
                    B = table[jnp.where(c3 < nc3, base3 + c3, sent)]
                    B = jnp.where(B == -1, -2, B)

                    def rot(s, mb):
                        return mb | (A == jnp.roll(B, s, axis=1))

                    memb = jax.lax.fori_loop(0, 128, rot, memb)
                ok = ok & memb
                total = total + jnp.sum(ok.astype(jnp.int32))
            return partials.at[w].set(total)

        return jax.lax.fori_loop(0, n_w, win,
                                 jnp.zeros((n_w,), jnp.int32))

    return run


def _make_class_sort(dag, key_rows):
    """Device sort of final-level embedding columns by rotation class
    (pow2 ceiling of the max adjacency chunk count over the member rows
    in key_rows; invalid columns sort last).  Only the tiny per-class
    count vector crosses to the host, so the classed final level costs
    one device sort + column gather on top of the rotation it shrinks.
    ALL rows (including a parent row, if present) ride the same column
    permutation; only key_rows feed the class key."""
    _, _, _, max_chunks, _ = _chunk_member_data(dag)
    n_classes = max(1, (max_chunks - 1).bit_length() + 1)
    key_rows = tuple(key_rows)

    @jax.jit
    def srt(members, nvalid, mem_ctx):
        from gardenia_tpu.ops import rowsel
        _, _, nchunk = mem_ctx
        cap = members.shape[1]
        # chunk the per-member class-key sweep: one whole-buffer
        # rowsel gather materializes a (cap, 128) row table — 32 GB at
        # a RMAT-20 kcl4 slice (s32[2^26, 128], found by the r5 sweep;
        # same class as the vc/mst fix)
        CH = min(SORT_CHUNK, cap)
        n_ch = -(-cap // CH)
        nchunk_rows = rowsel.to_rows(nchunk, nchunk.shape[0], 0)

        def kchunk(i, key):
            lo = i * CH
            nc = rowsel.take2d(nchunk_rows, jax.lax.dynamic_slice(
                members[key_rows[0]], (lo,), (CH,)))
            for r in key_rows[1:]:
                nc = jnp.maximum(nc, rowsel.take2d(
                    nchunk_rows, jax.lax.dynamic_slice(
                        members[r], (lo,), (CH,))))
            idx = jnp.zeros(CH, jnp.int32)
            for b in range(n_classes - 1):
                idx = idx + (nc > (1 << b)).astype(jnp.int32)
            # dynamic_slice clamps the last window; the overlap is
            # recomputed with identical values, so the clamped
            # update_slice writes are consistent
            pos = jnp.arange(CH, dtype=jnp.int32) + jnp.minimum(
                lo, cap - CH)
            k = jnp.where(pos < nvalid, idx, n_classes)
            return jax.lax.dynamic_update_slice(key, k, (lo,))

        key = jax.lax.fori_loop(
            0, n_ch, kchunk, jnp.full((cap,), n_classes, jnp.int32))
        _, perm = jax.lax.sort_key_val(key,
                                       jnp.arange(cap, dtype=jnp.int32))
        counts = jnp.zeros(n_classes + 1, jnp.int32).at[key].add(1)
        return jnp.take(members, perm, axis=1), counts[:n_classes]

    return srt, n_classes


@partial(jax.jit, static_argnames=("S",))
def _build_wedge_index(cum_d, S: int):
    """Device wedge-slot index: e_all[j] = embedding of wedge slot j and
    koff_all[j] = slot offset within its embedding, via boundary
    scatter-max + cummax fills — replaces the per-window searchsorted
    (24 gather passes over the embedding cumsum per window).

    cum_d: (Ne,) int32 inclusive cumsum of wedges-per-embedding.  For a
    group of embeddings sharing a start (zero-wedge runs) scatter-MAX
    picks the largest id, which is exactly the one owning the slot."""
    ne = cum_d.shape[0]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), cum_d[:-1]])
    ids = jnp.arange(ne, dtype=jnp.int32)
    e_seed = jnp.zeros(S, jnp.int32).at[starts].max(ids + 1, mode="drop")
    e_all = jax.lax.cummax(e_seed) - 1
    b_seed = jnp.zeros(S, jnp.int32).at[starts].max(starts + 1,
                                                    mode="drop")
    base_all = jax.lax.cummax(b_seed) - 1
    return e_all, jnp.arange(S, dtype=jnp.int32) - base_all


def _make_expand_dev(nnz, n_members, chunk, wins_per_call, member_fn,
                     fill: bool):
    """Device-resident expansion over `wins_per_call` chunk windows per
    program: embeddings compact into a device buffer at a TRACED offset
    and never cross the tunnel (measured D2H is 8-22 MB/s — the round-2
    one-window-per-call form spent 110 of kcl-4's 226 s at RMAT-16
    shipping (3, 2^18) blocks home).  fill=False only counts (the exact
    buffer size for the fill pass); the count pass also accumulates the
    NEXT level's wedge total with i32 saturation (callers fall back to
    host slicing when it saturates)."""

    @jax.jit
    def run(members, e_all, koff_all, total, ctx, w0, carry):
        from gardenia_tpu.ops import rowsel
        rowptr, colidx, mem_ctx = ctx

        def win(w, carry):
            s = (w0 + w) * chunk
            j = s + jnp.arange(chunk, dtype=jnp.int32)
            e = jax.lax.dynamic_slice(e_all, (s,), (chunk,))
            k_off = jax.lax.dynamic_slice(koff_all, (s,), (chunk,))
            e = jnp.clip(e, 0, members.shape[1] - 1)
            v1 = rowsel.take(members[0], e)
            x = rowsel.take(
                colidx,
                jnp.minimum(rowsel.take(rowptr, v1) + k_off, nnz - 1))
            ok = j < total
            for i in range(1, n_members):
                vi = rowsel.take(members[i], e)
                ok = ok & member_fn(x, vi, mem_ctx)
            n_new = jnp.sum(ok.astype(jnp.int32))
            if not fill:
                count, wsum = carry
                # next level's wedge total: the next level expands from
                # members[0] again (win() enumerates N+(members[0])), so
                # the per-survivor wedge count is deg+(v1), NOT deg+(x)
                # — deg+(x) can badly underestimate in the degree-ordered
                # DAG and let the i32 overflow guard pass wrongly
                dx = jnp.where(
                    ok,
                    rowsel.take(rowptr, v1 + 1) - rowsel.take(rowptr, v1),
                    0)
                wsum = jnp.minimum(
                    wsum.astype(jnp.float32) + jnp.sum(dx,
                                                       dtype=jnp.float32),
                    jnp.float32(2**31 - 1))
                return count + n_new, wsum
            buf, offset = carry
            # nonzero puts the true indices first, so the block's
            # garbage tail past n_new is overwritten by the next
            # window's write (or masked by the final nvalid)
            idx = jnp.nonzero(ok, size=chunk, fill_value=chunk - 1)[0]
            rows = jnp.concatenate(
                [jnp.take(members, e[idx], axis=1), x[idx][None, :]],
                axis=0)
            buf = jax.lax.dynamic_update_slice(buf, rows, (0, offset))
            return buf, offset + n_new

        return jax.lax.fori_loop(0, wins_per_call, win, carry)

    return run


def _expand_level(nnz, n_members, count_only, chunk, member_fn=None):
    """Build the jitted chunk expander for embeddings with n_members
    vertices: wedge j = (embedding e, slot k into N+(v1)).  All graph
    arrays arrive via the ctx pytree argument (constants would blow the
    remote-compile request size limit at scale — HTTP 413)."""

    @partial(jax.jit, static_argnames=())
    def step(members, cum, start, total, ctx):
        from gardenia_tpu.ops import rowsel
        rowptr, colidx, mem_ctx = ctx
        # members: (n_members, N) embedding vertex columns; all indices
        # int32 — callers slice the wedge space under EMB_WEDGE_LIMIT
        j = start + jnp.arange(chunk, dtype=jnp.int32)
        e = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        e = jnp.minimum(e, members.shape[1] - 1)
        base = jnp.where(e > 0, cum[jnp.maximum(e - 1, 0)], 0)
        k_off = (j - base).astype(jnp.int32)
        v1 = rowsel.take(members[0], e)
        x = rowsel.take(colidx,
                        jnp.minimum(rowsel.take(rowptr, v1) + k_off,
                                    nnz - 1))
        ok = j < total
        test = (lambda q, r: member_fn(q, r, mem_ctx)) if member_fn \
            else (lambda q, r: _member(rowptr, colidx, nnz, q, r))
        for i in range(1, n_members):
            vi = rowsel.take(members[i], e)
            ok = ok & test(x, vi)
        if count_only:
            return jnp.sum(ok.astype(jnp.int32))
        idx = jnp.nonzero(ok, size=chunk, fill_value=chunk - 1)[0]
        n_new = jnp.sum(ok.astype(jnp.int32))
        new_members = jnp.concatenate(
            [members[:, e[idx]], x[idx][None, :]], axis=0)
        return new_members, n_new

    return step


def _member(rowptr, colidx, nnz, queries, rows):
    from gardenia_tpu.ops import rowsel
    col2d = rowsel.to_rows(colidx, nnz, 0)
    lo = rowsel.take(rowptr, rows)
    end = rowsel.take(rowptr, rows + 1)
    hi = end

    def body(_, state):
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) // 2
        v = rowsel.gather(col2d, jnp.clip(mid, 0, nnz - 1),
                          acc_dtype=jnp.int32)
        right = v < queries
        return (jnp.where(active & right, mid + 1, lo),
                jnp.where(active & ~right, mid, hi))

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return (lo < end) & \
        (rowsel.gather(col2d, jnp.clip(lo, 0, nnz - 1),
                       acc_dtype=jnp.int32) == queries)


LAST_WIN = 1 << 12
EXPAND_WINS = 64    # chunk windows per device program (bounds program
                    # runtime under the ~2-minute axon worker kill)


def _kcl_device(dag, k: int, chunk: int, member_fn, mem_ctx, ctx, deg,
                edge_lo: int = 0, edge_hi: int = None,
                use_masks: bool = False):
    """Fully device-resident kCL: embeddings never cross the tunnel
    between levels (D2H measured at 8-22 MB/s; the host-loop form spent
    half of kcl-4's RMAT-16 time shipping embedding blocks).  Each
    non-final level runs a count pass (exact buffer size + the next
    level's wedge total) then a fill pass compacting into a device
    buffer at a traced offset; the final level rides the batched
    rotation.  Returns None to fall back to the host-slice path when a
    level's wedge space approaches int32.

    edge_lo/edge_hi seed only a SLICE of the level-2 (DAG-edge)
    embeddings: expansion trees are independent per seed, so the caller
    sums slices — this keeps graphs whose level-2 wedge space exceeds
    int32 (RMAT-20: 2.47 G) on the device path instead of the
    host-slice fallback's multi-GB D2H.

    GDN_KCL_TIME=1 records a per-stage wall-clock split into
    LAST_TIMINGS (wedgestream convention), adding one scalar D2H sync
    after each fill pass so stages don't bleed into each other."""
    import os
    import time as _time
    _timing = os.environ.get("GDN_KCL_TIME") == "1"
    _t0 = _time.time()

    def _mark(key):
        nonlocal _t0
        if _timing:
            now = _time.time()
            LAST_TIMINGS[key] = round(
                LAST_TIMINGS.get(key, 0.0) + (now - _t0), 3)
            _t0 = now

    nnz = dag.nnz
    rowptr_d = ctx[0]
    src = np.repeat(np.arange(dag.m, dtype=np.int32), deg)
    if edge_hi is None:
        edge_hi = len(src)
    src = src[edge_lo:edge_hi]
    e0 = len(src)
    cap0 = LAST_WIN * T.next_pow2(max(1, -(-e0 // LAST_WIN)))
    m0 = np.zeros((2, cap0), np.int32)
    m0[0, :e0] = src
    m0[1, :e0] = np.asarray(dag.colidx)[edge_lo:edge_hi]
    members_d = jnp.asarray(m0)
    count = e0
    total_wedges = int(deg[src].sum())
    guard = int((2 ** 31) * 0.98) - chunk * EXPAND_WINS
    # candidate-mask engine (k=4 only: the final level's parents must
    # be level-2 edges for their masks to cover all prior members)
    use_masks = use_masks and k == 4 and mem_ctx is not None
    wtab = None

    from gardenia_tpu.ops import rowsel
    # total_wedges is EXACT for level 2 (host sum); for later levels it
    # is the count pass's f32-saturating estimate, used ONLY as the
    # overflow guard — the exact total is re-read from the device
    # cumsum below before any masking depends on it
    for level in range(2, k):
        if level == k - 1:
            if count == 0:
                return 0
            # round 5: class embeddings by max member chunk count and
            # run a class-specialized rotation per contiguous range —
            # class-1 windows (every member's N+ in one 128-chunk, the
            # common case) do 1/max_chunks^2 of the rotation work
            # class key: with masks the mid member v2 is already baked
            # into the parent mask, so only v1 and the new member x3
            # bound the rotation loops
            key_rows = (0, level - 1) if use_masks else \
                tuple(range(level))
            srt, _ = dag._dev(("kcl_cls_sort", level, key_rows),
                              lambda: _make_class_sort(dag, key_rows))
            members_s, counts = srt(members_d, jnp.int32(count),
                                    mem_ctx)
            counts = np.asarray(counts)
            _mark(f"l{level}_clsort_s")
            # <= 2^23 embeddings per device program: the whole-buffer
            # call ran ~3x the axon worker's ~2-minute kill at a
            # RMAT-20 slice (~46M triangles); slice shapes pow2-snap in
            # LAST_WIN units so they repeat across calls (one compile
            # per (class, shape)); FIN_CH column padding keeps every
            # dynamic_slice in-bounds without start clamping
            FIN_CH = 1 << 23
            n_rows = members_s.shape[0]
            members_s = jnp.concatenate(
                [members_s,
                 jnp.zeros((n_rows, min(FIN_CH, members_s.shape[1])),
                           jnp.int32)], axis=1)
            tot = 0
            off = 0
            for ci_, cnt in enumerate(counts):
                cnt = int(cnt)
                if cnt == 0:
                    continue
                mc = 1 << ci_
                if use_masks:
                    last = dag._dev(
                        ("kcl_last_rotm", LAST_WIN, mc),
                        lambda mc=mc: _make_last_level_rotate_masked(
                            dag, LAST_WIN, mc))
                else:
                    last = dag._dev(
                        ("kcl_last_rot", level, LAST_WIN, mc),
                        lambda mc=mc: _make_last_level_rotate(
                            dag, level, LAST_WIN, mc))
                for o2 in range(off, off + cnt, FIN_CH):
                    n = min(off + cnt - o2, FIN_CH)
                    npad = LAST_WIN * T.next_pow2(-(-n // LAST_WIN))
                    npad = min(npad, members_s.shape[1] - o2)
                    win = jax.lax.dynamic_slice(
                        members_s, (0, o2), (n_rows, npad))
                    out = (last(win, wtab, jnp.int32(n), mem_ctx)
                           if use_masks else
                           last(win, jnp.int32(n), mem_ctx))
                    tot += int(np.asarray(out).astype(np.int64).sum())
                    if _timing:
                        LAST_TIMINGS[f"final_c{mc}_n"] = (
                            LAST_TIMINGS.get(f"final_c{mc}_n", 0) + n)
                    _mark(f"final_c{mc}_s")
                off += cnt
            return tot
        if total_wedges == 0:
            return 0
        if total_wedges >= guard:
            return None                     # host-slice fallback

        # device wedge index over this level's embeddings
        cap = members_d.shape[1]
        v1 = members_d[0]
        wpe = jnp.where(
            jnp.arange(cap, dtype=jnp.int32) < count,
            rowsel.take(rowptr_d, v1 + 1) - rowsel.take(rowptr_d, v1),
            0)
        cum_d = jnp.cumsum(wpe).astype(jnp.int32)
        total_wedges = int(cum_d[-1])       # exact (guard bounds it)
        if total_wedges == 0:
            return 0
        n_w = -(-total_wedges // chunk)
        S = chunk * T.next_pow2(n_w)
        e_all, koff_all = _build_wedge_index(cum_d, S=S)
        n_calls = -(-S // (chunk * EXPAND_WINS))
        tot_t = jnp.int32(total_wedges)

        if use_masks:
            # candidate masks over the level-2 edges: the count pass
            # collapses to one popcount over edges (no wedge sweep)
            mb = dag._dev(("kcl_emask",),
                          lambda: _make_edge_masks(dag))
            wtab = mb(members_d, jnp.int32(count), mem_ctx)
            mcnt = dag._dev(("kcl_emask_count",),
                            lambda: _make_mask_count(dag))
            cnt, wsum = mcnt(wtab, members_d[0], jnp.int32(count),
                             rowptr_d)
            new_count = int(cnt)
            _mark(f"l{level}_count_s")
            next_wedges = int(float(wsum) * 1.01) + 1024
            if new_count == 0:
                return 0
            new_cap = LAST_WIN * T.next_pow2(
                -(-(new_count + chunk) // LAST_WIN))
            fill_run = dag._dev(
                ("kcl_dev_fillm", chunk, EXPAND_WINS),
                lambda: _make_fill_masked(nnz, chunk, EXPAND_WINS))
            fcarry = (jnp.zeros((level + 2, new_cap), jnp.int32),
                      jnp.int32(0))
            for c in range(n_calls):
                fcarry = fill_run(members_d, wtab, e_all, koff_all,
                                  tot_t, ctx,
                                  jnp.int32(c * EXPAND_WINS), fcarry)
            members_d = fcarry[0]
            if _timing:
                int(fcarry[1])
            _mark(f"l{level}_fill_s")
            count = new_count
            total_wedges = next_wedges
            continue

        cnt_run = dag._dev(
            ("kcl_dev_count", level, chunk, EXPAND_WINS),
            lambda level=level: _make_expand_dev(
                nnz, level, chunk, EXPAND_WINS, member_fn, False))
        carry = (jnp.int32(0), jnp.float32(0))
        for c in range(n_calls):
            carry = cnt_run(members_d, e_all, koff_all, tot_t, ctx,
                            jnp.int32(c * EXPAND_WINS), carry)
        new_count = int(carry[0])
        _mark(f"l{level}_count_s")
        # guard estimate, inflated to absorb the f32 accumulation error
        next_wedges = int(float(carry[1]) * 1.01) + 1024
        if new_count == 0:
            return 0

        new_cap = LAST_WIN * T.next_pow2(
            -(-(new_count + chunk) // LAST_WIN))
        fill_run = dag._dev(
            ("kcl_dev_fill", level, chunk, EXPAND_WINS),
            lambda level=level: _make_expand_dev(
                nnz, level, chunk, EXPAND_WINS, member_fn, True))
        fcarry = (jnp.zeros((level + 1, new_cap), jnp.int32),
                  jnp.int32(0))
        for c in range(n_calls):
            fcarry = fill_run(members_d, e_all, koff_all, tot_t, ctx,
                              jnp.int32(c * EXPAND_WINS), fcarry)
        members_d = fcarry[0]
        if _timing:
            int(fcarry[1])              # sync so the fill stage is real
        _mark(f"l{level}_fill_s")
        count = new_count
        total_wedges = next_wedges
    return 0


def kcl_solver(g, k: int, *, chunk: int = 1 << 18,
               force_expand: bool = False) -> int:
    """Reference entry KCLSolver(g, k, total, nthreads)
    (mining/kcl_dfs/kcl.h:28). g: undirected (symmetric) graph; the DAG
    orientation is applied internally like the reference driver.

    force_expand=True bypasses the k==3 -> tc_solver shortcut and runs
    the actual kcl expansion machinery (final-level rotation over edge
    embeddings) — used by the CLI's at-scale k=3 cross-check, which
    would otherwise compare tc_solver with itself."""
    assert k >= 3
    if k == 3 and not force_expand:
        # 3-cliques ARE triangles: the lane-rotation intersection kernel
        # is ~2 orders of magnitude faster than per-wedge membership
        from gardenia_tpu.solvers.tc import tc_solver
        return tc_solver(g)
    dag = g._dev(("oriented",), g.oriented)
    if dag.nnz == 0:
        return 0
    rowptr, colidx = dag.device_csr()
    nnz = dag.nnz
    deg = np.diff(dag.rowptr)
    # chunk-compare membership pays max_chunks row gathers per test;
    # profitable while the DAG's widest adjacency stays within a few
    # chunks, else fall back to binary search
    max_chunks = -(-int(deg.max()) // 128) if len(deg) else 1
    if max_chunks <= 8:
        member_fn, mem_ctx = dag._dev(("kcl_member_fn",),
                                      lambda: _make_chunk_member(dag))
    else:
        member_fn, mem_ctx = None, None
    ctx = (rowptr, colidx, mem_ctx)

    if member_fn is not None:
        # slice the level-2 seeds so each slice's wedge space stays
        # int32 (expansion trees are independent per DAG edge, so the
        # slice totals sum exactly); one slice = the common case
        src_all = np.repeat(np.arange(dag.m, dtype=np.int32), deg)
        cum = np.cumsum(deg[src_all].astype(np.int64))
        # HBM-motivated (not just int32): the device wedge index
        # materializes two (S,) i32 arrays plus the next level's
        # members buffer — 2^28 wedges/slice keeps that ~2.5 GB
        # (a 1.9 G-wedge slice OOM'd the 16 GB HBM at RMAT-20) while
        # RMAT-16-class graphs stay single-slice
        budget = 1 << 28
        cuts = [0]
        while cuts[-1] < nnz and cum[-1] > 0:
            nxt = int(np.searchsorted(
                cum, (cum[cuts[-1] - 1] if cuts[-1] else 0) + budget,
                side="right"))
            cuts.append(max(min(nxt, nnz), cuts[-1] + 1))
            if cuts[-1] >= nnz:
                break
        total_dev = 0
        ok = True
        for lo, hi in zip(cuts, cuts[1:] + [nnz]):
            if lo >= hi:
                continue
            got = _kcl_device(dag, k, chunk, member_fn, mem_ctx, ctx,
                              deg, lo, hi, use_masks=USE_EDGE_MASKS)
            if got is None:
                ok = False      # a deeper level tripped the guard
                break
            total_dev += got
        if ok:
            return total_dev

    # level-2 embeddings = DAG edges
    src = np.repeat(np.arange(dag.m, dtype=np.int32), deg)
    members = np.stack([src, np.asarray(dag.colidx)])   # (2, E)
    total = 0
    for level in range(2, k):
        count_only = level == k - 1
        wedge_per_emb = deg[members[0]].astype(np.int64)
        if int(wedge_per_emb.sum()) == 0:
            return total
        if count_only and member_fn is not None:
            # final level: batch rotation intersection (one chunk-row
            # gather per embedding member instead of per wedge probe);
            # windows loop device-side, host slices bound HBM + the
            # ~2-minute worker program limit
            WIN = 1 << 12
            last = dag._dev(("kcl_last_rot", level, WIN),
                            lambda: _make_last_level_rotate(dag, level,
                                                            WIN))
            CH = 1 << 23
            N = members.shape[1]
            for lo in range(0, N, CH):
                msl = members[:, lo:lo + CH]
                n = msl.shape[1]
                # pow2-snap the window count: each distinct shape is a
                # multi-minute axon recompile
                npad = WIN * T.next_pow2(-(-n // WIN))
                if n < npad:
                    msl = np.concatenate(
                        [msl, np.zeros((level, npad - n), np.int32)],
                        axis=1)
                out = last(jnp.asarray(msl), jnp.int32(n), mem_ctx)
                total += int(np.asarray(out).astype(np.int64).sum())
            return total
        step = dag._dev(
            ("kcl_step", level, count_only, chunk),
            lambda: _expand_level(nnz, level, count_only, chunk,
                                  member_fn))
        outs: List[np.ndarray] = []
        # embedding-range slices keep every device index int32; >2^31
        # wedge spaces just take more slices
        for lo, hi in wedge_slices(wedge_per_emb, EMB_WEDGE_LIMIT):
            msl = members[:, lo:hi]
            cum = np.cumsum(wedge_per_emb[lo:hi]).astype(np.int32)
            total_wedges = int(cum[-1])
            if total_wedges == 0:
                continue
            members_d = jnp.asarray(msl)
            cum_d = jnp.asarray(cum)
            for start in range(0, total_wedges, chunk):
                if count_only:
                    total += int(step(members_d, cum_d,
                                      jnp.int32(start),
                                      jnp.int32(total_wedges), ctx))
                else:
                    new_m, n_new = step(members_d, cum_d,
                                        jnp.int32(start),
                                        jnp.int32(total_wedges), ctx)
                    n_new = int(n_new)
                    if n_new:
                        outs.append(np.asarray(new_m)[:, :n_new])
        if not count_only:
            if not outs:
                return 0
            members = np.concatenate(outs, axis=1)
    return total


def kcl_verifier(g, k: int) -> int:
    """Serial oracle: DFS clique extension over the DAG (the reference
    verifier re-runs the solver serially, mining/kcl_dfs/verifier.cc)."""
    dag = g.oriented()
    rp, ci = dag.rowptr, dag.colidx
    neigh = [set(ci[rp[v]:rp[v + 1]].tolist()) for v in range(dag.m)]

    def extend(members, cands, depth):
        if depth == k:
            return len(cands)
        total = 0
        for x in cands:
            total += extend(members + [x], cands & neigh[x], depth + 1)
        return total

    total = 0
    for v in range(dag.m):
        total += extend([v], neigh[v], 2)
    return total
