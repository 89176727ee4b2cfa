"""VC — vertex coloring, Gebremedhin-Manne speculative first-fit.

Reference: src/vc/{vc.h,omp_base.cc}: rounds of (1) speculative first-fit
— every active vertex takes the smallest color not used by any neighbor —
and (2) conflict resolution — of any conflicting edge (u,v) with
colors[u]==colors[v], the lower endpoint u<v re-enters the worklist
(omp_base.cc:8-41).  MAXCOLOR=128 (common.h:65).

TPU design: the per-thread forbiddenColors[MAXCOLOR] array becomes a
dense (m, C) forbidden table built edge-parallel with one scatter-max
into a flat (m*C,) byte vector; first-fit = argmin over the color axis;
the conflict worklist is a dense active mask.

Round-5 rework (the r5 sweep killed vc@RMAT-20 twice):

* The conflict cascade serializes the hub near-clique — measured rounds
  == num_colors exactly (48 rounds at scale 12, 74 at 14), so scale 20
  takes a few hundred rounds and ONE fused while_loop outlives the axon
  worker's ~2-minute program kill.  Rounds now run in bounded device
  segments with the host picking a tier between calls.
* After the first 2-4 rounds only the hub core stays active, but the
  fused loop paid two full O(E) edge sweeps per round.  Sparse tiers
  expand only the active vertices' out-edges (frontier compaction +
  expand_frontier_edges_tbl, static capacities like BFS/SSSP) — the
  reference analog is its conflict worklist shrinking to the conflicted
  vertices (omp_base.cc:30-41), which the dense sweep ignored.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.utils import segment


class VCResult(NamedTuple):
    colors: jax.Array      # i32[m]
    num_colors: jax.Array  # i32
    iterations: jax.Array  # i32


# per-edge rowsel gathers materialize a (chunk, 128) row table; 2^22
# slots bounds that at 2 GB — the unchunked form OOM'd the 16 GB HBM at
# RMAT-20 (s32[31.4M, 128] = 15 GB, found by the round-5 sweep)
VC_EDGE_CHUNK = 1 << 22

# sparse-tier static edge capacities (ids capped by the same number):
# the small tier serves the long tail of hub-core rounds, the big one
# the first post-explosion rounds; RMAT-20 hubs reach ~10^5 degree so
# the big tier must hold a few hubs' full neighborhoods
VC_SPARSE_CAPS = (1 << 17, 1 << 21)

# sparse rounds per device segment (each ~ms); dense rounds run one
# per call so the host can switch tiers as soon as the frontier fits
VC_ROUNDS_PER_SEGMENT = 64

# once at most this many vertices stay active, ONE core pass colors
# them all: the speculative cascade fixes O(1) hubs per round (measured
# rounds == num_colors: 74 at scale 14, 239 at RMAT-20 — 167.9 s with
# every hub round forced dense by hub degree sums), while a sequential
# exact first-fit over the core is conflict-free in a single program.
# 65536 slots = a 4 GB (K,K) byte adjacency (16 GB HBM) and a 65K-step
# device loop (~µs/step), traded against ~0.4-1 s per avoided dense
# round — at RMAT-20 a 2048 cap left ~80 cascade rounds (86.9 s) and
# 16384 still left 29 (31.1 s); the traced trajectory reaches 60K
# active by round 14
VC_CORE_CAP = 65536


def vc_solver(g, *, max_color: int = T.MAXCOLOR,
              rounds_per_segment: int = VC_ROUNDS_PER_SEGMENT) -> VCResult:
    """Reference entry int VCSolver(g, colors) (src/vc/vc.h:31).
    Requires a symmetrized graph (coloring is defined on undirected
    adjacency; the reference drivers load with symmetrize=1).

    Palette escalation: the reference's fixed forbiddenColors[128]
    (common.h:65) silently can't color a vertex whose neighborhood
    already uses all 128 colors (scale 16 already needs 111).  Here a
    saturated vertex KEEPS its state and stays active, the segment
    exits with a sticky flag, and the host doubles the palette and
    resumes the SAME carry — colors already committed are valid
    first-fits under any larger palette, so no work is redone."""
    m = g.m
    nnz = g.nnz
    n_ch = max(1, -(-nnz // VC_EDGE_CHUNK))
    CH = min(VC_EDGE_CHUNK, T.next_pow2(max(nnz, T.LANES)))

    from gardenia_tpu.ops import rowsel

    def up_dense():
        import numpy as _np
        rp = _np.asarray(g.rowptr, _np.int64)
        s = _np.repeat(_np.arange(m, dtype=_np.int32), _np.diff(rp))
        d = _np.asarray(g.colidx, _np.int32)
        pad = n_ch * CH - nnz
        # sentinel edges (m, m): inactive src, src < dst fails
        return (jnp.asarray(_np.concatenate(
                    [s, _np.full(pad, m, _np.int32)])),
                jnp.asarray(_np.concatenate(
                    [d, _np.full(pad, m, _np.int32)])))

    src, dst = g._dev(("vc_coo_pad", CH), up_dense)

    def up_sparse():
        rowptr, colidx = g.device_csr()
        rp_t = rowsel.to_rows(rowptr, m + 1, nnz)
        ci_t = rowsel.to_rows(colidx, nnz, 0)
        return rp_t, ci_t, g.device_degrees()

    rp_t, ci_t, deg = g._dev(("vc_sparse_tbl",), up_sparse)

    # carry: (colors, active, rounds, stuck=palette saturated,
    # spill=frontier outgrew this tier mid-segment)
    def _cond(state):
        _, active, _, stuck, spill = state
        return jnp.any(active) & ~stuck & ~spill

    def _first_fit(forb, colors, active):
        """Commit first-fit colors; returns (colors, sat, stuck)."""
        sat = active & (jnp.min(forb, axis=1) == 1)
        stuck = jnp.any(sat)
        fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
        return jnp.where(active & ~sat, fit, colors), sat, stuck

    def make_dense(C):
        # MERGED one-pass round (round 5): a scatter-MIN of neighbor
        # ids into the (m, C) color table serves BOTH conflict
        # detection — the reference rule "lower endpoint re-enters"
        # (omp_base.cc:30-41) is table[u, colors[u]] < u — and the
        # refit's forbidden set (table[u, c] < m), replacing the
        # two-pass forbidden-sweep + conflict-sweep form.  Simulated at
        # scale 16: identical round AND color counts; measured cost is
        # 1 gather + 1 scatter per edge instead of 4 + 2.  `active`
        # means "refit last round, test me": a vertex whose test comes
        # back clean drops out without refitting.  src/dst ride as jit
        # ARGUMENTS (a 256 MB closure constant dies with HTTP 413 in
        # the remote compiler).
        def body(state, src, dst):
            colors, active, it, _, _ = state

            def fchunk(i, tab):
                s = jax.lax.dynamic_slice(src, (i * CH,), (CH,))
                d = jax.lax.dynamic_slice(dst, (i * CH,), (CH,))
                cd = rowsel.take(colors, d)
                # pad edges (s = m) index past m*C and drop
                return tab.at[s * C + cd].min(d, mode="drop")

            tab = jax.lax.fori_loop(
                0, n_ch, fchunk,
                jnp.full((m * C,), m, jnp.int32)).reshape(m, C)
            own = jnp.take_along_axis(tab, colors[:, None], axis=1)[:, 0]
            conflicted = active & (own < jnp.arange(m, dtype=jnp.int32))
            forb = tab < m
            satrow = jnp.all(forb, axis=1)
            fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
            colors = jnp.where(conflicted & ~satrow, fit, colors)
            stuck = jnp.any(conflicted & satrow)
            return (colors, conflicted, it + 1, stuck, jnp.bool_(False))

        # one dense round per call: the host re-checks the frontier
        # after each so it can drop to a sparse tier immediately
        return segment.build_segmented_args(_cond, body, 1)

    def make_sparse(C, cap_ids, cap_e, core_cap):
        from gardenia_tpu.ops.frontier import (compact_mask,
                                               expand_frontier_edges_tbl)

        def cond_sp(state):
            # exit as soon as the frontier fits the core pass — the
            # remaining cascade (one hub per round, measured rounds ==
            # num_colors) collapses into a single sequential program
            _, active, _, stuck, spill = state
            more = _cond(state)
            if core_cap > 0:
                more &= jnp.sum(active.astype(jnp.int32)) > core_cap
            return more

        def body(state, rp_t, ci_t, deg):
            colors, active, it, _, _ = state
            cnt = jnp.sum(active.astype(jnp.int32))
            dsum = jnp.sum(jnp.where(active, deg, 0))
            fits = (cnt <= cap_ids) & (dsum <= cap_e)

            ids = compact_mask(active, cap_ids, m)
            s, d, valid, _ = expand_frontier_edges_tbl(
                rp_t, ci_t, nnz, ids, cap_e)
            # every expanded edge has an ACTIVE source by construction
            cd = rowsel.take(colors, d)
            forb = jnp.zeros((m * C,), jnp.int8).at[
                jnp.where(valid, s * C + cd, m * C)].max(
                jnp.int8(1), mode="drop").reshape(m, C)
            new_colors, sat, stuck = _first_fit(forb, colors, active)

            # conflicts among edges with >= 1 recolored endpoint (all
            # other edges were conflict-free last round and unchanged);
            # reactivate the LOWER endpoint like the reference
            ce = valid & (s != d) & (rowsel.take(new_colors, s) ==
                                     rowsel.take(new_colors, d))
            conflict = jnp.zeros((m,), jnp.int32).at[
                jnp.where(ce, jnp.minimum(s, d), m)].max(1, mode="drop")

            # an over-capacity frontier makes the whole round a no-op:
            # exit with spill and let the host pick a bigger tier
            colors = jnp.where(fits, new_colors, colors)
            active = jnp.where(fits, (conflict > 0) | sat, active)
            return (colors, active, it + fits.astype(jnp.int32),
                    fits & stuck, ~fits)

        return segment.build_segmented_args(cond_sp, body,
                                            rounds_per_segment)

    def make_core(C, K):
        """One-shot exact greedy over the <=K active vertices.

        One chunked edge sweep builds (a) the core's forbidden table
        from its NON-core neighbors' committed colors and (b) the
        core-core adjacency (the hub near-clique that serializes the
        speculative cascade).  A K-step fori_loop then first-fits the
        core in ascending-id order, ORing each chosen color into the
        later rows' forbidden columns through the adjacency — exact,
        so no conflict pass and no further rounds.  Cost ~= ONE dense
        round; replaces the O(num_colors) hub cascade."""
        from gardenia_tpu.ops.frontier import compact_mask

        @jax.jit
        def core(state, src, dst, deg):
            colors, active, it, _, _ = state
            ids = compact_mask(active, K, m)          # ascending ids
            # largest-first greedy uses measurably fewer colors than id
            # order (id order cost an extra palette escalation at
            # RMAT-20: 257 colors where the cascade fit 239); pads
            # (deg -1) sort last, keeping the slot/pad split
            dv = jnp.where(ids < m, rowsel.take(deg, ids), -1)
            ids = jnp.take(ids, jnp.argsort(-dv), axis=0)
            pos = jnp.full((m + 1,), K, jnp.int32).at[ids].set(
                jnp.arange(K, dtype=jnp.int32), mode="drop")
            pos = pos.at[m].set(K)                    # pad ids hit m

            def chunkf(i, fa):
                forb, adj = fa
                s = jax.lax.dynamic_slice(src, (i * CH,), (CH,))
                d = jax.lax.dynamic_slice(dst, (i * CH,), (CH,))
                ps = rowsel.take(pos, s)
                pd = rowsel.take(pos, d)
                cd = rowsel.take(colors, d)
                score, dcore = ps < K, pd < K
                # stale colors of core neighbors are NOT forbidden
                # (they get recolored below, through adj)
                forb = forb.at[jnp.where(score & ~dcore,
                                         ps * C + cd, K * C)].max(
                    jnp.int8(1))
                adj = adj.at[jnp.where(score & dcore,
                                       ps * K + pd, K * K)].max(
                    jnp.int8(1))
                return forb, adj

            forb, adj = jax.lax.fori_loop(
                0, n_ch, chunkf, (jnp.zeros((K * C + 1,), jnp.int8),
                                  jnp.zeros((K * K + 1,), jnp.int8)))
            forb2 = forb[:K * C].reshape(K, C)
            adj2 = adj[:K * K].reshape(K, K)

            def step(i, st):
                forb2, chosen = st
                row = jax.lax.dynamic_slice(forb2, (i, 0), (1, C))[0]
                c_i = jnp.argmin(row).astype(jnp.int32)
                sat = row[c_i] > 0
                chosen = chosen.at[i].set(jnp.where(sat, -1, c_i))
                # adj is symmetric (both edge directions scattered), so
                # read the contiguous ROW instead of a strided column
                colv = jax.lax.dynamic_slice(adj2, (i, 0),
                                             (1, K)).reshape(K, 1)
                cur = jax.lax.dynamic_slice(forb2, (0, c_i), (K, 1))
                upd = jnp.maximum(cur, jnp.where(sat, jnp.int8(0),
                                                 colv))
                return (jax.lax.dynamic_update_slice(forb2, upd,
                                                     (0, c_i)),
                        chosen)

            _, chosen = jax.lax.fori_loop(
                0, K, step, (forb2, jnp.full((K,), -1, jnp.int32)))
            valid = ids < m
            got = valid & (chosen >= 0)
            colors = colors.at[jnp.where(got, ids, m)].set(
                jnp.where(got, chosen, 0), mode="drop")
            active = jnp.zeros((m,), bool).at[
                jnp.where(valid & (chosen < 0), ids, m)].set(
                True, mode="drop")
            stuck = jnp.any(valid & (chosen < 0))
            return ((colors, active, it + 1, stuck, jnp.bool_(False)),
                    jnp.bool_(False))

        return core

    stats = g._dev(("vc_stats",), lambda: jax.jit(
        lambda a, deg: (jnp.sum(a.astype(jnp.int32)),
                        jnp.sum(jnp.where(a, deg, 0)))))

    tiers = []
    for ec in VC_SPARSE_CAPS:
        ic = min(ec, T.next_pow2(max(m, 2)))
        ec = min(ec, T.next_pow2(max(nnz, 256)))
        if (ic, ec) not in tiers:
            tiers.append((ic, ec))

    # remember the palette that worked so repeat solves (bench iters)
    # skip the saturated attempts
    C = max_color
    if max_color == T.MAXCOLOR:
        C = getattr(g, "_vc_palette", max_color)
    import os
    import time as _time
    _trace = os.environ.get("GDN_VC_TIME") == "1"
    colors = jnp.zeros((m,), jnp.int32)
    active = jnp.ones((m,), bool)
    it = jnp.int32(0)
    while True:
        cnt, dsum = (int(x) for x in stats(active, deg))
        if cnt == 0:
            break
        seg, consts, tier = None, (), "dense"
        # K sequential steps run regardless of cnt — clamp to the graph
        K = min(VC_CORE_CAP, T.next_pow2(max(m, 2)))
        if cnt <= K:
            seg = g._dev(("vc_core", C, K, CH),
                         lambda: make_core(C, K))
            consts, tier = (src, dst, deg), "core"
        for ic, ec in tiers if seg is None else ():
            if cnt <= ic and dsum <= ec:
                seg = g._dev(("vc_seg_sp", C, ic, ec, K,
                              rounds_per_segment),
                             lambda: make_sparse(C, ic, ec, K))
                consts, tier = (rp_t, ci_t, deg), f"sparse{ec}"
                break
        if seg is None:
            seg = g._dev(("vc_seg_dense", C, CH),
                         lambda: make_dense(C))
            consts = (src, dst)
        _t0 = _time.time()
        (colors, active, it, stuck, _spill), _ = seg(
            (colors, active, it, jnp.bool_(False), jnp.bool_(False)),
            *consts)
        if _trace:
            stuck = bool(stuck)   # sync so dt covers the device work
            print(f"vc[{tier}] it={int(it)} cnt={cnt} dsum={dsum} "
                  f"C={C} stuck={stuck} dt={_time.time() - _t0:.3f}s",
                  flush=True)
        if bool(stuck):
            if C >= 1 << 14:
                raise ValueError(
                    f"vertex coloring did not fit {C} colors "
                    "(degeneracy beyond the palette-escalation cap)")
            C *= 2
    if max_color == T.MAXCOLOR:
        g._vc_palette = C
    return VCResult(colors, jnp.max(colors) + 1, it)
