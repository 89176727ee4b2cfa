"""BFS — direction-optimizing (Beamer) breadth-first search.

Reference: src/bfs/{bfs.h,omp_beamer.cc,linear_lb.cu,fusion.cu}.  Output
contract: dist[v] = hop depth from source, MYINFINITY if unreachable
(omp_beamer.cc:166-169).

TPU variants:
  'pull'  — dense bottom-up every level inside one lax.while_loop: the
            frontier is an i32 mask; a level is one or-and-style slab SpMV
            (count of frontier in-neighbors) over unvisited rows.  No host
            sync at all — the TPU analog of the reference's fusion.cu
            (GlobalBarrier persistent kernel).
  'do'    — Beamer direction-optimizing: host-driven level loop that
            switches between a COMPACTED top-down step (frontier ids ->
            flattened out-edges via expand_frontier_edges, scatter-min on
            depths — the linear_lb mapping) and the dense bottom-up step,
            using the reference's alpha=15 / beta=18 heuristic
            (omp_beamer.cc:111,136-149).  Work-optimal on low-frontier
            levels; pays one small host readback per level like the
            reference's non-fused CUDA variants.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops import I32_PLUS_TIMES, spmv_ell
from gardenia_tpu.ops.frontier import (
    compact_mask, expand_frontier_edges, frontier_degree_sum)

ALPHA = 15   # reference omp_beamer.cc:111
BETA = 18

INF = np.int32(T.MYINFINITY)


class BFSResult(NamedTuple):
    dist: jax.Array        # i32[m], MYINFINITY when unreachable
    iterations: jax.Array  # i32


def _resolve_layout(layout: str) -> str:
    if layout != "auto":
        return layout
    from gardenia_tpu.ops import rowsel
    return "hybrid" if rowsel.enabled() else "ell"


def _hybrid_ctx(g):
    """(relabeled graph, device hybrid reverse matrix, new_of_old) —
    the production sweep context shared by pull/do_fused on TPU."""
    from gardenia_tpu.core.relabel import relabeled
    rel = relabeled(g)
    return rel.graph, rel.graph.hybrid(reverse=True), \
        jnp.asarray(rel.new_of_old)


def _count_sweep(m: int, in_ell=None):
    """frontier mask -> in-neighbour counts, as a fn(hyb, mask).
    hyb None selects the ELL path (captured in_ell)."""
    def sweep(hyb, mask):
        if hyb is None:
            return spmv_ell(in_ell, mask.astype(jnp.int32),
                            semiring=I32_PLUS_TIMES, num_rows=m)
        from gardenia_tpu.ops.bsr import spmv_hybrid
        # exact split operand: measured identical to the single bf16
        # counting pass at RMAT-20 (40.4 vs 40.5 ms/apply — the sweep
        # is tail-bound, not dense-bound), so keep the exact path
        return spmv_hybrid(hyb, mask.astype(jnp.float32), num_rows=m)
    return sweep


def _bfs_pull_loop(sweep, m: int):
    def run(source, hyb):
        dist0 = jnp.full((m,), INF, jnp.int32).at[source].set(0)
        frontier0 = jnp.zeros((m,), bool).at[source].set(True)

        def cond(state):
            _, frontier, _ = state
            return jnp.any(frontier)

        def body(state):
            dist, frontier, depth = state
            cnt = sweep(hyb, frontier)
            newly = jnp.logical_and(cnt > 0, dist == INF)
            dist = jnp.where(newly, depth + 1, dist)
            return dist, newly, depth + 1

        dist, _, depth = jax.lax.while_loop(
            cond, body, (dist0, frontier0, jnp.int32(0)))
        return BFSResult(dist, depth)
    return run


def bfs_pull(g, source: int, *, layout: str = "auto") -> BFSResult:
    layout = _resolve_layout(layout)

    def build():
        if layout == "hybrid":
            from gardenia_tpu.ops import rowsel
            g2, hyb, new_of_old = _hybrid_ctx(g)
            inner = _bfs_pull_loop(_count_sweep(g.m), g.m)

            def run(source, hyb_, new_of_old_):
                res = inner(rowsel.take(new_of_old_, source[None])[0],
                            hyb_)
                return BFSResult(rowsel.take(res.dist, new_of_old_),
                                 res.iterations)
            jitted = jax.jit(run)
            return lambda s: jitted(s, hyb, new_of_old)
        inner = _bfs_pull_loop(
            _count_sweep(g.m, g.ell(reverse=True)), g.m)
        jitted = jax.jit(lambda s: inner(s, None))
        return jitted

    run = g._dev(("bfs_pull_run", layout), build)
    return run(jnp.int32(source))


# --- direction-optimizing --------------------------------------------------

def _pow2_at_least(x: int, lo: int = 256) -> int:
    """Snap to powers of FOUR: halves the number of distinct compiled
    shapes in the host-driven variants (remote compiles are minutes)."""
    p = max(lo, T.next_pow2(max(int(x), 1)))
    if (p.bit_length() - 1) % 2 == 1:   # odd power of two -> next pow4
        p *= 2
    return p


def bfs_do(g, source: int) -> BFSResult:
    """Direction-optimizing BFS (host-driven level loop)."""
    m = g.m
    rowptr, colidx = g.device_csr()
    in_ell = g.ell(reverse=True)
    deg = g.device_degrees()

    @partial(jax.jit, static_argnames=("cap",))
    def td_step(dist, frontier_ids, depth, *, cap: int):
        from gardenia_tpu.ops import rowsel
        src, dst, valid, _ = expand_frontier_edges(rowptr, colidx,
                                                   frontier_ids, cap)
        unvisited = rowsel.take(dist, dst) == INF
        tgt = jnp.where(valid & unvisited, dst, m)
        dist = dist.at[tgt].min(depth + 1, mode="drop")
        newly = dist == depth + 1
        n_next = jnp.sum(newly)
        scout = frontier_degree_sum(newly, deg)
        return dist, newly, n_next, scout

    @jax.jit
    def bu_step(dist, frontier_mask, depth):
        cnt = spmv_ell(in_ell, frontier_mask.astype(jnp.int32),
                       semiring=I32_PLUS_TIMES, num_rows=m)
        newly = jnp.logical_and(cnt > 0, dist == INF)
        dist = jnp.where(newly, depth + 1, dist)
        return dist, newly, jnp.sum(newly)

    @partial(jax.jit, static_argnames=("size",))
    def compact(newly, *, size: int):
        return compact_mask(newly, size, m)

    dist = jnp.full((m,), INF, jnp.int32).at[source].set(0)
    frontier_ids = jnp.asarray([source], jnp.int32)
    frontier_mask = jnp.zeros((m,), bool).at[source].set(True)
    n_frontier = 1
    scout = int(np.asarray(deg[source]))
    edges_to_check = g.nnz
    depth = 0
    iters = 0
    while n_frontier > 0:
        if scout > edges_to_check // ALPHA:
            # bottom-up phase (omp_beamer.cc:137-149)
            awake, old_awake = n_frontier, None
            while True:
                iters += 1
                old_awake = awake
                dist, newly, n_new = bu_step(dist, frontier_mask,
                                             jnp.int32(depth))
                frontier_mask = newly
                awake = int(n_new)
                depth += 1
                if not (awake >= old_awake or awake > m // BETA):
                    break
            n_frontier = awake
            if n_frontier:
                frontier_ids = compact(frontier_mask,
                                       size=_pow2_at_least(n_frontier))
            scout = 1
        else:
            iters += 1
            edges_to_check -= scout
            cap = _pow2_at_least(scout)
            dist, newly, n_next, sc = td_step(dist, frontier_ids,
                                              jnp.int32(depth), cap=cap)
            n_frontier = int(n_next)
            scout = int(sc)
            depth += 1
            if n_frontier:
                frontier_ids = compact(newly,
                                       size=_pow2_at_least(n_frontier))
                frontier_mask = newly
    return BFSResult(dist, jnp.int32(iters))


def bfs_do_fused(g, source: int, *, layout: str = "auto") -> BFSResult:
    """Direction-optimizing BFS fused into ONE lax.while_loop: the
    top-down branch runs with a STATIC edge capacity of E/alpha — valid
    because the Beamer heuristic switches to bottom-up exactly when the
    frontier's out-edges exceed E/alpha — so both directions live inside
    lax.cond with fixed shapes and the whole solve needs zero host
    round-trips (the tunnel pays ~23 ms per readback, so the host-driven
    'do' variant loses badly on shallow graphs).

    Round-2 rework: the top-down expansion's owner search is now a
    vectorized scatter + running max (ops/frontier.py) instead of
    XLA's sequential searchsorted; compaction skips degree-0 vertices
    so the id list is capped by the same E/alpha budget; the bottom-up
    sweep rides the hybrid block-sparse layout on TPU.

    Round-4 rework (VERDICT r3 item 3): SPARSE bottom-up tiers — the
    reference's BUStep scans only unvisited rows with early exit
    (src/bfs/omp_beamer.cc:13-33), but the fused dense sweep paid a
    full O(E) hybrid pass per bottom-up level (~29 ms flat at RMAT-20,
    5 levels).  Now, when the unvisited in-edge count fits a static
    tier, the level compacts the unvisited ids and expands only THEIR
    in-edges (checking dist[neighbor] == depth — frontier membership by
    depth, no mask gather): post-explosion levels cost O(unvisited
    edges) like the reference instead of O(E)."""
    layout = _resolve_layout(layout)

    def build():
        if layout == "hybrid":
            gg, hyb, new_of_old = _hybrid_ctx(g)
        else:
            gg, hyb, new_of_old = g, None, None
        m, nnz = gg.m, gg.nnz
        rowptr, colidx = gg.device_csr()
        deg = gg.device_degrees()
        sweep = _count_sweep(m, None if layout == "hybrid"
                             else gg.ell(reverse=True))
        cap_e = T.next_pow2(max(nnz // ALPHA, 256))
        # graduated static capacities (round 3): a top-down round's
        # cost is dominated by gather/scatter work over the STATIC
        # expansion shape, so the first/last levels of a low-diameter
        # power-law traversal (frontiers of 1..10^4 edges) must not
        # pay the full E/alpha capacity.  lax.switch picks the
        # smallest tier that fits this round's out-edge count.
        # top tier clamped at 512K: expansions beyond that cost more
        # than the dense bottom-up sweep they'd replace, and
        # multi-million-slot scatters under lax.switch compile
        # pathologically on the axon toolchain (see solvers/cc.py)
        cap_t = min(cap_e, 1 << 19)
        tiers = []
        for shift in (6, 3, 0):
            ce = max(1024, cap_t >> shift)
            ci = min(T.next_pow2(max(m, 2)), ce)
            if (ci, ce) not in tiers:
                tiers.append((ci, ce))
        # bottom-up needs IN-edges; symmetric graphs reuse the forward
        # device arrays (a ("csr", True) cache key would upload a copy)
        if gg.symmetric:
            rowptr_r, colidx_r = rowptr, colidx
            deg_in = deg
        else:
            rowptr_r, colidx_r = gg.device_csr(reverse=True)
            deg_in = gg.device_degrees(reverse=True)
        bu_tiers = list(tiers)

        def run(source, hyb_, new_of_old_):
            from gardenia_tpu.ops import rowsel
            if new_of_old_ is not None:
                source = rowsel.take(new_of_old_, source[None])[0]
            dist0 = jnp.full((m,), INF, jnp.int32).at[source].set(0)
            mask0 = jnp.zeros((m,), bool).at[source].set(True)

            def make_td(cap_ids: int, ce: int):
                def td(args):
                    dist, mask, depth = args
                    # degree-0 frontier vertices contribute no edges;
                    # excluded, the id count is bounded by the scout
                    # count that selected this tier
                    ids = compact_mask(mask & (deg > 0), cap_ids, m)
                    src, dst, valid, _ = expand_frontier_edges(
                        rowptr, colidx, ids, ce)
                    unvis = rowsel.take(dist, dst) == INF
                    tgt = jnp.where(valid & unvis, dst, m)
                    dist = dist.at[tgt].min(depth + 1, mode="drop")
                    return dist, dist == depth + 1
                return td

            def make_bu_sparse(cap_ids: int, ce: int):
                def bu_sparse(args):
                    dist, mask, depth = args
                    # compact the UNVISITED rows and expand their
                    # in-edges; a row joins the frontier iff any
                    # in-neighbor sits at the current depth
                    ids = compact_mask((dist == INF) & (deg_in > 0),
                                       cap_ids, m)
                    u, w, valid, _ = expand_frontier_edges(
                        rowptr_r, colidx_r, ids, ce)
                    in_front = rowsel.take(dist, w) == depth
                    tgt = jnp.where(valid & in_front, u, m)
                    dist = dist.at[tgt].min(depth + 1, mode="drop")
                    return dist, dist == depth + 1
                return bu_sparse

            def bu(args):
                dist, mask, depth = args
                cnt = sweep(hyb_, mask)
                newly = (cnt > 0) & (dist == INF)
                return jnp.where(newly, depth + 1, dist), newly

            branches = [make_td(ci, ce) for ci, ce in tiers] \
                + [make_bu_sparse(ci, ce) for ci, ce in bu_tiers] + [bu]
            n_td = len(tiers)

            def cond(state):
                _, mask, _ = state
                return jnp.any(mask)

            def body(state):
                dist, mask, depth = state
                scout = frontier_degree_sum(mask, deg)
                idx = jnp.int32(0)
                for _, ce in tiers:
                    idx = idx + jnp.where(scout > ce, 1, 0)
                # beyond the top-down tiers the level goes bottom-up:
                # pick the smallest sparse tier that fits the unvisited
                # in-edge count, falling through to the dense sweep
                work_bu = jnp.sum(jnp.where(dist == INF, deg_in, 0))
                idx_bu = jnp.int32(0)
                for _, ce in bu_tiers:
                    idx_bu = idx_bu + jnp.where(work_bu > ce, 1, 0)
                idx = idx + jnp.where(idx == n_td, idx_bu, 0)
                dist, newly = jax.lax.switch(
                    idx, branches, (dist, mask, depth))
                return dist, newly, depth + 1

            dist, _, depth = jax.lax.while_loop(
                cond, body, (dist0, mask0, jnp.int32(0)))
            if new_of_old_ is not None:
                dist = rowsel.take(dist, new_of_old_)
            return BFSResult(dist, depth)

        if layout == "hybrid":
            jitted = jax.jit(run)
            return lambda s: jitted(s, hyb, new_of_old)
        jitted = jax.jit(lambda s: run(s, None, None))
        return jitted

    run = g._dev(("bfs_dofused_run", layout), build)
    return run(jnp.int32(source))


def bfs_multi_source(g, sources, *, layout: str = "auto") -> BFSResult:
    """Batched multi-source BFS: S sources traverse simultaneously in
    the lane dimension (state (m, S)).  On TPU the sweep rides the
    batched hybrid layout (ops/bsr.spmv_hybrid_batched): one pass over
    the dense 128x128 blocks serves all S sources on the MXU, and only
    the sparse remainder pays per-edge row gathers (which fetch whole
    per-source rows — 100% useful bytes).  CPU/testing falls back to
    the per-edge COO path (ops/spmv.spmv_batched).  Returns dist with
    shape (m, S) — the TPU-native take on the reference's multi-source
    hybrid variants (src/bfs hybrid_*)."""
    from gardenia_tpu.ops.spmv import spmv_batched
    from gardenia_tpu.solvers.bc import _coo_sorted

    layout = _resolve_layout(layout)
    m = g.m
    sources = jnp.asarray(np.asarray(sources, np.int32))
    S = sources.shape[0]

    def build():
        if layout == "hybrid":
            _, hyb, new_of_old = _hybrid_ctx(g)
        else:
            hyb, new_of_old = None, None
            in_dst, in_src = _coo_sorted(g, reverse=True)

        def sweep(hyb_, frontier):
            if hyb_ is None:
                return spmv_batched(in_dst, in_src, frontier, num_rows=m)
            from gardenia_tpu.ops.bsr import spmv_hybrid_batched
            # counting mode: only cnt > 0 is consumed, bf16 suffices
            return spmv_hybrid_batched(hyb_, frontier, num_rows=m,
                                       exact=False)

        def run(sources, hyb_, new_of_old_):
            from gardenia_tpu.ops import rowsel
            if new_of_old_ is not None:
                sources = rowsel.take(new_of_old_, sources)
            j = jnp.arange(S, dtype=jnp.int32)
            dist0 = jnp.full((m, S), INF, jnp.int32).at[sources, j].set(0)

            def cond(state):
                _, alive, _ = state
                return alive

            def body(state):
                dist, _, d = state
                frontier = (dist == d).astype(jnp.float32)
                cnt = sweep(hyb_, frontier)
                newly = (cnt > 0) & (dist == INF)
                dist = jnp.where(newly, d + 1, dist)
                return dist, jnp.any(newly), d + 1

            dist, _, depth = jax.lax.while_loop(
                cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
            if new_of_old_ is not None:
                dist = dist[new_of_old_]        # (m, S) row gather
            return BFSResult(dist, depth)

        if layout == "hybrid":
            jitted = jax.jit(run)
            return lambda s: jitted(s, hyb, new_of_old)
        jitted = jax.jit(lambda s: run(s, None, None))
        return jitted

    run = g._dev(("msbfs_run", S, layout), build)
    return run(sources)


VARIANTS = {"pull": bfs_pull, "do": bfs_do, "do_fused": bfs_do_fused}


def bfs_solver(g, source: int = 0, *, variant: str = "do") -> BFSResult:
    """Reference entry BFSSolver(g, source, dist) (src/bfs/bfs.h:43).
    Requires in-edges (need_reverse) for the pull/bottom-up steps."""
    return VARIANTS[variant](g, source)
