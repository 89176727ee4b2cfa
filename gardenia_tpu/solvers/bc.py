"""BC — betweenness centrality (Brandes, single source).

Reference: src/bc/{bc.h,omp_base.cc}: forward parallel BFS records depths
and path counts (sigma), marking successor edges in an edge Bitmap with
per-depth frontier boundaries; backward pass accumulates dependencies
delta level by level; scores normalized by the max (omp_base.cc:14-110).

TPU design: both passes are dense level-synchronous semiring SpMVs — no
edge bitmap needed because "successor" is recoverable from the depth
array (succ(u,v) <=> depth[v] == depth[u]+1):
  forward  d: sigma += A_in  @ (sigma where depth == d)      on rows with
              depth == d+1 (plus-times SpMV, newly discovered rows)
  backward d: delta[u] = sigma[u] * sum over out-nbrs v at depth d+1 of
              (1+delta[v])/sigma[v]   for rows at depth d
Both loops run fused in lax.while_loop with on-device level counters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops import F32_PLUS_TIMES, I32_PLUS_TIMES, spmv_ell

INF = np.int32(T.MYINFINITY)


class BCResult(NamedTuple):
    scores: jax.Array      # f32[m], normalized by max
    iterations: jax.Array  # i32 (forward levels)


def bc_batched(g, sources, *, layout: str = "auto") -> BCResult:
    """Batched multi-source Brandes: all sources traverse SIMULTANEOUSLY
    in the lane dimension — state is (m, S), so S sources cost roughly
    one traversal.  On TPU both passes ride the batched hybrid layout
    (ops/bsr.spmv_hybrid_batched): one pass over the dense 128x128
    blocks serves all S sources on the MXU (split-bf16 exact products —
    sigma path counts and delta ratios need accuracy); CPU/testing uses
    the per-edge COO path.  Replaces the reference's sequential
    num_iters loop (src/bc/omp_base.cc:69) with the TPU-natural
    batching."""
    from gardenia_tpu.solvers.bfs import _resolve_layout
    layout = _resolve_layout(layout)
    m = g.m
    sources = jnp.asarray(np.asarray(sources, np.int32))
    S = sources.shape[0]
    from gardenia_tpu.ops.spmv import spmv_batched

    def build():
        if layout == "hybrid":
            from gardenia_tpu.core.relabel import relabeled
            rel = relabeled(g)
            hyb_in = rel.graph.hybrid(reverse=True)
            hyb_out = rel.graph.hybrid(reverse=False)
            new_of_old = jnp.asarray(rel.new_of_old)
        else:
            hyb_in = hyb_out = new_of_old = None
            in_dst, in_src = _coo_sorted(g, reverse=True)
            out_src, out_dst = _coo_sorted(g, reverse=False)

        def run(sources, hyb_in_, hyb_out_, new_of_old_):
            from gardenia_tpu.ops import rowsel
            if new_of_old_ is not None:
                sources = rowsel.take(new_of_old_, sources)
            j = jnp.arange(S, dtype=jnp.int32)
            depth0 = jnp.full((m, S), INF, jnp.int32) \
                .at[sources, j].set(0)
            sigma0 = jnp.zeros((m, S), jnp.float32) \
                .at[sources, j].set(1.0)

            def pull_in(x):
                if hyb_in_ is None:
                    return spmv_batched(in_dst, in_src, x, num_rows=m)
                from gardenia_tpu.ops.bsr import spmv_hybrid_batched
                return spmv_hybrid_batched(hyb_in_, x, num_rows=m)

            def pull_out(x):
                if hyb_out_ is None:
                    return spmv_batched(out_src, out_dst, x, num_rows=m)
                from gardenia_tpu.ops.bsr import spmv_hybrid_batched
                return spmv_hybrid_batched(hyb_out_, x, num_rows=m)

            def fcond(state):
                _, _, alive, _ = state
                return alive

            def fbody(state):
                depth, sigma, _, d = state
                # one pull serves both discovery and path counts: sigma
                # on the frontier is >= 1, so paths > 0 iff the vertex
                # has an on-level in-neighbor (0.5 guards the split
                # -bf16 2^-16 rounding)
                on_level = depth == d
                paths = pull_in(jnp.where(on_level, sigma, 0.0))
                newly = (paths > 0.5) & (depth == INF)
                depth = jnp.where(newly, d + 1, depth)
                sigma = jnp.where(newly, paths, sigma)
                return depth, sigma, jnp.any(newly), d + 1

            depth, sigma, _, max_d = jax.lax.while_loop(
                fcond, fbody, (depth0, sigma0, jnp.bool_(True),
                               jnp.int32(0)))

            def bcond(state):
                _, d = state
                return d >= 0

            def bbody(state):
                delta, d = state
                w = jnp.where(depth == d + 1, (1.0 + delta) / sigma, 0.0)
                acc = pull_out(w)
                delta = jnp.where(depth == d, sigma * acc, delta)
                return delta, d - 1

            delta, _ = jax.lax.while_loop(
                bcond, bbody, (jnp.zeros((m, S), jnp.float32), max_d - 1))
            scores = jnp.sum(delta, axis=1)
            if new_of_old_ is not None:
                scores = rowsel.take(scores, new_of_old_)
            biggest = jnp.maximum(jnp.max(scores), 1e-30)
            return BCResult(scores / biggest, max_d)

        if layout == "hybrid":
            jitted = jax.jit(run)
            return lambda s: jitted(s, hyb_in, hyb_out, new_of_old)
        jitted = jax.jit(lambda s: run(s, None, None, None))
        return jitted

    run = g._dev(("bc_batched_run", S, layout), build)
    return run(sources)


def _coo_sorted(g, reverse: bool):
    """(row_ids_sorted, col_ids) device arrays for one direction."""
    import numpy as _np

    def up():
        rp = g.in_rowptr if reverse else g.rowptr
        ci = g.in_colidx if reverse else g.colidx
        rows = _np.repeat(_np.arange(g.m, dtype=_np.int32),
                          _np.diff(rp))
        return jnp.asarray(rows), jnp.asarray(_np.asarray(ci))
    return g._dev(("coo_sorted", reverse), up)


def bc_solver(g, source: int = 0, *, num_sources: int = 1) -> BCResult:
    """Reference entry BCSolver(g, source, scores) (src/bc/bc.h:37).
    num_sources > 1 runs the batched multi-source path on consecutive
    sources starting at `source` (the reference iterates them serially,
    omp_base.cc:69)."""
    if num_sources > 1:
        sources = (np.arange(num_sources) + source) % g.m
        return bc_batched(g, sources)
    m = g.m
    in_ell = g.ell(reverse=True)
    out_ell = g.ell()

    def run(source):
        def one_source(scores, src):
            depth0 = jnp.full((m,), INF, jnp.int32).at[src].set(0)
            sigma0 = jnp.zeros((m,), jnp.float32).at[src].set(1.0)
            frontier0 = jnp.zeros((m,), jnp.int32).at[src].set(1)

            def fcond(state):
                _, _, frontier, _ = state
                return jnp.sum(frontier) > 0

            def fbody(state):
                depth, sigma, frontier, d = state
                cnt = spmv_ell(in_ell, frontier, semiring=I32_PLUS_TIMES,
                               num_rows=m)
                newly = (cnt > 0) & (depth == INF)
                depth = jnp.where(newly, d + 1, depth)
                # path counts: sum of sigma over in-neighbors one level up
                contrib = jnp.where(depth == d, sigma, 0.0)
                paths = spmv_ell(in_ell, contrib,
                                 semiring=F32_PLUS_TIMES, num_rows=m)
                sigma = jnp.where(newly, paths, sigma)
                return depth, sigma, newly.astype(jnp.int32), d + 1

            depth, sigma, _, max_d = jax.lax.while_loop(
                fcond, fbody, (depth0, sigma0, frontier0, jnp.int32(0)))

            # backward accumulation from max_d-1 down to 0
            def bcond(state):
                _, d = state
                return d >= 0

            def bbody(state):
                delta, d = state
                w = jnp.where(depth == d + 1, (1.0 + delta) / sigma, 0.0)
                acc = spmv_ell(out_ell, w, semiring=F32_PLUS_TIMES,
                               num_rows=m)
                new_delta = sigma * acc
                delta = jnp.where(depth == d, new_delta, delta)
                return delta, d - 1

            # the reference accumulates the source's delta too
            # (omp_base.cc:81-93 loops down to depth 0)
            delta, _ = jax.lax.while_loop(
                bcond, bbody, (jnp.zeros((m,), jnp.float32), max_d - 1))
            return scores + delta, max_d

        scores = jnp.zeros((m,), jnp.float32)
        iters = jnp.int32(0)
        for k in range(num_sources):
            scores, it = one_source(scores, source + k)
            iters = iters + it
        biggest = jnp.maximum(jnp.max(scores), 1e-30)
        return BCResult(scores / biggest, iters)

    jitted = g._dev(("bc_run", num_sources), lambda: jax.jit(run))
    return jitted(jnp.int32(source))
