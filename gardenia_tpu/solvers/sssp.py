"""SSSP — delta-stepping / Bellman-Ford over min-plus slab SpMV.

Reference: src/sssp/{sssp.h,omp_base.cc,dstep.cu,davidson.cu}.  Distances
are int32 with MYINFINITY sentinel; the driver synthesizes unit weights
(src/sssp/main.cc:26) but real weights are honored when present.
MYINFINITY (1e9) + any edge weight stays below int32 max, so min-plus over
the sentinel is overflow-safe without masking (common.h:66).

Variants (both fully fused in one lax.while_loop, no host sync):
  'bf'    — frontier Bellman-Ford: relax out of all vertices whose distance
            improved last round (the linear_base data-driven mapping).
  'delta' — delta-stepping: per round, relax only the frontier vertices in
            the lowest occupied bucket (dist // delta == k), mirroring the
            thread-local-bin bucketing of omp_base.cc:31-97; on TPU the
            bucket is a mask and bin-voting is a device-wide min.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops import I32_MIN_PLUS, spmv_ell

INF = np.int32(T.MYINFINITY)


class SSSPResult(NamedTuple):
    dist: jax.Array        # i32[m]
    iterations: jax.Array  # i32


def _weighted_in_ell(g):
    """Min-plus needs int-valued weights in the slabs; reuse the cached
    f32 ELL (weights < 2^24 are exact in f32) but compute in int32."""
    return g.ell(reverse=True, weighted=True)


def _relax(in_ell, x_masked, m):
    """One masked min-plus relaxation: nd[v] = min over in-edges (u,w) of
    x[u] + w."""
    return spmv_ell(in_ell, x_masked, semiring=I32_MIN_PLUS, num_rows=m)


def _sssp_cond_body(g, in_ell, m: int, delta: int, use_delta: bool,
                    max_rounds: int, alpha: int = 15):
    """(cond, body) of the fused bucketed relaxation over carry
    (dist, frontier, it).  Each round relaxes the lowest occupied
    bucket (the delta-stepping near pile, src/sssp/dstep.cu:163
    near/far split: improved vertices re-enter their bucket until it
    drains, exactly the near-pile reprocessing); narrow buckets — the
    dominant case on road-class graphs — take the COMPACTED branch
    (vectorized expand + scatter-min over O(frontier edges)) and only
    wide buckets pay the dense masked min-plus sweep."""
    from gardenia_tpu.core import types as _T
    from gardenia_tpu.ops.frontier import (compact_mask,
                                           expand_frontier_edges)

    nnz = g.nnz
    rowptr, colidx = g.device_csr()
    w = g.device_weights()
    wi = jnp.ones((nnz,), jnp.int32) if w is None else w.astype(jnp.int32)
    deg = g.device_degrees()
    cap_e = _T.next_pow2(max(nnz // alpha, 256))
    cap_ids = min(_T.next_pow2(max(m, 2)), cap_e)

    from gardenia_tpu.ops import rowsel

    def cond(state):
        _, frontier, it = state
        return jnp.logical_and(jnp.any(frontier), it < max_rounds)

    def sparse(args):
        dist, active = args
        ids = compact_mask(active & (deg > 0), cap_ids, m)
        src, dst, valid, eid = expand_frontier_edges(
            rowptr, colidx, ids, cap_e)
        nd = rowsel.take(dist, src) + rowsel.take(wi, eid)
        tgt = jnp.where(valid, dst, m)
        return dist.at[tgt].min(nd, mode="drop")

    def dense(args):
        dist, active = args
        x = jnp.where(active, dist, INF)
        return jnp.minimum(dist, _relax(in_ell, x, m))

    def body(state):
        dist, frontier, it = state
        if use_delta:
            bucket = jnp.min(jnp.where(frontier, dist // delta, INF))
            active = frontier & (dist // delta == bucket)
        else:
            active = frontier
        scout = jnp.sum(jnp.where(active, deg, 0))
        new_dist = jax.lax.cond(scout <= nnz // alpha, sparse,
                                dense, (dist, active))
        improved = new_dist < dist
        return new_dist, (frontier & ~active) | improved, it + 1

    return cond, body


def sssp_hybrid(g, source: int = 0, delta: int = 1, *,
                alpha: int = 15) -> SSSPResult:
    """Frontier-size-adaptive delta-stepping (host-driven rounds).

    Low-frontier buckets — the common case on high-diameter road
    networks, the reference's dstep.cu target — expand a COMPACTED
    frontier's out-edges (cumsum + binary-search flattening) and
    scatter-min, touching O(frontier edges) instead of O(E); dense
    masked min-plus relaxation takes over when the bucket is wide
    (> E/alpha outgoing edges, mirroring the BFS direction heuristic).
    """
    from functools import partial as _partial

    from gardenia_tpu.core import types as _T
    from gardenia_tpu.ops import rowsel
    from gardenia_tpu.ops.frontier import (compact_mask,
                                           expand_frontier_edges)

    m, nnz = g.m, g.nnz
    rowptr, colidx = g.device_csr()
    w = g.device_weights()
    if w is None:
        w = jnp.ones((nnz,), jnp.float32)
    wi = w.astype(jnp.int32)
    deg = g.device_degrees()
    in_ell = _weighted_in_ell(g)
    delta = max(1, int(delta))

    @jax.jit
    def pick_bucket(dist, frontier):
        b = jnp.min(jnp.where(frontier, dist // delta, INF))
        active = frontier & (dist // delta == b)
        scout = jnp.sum(jnp.where(active, deg, 0))
        return b, active, jnp.sum(active), scout

    @_partial(jax.jit, static_argnames=("cap",))
    def sparse_relax(dist, ids, *, cap: int):
        src, dst, valid, eid = expand_frontier_edges(rowptr, colidx,
                                                     ids, cap)
        nd = rowsel.take(dist, src) + rowsel.take(wi, eid)
        tgt = jnp.where(valid, dst, m)
        new_dist = dist.at[tgt].min(nd, mode="drop")
        return new_dist, new_dist < dist

    @jax.jit
    def dense_relax(dist, active):
        x = jnp.where(active, dist, INF)
        nd = _relax(in_ell, x, m)
        new_dist = jnp.minimum(dist, nd)
        return new_dist, new_dist < dist

    @_partial(jax.jit, static_argnames=("size",))
    def compact(active, *, size: int):
        return compact_mask(active, size, m)

    def _pow2(x, lo=256):
        return max(lo, _T.next_pow2(max(int(x), 1)))

    dist = jnp.full((m,), INF, jnp.int32).at[source].set(0)
    frontier = jnp.zeros((m,), bool).at[source].set(True)
    rounds = 0
    threshold = max(1, nnz // alpha)
    while True:
        b, active, n_active, scout = pick_bucket(dist, frontier)
        n_active = int(n_active)
        if n_active == 0:
            break
        rounds += 1
        frontier = frontier & ~active
        if int(scout) <= threshold:
            ids = compact(active, size=_pow2(n_active))
            dist, improved = sparse_relax(dist, ids,
                                          cap=_pow2(int(scout)))
        else:
            dist, improved = dense_relax(dist, active)
        frontier = frontier | improved
    return SSSPResult(dist, jnp.int32(rounds))


DEFAULT_SEGMENT_ROUNDS = 4096   # ~30 s/segment at the measured
#                                 ~7 ms/round on grid-class graphs —
#                                 safely under the ~2-min worker kill


def sssp_solver(g, source: int = 0, delta: int = 1, *,
                variant: str = "delta",
                max_rounds: int = None,
                segment_rounds: int = DEFAULT_SEGMENT_ROUNDS,
                checkpointer=None) -> SSSPResult:
    """Reference entry SSSPSolver(g, source, weight, dist, delta)
    (src/sssp/sssp.h:46). Int32 edge weights come from the graph
    (g.weights) or default to 1.

    The fused bucket loop runs host-SEGMENTED (utils/segment.py): each
    device program executes at most `segment_rounds` rounds, so solves
    that need minutes (grid-1024, road-USA class) survive the axon
    worker's ~2-minute single-program kill; the carry stays on device
    between segments and optionally round-trips through `checkpointer`.
    """
    if variant == "hybrid":
        return sssp_hybrid(g, source, delta)
    if variant == "nearfar":
        from gardenia_tpu.solvers.sssp_nf import sssp_nearfar
        return sssp_nearfar(g, source, delta,
                            segment_rounds=segment_rounds)
    from gardenia_tpu.utils.segment import build_segmented, run_segmented
    m = g.m
    if max_rounds is None:
        # worst case: every round settles at least one vertex
        max_rounds = 4 * m + 16
    key = ("sssp_run", variant, int(delta), max_rounds, segment_rounds)

    def build():
        cond, body = _sssp_cond_body(
            g, _weighted_in_ell(g), m, max(1, int(delta)),
            variant == "delta", max_rounds)
        return build_segmented(cond, body, segment_rounds)

    seg = g._dev(key, build)
    dist0 = jnp.full((m,), INF, jnp.int32).at[source].set(0)
    frontier0 = jnp.zeros((m,), bool).at[source].set(True)
    (dist, _, it), _ = run_segmented(
        seg, (dist0, frontier0, jnp.int32(0)),
        checkpointer=checkpointer, checkpoint_every=1)
    return SSSPResult(dist, it)
