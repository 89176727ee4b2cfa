"""Multi-chip SSSP: 1D vertex-range partition, fused frontier
Bellman-Ford rounds under shard_map.

Each chip owns a contiguous vertex range and the weighted in-edge slabs
of that range.  A round, entirely on device:
  x_local   = dist_local where improved-last-round else INF   (frontier)
  x_full    = all_gather(x_local)                             (ICI ring)
  cand      = min-plus over the local slabs (x_full[src] + w) (VPU)
  dist'     = min(dist, cand); continue while psum(|changed|) > 0
The frontier masking mirrors the reference's data-driven worklist
(src/sssp/omp_base.cc:12-100: only bucketed vertices relax); distances
are int32 with the MYINFINITY sentinel, min-plus safe per common.h:66
(1e9 + w < 2^31).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gardenia_tpu.core import types as T
from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.parallel.partition import partition_ell_1d
from gardenia_tpu.solvers.sssp import SSSPResult

INF = np.int32(T.MYINFINITY)


def sssp_solver_dist(g, source: int = 0, *, mesh=None, n_shards=None,
                     balance: str = "edges",
                     max_rounds: int = None,
                     layout: str = "hybrid") -> SSSPResult:
    """Distributed frontier Bellman-Ford.  Returns the globally
    assembled SSSPResult (int32 distances, MYINFINITY unreachable).

    layout='hybrid' (default, round 5): each shard relaxes through the
    PRODUCTION degree-relabeled hybrid layout via the masked reduce-min
    min-plus (ops/bsr.spmv_hybrid_min_plus over a stacked HybridMatrix
    shard).  'ell' keeps the round-4 all-slab path."""
    if layout == "hybrid":
        return _sssp_dist_hybrid(g, source, mesh=mesh, n_shards=n_shards,
                                 balance=balance, max_rounds=max_rounds)
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    if max_rounds is None:
        max_rounds = g.m + 1
    parts = g._dev(("sssp_part1d", n, balance),
                   lambda: partition_ell_1d(g, n, reverse=True,
                                            weighted=True,
                                            balance=balance))
    mb = parts.rows_per_shard
    ell_arrays = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.asarray(a), parts.ell,
        is_leaf=lambda a: a is None)

    src_pad = int(parts.pad_map(np.asarray([source]))[0])
    dist0 = np.full(n * mb, INF, np.int32)
    dist0[src_pad] = 0
    front0 = np.zeros(n * mb, bool)
    front0[src_pad] = True

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(dist_l, front_l, ell):
        buckets = tuple((r[0], c[0], v[0].astype(jnp.int32))
                        for r, c, v in ell.buckets)

        def relax(x_full):
            # sentinel column pad_n indexes the appended INF (its padded
            # weight is 0, so INF + 0 stays the no-op)
            x_ext = jnp.concatenate([x_full, jnp.full((1,), INF,
                                                      jnp.int32)])
            y = jnp.full((mb,), INF, jnp.int32)
            for rids, cols, w in buckets:
                cand = jnp.min(x_ext[cols] + w, axis=0)
                y = y.at[rids].min(cand, mode="drop")
            return y

        def cond(state):
            _, _, it, alive = state
            return jnp.logical_and(alive > 0, it < max_rounds)

        def body(state):
            dist, front, it, _ = state
            x_l = jnp.where(front, dist, INF)
            x_full = jax.lax.all_gather(x_l, "v", tiled=True)
            cand = relax(x_full)
            changed = cand < dist
            dist = jnp.minimum(dist, cand)
            alive = jax.lax.psum(jnp.sum(changed.astype(jnp.int32)), "v")
            return dist, changed, it + 1, alive

        state = (dist_l, front_l, jnp.int32(0), jnp.int32(1))
        dist, _, it, _ = jax.lax.while_loop(cond, body, state)
        return dist, it

    dist, it = jax.jit(run)(jnp.asarray(dist0), jnp.asarray(front0),
                            ell_arrays)
    return SSSPResult(jnp.asarray(parts.from_padded(np.asarray(dist))),
                      it)


def _sssp_dist_hybrid(g, source: int, *, mesh=None, n_shards=None,
                      balance: str = "edges",
                      max_rounds: int = None) -> SSSPResult:
    """Frontier Bellman-Ford over shard-stacked WEIGHTED hybrid panels
    of the degree-relabeled graph (weights ride int8/bf16/f32 panels
    with the constant-value factorization; min-plus is the masked
    reduce-min of ops/bsr.spmv_hybrid_min_plus)."""
    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.ops.bsr import spmv_hybrid_min_plus
    from gardenia_tpu.parallel.partition import partition_hybrid_stacked

    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    if max_rounds is None:
        max_rounds = g.m + 1
    rel = relabeled(g)
    g2 = rel.graph
    parts = g2._dev(("sssp_stacked", n, balance),
                    lambda: partition_hybrid_stacked(
                        g2, n, reverse=True, weighted=True,
                        balance=balance))
    mb = parts.rows_per_shard
    hyb = jax.tree_util.tree_map(jnp.asarray, parts.hyb)

    src_rel = int(np.asarray(rel.new_of_old)[source])
    src_pad = int(parts.pad_map(np.asarray([src_rel]))[0])
    dist0 = np.full(parts.padded_size(), INF, np.int32)
    dist0[src_pad] = 0
    front0 = np.zeros(parts.padded_size(), bool)
    front0[src_pad] = True

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(dist_l, front_l, hyb_s):
        local = jax.tree_util.tree_map(lambda a: a[0], hyb_s)

        def cond(state):
            _, _, it, alive = state
            return jnp.logical_and(alive > 0, it < max_rounds)

        def body(state):
            dist, front, it, _ = state
            x_l = jnp.where(front, dist, INF)
            x_full = jax.lax.all_gather(x_l, "v", tiled=True)
            cand = spmv_hybrid_min_plus(local, x_full, num_rows=mb,
                                        sentinel=int(INF))
            changed = cand < dist
            dist = jnp.minimum(dist, cand)
            alive = jax.lax.psum(jnp.sum(changed.astype(jnp.int32)), "v")
            return dist, changed, it + 1, alive

        state = (dist_l, front_l, jnp.int32(0), jnp.int32(1))
        dist, _, it, _ = jax.lax.while_loop(cond, body, state)
        return dist, it

    dist, it = jax.jit(run)(jnp.asarray(dist0), jnp.asarray(front0),
                            hyb)
    dist_rel = parts.from_padded(np.asarray(dist))
    return SSSPResult(
        jnp.asarray(dist_rel[np.asarray(rel.new_of_old, np.int64)]), it)
