"""Multi-chip BFS: 1D vertex-range partition, fused level loop.

Each chip owns a vertex range and its in-edge slabs; a level is
  frontier_full = all_gather(frontier_local)            (ICI)
  newly_local   = unvisited & (count of frontier in-neighbors > 0)
  continue while psum(|newly|) > 0
This is the scale-out analog of the reference's single-GPU bottom-up
step (src/bfs/omp_beamer.cc:13-33) — the frontier all-gather plays the
role of the shared Bitmap.
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
from gardenia_tpu.solvers.bfs import BFSResult

INF = np.int32(T.MYINFINITY)


def bfs_solver_dist(g, source: int = 0, *, mesh=None, n_shards=None,
                    balance: str = "vertices") -> BFSResult:
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    parts = partition_ell_1d(g, n, reverse=True, balance=balance)
    mb = parts.rows_per_shard
    m = g.m
    ell_arrays = jax.tree_util.tree_map(jnp.asarray, parts.ell)

    src_pad = int(parts.pad_map(np.asarray([source]))[0])
    dist0 = np.full(n * mb, INF, np.int32)
    dist0[src_pad] = 0
    frontier0 = np.zeros(n * mb, np.int32)
    frontier0[src_pad] = 1

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(dist_l, frontier_l, ell):
        buckets = tuple((r[0], c[0], None) for r, c, _ in ell.buckets)

        def local_count(x_full):
            x_ext = jnp.concatenate([x_full, jnp.zeros((1,), jnp.int32)])
            y = jnp.zeros((mb,), jnp.int32)
            for rids, cols, _ in buckets:
                part = jnp.sum(x_ext[cols], axis=0)
                y = y.at[rids].add(part, mode="drop")
            return y

        def cond(state):
            _, _, _, alive = state
            return alive > 0

        def body(state):
            dist, frontier, depth, _ = state
            f_full = jax.lax.all_gather(frontier, "v", tiled=True)
            cnt = local_count(f_full)
            newly = (cnt > 0) & (dist == INF)
            dist = jnp.where(newly, depth + 1, dist)
            alive = jax.lax.psum(jnp.sum(newly.astype(jnp.int32)), "v")
            return dist, newly.astype(jnp.int32), depth + 1, alive

        state = (dist_l, frontier_l, jnp.int32(0), jnp.int32(1))
        dist, _, depth, _ = jax.lax.while_loop(cond, body, state)
        return dist, depth

    dist, depth = jax.jit(run)(jnp.asarray(dist0), jnp.asarray(frontier0),
                               ell_arrays)
    return BFSResult(jnp.asarray(parts.from_padded(np.asarray(dist))),
                     depth)
