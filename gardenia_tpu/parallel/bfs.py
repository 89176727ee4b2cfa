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
                    balance: str = "edges",
                    layout: str = "hybrid") -> BFSResult:
    """Distributed bottom-up BFS.  layout='hybrid' (default, round 3)
    sweeps each shard's row range through the production hybrid panel
    layout — frontier counts only need sign fidelity, so panels run one
    bf16 MXU pass; 'ell' keeps the round-2 all-slab gathers."""
    if layout == "hybrid":
        return _bfs_dist_hybrid(g, source, mesh=mesh, n_shards=n_shards,
                                balance=balance)
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


def _bfs_dist_hybrid(g, source: int, *, mesh=None, n_shards=None,
                     balance: str = "edges") -> BFSResult:
    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.parallel.partition import partition_hybrid_1d

    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    rel = relabeled(g)
    g2 = rel.graph
    m = g2.m
    # shared with _pr_dist_hybrid via the same cache key
    parts = g2._dev(("hybrid_part1d", n, balance),
                    lambda: partition_hybrid_1d(g2, n, reverse=True,
                                                balance=balance))
    mb = parts.rows_per_shard
    mbB = mb // 128
    widths = [w for w, _, _, _ in parts.panels]
    panels = tuple((jnp.asarray(pn), jnp.asarray(sr), jnp.asarray(ro))
                   for _, pn, sr, ro in parts.panels)
    rem = jax.tree_util.tree_map(jnp.asarray, parts.rem)

    src_new = int(rel.new_of_old[source])
    src_pad = int(parts.bounds[0])   # recompute below via pad map
    sshard = int(np.searchsorted(parts.bounds, src_new,
                                 side="right") - 1)
    src_pad = sshard * mb + (src_new - int(parts.bounds[sshard]))
    dist0 = np.full(n * mb, INF, np.int32)
    dist0[src_pad] = 0
    frontier0 = np.zeros(n * mb, np.float32)
    frontier0[src_pad] = 1.0

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(dist_l, frontier_l, panels_l, rem_l):
        pls = tuple((w, p[0], s[0], r[0]) for w, (p, s, r)
                    in zip(widths, panels_l))
        rbuckets = tuple((r[0], c[0], None) for r, c, _ in rem_l.buckets)

        def local_count(x_full):
            # counting sweep: one bf16 pass (only cnt > 0 is consumed)
            xb = x_full.astype(jnp.bfloat16).reshape(-1, 128, 1)
            y3d = jnp.zeros((mbB, 128), jnp.float32)
            for w, panel, srct, rows in pls:
                R = panel.shape[0]
                a = panel.astype(jnp.bfloat16) \
                    if panel.dtype != jnp.float32 else panel
                xg = xb[srct].reshape(R, w * 128, 1)
                if a.dtype == jnp.float32:
                    xg = xg.astype(jnp.float32)
                part = jnp.einsum("riw,rwk->rik", a, xg,
                                  preferred_element_type=jnp.float32)
                y3d = y3d.at[rows].add(part[..., 0], mode="drop")
            y = y3d.reshape(-1)
            x_ext = jnp.concatenate(
                [x_full, jnp.zeros((1,), jnp.float32)])
            for rids, cols, _ in rbuckets:
                y = y.at[rids].add(jnp.sum(x_ext[cols], axis=0),
                                   mode="drop")
            return y

        def cond(state):
            _, _, _, alive = state
            return alive > 0

        def body(state):
            dist, frontier, depth, _ = state
            f_full = jax.lax.all_gather(frontier, "v", tiled=True)
            cnt = local_count(f_full)
            newly = (cnt > 0.5) & (dist == INF)
            dist = jnp.where(newly, depth + 1, dist)
            alive = jax.lax.psum(jnp.sum(newly.astype(jnp.int32)), "v")
            return dist, newly.astype(jnp.float32), depth + 1, alive

        state = (dist_l, frontier_l, jnp.int32(0), jnp.int32(1))
        dist, _, depth, _ = jax.lax.while_loop(cond, body, state)
        return dist, depth

    dist, depth = jax.jit(run)(jnp.asarray(dist0),
                               jnp.asarray(frontier0), panels, rem)
    dist_new = parts.from_padded(np.asarray(dist))
    return BFSResult(jnp.asarray(dist_new[rel.new_of_old]), depth)


def bfs_multi_source_dist(g, sources, *, mesh=None,
                          n_shards=None) -> BFSResult:
    """Data-parallel batched multi-source BFS: the source batch is
    SHARDED across the mesh while the graph replicates — each chip
    level-traverses its S/n sources in the lane dimension with zero
    inter-chip traffic (independent problems), and only the level
    counter reduces at the end.  Composes the two batching axes native
    to this hardware: lanes within a chip (solvers/bfs.py
    bfs_multi_source) x data parallelism across chips.  Returns dist
    (m, S) sharded along S.  Reference analog: running the per-source
    loop of src/bc/omp_base.cc:69 across GPUs."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    sources = np.asarray(sources, np.int32)
    S = len(sources)
    if S % n:
        raise ValueError(f"the mesh size ({n}) must divide the "
                         f"source count ({S})")
    m = g.m
    Sl = S // n

    def build():
        from gardenia_tpu.solvers.bc import _coo_sorted
        in_dst, in_src = _coo_sorted(g, reverse=True)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P("v"), P(), P()),
                 out_specs=(P(None, "v"), P()))
        def run(src_l, in_dst_, in_src_):
            j = jnp.arange(Sl, dtype=jnp.int32)
            dist0 = jnp.full((m, Sl), INF, jnp.int32).at[src_l, j].set(0)

            def cond(state):
                _, alive, _ = state
                return alive

            def body(state):
                dist, _, d = state
                frontier = (dist == d).astype(jnp.float32)
                gathered = frontier[in_src_]
                cnt = jax.ops.segment_sum(gathered, in_dst_,
                                          num_segments=m,
                                          indices_are_sorted=True)
                newly = (cnt > 0) & (dist == INF)
                dist = jnp.where(newly, d + 1, dist)
                return dist, jnp.any(newly), d + 1

            # initial alive derives from dist0 so its varying-axis type
            # matches the loop body's (shard_map vma tracking)
            dist, _, depth = jax.lax.while_loop(
                cond, body, (dist0, jnp.any(dist0 == 0), jnp.int32(0)))
            return dist, jax.lax.pmax(depth, "v")

        jitted = jax.jit(run)
        return lambda s: jitted(s, in_dst, in_src)

    run = g._dev(("msbfs_dp_run", S, id(mesh)), build,
                 retain=mesh)
    dist, depth = run(jnp.asarray(sources))
    return BFSResult(dist, depth)
