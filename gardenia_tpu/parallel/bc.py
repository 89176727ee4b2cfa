"""Multi-chip betweenness centrality: source-batch data parallelism.

The source batch is SHARDED across the mesh while the graph replicates:
each chip runs the batched Brandes forward + backward passes (the lane
-batched formulation of solvers/bc.py) on its S/n sources with zero
inter-chip traffic — Brandes accumulations from distinct sources are
independent — and the per-source dependency sums psum into the global
centrality at the end.  This distributes the reference's sequential
per-source loop (src/bc/omp_base.cc:69) across chips, composing the two
batching axes native to the hardware: lanes within a chip x data
parallelism across chips (same scheme as parallel/bfs.py msbfs-dp).
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
from gardenia_tpu.solvers.bc import BCResult, _coo_sorted

INF = np.int32(T.MYINFINITY)


def bc_batched_dist(g, sources, *, mesh=None, n_shards=None,
                    layout: str = "auto") -> BCResult:
    """Distributed batched Brandes.  Returns the REPLICATED global
    BCResult (scores over all sources, normalized by the max) in
    original vertex order.

    layout='hybrid' (auto resolves like the single-chip solver): each
    chip's forward/backward pulls ride the PRODUCTION degree-relabeled
    hybrid layout (ops/bsr.spmv_hybrid_batched, replicated across the
    mesh — Brandes sources are independent, so the graph replicates
    and only the source batch shards).  'coo' keeps the segment-sum
    path (CPU tests)."""
    from gardenia_tpu.solvers.bfs import _resolve_layout
    if layout == "auto":
        layout = "hybrid" if _resolve_layout("auto") == "hybrid" \
            else "coo"
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
        if layout == "hybrid":
            from gardenia_tpu.core.relabel import relabeled
            from gardenia_tpu.ops.bsr import spmv_hybrid_batched
            rel = relabeled(g)
            hyb_in = rel.graph.hybrid(reverse=True)
            hyb_out = rel.graph.hybrid(reverse=False)
            new_of_old = jnp.asarray(rel.new_of_old)

            @partial(shard_map, mesh=mesh,
                     in_specs=(P("v"), P(), P(), P()),
                     out_specs=(P(), P()))
            def runh(src_l, hyb_in_, hyb_out_, noo_):
                from gardenia_tpu.ops import rowsel
                src_l = rowsel.take(noo_, src_l)
                j = jnp.arange(Sl, dtype=jnp.int32)
                depth0 = jnp.full((m, Sl), INF, jnp.int32) \
                    .at[src_l, j].set(0)
                sigma0 = jnp.zeros((m, Sl), jnp.float32) \
                    .at[src_l, j].set(1.0)

                def fcond(state):
                    _, _, alive, _ = state
                    return alive

                def fbody(state):
                    depth, sigma, _, d = state
                    on_level = depth == d
                    paths = spmv_hybrid_batched(
                        hyb_in_, jnp.where(on_level, sigma, 0.0),
                        num_rows=m)
                    newly = (paths > 0.5) & (depth == INF)
                    depth = jnp.where(newly, d + 1, depth)
                    sigma = jnp.where(newly, paths, sigma)
                    return depth, sigma, jnp.any(newly), d + 1

                depth, sigma, _, max_d = jax.lax.while_loop(
                    fcond, fbody,
                    (depth0, sigma0, jnp.any(depth0 == 0), jnp.int32(0)))

                def bcond(state):
                    _, d = state
                    return d >= 0

                def bbody(state):
                    delta, d = state
                    w = jnp.where(depth == d + 1,
                                  (1.0 + delta) / sigma, 0.0)
                    acc = spmv_hybrid_batched(hyb_out_, w, num_rows=m)
                    delta = jnp.where(depth == d, sigma * acc, delta)
                    return delta, d - 1

                delta, _ = jax.lax.while_loop(
                    bcond, bbody,
                    (jax.lax.pvary(jnp.zeros((m, Sl), jnp.float32), "v"),
                     max_d - 1))
                scores = jax.lax.psum(jnp.sum(delta, axis=1), "v")
                scores = rowsel.take(scores, noo_)   # back to orig order
                return scores, jax.lax.pmax(max_d, "v")

            jitted = jax.jit(runh)
            return lambda s: jitted(s, hyb_in, hyb_out, new_of_old)

        in_dst, in_src = _coo_sorted(g, reverse=True)
        out_src, out_dst = _coo_sorted(g, reverse=False)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P("v"), P(), P(), P(), P()),
                 out_specs=(P(), P()))
        def run(src_l, in_dst_, in_src_, out_src_, out_dst_):
            j = jnp.arange(Sl, dtype=jnp.int32)
            depth0 = jnp.full((m, Sl), INF, jnp.int32) \
                .at[src_l, j].set(0)
            sigma0 = jnp.zeros((m, Sl), jnp.float32) \
                .at[src_l, j].set(1.0)

            def pull(x, dst, src):
                return jax.ops.segment_sum(x[src], dst, num_segments=m,
                                           indices_are_sorted=True)

            def fcond(state):
                _, _, alive, _ = state
                return alive

            def fbody(state):
                depth, sigma, _, d = state
                on_level = depth == d
                paths = pull(jnp.where(on_level, sigma, 0.0),
                             in_dst_, in_src_)
                newly = (paths > 0.5) & (depth == INF)
                depth = jnp.where(newly, d + 1, depth)
                sigma = jnp.where(newly, paths, sigma)
                return depth, sigma, jnp.any(newly), d + 1

            depth, sigma, _, max_d = jax.lax.while_loop(
                fcond, fbody,
                (depth0, sigma0, jnp.any(depth0 == 0), jnp.int32(0)))

            def bcond(state):
                _, d = state
                return d >= 0

            def bbody(state):
                delta, d = state
                w = jnp.where(depth == d + 1, (1.0 + delta) / sigma, 0.0)
                acc = pull(w, out_src_, out_dst_)
                delta = jnp.where(depth == d, sigma * acc, delta)
                return delta, d - 1

            delta, _ = jax.lax.while_loop(
                bcond, bbody,
                (jax.lax.pvary(jnp.zeros((m, Sl), jnp.float32), "v"),
                 max_d - 1))
            scores = jax.lax.psum(jnp.sum(delta, axis=1), "v")
            return scores, jax.lax.pmax(max_d, "v")

        jitted = jax.jit(run)
        return lambda s: jitted(s, in_dst, in_src, out_src, out_dst)

    run = g._dev(("bc_dp_run", S, layout, id(mesh)), build, retain=mesh)
    scores, max_d = run(jnp.asarray(sources))
    biggest = jnp.maximum(jnp.max(scores), 1e-30)
    return BCResult(scores / biggest, max_d)
