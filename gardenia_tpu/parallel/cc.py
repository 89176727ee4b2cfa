"""Multi-chip connected components: 1D vertex-range partition, fused
min-label propagation + pointer-jump shortcutting under shard_map.

Each chip owns a contiguous vertex range and its adjacency slabs; labels
live distributed (one per owned vertex) and are PADDED-GLOBAL vertex ids
— the padded coordinate is monotone in the original id, so min-label
under padded ids equals min-label under original ids.  A round:
  comp_full = all_gather(comp_local)                       (ICI ring)
  hook:      comp' = min(comp, min over nbr slabs comp_full[nbr])
  shortcut:  comp' = comp_full[comp'] repeated (pointer jumping on the
             replicated label table — each jump is one local gather)
  continue while psum(|changed|) > 0
This is the scale-out rendering of the reference's Afforest/SV hooking +
compression (src/cc/omp_afforest.cc:37-83: Link scatters become the
gather-side min, Compress becomes the replicated-table jumps).  Input
must be symmetric (undirected), like the reference's CC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.parallel.partition import partition_ell_1d
from gardenia_tpu.solvers.cc import CCResult

_JUMPS = 4   # pointer-jump gathers per round on the replicated table


def cc_solver_dist(g, *, mesh=None, n_shards=None,
                   balance: str = "edges",
                   max_rounds: int = None,
                   layout: str = "hybrid") -> CCResult:
    """Distributed CC on a symmetric graph.  Labels converge to the
    minimum ORIGINAL vertex id of each component; the returned comp is
    in original vertex order and id space.

    layout='hybrid' (default, round 5): each shard hooks through the
    PRODUCTION degree-relabeled hybrid layout via the single-chip
    masked reduce-min (ops/bsr.spmv_hybrid_min_select on a stacked
    HybridMatrix shard) — the same kernel the single-chip CC sweeps
    use.  'ell' keeps the round-4 all-slab path."""
    if layout == "hybrid":
        return _cc_dist_hybrid(g, mesh=mesh, n_shards=n_shards,
                               balance=balance, max_rounds=max_rounds)
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    if max_rounds is None:
        max_rounds = g.m + 1
    parts = g._dev(("cc_part1d", n, balance),
                   lambda: partition_ell_1d(g, n, reverse=False,
                                            balance=balance))
    mb = parts.rows_per_shard
    pad_n = parts.padded_size()
    ell_arrays = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.asarray(a), parts.ell,
        is_leaf=lambda a: a is None)
    big = jnp.int32(pad_n)   # > any real padded label

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(comp_l, ell):
        from gardenia_tpu.ops import rowsel
        buckets = tuple((r[0], c[0], None) for r, c, _ in ell.buckets)

        def cond(state):
            _, it, alive = state
            return jnp.logical_and(alive > 0, it < max_rounds)

        def body(state):
            comp, it, _ = state
            comp_full = jax.lax.all_gather(comp, "v", tiled=True)
            comp_ext = jnp.concatenate([comp_full, big[None]])
            new = comp
            for rids, cols, _ in buckets:
                cand = jnp.min(comp_ext[cols], axis=0)
                srl = jnp.full((mb,), big, jnp.int32) \
                    .at[rids].min(cand, mode="drop")
                new = jnp.minimum(new, srl)
            # shortcut: labels are padded ids indexing comp_full; each
            # jump replaces a label by its (possibly stale) root label —
            # monotone non-increasing, stays within the component
            for _ in range(_JUMPS):
                new = jnp.minimum(new, rowsel.take(comp_full, new))
            changed = new != comp
            alive = jax.lax.psum(jnp.sum(changed.astype(jnp.int32)), "v")
            return new, it + 1, alive

        state = (comp_l, jnp.int32(0), jnp.int32(1))
        comp, it, _ = jax.lax.while_loop(cond, body, state)
        return comp, it

    comp0 = parts.pad_map(np.arange(g.m, dtype=np.int64))
    comp0 = parts.to_padded(comp0, np.int32(0))
    # pad slots self-label so they never propagate
    for s in range(parts.n_shards):
        lo, hi = parts.bounds[s], parts.bounds[s + 1]
        base = s * mb
        comp0[base + (hi - lo): base + mb] = \
            np.arange(base + (hi - lo), base + mb, dtype=np.int32)

    comp_p, it = jax.jit(run)(jnp.asarray(comp0), ell_arrays)
    # padded label -> original vertex id
    orig_of_padded = parts.to_padded(np.arange(g.m, dtype=np.int32),
                                     np.int32(0))
    comp = orig_of_padded[parts.from_padded(np.asarray(comp_p))]
    return CCResult(jnp.asarray(comp), it)


def _cc_dist_hybrid(g, *, mesh=None, n_shards=None,
                    balance: str = "edges",
                    max_rounds: int = None) -> CCResult:
    """Min-label hooking over shard-stacked production hybrid panels.
    Labels converge under the RELABELED id order (padded coordinates
    are monotone in relabeled id — any consistent total order works);
    the final host pass renames every component to its minimum
    ORIGINAL vertex id, preserving the public contract."""
    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.ops.bsr import spmv_hybrid_min_select
    from gardenia_tpu.parallel.partition import partition_hybrid_stacked

    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    if max_rounds is None:
        max_rounds = g.m + 1
    rel = relabeled(g)
    g2 = rel.graph
    parts = g2._dev(("cc_stacked", n, balance),
                    lambda: partition_hybrid_stacked(g2, n, reverse=False,
                                                     balance=balance))
    mb = parts.rows_per_shard
    pad_n = parts.padded_size()
    hyb = jax.tree_util.tree_map(jnp.asarray, parts.hyb)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v")),
             out_specs=(P("v"), P()))
    def run(comp_l, hyb_s):
        from gardenia_tpu.ops import rowsel
        local = jax.tree_util.tree_map(lambda a: a[0], hyb_s)

        def cond(state):
            _, it, alive = state
            return jnp.logical_and(alive > 0, it < max_rounds)

        def body(state):
            comp, it, _ = state
            comp_full = jax.lax.all_gather(comp, "v", tiled=True)
            cand = spmv_hybrid_min_select(local, comp_full,
                                          num_rows=mb, sentinel=pad_n)
            new = jnp.minimum(comp, cand)
            for _ in range(_JUMPS):
                new = jnp.minimum(new, rowsel.take(comp_full, new))
            changed = new != comp
            alive = jax.lax.psum(jnp.sum(changed.astype(jnp.int32)), "v")
            return new, it + 1, alive

        state = (comp_l, jnp.int32(0), jnp.int32(1))
        comp, it, _ = jax.lax.while_loop(cond, body, state)
        return comp, it

    comp0 = parts.pad_map(np.arange(g2.m, dtype=np.int64))
    comp0 = parts.to_padded(comp0, np.int32(0))
    for s in range(parts.n_shards):
        lo, hi = parts.bounds[s], parts.bounds[s + 1]
        base = s * mb
        comp0[base + (hi - lo): base + mb] = \
            np.arange(base + (hi - lo), base + mb, dtype=np.int32)

    comp_p, it = jax.jit(run)(jnp.asarray(comp0), hyb)
    # padded label -> relabeled id -> original id, per ORIGINAL vertex
    rel_of_padded = parts.to_padded(np.arange(g2.m, dtype=np.int32),
                                    np.int32(0))
    comp_rel = rel_of_padded[parts.from_padded(np.asarray(comp_p))]
    comp = np.asarray(rel.old_of_new, np.int64)[
        comp_rel[np.asarray(rel.new_of_old, np.int64)]]
    # rename each component to its min original id (public contract)
    minv = np.full(g.m, g.m, np.int64)
    np.minimum.at(minv, comp, np.arange(g.m, dtype=np.int64))
    return CCResult(jnp.asarray(minv[comp].astype(np.int32)), it)
