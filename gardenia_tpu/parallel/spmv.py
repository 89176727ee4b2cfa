"""Multi-chip SpMV: 1D row-range partition under shard_map.

Each chip owns a contiguous row range and the weighted ELL slabs of the
edges into it; the operand vector is all-gathered over ICI and the local
slab product writes only the owned rows — the scale-out rendering of the
reference's single-device row-parallel SpMV (src/spmv/omp_base.cc:12-41,
whose OpenMP rows-per-thread split becomes the vertex-range shard).
BASELINE configs 3-4 name SpMV as a first-class distributed kernel.
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


def spmv_solver_dist(g, Ax=None, x=None, y=None, *, mesh=None,
                     n_shards=None, balance: str = "edges",
                     layout: str = "hybrid"):
    """Distributed y + A@x.  Ax defaults like the single-chip driver
    (graph weights, else the reference's synthetic 0.2 —
    src/spmv/main.cc:28-37); x defaults to 0.3.  Returns the globally
    assembled product as a device array in original vertex order.

    layout='hybrid' (default, round 5): shards sweep the PRODUCTION
    degree-relabeled weighted hybrid layout through the single-chip
    ops/bsr.spmv_hybrid (stacked HybridMatrix shards — MXU panels +
    ELL remainder, identical numerics).  'ell' keeps the round-4
    all-slab path; rectangular matrices fall back to it (relabeling
    assumes square)."""
    if Ax is None:
        Ax = np.full(g.nnz, 0.2, np.float32) if g.weights is None \
            else np.asarray(g.weights, np.float32)
    if x is None:
        x = np.full(g.n, 0.3, np.float32)
    x = np.asarray(x, np.float32)
    y0 = np.zeros(g.m, np.float32) if y is None else np.asarray(
        y, np.float32)
    if layout == "hybrid" and g.n == g.m:
        return _spmv_dist_hybrid(g, Ax, x, y0, mesh=mesh,
                                 n_shards=n_shards, balance=balance)
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    parts = g._dev(("spmv_part1d", n, balance, id(Ax)),
                   lambda: partition_ell_1d(g, n, reverse=False, ax=Ax,
                                            balance=balance),
                   retain=Ax)

    xp = parts.to_padded(x, np.float32(0.0))
    yp = parts.to_padded(y0, np.float32(0.0))
    ell_arrays = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.asarray(a), parts.ell,
        is_leaf=lambda a: a is None)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=P("v"))
    def run(x_l, y_l, ell):
        buckets = tuple((r[0], c[0], v[0]) for r, c, v in ell.buckets)
        x_full = jax.lax.all_gather(x_l, "v", tiled=True)
        # sentinel column pad_n indexes the appended zero
        x_ext = jnp.concatenate([x_full, jnp.zeros((1,), jnp.float32)])
        acc = y_l
        for rids, cols, vals in buckets:
            part = jnp.sum(vals * x_ext[cols], axis=0)
            acc = acc.at[rids].add(part, mode="drop")
        return acc

    out = jax.jit(run)(jnp.asarray(xp), jnp.asarray(yp), ell_arrays)
    return jnp.asarray(parts.from_padded(np.asarray(out)))


def _spmv_dist_hybrid(g, Ax, x, y0, *, mesh=None, n_shards=None,
                      balance: str = "edges"):
    """One all-gather + a local spmv_hybrid per shard over the stacked
    weighted hybrid of the degree-relabeled matrix.  Ax (forward-CSR
    edge order) rides through the relabeling as graph weights."""
    from gardenia_tpu.core.graph import Graph
    from gardenia_tpu.core.relabel import degree_relabel
    from gardenia_tpu.ops.bsr import spmv_hybrid
    from gardenia_tpu.parallel.partition import partition_hybrid_stacked

    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size

    def build():
        gw = Graph(g.rowptr, g.colidx, np.asarray(Ax, np.float32),
                   num_cols=g.n, symmetric=g.symmetric)
        rel = degree_relabel(gw)
        parts = partition_hybrid_stacked(rel.graph, n, reverse=False,
                                         weighted=True, balance=balance)
        return rel, parts

    rel, parts = g._dev(("spmv_stacked", n, balance, id(Ax)), build,
                        retain=Ax)
    mb = parts.rows_per_shard
    hyb = jax.tree_util.tree_map(jnp.asarray, parts.hyb)
    old_of_new = np.asarray(rel.old_of_new, np.int64)
    xp = parts.to_padded(x[old_of_new], np.float32(0.0))
    yp = parts.to_padded(y0[old_of_new], np.float32(0.0))

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=P("v"))
    def run(x_l, y_l, hyb_s):
        local = jax.tree_util.tree_map(lambda a: a[0], hyb_s)
        x_full = jax.lax.all_gather(x_l, "v", tiled=True)
        return spmv_hybrid(local, x_full, num_rows=mb, init=y_l)

    out = jax.jit(run)(jnp.asarray(xp), jnp.asarray(yp), hyb)
    y_rel = parts.from_padded(np.asarray(out))
    return jnp.asarray(y_rel[np.asarray(rel.new_of_old, np.int64)])
