"""Multi-chip PageRank: 1D vertex-range partition under shard_map.

Each chip owns a contiguous vertex range (equal-vertex or edge-balanced,
see parallel/partition.py) and the in-edge slabs of that range.  Per
iteration, entirely on device:
  contrib_local = scores_local / out_degree_local        (VPU)
  contrib_full  = all_gather(contrib_local)              (ICI ring)
  incoming      = local slab SpMV over contrib_full      (VPU)
  scores_local' = base + kDamp * incoming
  err           = psum(sum |delta|)                      (ICI)
The convergence while_loop runs inside shard_map, so multi-chip PR has no
host round-trips at all (the reference's closest analog, pr/partition.cu,
syncs through global memory between segment and merge kernels each
iteration).
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
from gardenia_tpu.solvers.pr import KDAMP, EPSILON, MAX_ITER, PRResult


def pr_solver_dist(g, *, mesh=None, n_shards=None,
                   epsilon: float = EPSILON, max_iter: int = MAX_ITER,
                   balance: str = "vertices") -> PRResult:
    """Distributed pull PageRank. Returns globally-assembled PRResult."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    parts = partition_ell_1d(g, n, reverse=True, balance=balance)
    mb = parts.rows_per_shard
    m = g.m
    base = np.float32((1.0 - KDAMP) / m)
    kd = np.float32(KDAMP)

    deg = parts.to_padded(g.degrees.astype(np.float32), 0.0)
    valid = parts.to_padded(np.ones(m, np.float32), 0.0)
    scores0 = parts.to_padded(np.full(m, 1.0 / m, np.float32), 0.0)
    ell_arrays = jax.tree_util.tree_map(jnp.asarray, parts.ell)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v"), P("v")),
             out_specs=(P("v"), P(), P()))
    def run(scores_l, deg_l, valid_l, ell):
        # shard_map blocks keep the leading shard axis (size 1): drop it
        buckets = tuple(
            (r[0], c[0], None if v is None else v[0])
            for r, c, v in ell.buckets)
        safe_deg = jnp.maximum(deg_l, 1.0)

        def local_spmv(x_full):
            x_ext = jnp.concatenate(
                [x_full, jnp.zeros((1,), jnp.float32)])
            y = jnp.zeros((mb,), jnp.float32)
            for rids, cols, _ in buckets:
                partial_ = jnp.sum(x_ext[cols], axis=0)
                y = y.at[rids].add(partial_, mode="drop")
            return y

        def cond(state):
            _, _, it, err = state
            return jnp.logical_and(it < max_iter, err >= epsilon)

        def body(state):
            scores, errs, it, _ = state
            contrib_l = jnp.where(deg_l > 0, scores / safe_deg, 0.0)
            contrib_full = jax.lax.all_gather(contrib_l, "v", tiled=True)
            incoming = local_spmv(contrib_full)
            new = (base + kd * incoming) * valid_l
            err = jax.lax.psum(jnp.sum(jnp.abs(new - scores)), "v")
            errs = errs.at[it].set(err)
            return new, errs, it + 1, err

        errs0 = jnp.full((max_iter,), jnp.inf, jnp.float32)
        state = (scores_l, errs0, jnp.int32(0), jnp.float32(jnp.inf))
        scores, errs, it, _ = jax.lax.while_loop(cond, body, state)
        return scores, errs, it

    scores, errs, it = jax.jit(run)(
        jnp.asarray(scores0), jnp.asarray(deg), jnp.asarray(valid),
        ell_arrays)
    return PRResult(jnp.asarray(parts.from_padded(np.asarray(scores))),
                    it, errs)
