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
                   balance: str = "edges",
                   layout: str = "hybrid") -> PRResult:
    """Distributed pull PageRank. Returns globally-assembled PRResult.

    layout='hybrid' (default, round 3): each shard sweeps its row range
    through the PRODUCTION degree-relabeled hybrid block-sparse layout
    (partition_hybrid_1d) — dense 128x128 panels on the MXU, ELL
    remainder on gathers — instead of all-ELL gathers; balance defaults
    to 'edges' (equal-vertex ranges skew per-chip work badly on
    power-law inputs).  'ell' keeps the round-2 all-slab path."""
    if layout == "hybrid":
        return _pr_dist_hybrid(g, mesh=mesh, n_shards=n_shards,
                               epsilon=epsilon, max_iter=max_iter,
                               balance=balance)
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


def _pr_dist_hybrid(g, *, mesh=None, n_shards=None,
                    epsilon: float = EPSILON, max_iter: int = MAX_ITER,
                    balance: str = "edges") -> PRResult:
    """Hybrid-layout multichip PR: degree-relabel globally, partition
    the relabeled rows edge-balanced, sweep dense panels on the MXU
    and only the remainder on gathers (VERDICT r2 item 6/9)."""
    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.ops.bsr import _split_bf16
    from gardenia_tpu.parallel.partition import partition_hybrid_1d

    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    rel = relabeled(g)
    g2 = rel.graph
    m = g2.m
    parts = g2._dev(("hybrid_part1d", n, balance),
                    lambda: partition_hybrid_1d(g2, n, reverse=True,
                                                balance=balance))
    mb = parts.rows_per_shard
    mbB = mb // 128
    pad_n = parts.padded_size()
    base = np.float32((1.0 - KDAMP) / m)
    kd = np.float32(KDAMP)

    deg = parts.to_padded(g2.degrees.astype(np.float32), 0.0)
    valid = parts.to_padded(np.ones(m, np.float32), 0.0)
    scores0 = parts.to_padded(np.full(m, 1.0 / m, np.float32), 0.0)
    # widths are STATIC (python ints are pytree leaves shard_map would
    # try to shard): keep them in the closure, ship only the arrays
    widths = [w for w, _, _, _ in parts.panels]
    panels = tuple((jnp.asarray(pn), jnp.asarray(sr), jnp.asarray(ro))
                   for _, pn, sr, ro in parts.panels)
    rem = jax.tree_util.tree_map(jnp.asarray, parts.rem)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v"), P("v"), P("v")),
             out_specs=(P("v"), P(), P()))
    def run(scores_l, deg_l, valid_l, panels_l, rem_l):
        # drop the leading size-1 shard axis shard_map leaves on blocks
        pls = tuple((w, p[0], s[0], r[0]) for w, (p, s, r)
                    in zip(widths, panels_l))
        rbuckets = tuple(
            (r[0], c[0], None if v is None else v[0])
            for r, c, v in rem_l.buckets)
        safe_deg = jnp.maximum(deg_l, 1.0)

        def local_apply(x_full):
            # dense panels: split-bf16 exact operand, one MXU pass per
            # width bucket (same numerics as single-chip ops/bsr.py)
            hi, lo = _split_bf16(x_full)
            x3d = jnp.concatenate(
                [hi.reshape(-1, 128, 1), lo.reshape(-1, 128, 1)],
                axis=2)                                  # (qx, 128, 2)
            y3d = jnp.zeros((mbB, 128), jnp.float32)
            for w, panel, srct, rows in pls:
                R = panel.shape[0]
                a = panel.astype(jnp.bfloat16) \
                    if panel.dtype != jnp.float32 else panel
                xg = x3d[srct].reshape(R, w * 128, 2)
                if a.dtype == jnp.float32:
                    xg = xg.astype(jnp.float32)
                part = jnp.einsum("riw,rwk->rik", a, xg,
                                  preferred_element_type=jnp.float32)
                part = part[..., 0] + part[..., 1]       # (R, 128)
                y3d = y3d.at[rows].add(part, mode="drop")
            y = y3d.reshape(-1)
            # ELL remainder: rowsel-class gathers over the slabs
            x_ext = jnp.concatenate(
                [x_full, jnp.zeros((1,), jnp.float32)])
            for rids, cols, _ in rbuckets:
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
            incoming = local_apply(contrib_full)
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
        panels, rem)
    # padded-relabeled -> relabeled order -> original vertex order
    rel_scores = parts.from_padded(np.asarray(scores))
    return PRResult(jnp.asarray(rel_scores[rel.new_of_old]), it, errs)
