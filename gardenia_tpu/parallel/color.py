"""Multi-chip vertex coloring and SCC: edge-sharded rounds under
shard_map (BASELINE config 5: TC/VC/SCC multichip).

Both kernels keep per-vertex state replicated (labels are small) and
shard the EDGE work — scatter-style per-edge updates run on each chip's
edge shard and merge with mesh-wide max/min reductions, the shard_map
rendering of the reference's single-device atomics:

  VC: each chip builds the forbidden-color table from its edges; tables
      merge by psum-of-max (a 0/1 table, so psum > 0 == union); first-fit
      and conflict re-queueing replicate.
  SCC: trim degree counts, forward max-id color propagation and backward
      closure each do their per-edge scatter locally and jax.lax.pmax /
      psum-combine the per-vertex results.
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
from gardenia_tpu.solvers.vc import VCResult
from gardenia_tpu.solvers.scc import SCCResult


def _sharded_edges(g, ndev):
    src = np.repeat(np.arange(g.m, dtype=np.int32), np.diff(g.rowptr))
    dst = np.asarray(g.colidx)
    per = T.round_up(max(1, -(-g.nnz // ndev)), 8)
    pad = ndev * per - g.nnz
    # sentinel m scatters are dropped
    src = np.concatenate([src, np.full(pad, g.m, np.int32)])
    dst = np.concatenate([dst, np.full(pad, g.m, np.int32)])
    return (jnp.asarray(src.reshape(ndev, per)),
            jnp.asarray(dst.reshape(ndev, per)))


def vc_solver_dist(g, *, mesh=None, n_shards=None,
                   max_color: int = T.MAXCOLOR) -> VCResult:
    """Distributed Gebremedhin-Manne coloring; exact same fixed point as
    the single-chip solver (solvers/vc.py).

    OWNER-SHARDED (round 3, VERDICT r2 item 6): edges are partitioned
    by their src's owner range (edge-balanced bounds), so each chip's
    forbidden-color scatter touches only its own (R, C) slice — the
    table memory divides by n_devices where the round-2 form psum-merged
    a full (m, C) table per chip.  Conflict re-queueing is purely local
    for the same reason (a vertex's conflicts live with its out-edges);
    colors all_gather once per round.  Padded-global vertex ids keep the
    src<dst tie-break order-isomorphic to the single-chip solver."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    ndev = mesh.devices.size
    m, C = g.m, max_color

    from gardenia_tpu.parallel.partition import edge_balanced_bounds
    bounds = edge_balanced_bounds(g.rowptr, ndev)
    R = T.round_up(max(1, int(np.max(np.diff(bounds)))), 8)
    MP = ndev * R

    def pad_map(ids):
        s = np.searchsorted(bounds, ids, side="right") - 1
        return (s * R + (ids - bounds[s])).astype(np.int32)

    src_h = np.repeat(np.arange(g.m, dtype=np.int64), np.diff(g.rowptr))
    dst_h = np.asarray(g.colidx, np.int64)
    src_p = pad_map(src_h)
    dst_p = pad_map(dst_h)
    owner = np.searchsorted(bounds, src_h, side="right") - 1
    per = T.round_up(max(1, int(np.bincount(owner,
                                            minlength=ndev).max())), 8)
    sl = np.full((ndev, per), R, np.int32)        # local src, sentinel R
    dg = np.full((ndev, per), MP, np.int32)       # padded dst, sentinel
    for s in range(ndev):
        sel = owner == s
        k = int(sel.sum())
        sl[s, :k] = src_p[sel] - s * R
        dg[s, :k] = dst_p[sel]
    src_l, dst_g = jnp.asarray(sl), jnp.asarray(dg)

    # real-vertex mask in padded coordinates (host-built, replicated)
    real_mask = np.zeros(MP, bool)
    for s in range(ndev):
        real_mask[s * R: s * R + (bounds[s + 1] - bounds[s])] = True

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v")),
             out_specs=(P("v"), P(), P()))
    def run2(src_l, dst_g, real_own):
        from gardenia_tpu.ops import rowsel
        src_l, dst_g, real_own = src_l[0], dst_g[0], real_own[0]

        def cond(state):
            return state[3] > 0

        def body(state):
            colors_own, active_own, it, _ = state
            colors = jax.lax.all_gather(colors_own, "v", tiled=True)
            cd = rowsel.take(colors, jnp.minimum(dst_g, MP - 1))
            asrc = rowsel.take(active_own, jnp.minimum(src_l, R - 1))
            flat = jnp.where(asrc & (src_l < R) & (dst_g < MP),
                             src_l * C + cd, R * C)
            forb = jnp.zeros((R * C,), jnp.int32).at[flat].max(
                1, mode="drop").reshape(R, C)
            fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
            colors_own = jnp.where(active_own, fit, colors_own)
            upd = jax.lax.all_gather(colors_own, "v", tiled=True)
            cs = rowsel.take(colors_own, jnp.minimum(src_l, R - 1))
            cd2 = rowsel.take(upd, jnp.minimum(dst_g, MP - 1))
            gsrc = jax.lax.axis_index("v") * R + src_l
            conf = (gsrc < dst_g) & (dst_g < MP) & (src_l < R) \
                & (cs == cd2)
            confl = jnp.zeros((R,), bool).at[
                jnp.where(conf, src_l, R)].set(True, mode="drop")
            n_conf = jax.lax.psum(
                jnp.sum(confl.astype(jnp.int32)), "v")
            return colors_own, confl, it + 1, n_conf

        n0 = jax.lax.psum(jnp.sum(real_own.astype(jnp.int32)), "v")
        state = (jax.lax.pvary(jnp.zeros((R,), jnp.int32), "v"),
                 real_own, jnp.int32(0), n0)
        colors_own, _, it, _ = jax.lax.while_loop(cond, body, state)
        ncol = jax.lax.pmax(
            jnp.max(jnp.where(real_own, colors_own, -1)), "v") + 1
        return colors_own, ncol, it

    real_own = jnp.asarray(real_mask.reshape(ndev, R))
    colors_p, ncol, it = jax.jit(run2)(src_l, dst_g, real_own)
    cp = np.asarray(colors_p)
    out = np.empty(m, np.int32)
    for s in range(ndev):
        lo, hi = bounds[s], bounds[s + 1]
        out[lo:hi] = cp[s * R: s * R + (hi - lo)]
    return VCResult(jnp.asarray(out), int(ncol), int(it))


def scc_solver_dist(g, *, mesh=None, n_shards=None,
                    max_rounds: int = None) -> SCCResult:
    """Distributed FB-Trim SCC; same scheme as solvers/scc.py with the
    per-edge scatters sharded and psum/pmax-merged."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    ndev = mesh.devices.size
    m = g.m
    if max_rounds is None:
        max_rounds = m + 2
    src, dst = _sharded_edges(g, ndev)

    @partial(shard_map, mesh=mesh, in_specs=(P("v"), P("v")),
             out_specs=(P(), P()))
    def run(src, dst):
        from gardenia_tpu.ops import rowsel
        src, dst = src[0], dst[0]
        vid = jnp.arange(m, dtype=jnp.int32)
        src_c = jnp.minimum(src, m - 1)
        dst_c = jnp.minimum(dst, m - 1)
        real = (src < m) & (dst < m)

        def edge_active(active):
            return real & rowsel.take(active, src_c) & \
                rowsel.take(active, dst_c)

        def cond(state):
            _, active, it = state
            return jnp.any(active) & (it < max_rounds)

        def body(state):
            root, active, it = state

            def trim_body(st):
                root, active, _ = st
                ea = edge_active(active).astype(jnp.int32)
                ind = jax.lax.psum(
                    jnp.zeros((m,), jnp.int32).at[
                        jnp.where(real, dst, m)].add(ea, mode="drop"),
                    "v")
                outd = jax.lax.psum(
                    jnp.zeros((m,), jnp.int32).at[
                        jnp.where(real, src, m)].add(ea, mode="drop"),
                    "v")
                trivial = active & ((ind == 0) | (outd == 0))
                return (jnp.where(trivial, vid, root),
                        active & ~trivial, jnp.any(trivial))

            root, active, _ = jax.lax.while_loop(
                lambda st: st[2], trim_body,
                (root, active, jnp.bool_(True)))

            def fw_body(st):
                color, _ = st
                ea = edge_active(active)
                x = jnp.where(ea, rowsel.take(color, src_c), -1)
                pushed = jax.lax.pmax(
                    jnp.zeros((m,), jnp.int32).at[
                        jnp.where(real, dst, m)].max(x, mode="drop"),
                    "v")
                new = jnp.where(active, jnp.maximum(color, pushed),
                                color)
                return new, jnp.any(new != color)

            color, _ = jax.lax.while_loop(
                lambda st: st[1], fw_body,
                (jnp.where(active, vid, -1), jnp.any(active)))

            pivots = active & (color == vid)

            def bw_body(st):
                reach, _ = st
                ea = edge_active(active) & \
                    (rowsel.take(color, src_c) ==
                     rowsel.take(color, dst_c))
                x = (ea & rowsel.take(reach, dst_c)).astype(jnp.int32)
                pushed = jax.lax.psum(
                    jnp.zeros((m,), jnp.int32).at[
                        jnp.where(real, src, m)].max(x, mode="drop"),
                    "v") > 0
                new = reach | pushed
                return new, jnp.any(new != reach)

            reach, _ = jax.lax.while_loop(
                lambda st: st[1], bw_body, (pivots, jnp.any(pivots)))
            in_scc = active & reach
            return (jnp.where(in_scc, color, root),
                    active & ~in_scc, it + 1)

        root0 = jnp.full((m,), -1, jnp.int32)
        state = (root0, jnp.ones((m,), bool), jnp.int32(0))
        root, _, it = jax.lax.while_loop(cond, body, state)
        return root, it

    root, it = jax.jit(run)(src, dst)
    return SCCResult(root, it)
