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
    the single-chip solver (solvers/vc.py)."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    ndev = mesh.devices.size
    m, C = g.m, max_color
    src, dst = _sharded_edges(g, ndev)

    @partial(shard_map, mesh=mesh, in_specs=(P("v"), P("v")),
             out_specs=(P(), P(), P()))
    def run(src, dst):
        src, dst = src[0], dst[0]

        def cond(state):
            _, active, _ = state
            return jnp.any(active)

        def body(state):
            from gardenia_tpu.ops import rowsel
            colors, active, it = state
            cd = rowsel.take(colors, jnp.minimum(dst, m - 1))
            asrc = rowsel.take(active, jnp.minimum(src, m - 1))
            flat = jnp.where(asrc & (src < m) & (dst < m),
                             src * C + cd, m * C)
            forb_l = jnp.zeros((m * C,), jnp.int32).at[flat].max(
                1, mode="drop")
            forb = jax.lax.psum(forb_l, "v").reshape(m, C)
            fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
            colors = jnp.where(active, fit, colors)
            cs = rowsel.take(colors, jnp.minimum(src, m - 1))
            cd2 = rowsel.take(colors, jnp.minimum(dst, m - 1))
            conf = (src < dst) & (dst < m) & (cs == cd2)
            confl = jnp.zeros((m,), jnp.int32).at[
                jnp.where(conf, src, m)].max(1, mode="drop")
            conflict = jax.lax.psum(confl, "v") > 0
            return colors, conflict, it + 1

        colors0 = jnp.zeros((m,), jnp.int32)
        active0 = jnp.ones((m,), bool)
        colors, _, it = jax.lax.while_loop(
            cond, body, (colors0, active0, jnp.int32(0)))
        return colors, jnp.max(colors) + 1, it

    colors, ncol, it = jax.jit(run)(src, dst)
    return VCResult(colors, ncol, it)


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
