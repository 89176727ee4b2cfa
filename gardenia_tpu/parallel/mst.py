"""Multi-chip Boruvka MST: contiguous edge ranges sharded, component
state replicated, per-round min-tables merged with pmin.

Reference: src/mst/main.cu:12-129 (LonestarGPU Boruvka) — per round each
component finds its minimum outgoing edge, unions, repeats.  Scale-out
rendering: each chip owns the out-edges of a contiguous edge-balanced
row range; the three per-component min tables of the single-chip solver
(min weight, tie-break canonical edge id, concrete edge id —
solvers/mst.py) are built locally by scatter-min and merged across the
mesh with `jax.lax.pmin` (min is associative, so the merged tables
equal the single-chip ones exactly); hooking + pointer jumping then run
replicated on every chip, keeping `comp` identical mesh-wide with zero
further communication.  3 pmin collectives per round, O(log m) rounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gardenia_tpu.core import types as T
from gardenia_tpu.ops.pointer_jump import pointer_jump
from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.parallel.partition import edge_balanced_bounds
from gardenia_tpu.solvers.mst import MSTResult

_INT_MAX = np.int32(np.iinfo(np.int32).max)


def mst_solver_dist(g, *, mesh=None, n_shards=None,
                    balance: str = "edges") -> MSTResult:
    """Distributed Boruvka on a symmetrized weighted graph.  Returns
    the same MSTResult contract as the single-chip solver (total
    weight deduped by undirected pair on the host)."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    n = mesh.devices.size
    m, nnz = g.m, g.nnz

    def build():
        rp = np.asarray(g.rowptr, np.int64)
        if balance == "edges":
            bounds = edge_balanced_bounds(rp, n)
        else:
            mb0 = -(-m // n)
            bounds = np.minimum(
                np.arange(n + 1, dtype=np.int64) * mb0, m)
        ecut = rp[bounds]                       # contiguous edge ranges
        emax = T.round_up(max(int(np.diff(ecut).max()), T.LANES),
                          T.LANES)
        src_h = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
        dst_h = np.asarray(g.colidx, np.int64)
        w_h = np.ones(nnz, np.float32) if g.weights is None else \
            np.asarray(g.weights, np.float32)
        pair = np.stack([np.minimum(src_h, dst_h),
                         np.maximum(src_h, dst_h)], axis=1)
        _, cid_h = np.unique(pair, axis=0, return_inverse=True)

        def stack(arr, fill, dtype):
            out = np.full((n, emax), fill, dtype)
            for s in range(n):
                lo, hi = int(ecut[s]), int(ecut[s + 1])
                out[s, :hi - lo] = arr[lo:hi]
            return out

        shards = dict(
            src=stack(src_h.astype(np.int32), 0, np.int32),
            dst=stack(dst_h.astype(np.int32), 0, np.int32),
            wi=stack(w_h.astype(np.int32), _INT_MAX, np.int32),
            cid=stack(cid_h.astype(np.int32), _INT_MAX, np.int32),
            eid=stack(np.arange(nnz, dtype=np.int32), nnz, np.int32),
        )
        return bounds, ecut, emax, w_h, shards

    bounds, ecut, emax, w_h, shards = g._dev(
        ("mst_part1d", n, balance), build)
    dev = {k: jnp.asarray(v) for k, v in shards.items()}

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P("v"), P("v"), P("v"), P("v")),
             out_specs=(P(), P("v")))
    def run(src_s, dst_s, wi_s, cid_s, eid_s):
        from gardenia_tpu.ops import rowsel
        src_l, dst_l = src_s[0], dst_s[0]
        wi_l, cid_l, eid_l = wi_s[0], cid_s[0], eid_s[0]

        def cond(state):
            return state[2]

        def body(state):
            comp, chosen, _ = state
            cs = rowsel.take(comp, src_l)
            cd = rowsel.take(comp, dst_l)
            cross = (cs != cd) & (eid_l < nnz)
            key = jnp.where(cross, cs, m)
            # 1) min weight per component (local scatter, pmin merge)
            minw = jnp.full((m,), _INT_MAX, jnp.int32).at[key].min(
                jnp.where(cross, wi_l, _INT_MAX), mode="drop")
            minw = jax.lax.pmin(minw, "v")
            cs_c = jnp.minimum(cs, m - 1)
            # 2) tie-break: min canonical edge id among weight matches
            hit1 = cross & (wi_l == rowsel.take(minw, cs_c))
            mincid = jnp.full((m,), _INT_MAX, jnp.int32).at[
                jnp.where(hit1, cs, m)].min(
                jnp.where(hit1, cid_l, _INT_MAX), mode="drop")
            mincid = jax.lax.pmin(mincid, "v")
            hit = hit1 & (cid_l == rowsel.take(mincid, cs_c))
            # 3) one concrete edge per component
            mine = jnp.full((m,), nnz, jnp.int32).at[
                jnp.where(hit, cs, m)].min(
                jnp.where(hit, eid_l, nnz), mode="drop")
            mine = jax.lax.pmin(mine, "v")
            sel = hit & (eid_l == rowsel.take(mine, cs_c))
            chosen = chosen | sel
            # 4) union the chosen edges' roots (two-sided min hook on
            # every chip's replicated comp, merged by pmin — roots not
            # chosen anywhere stay put)
            hooked = comp.at[jnp.where(sel, cs, m)].min(
                jnp.where(sel, cd, _INT_MAX), mode="drop")
            hooked = hooked.at[jnp.where(sel, cd, m)].min(
                jnp.where(sel, cs, _INT_MAX), mode="drop")
            comp2 = pointer_jump(jax.lax.pmin(hooked, "v"))
            return comp2, chosen, jnp.any(comp2 != comp)

        # pmin outputs are replicated (unvarying), so comp and the
        # continue flag carry unvaried; only the edge mask is varying
        comp0 = jnp.arange(m, dtype=jnp.int32)
        chosen0 = jax.lax.pvary(jnp.zeros((emax,), bool), "v")
        comp, chosen, _ = jax.lax.while_loop(
            cond, body, (comp0, chosen0, jnp.bool_(True)))
        return comp, chosen

    comp, chosen_flat = jax.jit(run)(dev["src"], dev["dst"], dev["wi"],
                                     dev["cid"], dev["eid"])
    # reassemble the global chosen mask from the edge shards
    chosen_s = np.asarray(chosen_flat).reshape(n, emax)
    chosen = np.zeros(nnz, bool)
    for s in range(n):
        lo, hi = int(ecut[s]), int(ecut[s + 1])
        chosen[lo:hi] = chosen_s[s, :hi - lo]
    # host-side dedup of (u,v)/(v,u) double-chosen pairs (same contract
    # as the single-chip solver)
    rp = np.asarray(g.rowptr, np.int64)
    s_h = np.repeat(np.arange(m), np.diff(rp))[chosen]
    d_h = np.asarray(g.colidx)[chosen]
    wsel = w_h[chosen]
    key = np.stack([np.minimum(s_h, d_h), np.maximum(s_h, d_h)], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    total = float(wsel[first].sum())
    return MSTResult(jnp.float32(total), jnp.asarray(chosen),
                     jnp.asarray(comp))
