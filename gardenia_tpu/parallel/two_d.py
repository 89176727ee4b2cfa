"""2D edge partitioning with halo exchange — multi-chip TC / SCC / VC
(BASELINE config 5).

The 1D variants (parallel/color.py, parallel/tc.py) replicate the CSR /
edge list and shard only the work, so per-chip memory never shrinks.
Here the EDGES are partitioned over an (r x c) mesh:

  * vertices are split into r row ranges and c column ranges;
  * device (i, k) owns the adjacency panel A[R_i, C_k]
    (nnz / (r*c) edges per chip — the layout for graphs whose CSR
    exceeds one chip's HBM, reference analog: the column ranges of
    include/segmenting.h applied across chips instead of across SM
    cache blocks);
  * TC's intersections need whole adjacency rows restricted to one
    column range: devices ALL-GATHER their panels along the row axis —
    the halo exchange — after which every device in mesh column k holds
    N(v) ∩ C_k for every v, and wedge membership probes stay local;
  * per-vertex reductions travel as SHORT vectors: a source-side
    scatter lives on the row axis (psum over "c", all_gather over "r"),
    a destination-side scatter on the column axis — collective volume
    m/r + m/c per sweep instead of 2m.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from gardenia_tpu.core import types as T
from gardenia_tpu.solvers.scc import SCCResult
from gardenia_tpu.solvers.vc import VCResult


def make_mesh2d(n_devices: int = None) -> Mesh:
    """Near-square (r, c) factorization of the device count."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    r = int(np.sqrt(n))
    while n % r:
        r -= 1
    return Mesh(np.array(devs[:n]).reshape(r, n // r), ("r", "c"))


class Edges2D(NamedTuple):
    """Panel edge lists stacked (r, c, P) with GLOBAL vertex ids;
    sentinel m pads.  rows_per / cols_per are the range widths."""
    src: jax.Array            # i32[r, c, P]
    dst: jax.Array            # i32[r, c, P]
    rows_per: int
    cols_per: int


def partition_edges_2d(g, r: int, c: int) -> Edges2D:
    m = g.m
    rows_per = -(-m // r)
    cols_per = -(-m // c)
    src = np.repeat(np.arange(m, dtype=np.int64), np.diff(g.rowptr))
    dst = np.asarray(g.colidx, np.int64)
    pi = src // rows_per
    pk = dst // cols_per
    key = pi * c + pk
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=r * c)
    Pmax = T.round_up(max(int(counts.max()), 8), 8)
    s = np.full((r * c, Pmax), m, np.int32)
    d = np.full((r * c, Pmax), m, np.int32)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(src)) - offs[key[order]]
    s[key[order], slot] = src[order]
    d[key[order], slot] = dst[order]
    return Edges2D(jnp.asarray(s.reshape(r, c, Pmax)),
                   jnp.asarray(d.reshape(r, c, Pmax)),
                   rows_per, cols_per)


def _merge_src(vec_local, real_rows: int):
    """(rows_per,) per device (row-range partial) -> replicated (m,)."""
    s = jax.lax.psum(vec_local, "c")
    return jax.lax.all_gather(s, "r", axis=0, tiled=True)[:real_rows]


def _merge_dst(vec_local, real_cols: int):
    s = jax.lax.psum(vec_local, "r")
    return jax.lax.all_gather(s, "c", axis=0, tiled=True)[:real_cols]


def scc_solver_dist2d(g, *, mesh: Mesh = None, max_rounds: int = None
                      ) -> SCCResult:
    """FB-Trim SCC with 2D-partitioned edges: same fixed point as
    solvers/scc.py and parallel/color.py:scc_solver_dist; per-vertex
    reductions ride the short row/column axes."""
    if mesh is None:
        mesh = make_mesh2d()
    r, c = mesh.devices.shape
    m = g.m
    if max_rounds is None:
        max_rounds = m + 2
    e2 = partition_edges_2d(g, r, c)
    rows_per, cols_per = e2.rows_per, e2.cols_per
    mr, mc = r * rows_per, c * cols_per

    @partial(shard_map, mesh=mesh, in_specs=(P("r", "c"), P("r", "c")),
             out_specs=(P(), P()), check_vma=False)
    def run(src, dst):
        from gardenia_tpu.ops import rowsel
        src, dst = src[0, 0], dst[0, 0]
        ri = jax.lax.axis_index("r")
        ck = jax.lax.axis_index("c")
        src_l = src - ri * rows_per          # local row slot
        dst_l = dst - ck * cols_per          # local col slot
        vid = jnp.arange(m, dtype=jnp.int32)
        src_cl = jnp.minimum(src, m - 1)
        dst_cl = jnp.minimum(dst, m - 1)
        real = (src < m) & (dst < m)
        src_sc = jnp.where(real, src_l, rows_per)   # scatter targets
        dst_sc = jnp.where(real, dst_l, cols_per)

        def scat_src(x, op="add"):
            z = jnp.zeros((rows_per,), x.dtype)
            z = z.at[src_sc].add(x, mode="drop") if op == "add" else \
                z.at[src_sc].max(x, mode="drop")
            return z

        def scat_dst(x, op="add"):
            z = jnp.zeros((cols_per,), x.dtype)
            z = z.at[dst_sc].add(x, mode="drop") if op == "add" else \
                z.at[dst_sc].max(x, mode="drop")
            return z

        def edge_active(active):
            return real & rowsel.take(active, src_cl) & \
                rowsel.take(active, dst_cl)

        def cond(state):
            _, active, it = state
            return jnp.any(active) & (it < max_rounds)

        def body(state):
            root, active, it = state

            def trim_body(st):
                root, active, _ = st
                ea = edge_active(active).astype(jnp.int32)
                ind = _merge_dst(scat_dst(ea), mc)[:m]
                outd = _merge_src(scat_src(ea), mr)[:m]
                trivial = active & ((ind == 0) | (outd == 0))
                return (jnp.where(trivial, vid, root),
                        active & ~trivial, jnp.any(trivial))

            root, active, _ = jax.lax.while_loop(
                lambda st: st[2], trim_body,
                (root, active, jnp.bool_(True)))

            def fw_body(st):
                color, _ = st
                ea = edge_active(active)
                x = jnp.where(ea, rowsel.take(color, src_cl), -1)
                pushed = jax.lax.pmax(
                    jax.lax.all_gather(scat_dst(x, "max"), "c",
                                       axis=0, tiled=True)[:m], "r")
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
                    (rowsel.take(color, src_cl) ==
                     rowsel.take(color, dst_cl))
                x = (ea & rowsel.take(reach, dst_cl)).astype(jnp.int32)
                pushed = _merge_src(scat_src(x), mr)[:m] > 0
                new = reach | pushed
                return new, jnp.any(new != reach)

            reach, _ = jax.lax.while_loop(
                lambda st: st[1], bw_body, (pivots, jnp.any(pivots)))
            in_scc = active & reach
            return (jnp.where(in_scc, color, root),
                    active & ~in_scc, it + 1)

        root0 = jnp.full((m,), -1, jnp.int32)
        root, _, it = jax.lax.while_loop(
            cond, body, (root0, jnp.ones((m,), bool), jnp.int32(0)))
        return root, it

    root, it = jax.jit(run)(e2.src, e2.dst)
    return SCCResult(root, it)


def vc_solver_dist2d(g, *, mesh: Mesh = None,
                     max_color: int = T.MAXCOLOR) -> VCResult:
    """Gebremedhin-Manne coloring with 2D-partitioned edges: the
    forbidden-color table is built per row-range (rows_per x C) and
    merged along the short axes; same fixed point as solvers/vc.py."""
    if mesh is None:
        mesh = make_mesh2d()
    r, c = mesh.devices.shape
    m, C = g.m, max_color
    e2 = partition_edges_2d(g, r, c)
    rows_per = e2.rows_per
    mr = r * rows_per

    @partial(shard_map, mesh=mesh, in_specs=(P("r", "c"), P("r", "c")),
             out_specs=(P(), P(), P()), check_vma=False)
    def run(src, dst):
        from gardenia_tpu.ops import rowsel
        src, dst = src[0, 0], dst[0, 0]
        ri = jax.lax.axis_index("r")
        src_l = src - ri * rows_per
        real = (src < m) & (dst < m)

        def cond(state):
            _, active, _ = state
            return jnp.any(active)

        def body(state):
            colors, active, it = state
            cd = rowsel.take(colors, jnp.minimum(dst, m - 1))
            asrc = rowsel.take(active, jnp.minimum(src, m - 1))
            flat = jnp.where(asrc & real, src_l * C + cd, rows_per * C)
            forb_l = jnp.zeros((rows_per * C,), jnp.int32).at[flat].max(
                1, mode="drop")
            forb = jax.lax.all_gather(
                jax.lax.psum(forb_l, "c"), "r", axis=0,
                tiled=True)[:m * C].reshape(m, C)
            fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
            colors = jnp.where(active, fit, colors)
            cs = rowsel.take(colors, jnp.minimum(src, m - 1))
            cd2 = rowsel.take(colors, jnp.minimum(dst, m - 1))
            conf = (src < dst) & real & (cs == cd2)
            confl = jnp.zeros((rows_per,), jnp.int32).at[
                jnp.where(conf, src_l, rows_per)].max(1, mode="drop")
            conflict = _merge_src(confl, mr)[:m] > 0
            return colors, conflict, it + 1

        colors0 = jnp.zeros((m,), jnp.int32)
        colors, _, it = jax.lax.while_loop(
            cond, body, (colors0, jnp.ones((m,), bool), jnp.int32(0)))
        return colors, jnp.max(colors) + 1, it

    colors, ncol, it = jax.jit(run)(e2.src, e2.dst)
    return VCResult(colors, ncol, it)


def tc_solver_dist2d(g, *, mesh: Mesh = None, chunk: int = 1 << 14,
                     wedge_budget: int = 1 << 22) -> int:
    """Triangle counting over column-restricted adjacency panels with a
    row-axis all-gather halo.

    Device (i, k) stores the DAG panel A[R_i, C_k] as a local CSR
    (rowptr over its rows_per rows, column-restricted sorted neighbor
    lists).  One all_gather along "r" assembles N+(v) ∩ C_k for every v
    on each device of mesh column k — the adjacency-row halo exchange —
    then host-demuxed wedges (u, v, w in N+(u) ∩ C_k) of edge slice i
    probe w in N+(v) ∩ C_k with local binary search.  psum over the
    whole mesh totals the count."""
    if mesh is None:
        mesh = make_mesh2d()
    r, c = mesh.devices.shape
    dag = g._dev(("oriented",), g.oriented)
    m, nnz = dag.m, dag.nnz
    if nnz == 0:
        return 0
    rows_per = -(-m // r)
    cols_per = -(-m // c)

    # --- host: column-restricted panels + per-device wedge streams -------
    src_all = np.repeat(np.arange(m, dtype=np.int64), np.diff(dag.rowptr))
    dst_all = np.asarray(dag.colidx, np.int64)
    pk = dst_all // cols_per
    pi_row = src_all // rows_per

    # panels: per (i,k): edges grouped by (row range of src, col range)
    key = pi_row * c + pk
    order = np.argsort((key * (m + 1) + src_all) * (m + 1) + dst_all,
                       kind="stable")
    ks, ss, ds = key[order], src_all[order], dst_all[order]
    counts = np.bincount(ks, minlength=r * c)
    Emax = T.round_up(max(int(counts.max()), 8), 8)
    # local CSR per panel: rowptr (rows_per+1), colidx (Emax)
    p_rowptr = np.zeros((r * c, rows_per + 1), np.int32)
    p_colidx = np.full((r * c, Emax), m, np.int32)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(ss)) - offs[ks]
    p_colidx[ks, slot] = ds
    for p in range(r * c):
        sel = ks == p
        loc = (ss[sel] - (p // c) * rows_per).astype(np.int64)
        cnt = np.bincount(loc, minlength=rows_per)
        p_rowptr[p, 1:] = np.cumsum(cnt)

    # wedge streams: wedge (edge e=(u,v), w in N+(u) ∩ C_k) assigned to
    # device (row slice of e, k).  Edge slices balance the wedge space.
    # Round 3: the stream is processed in host-side EDGE-RANGE SLICES
    # of bounded per-device capacity (one fixed shape -> one compiled
    # executable), so the host never materializes the full O(wedges)
    # stream — RMAT-20 has 2^33+ wedges; the round-2 version OOMed
    # exactly like single-chip tc_bsearch would without its slicing.
    deg = np.diff(dag.rowptr)
    wpe = deg[src_all].astype(np.int64)
    cum = np.cumsum(wpe)
    total_w = int(cum[-1]) if len(cum) else 0
    per_slice = total_w / r
    slice_of_edge = np.minimum((cum - wpe) // max(per_slice, 1),
                               r - 1).astype(np.int64)
    Ws = T.round_up(min(max(int(wedge_budget), 8),
                        T.round_up(max(total_w, 8), 8)), 8)
    n_chunks = -(-Ws // chunk)

    def build_slice(e0: int, e1: int):
        """(r*c, Ws) wedge queues for the DAG edge range [e0, e1)."""
        sl = slice(e0, e1)
        deg_sl = deg[src_all[sl]]
        e_ids = e0 + np.repeat(np.arange(e1 - e0, dtype=np.int64),
                               deg_sl)
        off_in_edge = np.arange(len(e_ids), dtype=np.int64) - \
            np.repeat(np.cumsum(deg_sl) - deg_sl, deg_sl)
        w_vals = dst_all[dag.rowptr[src_all[e_ids]] + off_in_edge]
        wkey = slice_of_edge[e_ids] * c + (w_vals // cols_per)
        wq = np.bincount(wkey, minlength=r * c)
        if int(wq.max()) > Ws:
            return None                      # caller bisects the range
        q_w = np.full((r * c, Ws), m, np.int32)   # sentinel m = invalid
        q_v = np.full((r * c, Ws), m, np.int32)
        worder = np.argsort(wkey, kind="stable")
        woffs = np.concatenate([[0], np.cumsum(wq)[:-1]])
        wslot = np.arange(len(e_ids)) - woffs[wkey[worder]]
        q_w[wkey[worder], wslot] = w_vals[worder]
        q_v[wkey[worder], wslot] = dst_all[e_ids][worder]
        return (jnp.asarray(q_w.reshape(r, c, Ws)),
                jnp.asarray(q_v.reshape(r, c, Ws)))

    p_rowptr_d = jnp.asarray(p_rowptr.reshape(r, c, rows_per + 1))
    p_colidx_d = jnp.asarray(p_colidx.reshape(r, c, Emax))

    @partial(shard_map, mesh=mesh,
             in_specs=(P("r", "c"), P("r", "c"), P("r", "c"),
                       P("r", "c")),
             out_specs=P(), check_vma=False)
    def run(rp, ci, qw, qv):
        from gardenia_tpu.ops import rowsel
        rp, ci, qw, qv = rp[0, 0], ci[0, 0], qw[0, 0], qv[0, 0]
        # halo: assemble the full column panel on every device of this
        # mesh column — rowptr stays per-piece, colidx pieces flatten
        rp_g = jax.lax.all_gather(rp, "r", axis=0)      # (r, rows_per+1)
        ci_g = jax.lax.all_gather(ci, "r", axis=0).reshape(-1)
        rp_flat = (rp_g +
                   (jnp.arange(r, dtype=jnp.int32) * Emax)[:, None]
                   ).reshape(-1)

        def body(ch, acc):
            j = ch * chunk + jnp.arange(chunk, dtype=jnp.int32)
            w = rowsel.take(qw, jnp.minimum(j, Ws - 1))
            v = rowsel.take(qv, jnp.minimum(j, Ws - 1))
            valid = (j < Ws) & (w < m) & (v < m)
            vc = jnp.minimum(v, m - 1)
            piece = vc // rows_per
            vloc = vc - piece * rows_per
            lo = rowsel.take(rp_flat, piece * (rows_per + 1) + vloc)
            hi = rowsel.take(rp_flat, piece * (rows_per + 1) + vloc + 1)
            end = hi
            ci2d = rowsel.to_rows(ci_g, ci_g.shape[0], 0)

            def bs(_, st):
                lo, hi = st
                act = lo < hi
                mid = (lo + hi) // 2
                val = rowsel.gather(ci2d, jnp.clip(mid, 0,
                                                   ci_g.shape[0] - 1),
                                    acc_dtype=jnp.int32)
                right = val < w
                return (jnp.where(act & right, mid + 1, lo),
                        jnp.where(act & ~right, mid, hi))

            lo, hi = jax.lax.fori_loop(0, 32, bs, (lo, hi))
            found = (lo < end) & (rowsel.gather(
                ci2d, jnp.clip(lo, 0, ci_g.shape[0] - 1),
                acc_dtype=jnp.int32) == w)
            return acc + jnp.sum((valid & found).astype(jnp.int32))

        local = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
        return jax.lax.psum(jax.lax.psum(local, "c"), "r")

    run_j = jax.jit(run)
    total = 0
    e0 = 0
    # greedy edge ranges: target ~half the aggregate queue capacity per
    # slice, bisect whenever one device's queue would overflow
    budget = Ws * r * c // 2
    while e0 < nnz:
        base_w = cum[e0 - 1] if e0 else 0
        e1 = int(np.searchsorted(cum, base_w + max(budget, 1),
                                 side="right"))
        e1 = max(e1, e0 + 1)
        while True:
            qs = build_slice(e0, e1)
            if qs is not None or e1 == e0 + 1:
                break
            e1 = e0 + max((e1 - e0) // 2, 1)
        if qs is None:
            raise ValueError(
                f"wedge_budget {Ws} too small for a single edge's "
                f"wedges; raise wedge_budget")
        total += int(run_j(p_rowptr_d, p_colidx_d, qs[0], qs[1]))
        e0 = e1
    return total
