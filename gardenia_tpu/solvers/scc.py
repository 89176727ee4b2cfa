"""SCC — strongly connected components (FB-Trim, color-partitioned).

Reference: src/scc/{scc.h,base.cu,two_phase.cu,wcc.cu}: trim-1 removal of
trivial SCCs, pivot generation per color partition, forward+backward
reachability closures, repeat (base.cu:12-133 bfs_step/trim_kernel/
pivot_gen_kernel/update_kernel).

TPU design (all dense, fused rounds):
  trim:  active vertices with no active in-edges or no active out-edges
         are singleton SCCs — two masked degree counts per pass.
  color: forward max-id propagation within the active subgraph partitions
         it into pivot regions (color[v] = max vertex id that reaches v);
         every color root c (color[c]==c) is a pivot.
  bw:    backward closure from all pivots at once, restricted to equal
         color — vertices reached are exactly SCC(pivot of their color).
  assign + deactivate, repeat.
This is the multi-pivot FB scheme the CUDA code expresses with per-color
pivot_gen; max-propagation replaces random pivot choice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np



class SCCResult(NamedTuple):
    scc_root: jax.Array    # i32[m] pivot id per vertex
    iterations: jax.Array  # i32 outer FB rounds


def scc_solver(g, *, max_rounds: int = None,
               variant: str = "color") -> SCCResult:
    """Reference entry SCCSolver(m, nnz, in/out CSR, scc_root)
    (src/scc/scc.h:29).

    variant 'color': multi-pivot FB with max-id forward coloring
    (base.cu scheme) — the partition step costs O(diameter) sweeps.
    variant 'wcc': WCC-first decomposition (reference wcc.cu /
    two_phase.cu): the active subgraph is partitioned by weakly
    connected components via log-depth hooking + pointer jumping, one
    pivot per component, boolean fwd/bwd closures, and fwd/bwd/neither
    region tags refine the next round's partition — the partition step
    is O(log m) instead of O(diameter)."""
    if variant == "wcc":
        return _scc_wcc(g, max_rounds=max_rounds)
    m = g.m
    src, dst = g.device_coo()            # forward edges u->v
    if max_rounds is None:
        max_rounds = m + 2

    def run():
        root0 = jnp.full((m,), -1, jnp.int32)
        active0 = jnp.ones((m,), bool)
        vid = jnp.arange(m, dtype=jnp.int32)

        from gardenia_tpu.ops import rowsel

        def edge_active(active):
            return rowsel.take(active, src) & rowsel.take(active, dst)

        def cond(state):
            _, active, it = state
            return jnp.any(active) & (it < max_rounds)

        def body(state):
            root, active, it = state
            # --- trim-1 (scc.h:12: trivial SCC removal) ----------------
            def trim_cond(state2):
                _, _, changed = state2
                return changed

            def trim_body(state2):
                root, active, _ = state2
                ea = edge_active(active)
                ea_i = ea.astype(jnp.int32)
                ind = jnp.zeros((m,), jnp.int32).at[dst].add(ea_i)
                outd = jnp.zeros((m,), jnp.int32).at[src].add(ea_i)
                trivial = active & ((ind == 0) | (outd == 0))
                # trim-2 (reference FB-Trim): u<->v forming an isolated
                # 2-cycle (each is the other's only active neighbor) is
                # an SCC of size 2 — find the unique neighbor with a
                # scatter-max over the single active edge
                in_nbr = jnp.full((m,), -1, jnp.int32).at[dst].max(
                    jnp.where(ea, src, -1))
                out_nbr = jnp.full((m,), -1, jnp.int32).at[src].max(
                    jnp.where(ea, dst, -1))
                cand = active & (ind == 1) & (outd == 1) & \
                    (in_nbr == out_nbr)
                v = jnp.clip(out_nbr, 0, m - 1)
                paired = cand & rowsel.take(cand, v) & \
                    (rowsel.take(out_nbr, v) == vid)
                root = jnp.where(trivial, vid, root)
                root = jnp.where(paired, jnp.minimum(vid, out_nbr),
                                 root)
                removed = trivial | paired
                return root, active & ~removed, jnp.any(removed)

            root, active, _ = jax.lax.while_loop(
                trim_cond, trim_body, (root, active, jnp.bool_(True)))

            # --- forward max-id color propagation ----------------------
            def fw_cond(state2):
                _, changed = state2
                return changed

            def fw_body(state2):
                color, _ = state2
                ea = edge_active(active)
                x = jnp.where(ea, rowsel.take(color, src), -1)
                pushed = jnp.zeros((m,), jnp.int32).at[dst].max(x)
                new = jnp.where(active, jnp.maximum(color, pushed), color)
                return new, jnp.any(new != color)

            color0 = jnp.where(active, vid, -1)
            color, _ = jax.lax.while_loop(
                fw_cond, fw_body, (color0, jnp.any(active)))

            # --- backward closure from pivots within equal color -------
            pivots = active & (color == vid)

            def bw_cond(state2):
                _, changed = state2
                return changed

            def bw_body(state2):
                reach, _ = state2
                ea = edge_active(active) & \
                    (rowsel.take(color, src) == rowsel.take(color, dst))
                x = ea & rowsel.take(reach, dst)   # reverse: v->u
                pushed = jnp.zeros((m,), bool).at[src].max(x)
                new = reach | pushed
                return new, jnp.any(new != reach)

            reach, _ = jax.lax.while_loop(
                bw_cond, bw_body, (pivots, jnp.any(pivots)))

            in_scc = active & reach
            root = jnp.where(in_scc, color, root)
            return root, active & ~in_scc, it + 1

        root, _, it = jax.lax.while_loop(
            cond, body, (root0, active0, jnp.int32(0)))
        return SCCResult(root, it)

    return g._dev(("scc_run", max_rounds), lambda: jax.jit(run))()


def _scc_wcc(g, *, max_rounds: int = None) -> SCCResult:
    """WCC-first FB-Trim (reference src/scc/wcc.cu, two_phase.cu).

    Per outer round: trim-1/2, then partition the active subgraph by
    weakly connected components (scatter-min hooking + pointer jumping,
    O(log m) inner rounds — the win over max-id coloring's O(diameter)),
    elect the max-id vertex of each component as its pivot, run boolean
    forward and backward closures from all pivots at once, assign
    SCC = fwd ∩ bwd, and tag survivors with their fwd/bwd/neither
    region so the next round's hooking never merges across regions
    (two_phase.cu's partition refinement — SCCs cannot span regions)."""
    m = g.m
    src, dst = g.device_coo()
    if max_rounds is None:
        max_rounds = m + 2
    jump_steps = max(1, int(np.ceil(np.log2(max(m, 2)))) + 1)

    def run():
        from gardenia_tpu.ops import rowsel

        vid = jnp.arange(m, dtype=jnp.int32)

        def cond(state):
            _, active, _, it = state
            return jnp.any(active) & (it < max_rounds)

        def body(state):
            root, active, region, it = state

            # --- trim-1 / trim-2 (as in the color variant) -------------
            def trim_body(st):
                root, active, _ = st
                ea = (rowsel.take(active, src) &
                      rowsel.take(active, dst))
                ea_i = ea.astype(jnp.int32)
                ind = jnp.zeros((m,), jnp.int32).at[dst].add(ea_i)
                outd = jnp.zeros((m,), jnp.int32).at[src].add(ea_i)
                trivial = active & ((ind == 0) | (outd == 0))
                in_nbr = jnp.full((m,), -1, jnp.int32).at[dst].max(
                    jnp.where(ea, src, -1))
                out_nbr = jnp.full((m,), -1, jnp.int32).at[src].max(
                    jnp.where(ea, dst, -1))
                cand = active & (ind == 1) & (outd == 1) & \
                    (in_nbr == out_nbr)
                v = jnp.clip(out_nbr, 0, m - 1)
                paired = cand & rowsel.take(cand, v) & \
                    (rowsel.take(out_nbr, v) == vid)
                root = jnp.where(trivial, vid, root)
                root = jnp.where(paired, jnp.minimum(vid, out_nbr),
                                 root)
                removed = trivial | paired
                return root, active & ~removed, jnp.any(removed)

            root, active, _ = jax.lax.while_loop(
                lambda st: st[2], trim_body,
                (root, active, jnp.bool_(True)))

            # --- WCC partition (hook + jump, region-restricted) ---------
            ea = (rowsel.take(active, src) & rowsel.take(active, dst) &
                  (rowsel.take(region, src) == rowsel.take(region, dst)))

            def wcc_body(st):
                comp, _ = st
                cs = rowsel.take(comp, src)
                cd = rowsel.take(comp, dst)
                low_d = jnp.full((m,), m, jnp.int32).at[dst].min(
                    jnp.where(ea, cs, m))
                low_s = jnp.full((m,), m, jnp.int32).at[src].min(
                    jnp.where(ea, cd, m))
                new = jnp.minimum(comp, jnp.minimum(low_d, low_s))

                def jump(_, c):
                    return rowsel.take(c, c)

                new = jax.lax.fori_loop(0, jump_steps, jump, new)
                return new, jnp.any(new != comp)

            comp, _ = jax.lax.while_loop(
                lambda st: st[1], wcc_body, (vid, jnp.any(active)))

            # --- one pivot per component: its max active vertex ---------
            piv_of_comp = jnp.full((m,), -1, jnp.int32).at[
                jnp.where(active, comp, m - 1)].max(
                jnp.where(active, vid, -1), mode="drop")
            pivot_id = rowsel.take(piv_of_comp, comp)   # per vertex
            pivots = active & (vid == pivot_id)

            # --- boolean closures (edges stay within one WCC) -----------
            def fw_body(st):
                reach, _ = st
                x = ea & rowsel.take(reach, src)
                pushed = jnp.zeros((m,), bool).at[dst].max(x)
                new = reach | pushed
                return new, jnp.any(new != reach)

            fwd, _ = jax.lax.while_loop(
                lambda st: st[1], fw_body, (pivots, jnp.any(pivots)))

            def bw_body(st):
                reach, _ = st
                x = ea & rowsel.take(reach, dst)
                pushed = jnp.zeros((m,), bool).at[src].max(x)
                new = reach | pushed
                return new, jnp.any(new != reach)

            bwd, _ = jax.lax.while_loop(
                lambda st: st[1], bw_body, (pivots, jnp.any(pivots)))

            in_scc = active & fwd & bwd
            root = jnp.where(in_scc, pivot_id, root)
            # region tags refine next round's partition: 0 fwd-only,
            # 1 bwd-only, 2 neither (disjoint per component by
            # construction; offset by component to stay globally unique)
            region = jnp.where(fwd & ~bwd, comp * 3,
                               jnp.where(bwd & ~fwd, comp * 3 + 1,
                                         comp * 3 + 2))
            return root, active & ~in_scc, region, it + 1

        root0 = jnp.full((m,), -1, jnp.int32)
        state = (root0, jnp.ones((m,), bool),
                 jnp.zeros((m,), jnp.int32), jnp.int32(0))
        root, _, _, it = jax.lax.while_loop(cond, body, state)
        return SCCResult(root, it)

    return g._dev(("scc_wcc_run", max_rounds), lambda: jax.jit(run))()
