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


def scc_solver(g, *, max_rounds: int = None) -> SCCResult:
    """Reference entry SCCSolver(m, nnz, in/out CSR, scc_root)
    (src/scc/scc.h:29)."""
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
