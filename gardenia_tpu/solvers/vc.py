"""VC — vertex coloring, Gebremedhin-Manne speculative first-fit.

Reference: src/vc/{vc.h,omp_base.cc}: rounds of (1) speculative first-fit
— every active vertex takes the smallest color not used by any neighbor —
and (2) conflict resolution — of any conflicting edge (u,v) with
colors[u]==colors[v], the lower endpoint u<v re-enters the worklist
(omp_base.cc:8-41).  MAXCOLOR=128 (common.h:65).

TPU design: the per-thread forbiddenColors[MAXCOLOR] array becomes a dense
(m, 128) forbidden table built edge-parallel with one scatter-max into a
flat (m*128,) byte vector; first-fit = argmin over the color axis; the
conflict worklist is a dense active mask.  The whole round loop is fused
in one lax.while_loop (no host sync).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T


class VCResult(NamedTuple):
    colors: jax.Array      # i32[m]
    num_colors: jax.Array  # i32
    iterations: jax.Array  # i32


def vc_solver(g, *, max_color: int = T.MAXCOLOR) -> VCResult:
    """Reference entry int VCSolver(g, colors) (src/vc/vc.h:31).
    Requires a symmetrized graph (coloring is defined on undirected
    adjacency; the reference drivers load with symmetrize=1)."""
    m = g.m
    C = max_color
    src, dst = g.device_coo()

    def run():
        colors0 = jnp.zeros((m,), jnp.int32)
        active0 = jnp.ones((m,), bool)

        def cond(state):
            _, active, _ = state
            return jnp.any(active)

        def body(state):
            colors, active, it = state
            from gardenia_tpu.ops import rowsel
            cd = rowsel.take(colors, dst)
            # forbidden[u, c] = 1 iff some neighbor of active u has color c
            flat_idx = jnp.where(rowsel.take(active, src), src * C + cd,
                                 m * C)
            forb = jnp.zeros((m * C,), jnp.int32).at[flat_idx].max(
                1, mode="drop").reshape(m, C)
            # first-fit: smallest non-forbidden color (argmin finds the
            # first 0 along the color axis)
            fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
            colors = jnp.where(active, fit, colors)
            # conflicts: edge (u,v), u<v, same color -> u goes again
            conf_edge = (src < dst) & (rowsel.take(colors, src) ==
                                       rowsel.take(colors, dst))
            conflict = jnp.zeros((m,), jnp.int32).at[
                jnp.where(conf_edge, src, m)].max(1, mode="drop")
            return colors, conflict > 0, it + 1

        colors, _, it = jax.lax.while_loop(
            cond, body, (colors0, active0, jnp.int32(0)))
        return VCResult(colors, jnp.max(colors) + 1, it)

    return g._dev(("vc_run", C), lambda: jax.jit(run))()
