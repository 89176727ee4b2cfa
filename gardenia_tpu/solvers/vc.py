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


# per-edge rowsel gathers materialize a (chunk, 128) row table; 2^22
# slots bounds that at 2 GB — the unchunked form OOM'd the 16 GB HBM at
# RMAT-20 (s32[31.4M, 128] = 15 GB, found by the round-5 sweep)
VC_EDGE_CHUNK = 1 << 22


def vc_solver(g, *, max_color: int = T.MAXCOLOR) -> VCResult:
    """Reference entry int VCSolver(g, colors) (src/vc/vc.h:31).
    Requires a symmetrized graph (coloring is defined on undirected
    adjacency; the reference drivers load with symmetrize=1).

    Palette escalation (round 5): the reference's fixed
    forbiddenColors[MAXCOLOR=128] (common.h:65) silently can't color a
    vertex whose neighborhood already uses all 128 colors — here that
    saturation would spin the fused while_loop forever (the axon worker
    killed vc@RMAT-20 at its ~2-minute limit; scale 16 already uses 111
    colors).  The device program detects saturation and exits with a
    flag; the host doubles the palette and re-runs (the (m, C) table
    doubles too — still ≤ 4 GB at C=1024, m=2^20)."""
    m = g.m
    nnz = g.nnz
    n_ch = max(1, -(-nnz // VC_EDGE_CHUNK))
    CH = min(VC_EDGE_CHUNK, T.next_pow2(max(nnz, T.LANES)))

    def up():
        import numpy as _np
        rp = _np.asarray(g.rowptr, _np.int64)
        s = _np.repeat(_np.arange(m, dtype=_np.int32), _np.diff(rp))
        d = _np.asarray(g.colidx, _np.int32)
        pad = n_ch * CH - nnz
        # sentinel edges (m, m): inactive src, src < dst fails
        return (jnp.asarray(_np.concatenate(
                    [s, _np.full(pad, m, _np.int32)])),
                jnp.asarray(_np.concatenate(
                    [d, _np.full(pad, m, _np.int32)])))

    src, dst = g._dev(("vc_coo_pad", CH), up)

    def make_run(C):
        def run(src, dst):
            from gardenia_tpu.ops import rowsel
            colors0 = jnp.zeros((m,), jnp.int32)
            active0 = jnp.ones((m,), bool)

            def cond(state):
                _, active, _, stuck = state
                return jnp.any(active) & ~stuck

            def body(state):
                colors, active, it, _ = state

                # forbidden[u, c] = 1 iff a neighbor of active u has
                # color c
                def fchunk(i, forb):
                    s = jax.lax.dynamic_slice(src, (i * CH,), (CH,))
                    d = jax.lax.dynamic_slice(dst, (i * CH,), (CH,))
                    cd = rowsel.take(colors, d)
                    flat_idx = jnp.where(rowsel.take(active, s),
                                         s * C + cd, m * C)
                    return forb.at[flat_idx].max(1, mode="drop")

                forb = jax.lax.fori_loop(
                    0, n_ch, fchunk,
                    jnp.zeros((m * C,), jnp.int32)).reshape(m, C)
                # a saturated active vertex (all C colors forbidden)
                # can never leave the worklist: exit and let the host
                # double the palette
                stuck = jnp.any(active & (jnp.min(forb, axis=1) == 1))
                # first-fit: smallest non-forbidden color (argmin
                # finds the first 0 along the color axis)
                fit = jnp.argmin(forb, axis=1).astype(jnp.int32)
                colors = jnp.where(active, fit, colors)

                # conflicts: edge (u,v), u<v, same color -> u again
                def cchunk(i, conflict):
                    s = jax.lax.dynamic_slice(src, (i * CH,), (CH,))
                    d = jax.lax.dynamic_slice(dst, (i * CH,), (CH,))
                    ce = (s < d) & (rowsel.take(colors, s) ==
                                    rowsel.take(colors, d))
                    return conflict.at[jnp.where(ce, s, m)].max(
                        1, mode="drop")

                conflict = jax.lax.fori_loop(
                    0, n_ch, cchunk, jnp.zeros((m,), jnp.int32))
                return colors, conflict > 0, it + 1, stuck

            colors, _, it, stuck = jax.lax.while_loop(
                cond, body,
                (colors0, active0, jnp.int32(0), jnp.bool_(False)))
            return VCResult(colors, jnp.max(colors) + 1, it), stuck

        return run

    # remember the palette that worked so repeat solves (bench iters)
    # skip the saturated attempts
    C = max_color
    if max_color == T.MAXCOLOR:
        C = getattr(g, "_vc_palette", max_color)
    while True:
        jitted = g._dev(("vc_run", C, CH), lambda: jax.jit(make_run(C)))
        res, stuck = jitted(src, dst)
        if not bool(stuck):
            if max_color == T.MAXCOLOR:
                g._vc_palette = C
            return res
        if C >= 1 << 14:
            raise ValueError(
                f"vertex coloring did not fit {C} colors (degeneracy "
                "beyond the palette-escalation cap)")
        C *= 2
