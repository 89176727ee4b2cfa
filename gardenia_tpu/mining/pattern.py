"""Generic vertex-induced pattern enumeration by chunked BFS expansion.

The TPU replacement for the reference's AutoMine-generated nested loops
(mining/sgl/{diamond,rectangle,pentagon,house}.h, mining/kcl_dfs/
automine_omp.h): a pattern is a declarative spec — per level, the anchor
whose neighborhood supplies candidates, required adjacencies,
required non-adjacencies (induced matching), and id-order symmetry
breaking constraints — and one engine expands embeddings level by level:
gather candidate slots from the anchor's CSR row, test each constraint
with vectorized binary search, prefix-sum compact survivors.  Embedding
frontiers live in fixed (level, N) int32 arrays; the wedge space is
processed in fixed-size chunks so memory stays bounded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Level:
    """Constraints for vertex v_i (i = position, >= 1)."""
    anchor: int                       # candidates come from N(v_anchor)
    adj: Tuple[int, ...] = ()         # must be adjacent to these members
    nonadj: Tuple[int, ...] = ()      # must NOT be adjacent (induced)
    gt: Tuple[int, ...] = ()          # candidate id > member id
    lt: Tuple[int, ...] = ()          # candidate id < member id
    ne: Tuple[int, ...] = ()          # candidate id != member id


@dataclass(frozen=True)
class PatternSpec:
    name: str
    levels: Tuple[Level, ...]         # levels[0] describes v_1


def _member_test(rowptr, colidx, nnz, queries, rows):
    from gardenia_tpu.mining.kcl import _member
    return _member(rowptr, colidx, nnz, queries, rows)


def count_pattern(g, spec: PatternSpec, *, chunk: int = 1 << 18) -> int:
    """Count embeddings of `spec` in the symmetric graph g."""
    m, nnz = g.m, g.nnz
    if nnz == 0:
        return 0
    rowptr, colidx = g.device_csr()
    deg_h = np.diff(g.rowptr)

    def make_step(level: Level, n_members: int, count_only: bool):
        @jax.jit
        def step(members, cum, start, total):
            from gardenia_tpu.ops import rowsel
            # all indices int32 — the caller slices the wedge space
            # under EMB_WEDGE_LIMIT (x64 is disabled; int64 annotations
            # would silently truncate)
            j = start + jnp.arange(chunk, dtype=jnp.int32)
            e = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            e = jnp.minimum(e, members.shape[1] - 1)
            base = jnp.where(e > 0, cum[jnp.maximum(e - 1, 0)], 0)
            k = (j - base).astype(jnp.int32)
            va = rowsel.take(members[level.anchor], e)
            x = rowsel.take(colidx,
                            jnp.minimum(rowsel.take(rowptr, va) + k,
                                        nnz - 1))
            ok = j < total
            for i in range(n_members):
                vi = rowsel.take(members[i], e)
                if i in level.ne or i in level.adj or i in level.nonadj:
                    ok = ok & (x != vi)
                if i in level.gt:
                    ok = ok & (x > vi)
                if i in level.lt:
                    ok = ok & (x < vi)
            for i in level.adj:
                if i == level.anchor:
                    continue
                ok = ok & _member_test(rowptr, colidx, nnz, x,
                                       members[i, e])
            for i in level.nonadj:
                ok = ok & ~_member_test(rowptr, colidx, nnz, x,
                                        members[i, e])
            if count_only:
                return jnp.sum(ok.astype(jnp.int32))
            idx = jnp.nonzero(ok, size=chunk, fill_value=chunk - 1)[0]
            n_new = jnp.sum(ok.astype(jnp.int32))
            new_members = jnp.concatenate(
                [members[:, e[idx]], x[idx][None, :]], axis=0)
            return new_members, n_new
        return step

    members = np.arange(m, dtype=np.int32)[None, :]     # level-1: all v0
    total_count = 0
    n_levels = len(spec.levels)
    for li, level in enumerate(spec.levels):
        count_only = li == n_levels - 1
        from gardenia_tpu.mining.kcl import EMB_WEDGE_LIMIT, wedge_slices
        wpe = deg_h[members[level.anchor]].astype(np.int64)
        if int(wpe.sum()) == 0:
            return total_count
        step = g._dev(("pattern_step", spec.name, li,
                       members.shape[0], count_only, chunk),
                      lambda: make_step(level, members.shape[0],
                                        count_only))
        outs: List[np.ndarray] = []
        # embedding-range slices keep every device index int32; >2^31
        # wedge spaces just take more slices
        for lo, hi in wedge_slices(wpe, EMB_WEDGE_LIMIT):
            msl = members[:, lo:hi]
            cum = np.cumsum(wpe[lo:hi]).astype(np.int32)
            total = int(cum[-1])
            if total == 0:
                continue
            members_d = jnp.asarray(msl)
            cum_d = jnp.asarray(cum)
            for start in range(0, total, chunk):
                if count_only:
                    total_count += int(step(members_d, cum_d,
                                            jnp.int32(start),
                                            jnp.int32(total)))
                else:
                    new_m, n_new = step(members_d, cum_d,
                                        jnp.int32(start),
                                        jnp.int32(total))
                    n_new = int(n_new)
                    if n_new:
                        outs.append(np.asarray(new_m)[:, :n_new])
        if not count_only:
            if not outs:
                return 0
            members = np.concatenate(outs, axis=1)
    return total_count


# --- pattern library (mining/sgl/pattern.h:5-18) ---------------------------
# Induced matching with symmetry breaking; each pattern's automorphism
# group is quotiented by id-order constraints so every embedding is
# counted exactly once (verified against brute force in tests).

# diamond: chord (v0,v1), opposite vertices v2,v3 mutually non-adjacent
DIAMOND = PatternSpec("diamond", (
    Level(anchor=0, adj=(0,), lt=(0,)),                  # v1 < v0, chord
    Level(anchor=0, adj=(0, 1)),                         # v2 ~ both
    Level(anchor=0, adj=(0, 1), nonadj=(2,), lt=(2,)),   # v3 < v2
))

# rectangle (induced 4-cycle): v0-v1-v2-v3, diagonals absent;
# canonical: v0 = min, v1 < v3
RECTANGLE = PatternSpec("rectangle", (
    Level(anchor=0, adj=(0,), gt=(0,)),                   # v1 > v0
    Level(anchor=1, adj=(1,), nonadj=(0,), gt=(0,)),      # v2 ~ v1, !~v0
    Level(anchor=2, adj=(2, 0), nonadj=(1,), gt=(0, 1)),  # v3 closes, v3 > v1
))

# pentagon (induced 5-cycle): canonical v0 = min, v1 < v4
PENTAGON = PatternSpec("pentagon", (
    Level(anchor=0, adj=(0,), gt=(0,)),                       # v1
    Level(anchor=1, adj=(1,), nonadj=(0,), gt=(0,)),          # v2
    Level(anchor=2, adj=(2,), nonadj=(0, 1), gt=(0,)),        # v3
    Level(anchor=3, adj=(3, 0), nonadj=(1, 2), gt=(0, 1)),    # v4 > v1
))

# house: square v0-v1-v2-v3 + roof v4 ~ {v0, v1}; induced non-edges
# {02, 13, 24, 34}; mirror symmetry broken by v0 < v1
HOUSE = PatternSpec("house", (
    Level(anchor=0, adj=(0,), gt=(0,)),                       # v1 > v0
    Level(anchor=1, adj=(1,), nonadj=(0,)),                   # v2 ~ v1
    Level(anchor=2, adj=(2, 0), nonadj=(1,)),                 # v3 square
    Level(anchor=0, adj=(0, 1), nonadj=(2, 3)),               # v4 roof
))

PATTERNS = {p.name: p for p in (DIAMOND, RECTANGLE, PENTAGON, HOUSE)}
