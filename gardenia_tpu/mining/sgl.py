"""SGL — subgraph listing for fixed patterns (diamond / rectangle /
pentagon / house).

Reference: mining/sgl/{sgl.h,pattern.h,omp_base.cc} with per-pattern
AutoMine nests ({diamond,rectangle,pentagon,house}.h).  Here every
pattern runs through the one declarative chunked-expansion engine
(mining/pattern.py); `diamond` additionally has a closed-form fast path
from per-edge triangle counts.
"""

from __future__ import annotations

from gardenia_tpu.mining.pattern import PATTERNS, count_pattern


def sgl_solver(g, pattern: str, *, chunk: int = 1 << 18,
               use_formula: bool = True) -> int:
    """Reference entry SglSolver(g, pattern, total) (mining/sgl/sgl.h:15).
    g must be symmetric."""
    name = pattern.lower()
    if name == "diamond" and use_formula:
        import numpy as np
        from gardenia_tpu.mining.kcl import kcl_solver
        from gardenia_tpu.mining.motif import edge_triangle_counts
        tri_e = edge_triangle_counts(g).astype(np.int64)
        k4 = kcl_solver(g, 4)
        return int((tri_e * (tri_e - 1) // 2).sum()) // 2 - 6 * k4
    if name not in PATTERNS:
        raise ValueError(f"unknown pattern {pattern!r}; "
                         f"available: {sorted(PATTERNS)}")
    return count_pattern(g, PATTERNS[name], chunk=chunk)


def sgl_verifier(g, pattern: str) -> int:
    """Brute-force oracle over vertex subsets (test sizes only)."""
    import itertools
    import numpy as np
    m = g.m
    rp, ci = g.rowptr, g.colidx
    adj = [set(ci[rp[v]:rp[v + 1]].tolist()) for v in range(m)]

    def has(a, b):
        return b in adj[a]

    count = 0
    if pattern == "diamond":
        for sub in itertools.combinations(range(m), 4):
            edges = [(a, b) for a, b in itertools.combinations(sub, 2)
                     if has(a, b)]
            degs = sorted(sum(1 for x in sub if has(v, x)) for v in sub)
            if len(edges) == 5 and degs == [2, 2, 3, 3]:
                count += 1
        return count
    if pattern == "rectangle":
        for sub in itertools.combinations(range(m), 4):
            edges = sum(1 for a, b in itertools.combinations(sub, 2)
                        if has(a, b))
            degs = sorted(sum(1 for x in sub if has(v, x)) for v in sub)
            if edges == 4 and degs == [2, 2, 2, 2]:
                count += 1
        return count
    if pattern == "pentagon":
        for sub in itertools.combinations(range(m), 5):
            edges = sum(1 for a, b in itertools.combinations(sub, 2)
                        if has(a, b))
            degs = sorted(sum(1 for x in sub if has(v, x)) for v in sub)
            if edges == 5 and degs == [2, 2, 2, 2, 2]:
                count += 1
        return count
    if pattern == "house":
        for sub in itertools.combinations(range(m), 5):
            edges = sum(1 for a, b in itertools.combinations(sub, 2)
                        if has(a, b))
            degsv = {v: sum(1 for x in sub if has(v, x)) for v in sub}
            degs = sorted(degsv.values())
            if edges == 6 and degs == [2, 2, 2, 3, 3]:
                # distinguish from K_{2,3}: the house's two degree-3
                # vertices are adjacent (the chord)
                d3 = [v for v in sub if degsv[v] == 3]
                if has(d3[0], d3[1]):
                    count += 1
        return count
    raise ValueError(pattern)
