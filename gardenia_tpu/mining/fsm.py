"""FSM — frequent subgraph mining on labeled graphs (MNI domain support).

Reference: mining/fsm/{fsm.h,serial.cc,omp_base.cc} (Pangolin edge-miner:
BFS embedding expansion, quick-pattern aggregation, canonical-pattern
domain support, filter, repeat up to k edges).

TPU/NumPy design: the Pangolin hash-aggregation machinery collapses to
vectorized groupbys — a pattern is a packed label key, a domain is the
distinct-vertex count per pattern position, and MNI support is the min
across positions (domain_support.h semantics):

  level 1: single-edge patterns (la <= lb); canonical embedding
           (min-id, max-id) when la == lb, else (a-side, b-side).
  level 2: wedge patterns (center label, sorted endpoint labels);
           each unordered wedge enumerated once.

Counts the number of frequent patterns with <= k edges.  k > 2 is not
yet implemented (the reference's own fsm caps at small k; its k is the
max embedding size in edges).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gardenia_tpu.core import build


def _support_from_domains(keys, *domain_cols) -> dict:
    """MNI support per unique key: min over positions of distinct-vertex
    counts. domain_cols are (vertex_id arrays) aligned with keys."""
    uniq, inv = np.unique(keys, return_inverse=True)
    support = {}
    for kidx, key in enumerate(uniq):
        sel = inv == kidx
        support[int(key)] = min(
            len(np.unique(col[sel])) for col in domain_cols)
    return support


def fsm_solver(g, k: int = 2, minsup: int = 2,
               labels: Optional[np.ndarray] = None) -> int:
    """Reference entry FSMSolver(m, nnz, k, minsup, row_offsets,
    column_indices, labels, total) (mining/fsm/fsm.h:23).  g symmetric;
    labels default to g.vlabels, else degree-bucket synthetic labels
    (deterministic), matching the converter's labeling fallback."""
    if k < 1:
        return 0
    if k > 3:
        raise NotImplementedError(
            "fsm_solver currently supports max pattern size k <= 3 edges")
    m = g.m
    if labels is None:
        labels = g.vlabels
    if labels is None:
        deg = g.degrees
        labels = np.minimum(deg, 10).astype(np.int64)   # degree buckets
    labels = np.asarray(labels, dtype=np.int64)
    nlab = int(labels.max()) + 1 if m else 1

    src, dst = build.csr_to_coo(g.rowptr, g.colidx)
    src = src.astype(np.int64)
    dst = dst.astype(np.int64)
    once = src < dst                       # each undirected edge once
    u, v = src[once], dst[once]
    lu, lv = labels[u], labels[v]
    # orient edge embeddings so position 0 carries the smaller label
    swap = lu > lv
    a = np.where(swap, v, u)
    b = np.where(swap, u, v)
    la, lb = labels[a], labels[b]
    eq = la == lb
    a2 = np.where(eq, np.minimum(a, b), a)
    b2 = np.where(eq, np.maximum(a, b), b)
    edge_keys = la * nlab + lb
    sup1 = _support_from_domains(edge_keys, a2, b2)
    frequent_edges = {key for key, s in sup1.items() if s >= minsup}
    total = len(frequent_edges)
    if k == 1 or not frequent_edges:
        return total

    # level 2: wedges (x - c - y), unordered endpoints, both edges must
    # extend embeddings of frequent single-edge patterns (Pangolin
    # filters the queue before joining, serial.cc:60-74)
    deg = np.diff(g.rowptr)
    centers = np.repeat(np.arange(m, dtype=np.int64), deg)
    nbrs = dst  # full directed list: neighbor per slot
    # build wedge pairs per center via per-row pair expansion
    rp = g.rowptr
    xs, cs, ys = [], [], []
    for c in range(m):
        nb = dst[rp[c]:rp[c + 1]]
        if len(nb) < 2:
            continue
        iu, iw = np.triu_indices(len(nb), k=1)
        xs.append(nb[iu])
        ys.append(nb[iw])
        cs.append(np.full(len(iu), c, np.int64))
    if not xs:
        return total
    x = np.concatenate(xs).astype(np.int64)
    y = np.concatenate(ys).astype(np.int64)
    c = np.concatenate(cs)
    lc, lx, ly = labels[c], labels[x], labels[y]

    def ekey(l1, l2):
        return np.minimum(l1, l2) * nlab + np.maximum(l1, l2)

    keep = np.isin(ekey(lc, lx), list(frequent_edges)) & \
        np.isin(ekey(lc, ly), list(frequent_edges))
    x, y, c, lx, ly, lc = x[keep], y[keep], c[keep], lx[keep], ly[keep], \
        lc[keep]
    # canonical endpoint order: by (label, id)
    swap = (lx > ly) | ((lx == ly) & (x > y))
    p = np.where(swap, y, x)
    q = np.where(swap, x, y)
    lp, lq = labels[p], labels[q]
    wkeys = (lc * nlab + lp) * nlab + lq
    sup2 = _support_from_domains(wkeys, c, p, q)
    total += sum(1 for s in sup2.values() if s >= minsup)
    if k == 2:
        return total
    total += _level3_count(g, labels, nlab, minsup)
    return total


def _level3_count(g, labels, nlab, minsup) -> int:
    """Frequent 3-edge patterns: triangle (3 vertices), 3-star and
    3-path (4 vertices).  Non-induced edge-subgraph embeddings
    (Pangolin/gSpan convention); each embedding maps to its canonical
    position order (automorphisms quotiented by (label, id) sorting /
    lexicographic reversal for paths), MNI = min distinct vertices per
    canonical position."""
    from collections import defaultdict
    from itertools import combinations

    m = g.m
    rp, ci = g.rowptr, g.colidx
    deg = np.diff(rp).astype(np.int64)
    star_work = int((deg * (deg - 1) * (deg - 2) // 6).sum())
    path_work = int(((deg - 1) ** 2).clip(0).sum()) * 4
    if star_work + path_work > 50_000_000:
        raise MemoryError(
            "3-edge pattern space too large for the host enumerator; "
            "run FSM with k <= 2 on this graph")
    adj = [np.asarray(ci[rp[v]:rp[v + 1]]) for v in range(m)]
    adjset = [set(a.tolist()) for a in adj]

    def add(doms, key, verts):
        d = doms[key]
        while len(d) < len(verts):
            d.append(set())
        for i, v in enumerate(verts):
            d[i].add(v)

    tri = defaultdict(list)
    star = defaultdict(list)
    path = defaultdict(list)

    for b in range(m):
        nb = adj[b]
        # triangles with b as the smallest id
        for cix in nb[nb > b]:
            common = [w for w in adj[int(cix)] if w > int(cix)
                      and w in adjset[b]]
            for w in common:
                verts = sorted((b, int(cix), int(w)),
                               key=lambda v: (labels[v], v))
                key = ("t",) + tuple(int(labels[v]) for v in verts)
                add(tri, key, verts)
        # 3-stars centered at b
        if len(nb) >= 3:
            for leaves in combinations(nb.tolist(), 3):
                ls = sorted(leaves, key=lambda v: (labels[v], v))
                key = ("s", int(labels[b])) + \
                    tuple(int(labels[v]) for v in ls)
                add(star, key, [b] + ls)
        # 3-paths a-b-c-d with (b, c) the middle edge, b < c to
        # enumerate each middle edge once
        for c_ in nb[nb > b]:
            c_ = int(c_)
            for a in adj[b]:
                a = int(a)
                if a == c_:
                    continue
                for d_ in adj[c_]:
                    d_ = int(d_)
                    if d_ == b or d_ == a:
                        continue
                    seq = (a, b, c_, d_)
                    labseq = tuple(int(labels[v]) for v in seq)
                    rev = seq[::-1]
                    rlab = labseq[::-1]
                    if (rlab, rev) < (labseq, seq):
                        seq, labseq = rev, rlab
                    key = ("p",) + labseq
                    add(path, key, list(seq))

    total = 0
    for doms in (tri, star, path):
        for d in doms.values():
            if min(len(s) for s in d) >= minsup:
                total += 1
    return total


def fsm_verifier(g, k: int = 2, minsup: int = 2,
                 labels: Optional[np.ndarray] = None) -> int:
    """Brute-force oracle: enumerate all single-edge and wedge embeddings
    per labeled pattern, compute MNI support directly."""
    from collections import defaultdict
    m = g.m
    if labels is None:
        labels = g.vlabels
    if labels is None:
        labels = np.minimum(g.degrees, 10).astype(np.int64)
    labels = np.asarray(labels, dtype=np.int64)
    rp, ci = g.rowptr, g.colidx
    adj = [sorted(ci[rp[vv]:rp[vv + 1]].tolist()) for vv in range(m)]

    # single edges
    doms = defaultdict(lambda: [set(), set()])
    for uu in range(m):
        for vv in adj[uu]:
            if uu >= vv:
                continue
            lu, lv = labels[uu], labels[vv]
            if lu < lv:
                key = (lu, lv)
                e0, e1 = uu, vv
            elif lv < lu:
                key = (lv, lu)
                e0, e1 = vv, uu
            else:
                key = (lu, lv)
                e0, e1 = min(uu, vv), max(uu, vv)
            doms[key][0].add(e0)
            doms[key][1].add(e1)
    freq_edges = {kk for kk, d in doms.items()
                  if min(len(d[0]), len(d[1])) >= minsup}
    total = len(freq_edges)
    if k == 1:
        return total

    wdoms = defaultdict(lambda: [set(), set(), set()])
    for cc in range(m):
        nb = adj[cc]
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                xx, yy = nb[i], nb[j]
                lc, lx, ly = labels[cc], labels[xx], labels[yy]
                if (min(lc, lx), max(lc, lx)) not in freq_edges:
                    continue
                if (min(lc, ly), max(lc, ly)) not in freq_edges:
                    continue
                if (lx, xx) > (ly, yy):
                    xx, yy, lx, ly = yy, xx, ly, lx
                key = (lc, lx, ly)
                wdoms[key][0].add(cc)
                wdoms[key][1].add(xx)
                wdoms[key][2].add(yy)
    total += sum(1 for d in wdoms.values()
                 if min(map(len, d)) >= minsup)
    if k == 2:
        return total

    # 3-edge patterns by brute force over vertex tuples (independent of
    # the solver's per-middle-edge enumeration)
    import itertools
    from collections import defaultdict as dd
    doms = dd(dict)

    def add(key, verts):
        d = doms[key]
        for i, v in enumerate(verts):
            d.setdefault(i, set()).add(v)

    has = lambda a, b: b in adj[a]  # noqa: E731
    for sub in itertools.combinations(range(m), 3):
        a, b, c = sub
        if has(a, b) and has(b, c) and has(a, c):
            vs = sorted(sub, key=lambda v: (labels[v], v))
            add(("t",) + tuple(int(labels[v]) for v in vs), vs)
    for sub in itertools.combinations(range(m), 4):
        for center in sub:
            rest = [v for v in sub if v != center]
            if all(has(center, v) for v in rest):
                ls = sorted(rest, key=lambda v: (labels[v], v))
                add(("s", int(labels[center])) +
                    tuple(int(labels[v]) for v in ls), [center] + ls)
        seen = set()
        for perm in itertools.permutations(sub):
            aa, bb, cc2, dd2 = perm
            if not (has(aa, bb) and has(bb, cc2) and has(cc2, dd2)):
                continue
            if (dd2, cc2, bb, aa) in seen:
                continue
            seen.add(perm)
            labseq = tuple(int(labels[v]) for v in perm)
            rev = perm[::-1]
            rlab = labseq[::-1]
            if (rlab, rev) < (labseq, perm):
                perm, labseq = rev, rlab
            add(("p",) + labseq, list(perm))
    total += sum(1 for d in doms.values()
                 if min(len(s) for s in d.values()) >= minsup)
    return total
