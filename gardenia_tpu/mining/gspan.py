"""General frequent-subgraph mining engine — gSpan-style pattern growth
with DFS-code canonical aggregation and MNI domain support.

Reference: mining/fsm2/miner.h + include/mining/edge_miner.h (Pangolin
edge miner: BFS embedding expansion -> quick-pattern aggregation ->
canonical aggregation with vertex-position equivalences -> domain
support filter, repeated up to k edges).  This replaces both the
reference's bliss canonicalization (mining/dfscode.py computes minimum
DFS codes exhaustively — patterns are tiny) and its hash-map embedding
queues (embeddings live in dense (n_positions, N) int32 arrays in
canonical vertex order; expansion is the chunked device machinery shared
with kCL).

Support convention (= the reference's, edge_miner.h:175-193): MNI with
vertex-position equivalence — domain of canonical position p is the set
of graph vertices reachable at ANY position in p's automorphism orbit,
support = min over positions.  This equals the standard "minimum image"
support over all subgraph isomorphisms.

Every connected edge-subgraph occurrence is generated at least once
(extensions are exhaustive over positions); duplicates are collapsed by
canonical reordering + column dedup, and automorphism closure supplies
the remaining isomorphism images.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.mining.dfscode import (Pattern, apply_perm,
                                         automorphisms, canonical,
                                         extensions, make_pattern)
from gardenia_tpu.mining.kcl import EMB_WEDGE_LIMIT, _member, wedge_slices

# safety valve: total embedding columns held per level
MAX_EMBEDDINGS = 50_000_000


def _next_pow2(x: int) -> int:
    return 1 << (max(int(x), 1) - 1).bit_length()


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(2,))
def _member_jit(rowptr, colidx, nnz, queries, rows):
    return _member(rowptr, colidx, nnz, queries, rows)


def _reorder(rows: np.ndarray, perm) -> np.ndarray:
    """rows (n, N) in pattern-position order -> canonical order
    (perm[p] = canonical position of pattern position p)."""
    out = np.empty_like(rows)
    for p in range(rows.shape[0]):
        out[perm[p]] = rows[p]
    return out


def mni_support(pattern: Pattern, M: np.ndarray) -> int:
    """Minimum-image support of embeddings M (nv, N) in canonical
    position order, closed under the pattern's automorphisms."""
    if M.size == 0:
        return 0
    nv = pattern[0]
    autos = automorphisms(pattern)
    # orbit of each position under Aut
    best = None
    seen_orbits = set()
    for p in range(nv):
        orbit = frozenset(sigma[p] for sigma in autos)
        if orbit in seen_orbits:
            continue
        seen_orbits.add(orbit)
        dom = len(np.unique(M[sorted(orbit)]))
        best = dom if best is None else min(best, dom)
    return int(best)


def _fwd_step(rowptr, colidx, nnz: int, n_members: int, chunk: int):
    """Chunked forward extension: for each (embedding e, slot into
    N(anchor[e])) wedge, emit candidate x if x is none of the embedding's
    vertices.  Mirrors kcl._expand_level without adjacency constraints."""

    @jax.jit
    def step(members, anchor, cum, start, total):
        from gardenia_tpu.ops import rowsel
        j = start + jnp.arange(chunk, dtype=jnp.int32)
        e = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        e = jnp.minimum(e, members.shape[1] - 1)
        base = jnp.where(e > 0, cum[jnp.maximum(e - 1, 0)], 0)
        k_off = (j - base).astype(jnp.int32)
        va = rowsel.take(anchor, e)
        x = rowsel.take(colidx,
                        jnp.minimum(rowsel.take(rowptr, va) + k_off,
                                    nnz - 1))
        ok = j < total
        for t in range(n_members):
            ok = ok & (x != rowsel.take(members[t], e))
        idx = jnp.nonzero(ok, size=chunk, fill_value=chunk - 1)[0]
        n_new = jnp.sum(ok.astype(jnp.int32))
        return members[:, e[idx]], x[idx], n_new

    return step


def fsm_gspan(g, k: int, minsup: int,
              labels: Optional[np.ndarray] = None, *,
              chunk: int = 1 << 15) -> int:
    """Count frequent connected edge-patterns with 1..k edges
    (cumulative over levels, matching the prior FSM convention)."""
    m = g.m
    if k < 1 or m == 0 or g.nnz == 0:
        return 0
    if labels is None:
        labels = g.vlabels
    if labels is None:
        labels = np.minimum(g.degrees, 10).astype(np.int64)
    labels = np.asarray(labels, dtype=np.int64)

    rowptr, colidx = g.device_csr()
    nnz = g.nnz
    deg_h = np.diff(g.rowptr).astype(np.int64)

    # ---- level 1: single edges -------------------------------------------
    from gardenia_tpu.core import build
    src, dst = build.csr_to_coo(g.rowptr, g.colidx)
    once = src < dst
    u, v = src[once].astype(np.int64), dst[once].astype(np.int64)
    lu, lv = labels[u], labels[v]

    groups: Dict[tuple, Tuple[Pattern, np.ndarray]] = {}
    pair_keys = np.minimum(lu, lv) * (labels.max() + 1) + \
        np.maximum(lu, lv)
    for keyval in np.unique(pair_keys):
        sel = pair_keys == keyval
        us, vs, lus, lvs = u[sel], v[sel], lu[sel], lv[sel]
        # orient position 0 to the smaller label
        swap = lus > lvs
        a = np.where(swap, vs, us)
        b = np.where(swap, us, vs)
        la = int(labels[a[0]])
        lb = int(labels[b[0]])
        pat = make_pattern(2, ((0, 1),), (la, lb))
        ckey, perm = canonical(pat)
        M = _reorder(np.stack([a, b]).astype(np.int32), perm)
        groups[ckey] = (apply_perm(pat, perm), M)

    total = 0
    frequent: Dict[tuple, Tuple[Pattern, np.ndarray]] = {}
    for ckey, (pat, M) in groups.items():
        if mni_support(pat, M) >= minsup:
            frequent[ckey] = (pat, M)
    total += len(frequent)
    if k == 1:
        return total

    # ---- levels 2..k: pattern growth -------------------------------------
    step_cache: Dict[int, object] = {}
    for _level in range(2, k + 1):
        raw: Dict[tuple, List[np.ndarray]] = defaultdict(list)
        child_pat: Dict[tuple, Pattern] = {}
        for ckey, (pat, M) in frequent.items():
            nv = pat[0]
            for kind, i, j in extensions(pat):
                if kind == "back":
                    # closing edge (i, j): keep embeddings where
                    # v_j in N(v_i); pow2-padded so the jitted
                    # membership test compiles once per size class
                    N = M.shape[1]
                    Np = _next_pow2(max(N, 128))
                    mi = np.zeros(Np, np.int32)
                    mj = np.zeros(Np, np.int32)
                    mi[:N] = M[i]
                    mj[:N] = M[j]
                    # pad pairs query vertex 0 against row 0 — result
                    # sliced away below
                    hit = np.asarray(_member_jit(rowptr, colidx, nnz,
                                                 jnp.asarray(mj),
                                                 jnp.asarray(mi)))[:N]
                    if not hit.any():
                        continue
                    child = make_pattern(
                        nv, pat[1] + ((i, j),), pat[2])
                    ck, perm = canonical(child)
                    child_pat.setdefault(ck, apply_perm(child, perm))
                    raw[ck].append(_reorder(M[:, hit], perm))
                    continue
                # forward extension from anchor position i
                wpe = deg_h[M[i]]
                grand = int(wpe.sum())
                if grand == 0:
                    continue
                # size classes are pow2-padded so each (nv, chunk) jit
                # compiles once and is reused across patterns/levels
                ch = min(chunk, _next_pow2(max(grand, 256)))
                if (nv, ch) not in step_cache:
                    step_cache[(nv, ch)] = _fwd_step(rowptr, colidx,
                                                     nnz, nv, ch)
                step = step_cache[(nv, ch)]
                outs_m: List[np.ndarray] = []
                outs_x: List[np.ndarray] = []
                for lo, hi in wedge_slices(wpe, EMB_WEDGE_LIMIT):
                    N = hi - lo
                    Np = _next_pow2(max(N, 128))
                    mp = np.zeros((M.shape[0], Np), np.int32)
                    mp[:, :N] = M[:, lo:hi]
                    wp = np.zeros(Np, np.int64)
                    wp[:N] = wpe[lo:hi]
                    msl = jnp.asarray(mp)
                    anchor = msl[i]
                    cum = np.cumsum(wp).astype(np.int32)
                    tot = int(cum[-1])
                    cum_d = jnp.asarray(cum)
                    for start in range(0, tot, ch):
                        mm, xx, n_new = step(msl, anchor, cum_d,
                                             jnp.int32(start),
                                             jnp.int32(tot))
                        n_new = int(n_new)
                        if n_new:
                            outs_m.append(np.asarray(mm)[:, :n_new])
                            outs_x.append(np.asarray(xx)[:n_new])
                if not outs_m:
                    continue
                Mext = np.concatenate(outs_m, axis=1)
                X = np.concatenate(outs_x)
                lx = labels[X]
                for lab in np.unique(lx):
                    sel = lx == lab
                    child = make_pattern(
                        nv + 1, pat[1] + ((i, nv),),
                        pat[2] + (int(lab),))
                    ck, perm = canonical(child)
                    child_pat.setdefault(ck, apply_perm(child, perm))
                    arr = np.concatenate(
                        [Mext[:, sel], X[sel][None, :]], axis=0)
                    raw[ck].append(_reorder(arr, perm))

        frequent = {}
        n_cols = sum(sum(a.shape[1] for a in lst)
                     for lst in raw.values())
        if n_cols > MAX_EMBEDDINGS:
            raise MemoryError(
                f"FSM level {_level} embedding frontier has {n_cols:.2e}"
                " columns; reduce k or raise minsup")
        for ck, arrs in raw.items():
            M = np.unique(np.concatenate(arrs, axis=1), axis=1)
            pat = child_pat[ck]
            if mni_support(pat, M) >= minsup:
                frequent[ck] = (pat, M)
        total += len(frequent)
        if not frequent:
            break
    return total


# ---- independent brute-force oracle ---------------------------------------

def fsm_bruteforce(g, k: int, minsup: int,
                   labels: Optional[np.ndarray] = None) -> int:
    """Enumerate every connected edge-subgraph with <= k edges by
    recursive edge addition (host, exact); aggregate true MNI domains
    per canonical pattern.  Independent of the device engine except for
    the canonical-form key."""
    m = g.m
    if k < 1 or m == 0 or g.nnz == 0:
        return 0
    if labels is None:
        labels = g.vlabels
    if labels is None:
        labels = np.minimum(g.degrees, 10).astype(np.int64)
    labels = np.asarray(labels, dtype=np.int64)
    rp, ci = g.rowptr, g.colidx
    edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a in range(m)
                    for b in ci[rp[a]:rp[a + 1]].tolist() if a != b})
    incident: Dict[int, List[int]] = defaultdict(list)
    for idx, (a, b) in enumerate(edges):
        incident[a].append(idx)
        incident[b].append(idx)

    subsets_by_size: List[set] = [set() for _ in range(k + 1)]

    def expand(eset: frozenset, verts: frozenset):
        size = len(eset)
        if eset in subsets_by_size[size]:
            return
        subsets_by_size[size].add(eset)
        if size == k:
            return
        cand = set()
        for vtx in verts:
            cand.update(incident[vtx])
        for idx in cand:
            if idx not in eset:
                a, b = edges[idx]
                expand(eset | {idx}, verts | {a, b})

    for idx, (a, b) in enumerate(edges):
        expand(frozenset([idx]), frozenset([a, b]))

    total = 0
    for size in range(1, k + 1):
        doms: Dict[tuple, List[set]] = {}
        pats: Dict[tuple, Pattern] = {}
        for eset in subsets_by_size[size]:
            es = [edges[i] for i in eset]
            verts = sorted({x for e in es for x in e})
            pos = {vtx: p for p, vtx in enumerate(verts)}
            pat = make_pattern(len(verts),
                               [(pos[a], pos[b]) for a, b in es],
                               [labels[vtx] for vtx in verts])
            ck, perm = canonical(pat)
            cpat = apply_perm(pat, perm)
            pats.setdefault(ck, cpat)
            d = doms.setdefault(ck, [set() for _ in range(len(verts))])
            # all isomorphism images = automorphism closure of one
            base = [0] * len(verts)
            for vtx in verts:
                base[perm[pos[vtx]]] = vtx
            for sigma in automorphisms(cpat):
                for p in range(len(verts)):
                    d[p].add(base[sigma[p]])
        total += sum(1 for ck, d in doms.items()
                     if min(len(s) for s in d) >= minsup)
    return total
