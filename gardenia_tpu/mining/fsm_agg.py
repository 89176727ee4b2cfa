"""Aggregate FSM for patterns of <= 2 edges — embedding-free MNI support.

Reference behavior: mining/fsm/fsm.h:23 (FSMSolver(k, minsup)) counts
frequent connected edge-patterns; the reference (and our gSpan engine,
mining/gspan.py) materializes every embedding to aggregate MNI domains —
at RMAT-12 the 2-edge frontier is already ~1.5e8 wedge embeddings, which
caps the reference-convention FSM at toy scales on any backend.

TPU re-design: for 1- and 2-edge patterns the minimum-image support is a
closed-form aggregate over per-vertex LABEL-COUNT vectors — no embedding
is ever materialized.  Let C[v, l] = |{w in N(v): label(w) = l}|:

  edge (la, lb):   dom_a = #{v: lab v = la, C[v, lb] >= 1}  (dom_b sym.)
                   support = min(dom_a, dom_b); la == lb merges the two
                   automorphic positions into one identical domain.
  wedge (la -b- lc), la <= lc, center label lb:
    center domain: lab v = lb and (la != lc ? C[v,la] >= 1 and
                   C[v,lc] >= 1 : C[v,la] >= 2)  (endpoints distinct)
    endpoint-a domain: lab u = la and some neighbor v has lab lb and
                   C[v, lc] >= 1 + (la == lc)    (u itself is counted in
                   C[v, lc] exactly when la == lc, so demand one more)
    support = min over automorphism orbits (la == lc merges endpoints).

Everything is 3 batched hybrid SpMV passes (ops/bsr.spmv_hybrid_batched,
the MS-BFS machinery: one pass over the int8 panels serves all L*L lane
problems on the MXU) + exact int32 segment-sums; thresholds >=1 / >=2
are exact under bf16 accumulation because partial sums of non-negative
values are monotone and 1.0 / 2.0 are exactly representable.  The
frequent-pattern count equals gSpan's (MNI is anti-monotone, so every
frequent wedge's sub-edges are frequent — no pruning difference).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# lane budget for one batched pass: (lb, lc) column pairs are processed
# in chunks of <= MAX_LANES so any label-set size L works
MAX_LANES = 512


def fsm_k2_aggregate(g, k: int, minsup: int,
                     labels: Optional[np.ndarray] = None) -> int:
    """Cumulative frequent-pattern count for k in {1, 2} (the same
    convention as mining/gspan.fsm_gspan).  g must be symmetric."""
    import jax
    import jax.numpy as jnp

    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.ops.bsr import spmv_hybrid_batched

    if k < 1 or g.m == 0 or g.nnz == 0:
        return 0
    if k > 2:
        raise ValueError("fsm_k2_aggregate handles k <= 2 only")
    if labels is None:
        labels = g.vlabels
    if labels is None:
        labels = np.minimum(g.degrees, 10).astype(np.int64)
    _, lab = np.unique(np.asarray(labels), return_inverse=True)
    L = int(lab.max()) + 1

    rel = relabeled(g)
    g2 = rel.graph
    m = g2.m
    hyb = g2.hybrid(reverse=False, weighted=False, dense_threshold=16)
    lab2 = lab[np.asarray(rel.old_of_new, np.int64)].astype(np.int32)

    # static (lb, lc) column chunks
    pair_lb, pair_lc = np.divmod(np.arange(L * L, dtype=np.int32), L)
    chunks = [(pair_lb[i:i + MAX_LANES], pair_lc[i:i + MAX_LANES])
              for i in range(0, L * L, MAX_LANES)]

    def build_runner():
        @jax.jit
        def agg(hyb_, lab_d):
            onehot = (lab_d[:, None]
                      == jnp.arange(L, dtype=jnp.int32)[None, :]
                      ).astype(jnp.float32)
            C = spmv_hybrid_batched(hyb_, onehot, num_rows=m,
                                    exact=False)
            E1 = (C >= 0.5).astype(jnp.float32)
            E2 = (C >= 1.5).astype(jnp.float32)
            G1s, G2s, Ds = [], [], []
            for plb, plc in chunks:
                B1 = onehot[:, plb] * E1[:, plc]
                B2 = onehot[:, plb] * E2[:, plc]
                H1 = (spmv_hybrid_batched(hyb_, B1, num_rows=m,
                                          exact=False) >= 0.5)
                H2 = (spmv_hybrid_batched(hyb_, B2, num_rows=m,
                                          exact=False) >= 0.5)
                G1s.append(jax.ops.segment_sum(
                    H1.astype(jnp.int32), lab_d, num_segments=L))
                G2s.append(jax.ops.segment_sum(
                    H2.astype(jnp.int32), lab_d, num_segments=L))
                # center pair-AND counts per label: [lb, (la, lc)]
                Ds.append(jax.ops.segment_sum(
                    (E1[:, plb] * E1[:, plc]).astype(jnp.int32),
                    lab_d, num_segments=L))
            G1 = jnp.concatenate(G1s, axis=1)       # (L, L*L) [la,(lb,lc)]
            G2 = jnp.concatenate(G2s, axis=1)
            Dcnt = jnp.concatenate(Ds, axis=1)      # (L, L*L) [lb,(la,lc)]
            D2 = jax.ops.segment_sum(E2.astype(jnp.int32), lab_d,
                                     num_segments=L)       # (L, L)
            edge_dom = jax.ops.segment_sum(E1.astype(jnp.int32), lab_d,
                                           num_segments=L)  # (L, L)
            return G1, G2, Dcnt, D2, edge_dom
        return agg

    agg = g._dev(("fsm_agg_runner", L, m), build_runner)
    G1, G2, Dcnt, D2, edge_dom = jax.tree_util.tree_map(
        np.asarray, agg(hyb, jnp.asarray(lab2)))

    total = 0
    for la in range(L):
        for lb in range(la, L):
            sup = (edge_dom[la, la] if la == lb
                   else min(edge_dom[la, lb], edge_dom[lb, la]))
            if sup >= minsup:
                total += 1
    if k == 1:
        return total
    for lb in range(L):                 # center label
        for la in range(L):
            for lc in range(la, L):     # endpoint labels, la <= lc
                if la == lc:
                    center = D2[lb, la]
                    dom_a = G2[la, lb * L + lc]
                    sup = min(center, dom_a)
                else:
                    center = Dcnt[lb, la * L + lc]
                    dom_a = G1[la, lb * L + lc]
                    dom_c = G1[lc, lb * L + la]
                    sup = min(center, dom_a, dom_c)
                if sup >= minsup:
                    total += 1
    return total
