"""FSM — frequent subgraph mining on labeled graphs (MNI domain support).

Reference: mining/fsm/{fsm.h,serial.cc,omp_base.cc} and
mining/fsm2/miner.h (Pangolin edge miner: BFS embedding expansion,
quick-pattern aggregation, canonical-pattern domain support, filter,
repeat up to k edges; canonical forms via bliss +
include/dfscode/dfs_code.hpp).

TPU design (mining/gspan.py): patterns are canonicalized on the host by
minimum DFS code (mining/dfscode.py — patterns are tiny, so exhaustive
code enumeration replaces bliss); embeddings live in dense
(positions, N) int32 arrays in canonical vertex order and expand with
the chunked device machinery shared with kCL.  Support is minimum-image
(MNI) closed under vertex-position automorphism equivalence — the same
convention as the reference's equivalence-set union
(edge_miner.h:175-193).

Counts the number of frequent patterns with 1..k edges (cumulative),
any k.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def fsm_solver(g, k: int = 2, minsup: int = 2,
               labels: Optional[np.ndarray] = None) -> int:
    """Reference entry FSMSolver(m, nnz, k, minsup, row_offsets,
    column_indices, labels, total) (mining/fsm/fsm.h:23).  g symmetric;
    labels default to g.vlabels, else degree-bucket synthetic labels
    (deterministic), matching the converter's labeling fallback."""
    if k < 1:
        return 0
    if k <= 2:
        # embedding-free aggregate MNI (mining/fsm_agg.py): 3 batched
        # hybrid SpMV passes instead of a ~1e8-column wedge frontier —
        # the path that makes FSM run at RMAT-20 (gSpan caps at ~rmat12)
        from gardenia_tpu.mining.fsm_agg import fsm_k2_aggregate
        return fsm_k2_aggregate(g, k, minsup, labels)
    from gardenia_tpu.mining.gspan import fsm_gspan
    return fsm_gspan(g, k, minsup, labels)


def fsm_verifier(g, k: int = 2, minsup: int = 2,
                 labels: Optional[np.ndarray] = None) -> int:
    """Brute-force oracle: enumerate every connected edge-subgraph with
    <= k edges by recursive edge addition, aggregate true MNI domains
    per canonical pattern (independent of the device engine)."""
    from gardenia_tpu.mining.gspan import fsm_bruteforce
    return fsm_bruteforce(g, k, minsup, labels)
