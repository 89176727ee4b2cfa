"""Clustering — similarity-threshold connected components.

Reference src/clustering is an empty loop skeleton (SURVEY.md §2.3
"stubs"); this is a real implementation of the simplest useful scheme:
single-linkage clustering = connected components of the graph with
edges below a weight threshold removed, sharing the CC machinery
(pointer jumping + hooking).  The threshold sweep gives a dendrogram
level per call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.ops.pointer_jump import pointer_jump


class ClusterResult(NamedTuple):
    labels: jax.Array      # i32[m] cluster representative ids
    num_clusters: int


def cluster_threshold(g, threshold: float = 0.0) -> ClusterResult:
    """Single-linkage level: merge endpoints of every edge with
    weight >= threshold (all edges when the graph is unweighted)."""
    m = g.m
    src, dst = g.device_coo()
    w = g.device_weights()

    def build():
        @jax.jit
        def run(thr):
            keep = jnp.ones(src.shape, bool) if w is None \
                else (w >= thr)
            s = jnp.where(keep, src, m)
            d = jnp.where(keep, dst, m)

            def cond(state):
                comp, changed = state
                return changed

            def body(state):
                from gardenia_tpu.ops import rowsel
                comp, _ = state
                ls = rowsel.take(comp, jnp.minimum(s, m - 1))
                ld = rowsel.take(comp, jnp.minimum(d, m - 1))
                new = comp.at[jnp.where(keep, ld, m)].min(
                    ls, mode="drop")
                new = new.at[jnp.where(keep, ls, m)].min(
                    ld, mode="drop")
                new = pointer_jump(new)
                return new, jnp.any(new != comp)

            comp0 = jnp.arange(m, dtype=jnp.int32)
            comp, _ = jax.lax.while_loop(
                cond, body, (comp0, jnp.bool_(True)))
            return comp
        return run

    run = g._dev(("cluster_run",), build)
    labels = run(jnp.float32(threshold))
    return ClusterResult(labels, len(np.unique(np.asarray(labels))))
