"""Label indexes for labeled-graph mining.

Reference: the mining Graph builds label frequency and NLF
(neighbor-label-frequency) indexes for candidate filtering
(include/graph.hh, SURVEY.md §2.1).  Both are one scatter-add here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def label_frequency(labels, num_labels: int) -> np.ndarray:
    """Count of vertices per label (graph.hh label frequency index)."""
    return np.bincount(np.asarray(labels, np.int64),
                       minlength=num_labels)


def nlf_index(g, labels, num_labels: int) -> jax.Array:
    """NLF[v, l] = number of neighbors of v with label l — the classic
    subgraph-query pruning index: a query vertex q can map to v only if
    NLF[v] >= NLF_query[q] elementwise."""
    labels = jnp.asarray(np.asarray(labels, np.int32))
    src, dst = g.device_coo()
    from gardenia_tpu.ops import rowsel
    lab_d = rowsel.take(labels, dst)
    flat = src * num_labels + lab_d
    table = jnp.zeros((g.m * num_labels,), jnp.int32).at[flat].add(1)
    return table.reshape(g.m, num_labels)


def nlf_filter(nlf, query_nlf_row) -> jax.Array:
    """bool[m]: vertices whose NLF dominates the query vertex's."""
    return jnp.all(nlf >= jnp.asarray(query_nlf_row)[None, :], axis=1)
