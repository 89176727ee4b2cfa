"""TC — triangle counting over the DAG orientation.

Reference: src/tc/{omp_base.cc,gpu_base.cu}, main applies the degree-order
DAG first (src/tc/main.cc:13 USE_DAG), then
total = sum over DAG edges (u,v) of |N+(u) ∩ N+(v)| (omp_base.cc:16-21);
with the DAG each triangle is counted exactly once.

TPU design: the "wedge" space — pairs (edge e=(u,v), w in N+(u)) — is
enumerated in fixed-size chunks; each chunk resolves membership w ∈ N+(v)
by vectorized binary search (ops/intersect.py), replacing the warp-merge
intersections of set_intersect.cuh with branch-free gather rounds.  The
chunk loop is a lax.fori_loop, fully on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.core import types as T
from gardenia_tpu.ops.intersect import membership_counts


def tc_solver(g, *, chunk: int = 1 << 20, presorted_dag: bool = False):
    """Reference entry TCSolver(g, total) (src/tc/tc.h:7).
    g must be symmetric (undirected); the DAG orientation is applied here
    unless presorted_dag. Returns a python int triangle count."""
    # cache the DAG view on the source graph so repeated solves (bench
    # warmup + timed runs) reuse both the orientation and the jitted body
    dag = g if presorted_dag else g._dev(("oriented",), g.oriented)
    m, nnz = dag.m, dag.nnz
    if nnz == 0:
        return 0
    rowptr, colidx = dag.device_csr()
    # wedge prefix: edge e=(u,v) owns deg+(u) wedges
    deg = np.diff(dag.rowptr)
    src_host = np.repeat(np.arange(m), deg)
    wedge_per_edge = deg[src_host]                   # deg+(src(e))
    cum = np.cumsum(wedge_per_edge, dtype=np.int64)
    total_wedges = int(cum[-1])
    # TODO(round2): segment the wedge space on host for > 2^31 wedges
    assert total_wedges < 2 ** 31, "wedge space exceeds int32 indexing"
    cum_d = jnp.asarray(cum.astype(np.int32))
    src_d = jnp.asarray(src_host.astype(np.int32))
    max_rounds = max(1, int(np.ceil(np.log2(max(2, deg.max() + 1)))) + 1)

    n_chunks = max(1, -(-total_wedges // chunk))

    def run():
        def body(c, partials):
            from gardenia_tpu.ops import rowsel
            j = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
            e = jnp.searchsorted(cum_d, j, side="right").astype(jnp.int32)
            e = jnp.minimum(e, nnz - 1)
            base = jnp.where(e > 0, cum_d[jnp.maximum(e - 1, 0)], 0)
            k = (j - base).astype(jnp.int32)          # wedge index in N+(u)
            u = rowsel.take(src_d, e)
            v = rowsel.take(colidx, e)
            w = rowsel.take(colidx,
                            jnp.minimum(rowsel.take(rowptr, u) + k,
                                        nnz - 1))
            valid = j < total_wedges
            cnt = membership_counts(rowptr, colidx, w, v, valid,
                                    search_rounds=max_rounds)
            return partials.at[c].set(cnt)

        # per-chunk int32 partials (chunk < 2^31); summed exactly on host
        return jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((n_chunks,), jnp.int32))

    jitted = dag._dev(("tc_run", chunk), lambda: jax.jit(run))
    return int(np.asarray(jitted()).astype(np.int64).sum())
