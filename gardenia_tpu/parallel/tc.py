"""Multi-chip triangle counting: the wedge space sharded over the mesh.

Each chip owns an equal slice of the wedge space (edge e x slot k into
N+(src(e))) of the DAG; the CSR arrays are replicated (they are read-only
and orders of magnitude smaller than the wedge space).  Per-chip partial
counts psum over ICI.  This realizes BASELINE.json config 5's
multi-chip TC; a 2D edge partition with halo exchange of adjacency rows
is the planned refinement for graphs whose CSR exceeds one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.ops.intersect import membership_counts


def tc_solver_dist(g, *, mesh=None, n_shards=None,
                   chunk: int = 1 << 18) -> int:
    if mesh is None:
        mesh = make_mesh(n_shards)
    ndev = mesh.devices.size
    dag = g._dev(("oriented",), g.oriented)
    m, nnz = dag.m, dag.nnz
    if nnz == 0:
        return 0
    rowptr, colidx = dag.device_csr()
    deg = np.diff(dag.rowptr)
    src_h = np.repeat(np.arange(m, dtype=np.int32), deg)
    cum = np.cumsum(deg[src_h], dtype=np.int64)
    total = int(cum[-1])
    assert total < 2 ** 31
    cum_d = jnp.asarray(cum.astype(np.int32))
    src_d = jnp.asarray(src_h)
    per = -(-total // ndev)
    n_chunks = -(-per // chunk)
    max_rounds = max(1, int(np.ceil(np.log2(max(2, deg.max() + 1)))) + 1)
    starts = jnp.asarray(
        (np.arange(ndev, dtype=np.int64) * per).astype(np.int32)
    ).reshape(ndev, 1)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("v"), P(), P(), P(), P()),
             out_specs=P(), check_vma=False)
    def run(start_l, rowptr, colidx, cum_d, src_d):
        base = start_l[0, 0]

        def body(c, acc):
            from gardenia_tpu.ops import rowsel
            j = base + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
            e = jnp.searchsorted(cum_d, j, side="right").astype(jnp.int32)
            e = jnp.minimum(e, nnz - 1)
            b = jnp.where(e > 0, cum_d[jnp.maximum(e - 1, 0)], 0)
            k = j - b
            u = rowsel.take(src_d, e)
            v = rowsel.take(colidx, e)
            w = rowsel.take(colidx,
                            jnp.minimum(rowsel.take(rowptr, u) + k,
                                        nnz - 1))
            valid = (j < total) & (j < base + per)
            return acc + membership_counts(rowptr, colidx, w, v, valid,
                                           search_rounds=max_rounds)

        local = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
        return jax.lax.psum(local, "v")

    return int(jax.jit(run)(starts, rowptr, colidx, cum_d, src_d))
