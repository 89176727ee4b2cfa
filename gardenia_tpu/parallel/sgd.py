"""Multi-chip SGD matrix factorization — the framework's training step.

Data-parallel over the rating edges: each chip owns a contiguous shard of
(src, dst, rating), latent factor matrices are replicated, per-shard
gradients are psum'd over the mesh axis before the update (the classic
dp recipe; gradients ride ICI).  The reference's SGD is single-node
Hogwild (src/sgd/omp_base.cc) — this is the scale-out axis it lacks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gardenia_tpu.core import types as T
from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.solvers.sgd import (DEFAULT_LAMBDA, DEFAULT_STEP,
                                      init_latent)


class SGDDistResult(NamedTuple):
    user_lv: jax.Array
    item_lv: jax.Array
    rmse: jax.Array


def make_dist_sgd_step(mesh, m: int, n: int, nnz_total: int,
                       lam: float = DEFAULT_LAMBDA,
                       step: float = DEFAULT_STEP):
    """Build the sharded training step:
    (ulv, ilv, src_shard, dst_shard, r_shard, valid_shard) -> updated.

    Edge arrays carry a leading shard axis (n_dev, edges_per_shard);
    factors are replicated.
    """
    lam = np.float32(lam)
    step_ = np.float32(step)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("v"), P("v"), P("v"), P("v")),
             out_specs=(P(), P(), P()))
    def train_step(ulv, ilv, src, dst, r, valid):
        src, dst, r, valid = src[0], dst[0], r[0], valid[0]

        def loss_fn(ulv, ilv):
            est = jnp.einsum("ek,ek->e", ulv[src], ilv[dst],
                             preferred_element_type=jnp.float32)
            delta = (r - est) * valid
            reg = jnp.sum((ulv[src] ** 2) * valid[:, None]) + \
                jnp.sum((ilv[dst] ** 2) * valid[:, None])
            return 0.5 * jnp.sum(delta ** 2) + 0.5 * lam * reg, \
                jnp.sum(delta ** 2)

        (_, sqerr), (gu, gi) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(ulv, ilv)
        # NOTE: gu/gi are already all-reduced — shard_map's vma-aware
        # transpose inserts the psum when differentiating a replicated
        # (unvarying) input against device-varying data; an explicit
        # psum here would overcount by the mesh size.
        sqerr = jax.lax.psum(sqerr, "v")
        return ulv - step_ * gu, ilv - step_ * gi, \
            jnp.sqrt(sqerr / nnz_total)

    return train_step


def sgd_train_dist(g, *, mesh=None, n_shards=None, iters: int = 3,
                   lam: float = DEFAULT_LAMBDA,
                   step: float = DEFAULT_STEP, seed: int = 0
                   ) -> SGDDistResult:
    """Run `iters` distributed epochs. g: bipartite rating graph."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    ndev = mesh.devices.size
    m = g.m
    n = max(g.n, int(g.colidx.max()) + 1 if g.nnz else 1)
    src_h = np.repeat(np.arange(m, dtype=np.int32), np.diff(g.rowptr))
    dst_h = np.asarray(g.colidx)
    r_h = np.asarray(g.weights if g.weights is not None
                     else np.ones(g.nnz), np.float32)
    per = T.round_up(max(1, -(-g.nnz // ndev)), 8)
    pad = ndev * per - g.nnz
    pad_i = np.zeros(pad, np.int32)

    def shardify(a, padv):
        return np.concatenate([a, np.full(pad, padv, a.dtype)]) \
            .reshape(ndev, per)

    src = jnp.asarray(shardify(src_h, 0))
    dst = jnp.asarray(shardify(dst_h, 0))
    r = jnp.asarray(shardify(r_h, 0))
    valid = jnp.asarray(shardify(np.ones(g.nnz, np.float32), 0))

    train = jax.jit(make_dist_sgd_step(mesh, m, n, g.nnz, lam, step))
    ulv = jnp.asarray(init_latent(m, seed))
    ilv = jnp.asarray(init_latent(n, seed + 1))
    rmse = jnp.float32(0)
    for _ in range(iters):
        ulv, ilv, rmse = train(ulv, ilv, src, dst, r, valid)
    return SGDDistResult(ulv, ilv, rmse)
