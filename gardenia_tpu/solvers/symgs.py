"""SymGS — multi-color symmetric Gauss-Seidel smoother.

Reference: src/symgs/{symgs.h,omp_base.cc,main.cc}: the driver colors the
graph with VCSolver, sorts vertices by color into `indices` +
`color_offsets`, then sweeps color blocks forward and backward; within a
block rows are independent (proper coloring) so the row loop is parallel
(omp_base.cc:7-41).

TPU design: a color block sweep is a row-masked SpMV —
  x[i] = (b[i] - sum_{j in N(i)} A[ij] x[j]) / diag[i]   for colors[i]==c
— so one SymGS application is 2*num_colors masked slab SpMVs, unrolled
under jit (num_colors is static).  The reference's thrust
sort/reduce/scan block-building (main.cc:52-61) is unnecessary: the color
mask replaces the permutation.

Note the reference driver never initializes the off-diagonal values and
self-loops are stripped by the loader, so its diag is implicitly 0 and
rows never update; here we synthesize a diagonally-dominant system
(diag = degree + 1) so the smoother does real work and the serial-oracle
comparison is meaningful.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.ops import F32_PLUS_TIMES, spmv_ell


class SymGSResult(NamedTuple):
    x: jax.Array
    num_colors: int


def symgs_solver(g, Ax: Optional[np.ndarray] = None,
                 x: Optional[np.ndarray] = None,
                 b: Optional[np.ndarray] = None,
                 diag: Optional[np.ndarray] = None,
                 colors: Optional[np.ndarray] = None) -> SymGSResult:
    """Reference entry SymGSSolver(g, indices, Ax, x, b, color_offsets)
    (src/symgs/symgs.h:31); the coloring preprocessing is performed here
    when colors is None (main.cc:52-61 composes VCSolver the same way)."""
    m = g.m
    rng = np.random.default_rng(13)
    if Ax is None:
        Ax = rng.random(g.nnz).astype(np.float32)
    if x is None:
        x = rng.random(m).astype(np.float32)
    if b is None:
        b = rng.random(m).astype(np.float32)
    if diag is None:
        diag = (g.degrees + 1).astype(np.float32)
    if colors is None:
        from gardenia_tpu.solvers.vc import vc_solver
        colors = np.asarray(vc_solver(g).colors)
    num_colors = int(colors.max()) + 1

    def build():
        from gardenia_tpu.ops.ell import build_ell
        ell = jax.tree_util.tree_map(
            jax.device_put,
            build_ell(g.rowptr, g.colidx, np.asarray(Ax, np.float32),
                      num_cols=g.n))
        colors_d = jnp.asarray(colors.astype(np.int32))
        diag_d = jnp.asarray(diag)
        b_d = jnp.asarray(b)

        # the operands ride as jit ARGUMENTS (closure constants ship in
        # the remote-compile request body — the RMAT-20 ELL died with
        # HTTP 413) and the color blocks run under fori_loop (unrolled,
        # 2*num_colors = 478 full SpMVs at scale 20 blew program size)
        @jax.jit
        def run(x, ell, colors_d, diag_d, b_d):
            def sweep(c, x):
                mask = colors_d == c
                rsum = spmv_ell(ell, x, semiring=F32_PLUS_TIMES,
                                num_rows=m, row_mask=mask)
                newx = (b_d - rsum) / diag_d
                return jnp.where(mask & (diag_d != 0), newx, x)

            # forward (omp_base.cc:38-39), then backward (:40-41)
            x = jax.lax.fori_loop(0, num_colors, sweep, x)
            return jax.lax.fori_loop(
                0, num_colors,
                lambda i, x: sweep(num_colors - 1 - i, x), x)
        return run, (ell, colors_d, diag_d, b_d)

    run, ops = g._dev(("symgs_run", id(Ax), id(b), id(diag), id(colors)),
                      build, retain=(Ax, b, diag, colors))
    return SymGSResult(run(jnp.asarray(x), *ops), num_colors)
