"""SpMV — y += A x over the graph's CSR (Bell-Garland on GPU; here one
degree-bucketed ELL sweep on the VPU).

Reference: src/spmv/{spmv.h,omp_base.cc,warp.cu,vector.cu}.  The scalar /
warp / vector row-mapping variants collapse into the slab layout (width
bucketing replaces the per-row thread-count choice); `variant` selects the
device implementation:
  'ell'     — degree-bucketed slabs (default, fastest)
  'segment' — COO scatter-add (reference 'push' analog)
  'push_pb' — propagation-blocking push: static dst-bin permutation +
              sorted segment-sum (reference prop_blocking.h / pr/pb.cc)
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.ops import F32_PLUS_TIMES, spmv_ell, spmv_segment


def spmv_solver(g, Ax=None, x=None, y=None, *, variant: str = "ell"):
    """Return y + A@x as a device array.

    Ax: edge values (defaults to the graph's weights, else the reference
    driver's synthetic 0.2 — src/spmv/main.cc:28-37); x defaults to 0.3.
    """
    if Ax is None:
        Ax = np.full(g.nnz, 0.2, np.float32) if g.weights is None \
            else np.asarray(g.weights, np.float32)
    if x is None:
        x = np.full(g.n, 0.3, np.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    y = jnp.zeros(g.m, jnp.float32) if y is None \
        else jnp.asarray(y, dtype=jnp.float32)

    if variant == "push_pb":
        # push computes y += A^T x over the stored CSR; callers wanting
        # the forward product pass the graph pre-transposed, exactly as
        # the reference pb variants use the reverse edge list
        from gardenia_tpu.ops.spmv import make_push_pb
        fn = g._dev(("spmv_pb_run", id(Ax)),
                    lambda: jax.jit(make_push_pb(g, weights=Ax)),
                    retain=Ax)
        return fn(x) + y

    if variant == "segment":
        def build_seg():
            src, dst = g.device_coo()
            vals = jnp.asarray(np.asarray(Ax, np.float32))
            return jax.jit(partial(spmv_segment, src, dst, vals,
                                   semiring=F32_PLUS_TIMES, num_rows=g.m))
        fn = g._dev(("spmv_seg_run", id(Ax)), build_seg, retain=Ax)
        return fn(x, init=y)

    # default: build a weighted ELL with the provided values
    def build_fn():
        from gardenia_tpu.ops.ell import build_ell
        ell = jax.tree_util.tree_map(
            jax.device_put,
            build_ell(g.rowptr, g.colidx, np.asarray(Ax, np.float32),
                      num_cols=g.n))
        return jax.jit(partial(spmv_ell, ell, semiring=F32_PLUS_TIMES,
                               num_rows=g.m))
    fn = g._dev(("spmv_ell_run", id(Ax)), build_fn, retain=Ax)
    return fn(x, init=y)
