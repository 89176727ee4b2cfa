"""SpMV — y += A x over the graph's CSR (Bell-Garland on GPU; here one
degree-bucketed ELL sweep on the VPU).

Reference: src/spmv/{spmv.h,omp_base.cc,warp.cu,vector.cu}.  The scalar /
warp / vector row-mapping variants collapse into the slab layout (width
bucketing replaces the per-row thread-count choice); `variant` selects the
device implementation:
  'ell'     — degree-bucketed slabs (default on CPU)
  'hybrid'  — degree-relabeled hybrid block-sparse (ops/bsr.py): dense
              128x128 blocks on the MXU + ELL remainder; the production
              TPU path (reference locality analog: segmenting.h,
              partition.cu)
  'auto'    — hybrid on TPU backends, ell elsewhere
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

    if variant == "auto":
        from gardenia_tpu.ops import rowsel
        variant = "hybrid" if rowsel.enabled() else "ell"

    if variant == "hybrid":
        # relabel for block locality; x/y live in original ids, so the
        # runner permutes the operand in and the product back out
        def build_hyb():
            import jax.numpy as _jnp

            from gardenia_tpu.core.relabel import relabeled
            from gardenia_tpu.ops import rowsel
            from gardenia_tpu.ops.bsr import build_hybrid, spmv_hybrid
            rel = relabeled(g)
            g2 = rel.graph
            w2 = None
            if Ax is not None:
                # weights arrive in g's CSR edge order; rebuild in g2's
                src, dst = build_mod.csr_to_coo(g.rowptr, g.colidx)
                order = np.lexsort((rel.new_of_old[dst],
                                    rel.new_of_old[src]))
                w2 = np.asarray(Ax, np.float32)[order]
            host = build_hybrid(g2.rowptr, g2.colidx, w2, num_cols=g2.n,
                                dense_threshold=64 if w2 is not None
                                else 16)
            hyb = jax.tree_util.tree_map(jax.device_put, host)
            new_of_old = _jnp.asarray(rel.new_of_old)
            old_of_new = _jnp.asarray(rel.old_of_new)

            # matrix as jit arguments, not captured constants (see pr.py)
            def run(x, init, hyb_, new_, old_):
                x2 = rowsel.take(x, old_)
                y2 = spmv_hybrid(hyb_, x2, num_rows=g.m)
                return rowsel.take(y2, new_) + init
            jitted = jax.jit(run)
            return lambda x, init: jitted(x, init, hyb, new_of_old,
                                          old_of_new)
        from gardenia_tpu.core import build as build_mod
        fn = g._dev(("spmv_hybrid_run", id(Ax)), build_hyb, retain=Ax)
        return fn(x, y)

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
