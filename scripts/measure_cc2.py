"""Loop-fused on-chip cost decomposition at scale 20 (CC + BFS bu).

Each op runs REPS times inside one jitted fori_loop (carry-dependent so
nothing is DCE'd); the per-op cost is (total - floor) / REPS, which
buries the ~24-29 ms tunnel floor.

Usage: python -u scripts/measure_cc2.py [scale] [op ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench  # sets JAX_COMPILATION_CACHE_DIR

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
only = set(sys.argv[2:])

import jax
import jax.numpy as jnp

from gardenia_tpu.ops import I32_MIN_SELECT2, spmv_ell, rowsel
from gardenia_tpu.utils.timer import time_op

REPS = 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, fn, *args):
    if only and name.split()[0] not in only:
        return
    t0 = time.time()
    jfn = jax.jit(fn)
    try:
        _ = jfn(*args)
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")
        return
    compile_s = time.time() - t0
    _, s = time_op(lambda: jfn(*args), warmup=1, iters=3)
    log(f"{name}: {(s*1e3 - 26)/REPS:.2f} ms/op "
        f"(total {s*1e3:.1f} ms, compile {compile_s:.0f}s)")


log(f"backend: {jax.default_backend()}")
g = bench.get_graph(scale, need_reverse=False)
m, nnz = g.m, g.nnz
log(f"graph: m={m} nnz={nnz}")
SENT = np.int32(np.iinfo(np.int32).max)
comp0 = jnp.arange(m, dtype=jnp.int32)
rng = np.random.default_rng(0)
ridx = jnp.asarray(rng.integers(0, m, m).astype(np.int32))

# ---- m-sized primitives ---------------------------------------------------
timed("gather_m (jump level)",
      lambda c: jax.lax.fori_loop(
          0, REPS, lambda i, c: rowsel.take(c, c), c), comp0)
timed("scatter_min_m",
      lambda c, idx: jax.lax.fori_loop(
          0, REPS, lambda i, c: c.at[idx].min(c, mode="drop") + 1, c),
      comp0, ridx)

# ---- pre-round ------------------------------------------------------------
rp, ci = g.device_csr()


def pre_round(c, rp_, ci_, first):
    vid = jnp.arange(m, dtype=jnp.int32)
    start = rp_[:m]
    has = start < rp_[1:]
    partner = rowsel.take(ci_, jnp.minimum(start, nnz - 1))
    partner = jnp.where(has, partner, vid)
    ld = partner if first else rowsel.take(c, partner)
    c2 = c.at[ld].min(c, mode="drop")
    return c2.at[c].min(ld, mode="drop")


timed("pre_round_r1 (with ld gather)",
      lambda c, rp_, ci_: jax.lax.fori_loop(
          0, REPS, lambda i, c: pre_round(c, rp_, ci_, False), c),
      comp0, rp, ci)

# round-5 forms: host-precomputed partner vectors; round 0 exploits
# identity labels (no gather, second hook elementwise)
_rp_h = np.asarray(g.rowptr, np.int64)
_ci_h = np.asarray(g.colidx, np.int64)
_deg_h = np.diff(_rp_h)
_vid_h = np.arange(m, dtype=np.int64)
_parts = [jnp.asarray(np.where(_deg_h > r,
                               _ci_h[np.minimum(_rp_h[:m] + r, nnz - 1)],
                               _vid_h).astype(np.int32))
          for r in range(2)]

timed("pre_round0_identity (r5)",
      lambda c, p0: jax.lax.fori_loop(
          0, REPS,
          lambda i, c: jnp.minimum(c.at[p0].min(c, mode="drop"), p0),
          c), comp0, _parts[0])
timed("pre_round1_precomp (r5)",
      lambda c, p1: jax.lax.fori_loop(
          0, REPS,
          lambda i, c: (lambda ld: c.at[ld].min(c, mode="drop")
                        .at[c].min(ld, mode="drop"))(rowsel.take(c, p1)),
          c), comp0, _parts[1])

# ---- hybrid panel ops -----------------------------------------------------
bench.warm_hybrid(g, scale)
from gardenia_tpu.core.relabel import relabeled
rel = relabeled(g)
g2 = rel.graph
hyb = g2.hybrid()
log(f"hybrid ready: panels={[p.panel.shape for p in hyb.dense]} "
    f"rem_edges={int(hyb.rem_dst.shape[0])}")
from gardenia_tpu.ops.bsr import spmv_hybrid, spmv_hybrid_min_select

timed("panel_minselect (dense only)",
      lambda h, c: jax.lax.fori_loop(
          0, REPS,
          lambda i, c: spmv_hybrid_min_select(
              h._replace(rem=h.rem._replace(buckets=()),
                         rem_dst=h.rem_dst[:1], rem_src=h.rem_src[:1]),
              c, num_rows=m, sentinel=int(SENT)),
          c), hyb, comp0)
timed("rem_ell_minselect",
      lambda h, c: jax.lax.fori_loop(
          0, REPS,
          lambda i, c: spmv_ell(h.rem, c, semiring=I32_MIN_SELECT2,
                                num_rows=m), c), hyb, comp0)


def rem_coo_min(h, c):
    vals = rowsel.take(c, h.rem_src)
    out = jnp.full((m,), SENT).at[h.rem_dst].min(vals, mode="drop")
    return jnp.minimum(out, c)


timed("rem_coo_scatter_min",
      lambda h, c: jax.lax.fori_loop(
          0, REPS, lambda i, c: rem_coo_min(h, c), c), hyb, comp0)
timed("hybrid_minselect_full",
      lambda h, c: jax.lax.fori_loop(
          0, REPS,
          lambda i, c: spmv_hybrid_min_select(h, c, num_rows=m,
                                              sentinel=int(SENT)),
          c), hyb, comp0)
timed("hybrid_count_sweep (BFS bu)",
      lambda h, x: jax.lax.fori_loop(
          0, REPS,
          lambda i, x: (spmv_hybrid(h, x, num_rows=m) > 0)
          .astype(jnp.float32), x),
      hyb, jnp.ones((m,), jnp.float32))

# ---- sparse round at the top tier ----------------------------------------
from gardenia_tpu.ops.frontier import compact_mask, expand_frontier_edges
deg = g.device_degrees()


def sparse_round(c, rp_, ci_, deg_):
    ids = compact_mask((c > 0) & (deg_ > 0), 1 << 19, m)
    src, dst, valid, _ = expand_frontier_edges(rp_, ci_, ids, 1 << 19)
    lbl = rowsel.take(c, src)
    return c.at[jnp.where(valid, dst, m)].min(lbl, mode="drop")


timed("sparse_round_512K",
      lambda c, rp_, ci_, d: jax.lax.fori_loop(
          0, REPS, lambda i, c: sparse_round(c, rp_, ci_, d), c),
      comp0, rp, ci, deg)
log("done")
