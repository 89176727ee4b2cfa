"""On-chip decomposition of the CC solve (VERDICT r3 item 2) plus the
candidate fast dense min-select: an XLA fused masked-min over the
hybrid int8 panels (where(panel!=0, x, SENT) -> reduce-min, which XLA
should fuse into the reduction without materializing the broadcast).

Usage: python -u scripts/measure_cc.py [scale]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


import jax
import jax.numpy as jnp

from gardenia_tpu.ops import I32_MIN_SELECT2, spmv_ell, rowsel
from gardenia_tpu.ops.pointer_jump import pointer_jump, pointer_jump_n
from gardenia_tpu.utils.timer import time_op

log(f"backend: {jax.default_backend()}")
g = bench.get_graph(scale, need_reverse=False)
m, nnz = g.m, g.nnz
log(f"graph: m={m} nnz={nnz}")
SENT = np.int32(np.iinfo(np.int32).max)

comp0 = jnp.arange(m, dtype=jnp.int32)

# ---- A: full ELL min-select sweep (current dense-round cost) -------------
ell = g.ell()
f_ell = jax.jit(lambda e, c: spmv_ell(e, c, semiring=I32_MIN_SELECT2,
                                      num_rows=m))
_, s = time_op(lambda: f_ell(ell, comp0), warmup=1, iters=3)
log(f"A ell_min_select_sweep: {s*1e3:.1f} ms")

# ---- B: hybrid masked-min (XLA fused attempt) ----------------------------
t0 = time.time()
bench.warm_hybrid(g, scale)
from gardenia_tpu.core.relabel import relabeled
rel = relabeled(g)
g2 = rel.graph
hyb = g2.hybrid()
log(f"warm_hybrid ready ({time.time()-t0:.0f}s); "
    f"panels={[(p.panel.shape, str(p.panel.dtype)) for p in hyb.dense]}")

mb = (m + 127) // 128
qx = (g2.n + 127) // 128


def hybrid_min_xla(hyb_, x):
    flat = jnp.full((qx * 128,), SENT, jnp.int32).at[:g2.n].set(x)
    x2d = flat.reshape(qx, 128)
    y2d = jnp.full((mb, 128), SENT, jnp.int32)
    for p in hyb_.dense:
        R, W = p.src.shape
        xg = x2d[p.src].reshape(R, 1, W * 128)
        part = jnp.min(jnp.where(p.panel != 0, xg, SENT), axis=2)
        y2d = y2d.at[p.rows].min(part)
    y = y2d.reshape(-1)[:m]
    if hyb_.rem.buckets:
        y = spmv_ell(hyb_.rem, x, semiring=I32_MIN_SELECT2,
                     num_rows=m, init=y)
    return y


f_hyb = jax.jit(hybrid_min_xla)
t0 = time.time()
y_hyb = f_hyb(hyb, comp0)
log(f"B compile+run: {time.time()-t0:.1f} s")
_, s = time_op(lambda: f_hyb(hyb, comp0), warmup=0, iters=3)
log(f"B hybrid_min_xla sweep: {s*1e3:.1f} ms")

# correctness vs the ELL sweep (relabeled graph, same labels comp0=iota
# in relabeled space -> compare against ELL of g2)
ell2 = g2.ell()
y_ref = f_ell(ell2, comp0)
neq = int(jnp.sum(y_hyb != y_ref))
log(f"B correctness vs ELL(g2): mismatches={neq}")

# ---- B2: panels only / remainder only ------------------------------------
f_pan = jax.jit(lambda h, x: hybrid_min_xla(
    h._replace(rem=h.rem._replace(buckets=())), x))
_, s = time_op(lambda: f_pan(hyb, comp0), warmup=1, iters=3)
log(f"B2 panels-only masked-min: {s*1e3:.1f} ms")
f_rem = jax.jit(lambda h, x: spmv_ell(h.rem, x,
                                      semiring=I32_MIN_SELECT2,
                                      num_rows=m))
_, s = time_op(lambda: f_rem(hyb, comp0), warmup=1, iters=3)
log(f"B3 remainder-only ELL min-select: {s*1e3:.1f} ms")

# ---- C: pointer_jump level cost ------------------------------------------
# representative forest: hook every vertex to its first neighbor's min
rng = np.random.default_rng(0)
parent = np.minimum(np.arange(m, dtype=np.int32),
                    rng.integers(0, m, m).astype(np.int32))
parent_d = jnp.asarray(parent)
f_j1 = jax.jit(lambda c: pointer_jump_n(c, 1))
_, s = time_op(lambda: f_j1(parent_d), warmup=1, iters=3)
log(f"C jump_1 (m-gather): {s*1e3:.1f} ms")
f_jf = jax.jit(pointer_jump)
_, s = time_op(lambda: f_jf(parent_d), warmup=1, iters=3)
log(f"C full pointer_jump on random forest: {s*1e3:.1f} ms")

# ---- D: one Afforest pre-round (as in cc_sv) -----------------------------
rp, ci = g.device_csr()


def pre_round(comp, rp_, ci_, r):
    vid = jnp.arange(m, dtype=jnp.int32)
    start = rp_[:m] + r
    has = start < rp_[1:]
    partner = rowsel.take(ci_, jnp.minimum(start, nnz - 1))
    partner = jnp.where(has, partner, vid)
    ld = rowsel.take(comp, partner)
    c = comp.at[ld].min(comp, mode="drop")
    return c.at[comp].min(ld, mode="drop")


f_pre = jax.jit(lambda c, rp_, ci_: pre_round(c, rp_, ci_, 0))
_, s = time_op(lambda: f_pre(comp0, rp, ci), warmup=1, iters=3)
log(f"D pre-round (no jump): {s*1e3:.1f} ms")
f_prej = jax.jit(lambda c, rp_, ci_: pointer_jump(
    pre_round(c, rp_, ci_, 0)))
_, s = time_op(lambda: f_prej(comp0, rp, ci), warmup=1, iters=3)
log(f"D pre-round + full jump: {s*1e3:.1f} ms")

# ---- E: current production cc_sv -----------------------------------------
from gardenia_tpu.solvers.cc import cc_solver
res, s = time_op(lambda: cc_solver(g, variant="sv"), warmup=1, iters=3)
log(f"E cc_sv total: {s*1e3:.1f} ms rounds={int(res.iterations)}")
log("done")
