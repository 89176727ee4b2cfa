"""Headline benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: pull-PageRank GTEPS (edges traversed per iteration x
iterations / solve time) on a Graph500 R-MAT scale-20 graph (|V|=1M,
|E|~=30M symmetrized, dedup'd) — the same workload class as the
reference's LiveJournal config (BASELINE.json config 2).

vs_baseline compares against 2.0 GTEPS, an A100-class CUDA pull-PR rate
on scale-free graphs of this size (GAP-class published numbers; the
reference repo itself publishes no tables — BASELINE.md). >=0.5 meets the
"within 2x of A100" north star; >1.0 beats it.

Run: python bench.py [--scale N] [--kernel pr|spmv] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_GTEPS = 2.0      # A100-class CUDA pull-PR on LiveJournal-scale
BASELINE_SPMV_GFLOPS = 55.0  # cuSPARSE CSR SpMV, scale-free, A100-class

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")

# persistent XLA compile cache: first-compile of the fused solver loops
# takes minutes through the axon remote-compile tunnel; cache across
# processes so driver runs after a warm-up are fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(CACHE_DIR, "xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def get_graph(scale: int, need_reverse: bool):
    """R-MAT graph, cached as binary CSR after first generation."""
    from gardenia_tpu import load_graph
    from gardenia_tpu.core.generate import generate_graph
    from gardenia_tpu.core.io import write_bin_csr
    os.makedirs(CACHE_DIR, exist_ok=True)
    prefix = os.path.join(CACHE_DIR, f"rmat{scale}")
    if os.path.exists(prefix + ".meta.txt"):
        g = load_graph(prefix, "bin", symmetrize=True,
                       need_reverse=need_reverse)
        return g
    g = generate_graph("rmat", scale=scale, degree=16, symmetrize=True,
                       need_reverse=need_reverse)
    write_bin_csr(prefix, g.rowptr, g.colidx)
    return g


def get_graph_directed(scale: int):
    """DIRECTED R-MAT (no symmetrization) — SCC on a symmetrized graph
    degenerates to CC, so its bench needs the raw digraph."""
    from gardenia_tpu import load_graph
    from gardenia_tpu.core.generate import generate_graph
    from gardenia_tpu.core.io import write_bin_csr
    os.makedirs(CACHE_DIR, exist_ok=True)
    prefix = os.path.join(CACHE_DIR, f"rmat{scale}d")
    if os.path.exists(prefix + ".meta.txt"):
        return load_graph(prefix, "bin", need_reverse=True)
    g = generate_graph("rmat", scale=scale, degree=16, symmetrize=False,
                       need_reverse=True)
    write_bin_csr(prefix, g.rowptr, g.colidx)
    return g


_HYBRID_CACHE_VERSION = 4   # bump when ops/bsr.py layouts change


def warm_hybrid(g, scale: int) -> None:
    """Pre-populate g's relabel + hybrid caches from disk (build once,
    ~5 min of host sorting at scale 20 otherwise).  The benched graphs
    are symmetric, so one unweighted threshold-16 hybrid serves the
    pull (reverse) sweeps of PR/BFS/MS-BFS/BC."""
    import pickle

    from gardenia_tpu.core.graph import Graph
    from gardenia_tpu.core.relabel import Relabeled
    from gardenia_tpu.ops.bsr import build_hybrid

    assert g.symmetric and g.weights is None, \
        "warm_hybrid serves the symmetric unweighted bench graphs only"
    # key carries nnz + threshold so a changed generator/threshold can
    # never serve a stale layout; load failures (truncated pickle from
    # a killed process) fall back to a rebuild
    thresh = 16
    path = os.path.join(
        CACHE_DIR,
        f"hyb{scale}_n{g.nnz}_t{thresh}_v{_HYBRID_CACHE_VERSION}.pkl")
    cached = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                cached = pickle.load(f)
        except Exception:
            os.unlink(path)
    if cached is not None:
        rel_csr, new_of_old, old_of_new, host = cached
        g2 = Graph(rel_csr[0], rel_csr[1], None, num_cols=g.n,
                   symmetric=True)
    else:
        import tempfile

        from gardenia_tpu.core.relabel import degree_relabel
        g2, new_of_old, old_of_new = degree_relabel(g)
        host = build_hybrid(g2.rowptr, g2.colidx, None, num_cols=g2.n,
                            dense_threshold=thresh)
        fd, tmp = tempfile.mkstemp(dir=CACHE_DIR, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(((g2.rowptr, g2.colidx), new_of_old, old_of_new,
                         host), f, protocol=4)
        os.replace(tmp, path)
    import jax
    hyb = jax.tree_util.tree_map(jax.device_put, host)
    rel = Relabeled(g2, new_of_old, old_of_new)
    g._dev(("relabel_degree",), lambda: rel)
    # symmetric graphs normalize reverse->False in Graph.hybrid's key
    g2._dev(("hybrid", False, False, 16), lambda: hyb)


def bench_pr(scale: int):
    from gardenia_tpu.solvers.pr import pr_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=True)
    warm_hybrid(g, scale)
    res, secs = time_op(lambda: pr_solver(g), warmup=1, iters=3)
    iters = int(res.iterations)
    gteps = g.nnz * iters / secs / 1e9
    return {"metric": f"pr_pull_gteps_rmat{scale}", "value": round(gteps, 4),
            "unit": "GTEPS", "vs_baseline": round(gteps / BASELINE_GTEPS, 4),
            "detail": {"iters": iters, "ms": round(secs * 1e3, 3),
                       "nnz": g.nnz, "m": g.m}}


def bench_spmv(scale: int, reps: int = 8):
    """Steady-state SpMV throughput: a fused `reps`-application power
    loop (normalized each step), divided by reps — the methodology of
    cuSPARSE-class numbers (kernel-rate over repetitions), and the same
    convention as bench_pr's fused iterations.  A single call through
    the axon tunnel carries a ~25 ms dispatch+D2H floor that would
    dominate the kernel."""
    import jax
    import jax.numpy as jnp
    from gardenia_tpu.core.relabel import relabeled
    from gardenia_tpu.ops.bsr import spmv_hybrid
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    # uniform 0.2 weights (the reference driver's own synthesis,
    # src/spmv/main.cc:30) factor into scale * int8 count panels (ops/
    # bsr constant-value factorization) — EXACTLY the warm_hybrid disk
    # -cached unweighted layout with scale 0.2, so reuse it instead of
    # re-running the ~80 min host build this machine takes at scale 20
    warm_hybrid(g, scale)
    rel = relabeled(g)
    g2 = rel.graph
    def _missing():
        raise RuntimeError("warm_hybrid must have cached this layout")
    hyb = g2._dev(("hybrid", False, False, 16), _missing)
    hyb = hyb._replace(scale=0.2)

    @jax.jit
    def apply_n(x, hyb_):
        def body(_, x):
            y = spmv_hybrid(hyb_, x, num_rows=g2.m)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    x0 = jnp.asarray(np.full(g2.n, 0.3, np.float32))
    _, secs = time_op(lambda: apply_n(x0, hyb), warmup=1, iters=3)
    per = secs / reps
    gflops = 2 * g.nnz / per / 1e9
    return {"metric": f"spmv_gflops_rmat{scale}", "value": round(gflops, 3),
            "unit": "GFLOP/s",
            "vs_baseline": round(gflops / BASELINE_SPMV_GFLOPS, 4),
            "detail": {"ms_per_apply": round(per * 1e3, 3), "reps": reps,
                       "nnz": g.nnz}}


BASELINE_BFS_GTEPS = 30.0   # A100-class linear_lb BFS on LiveJournal
BASELINE_CC_MS_PER_MEDGE = 1.0  # A100-class afforest ~1 ms / M edges
BASELINE_TC_MEPS = 2000.0   # A100-class warp-intersection TC rate


def bench_bfs(scale: int):
    """Conventional single-source BFS GTEPS (edges/time, GAP convention).
    Round 3 benches the fused direction-optimizing variant: graduated
    static top-down capacities finally make it beat the dense pull
    (229 vs 313 ms at RMAT-20 — the reference's best variant is also
    direction-optimizing, src/bfs/linear_lb.cu)."""
    from gardenia_tpu.solvers.bfs import bfs_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=True)
    warm_hybrid(g, scale)
    # deterministic well-connected source (R-MAT leaves low ids isolated
    # sometimes; an empty traversal would just measure the sweep floor)
    src = int(np.argmax(g.degrees))
    res, secs = time_op(lambda: bfs_solver(g, src, variant="do_fused"),
                        warmup=1, iters=3)
    gteps = g.nnz / secs / 1e9
    return {"metric": f"bfs_dofused_gteps_rmat{scale}",
            "value": round(gteps, 4), "unit": "GTEPS",
            "vs_baseline": round(gteps / BASELINE_BFS_GTEPS, 4),
            "detail": {"levels": int(res.iterations),
                       "relax_gteps": round(
                           g.nnz * int(res.iterations) / secs / 1e9, 3),
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz}}


def bench_msbfs(scale: int, sources: int = 128):
    """Batched multi-source BFS: aggregated TEPS over S concurrent
    sources (each source's traversal counts nnz edges — the multi-source
    benchmark convention)."""
    import numpy as np
    from gardenia_tpu.solvers.bfs import bfs_multi_source
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=True)
    warm_hybrid(g, scale)
    srcs = np.arange(sources)
    res, secs = time_op(lambda: bfs_multi_source(g, srcs),
                        warmup=1, iters=3)
    gteps = g.nnz * sources / secs / 1e9
    return {"metric": f"msbfs{sources}_gteps_rmat{scale}",
            "value": round(gteps, 3), "unit": "GTEPS",
            "vs_baseline": round(gteps / BASELINE_BFS_GTEPS, 4),
            "detail": {"sources": sources, "levels": int(res.iterations),
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz}}


def bench_cc(scale: int):
    from gardenia_tpu.solvers.cc import cc_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    # round 4: cc_sv's dense rounds ride the hybrid min-select, so the
    # disk-cached layout is the one the solver needs anyway
    warm_hybrid(g, scale)
    res, secs = time_op(lambda: cc_solver(g, variant="sv"),
                        warmup=1, iters=3)
    ms_per_medge = secs * 1e3 / (g.nnz / 1e6)
    return {"metric": f"cc_sv_ms_rmat{scale}",
            "value": round(secs * 1e3, 3), "unit": "ms",
            "vs_baseline": round(BASELINE_CC_MS_PER_MEDGE / ms_per_medge,
                                 4),
            "detail": {"rounds": int(res.iterations), "nnz": g.nnz}}


def bench_tc(scale: int):
    from gardenia_tpu.solvers.tc import tc_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    total, secs = time_op(lambda: tc_solver(g), warmup=1, iters=2)
    meps = g.nnz / secs / 1e6
    return {"metric": f"tc_meps_rmat{scale}", "value": round(meps, 2),
            "unit": "M edges/s",
            "vs_baseline": round(meps / BASELINE_TC_MEPS, 4),
            "detail": {"triangles": int(total),
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz}}


BASELINE_BC_GTEPS = 5.0   # A100-class per-source Brandes rate


def bench_bc(scale: int, sources: int = 128):
    """Batched multi-source Brandes — the TPU-native headline: S sources
    traverse in the lane dim at ~the cost of one."""
    import numpy as np
    from gardenia_tpu.solvers.bc import bc_batched
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=True)
    warm_hybrid(g, scale)
    srcs = np.arange(sources)
    res, secs = time_op(lambda: bc_batched(g, srcs), warmup=1, iters=2)
    # Brandes traverses each edge twice (forward + backward) per source
    gteps = 2 * g.nnz * sources / secs / 1e9
    return {"metric": f"bc_batched{sources}_gteps_rmat{scale}",
            "value": round(gteps, 3), "unit": "GTEPS",
            "vs_baseline": round(gteps / BASELINE_BC_GTEPS, 4),
            "detail": {"sources": sources, "levels": int(res.iterations),
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz}}


BASELINE_SGD_MRPS = 500.0   # A100-class MF-SGD ratings/s (K=20)


def bench_sgd(scale: int, epochs: int = None):
    """SGD matrix factorization training throughput (ratings/s x K=20
    latent dims; einsum contractions ride the MXU).  Mini-batched epochs
    with degree-normalized per-vertex updates converge at step 0.1 on
    power-law data (full-batch needed a 1/max_degree step and barely
    moved the RMSE — round-1 finding).

    Round 3: the full 10 epochs run at EVERY scale — the solver
    host-segments the epoch loop (utils/segment.py, 4 epochs per
    device program), so the axon worker's ~2-minute single-program
    kill no longer caps the run (round 2 had to stop at 3 epochs)."""
    import numpy as np
    from gardenia_tpu.solvers.sgd import sgd_solver
    from gardenia_tpu.utils.timer import time_op
    if epochs is None:
        epochs = 10
    base_g = get_graph(scale, need_reverse=False)
    rng = np.random.default_rng(13)
    # fresh Graph view: never mutate the disk-cached graph object
    # (VERDICT r2 weakness 5 — a footgun for in-process sweeps)
    from gardenia_tpu.core.graph import Graph
    g = Graph(base_g.rowptr, base_g.colidx,
              rng.integers(1, 6, base_g.nnz).astype(np.float64),
              num_cols=base_g.n, symmetric=base_g.symmetric)
    # initial latents hoisted OUT of the timed region (VERDICT r3
    # weakness 4: regenerating them per solve is ~160 MB of host RNG +
    # H2D per call on this slow host — the 11.1-vs-18.6 M r/s gap)
    import jax
    from gardenia_tpu.solvers.sgd import init_latent
    init = (jax.device_put(init_latent(g.m, 0)),
            jax.device_put(init_latent(g.n, 1)))
    res, secs = time_op(
        lambda: sgd_solver(g, step=0.1, max_iters=epochs, epsilon=0.0,
                           init=init),
        warmup=1, iters=2)
    mrps = g.nnz * epochs / secs / 1e6
    return {"metric": f"sgd_mf_mrps_rmat{scale}", "value": round(mrps, 2),
            "unit": "M ratings/s",
            "vs_baseline": round(mrps / BASELINE_SGD_MRPS, 4),
            "detail": {"epochs": epochs, "ms": round(secs * 1e3, 3),
                       "final_rmse": float(np.asarray(res.rmse)[
                           int(res.iterations) - 1]), "nnz": g.nnz}}


BASELINE_SSSP_GTEPS = 1.0   # A100-class delta-stepping on road graphs


def bench_sssp(scale: int):
    """Near-far delta-stepping on a weighted grid (road-network class —
    the road_usa stand-in, BASELINE config 4). side = 2^(scale/2) so
    the vertex count tracks `scale` — UNCAPPED since round 3: the
    solver's persistent compact frontiers (solvers/sssp_nf.py) do
    O(frontier) work per round and the loop is host-segmented
    (utils/segment.py), so grid-1024's thousands of bucket rounds
    neither sweep O(m) each nor exceed the axon worker's ~2-minute
    single-program kill."""
    import numpy as np
    from gardenia_tpu.core.generate import grid_edges
    from gardenia_tpu.core.graph import from_edges
    from gardenia_tpu.solvers.sssp import sssp_solver
    from gardenia_tpu.utils.timer import time_op
    side = 1 << (scale // 2)
    g = from_edges(grid_edges(side), symmetrize=True, need_reverse=True)
    # delta 1024: best of the measured on-chip sweep (512..4096 within
    # 5%; 128 drowns in far-queue rebuild storms, >=8192 in wide tiers)
    res, secs = time_op(lambda: sssp_solver(g, 0, 1024,
                                            variant="nearfar"),
                        warmup=1, iters=2)
    gteps = g.nnz / secs / 1e9
    return {"metric": f"sssp_nf_gteps_grid{side}",
            "value": round(gteps, 4), "unit": "GTEPS",
            "vs_baseline": round(gteps / BASELINE_SSSP_GTEPS, 4),
            "detail": {"rounds": int(res.iterations),
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz,
                       "m": g.m}}


# Mining floors (round 3): the reference's mining suite publishes no
# tables either; these are Pangolin/G2Miner-class A100 rates on
# LiveJournal-scale inputs (order-of-magnitude stand-ins so mining
# optimization has a measured floor, VERDICT r2 item 10).
BASELINE_KCL4_MCPS = 200.0    # M 4-cliques listed / s
BASELINE_MOTIF4_MEPS = 50.0   # M edges / s for the 4-motif census


def bench_kcl(scale: int, k: int = 4):
    from gardenia_tpu.mining.kcl import kcl_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    # one timed solve beyond warmup at scale >= 18: a mining solve is
    # minutes there and the host/stream prep is g._dev-cached anyway
    total, secs = time_op(lambda: kcl_solver(g, k), warmup=1,
                          iters=2 if scale < 18 else 1)
    mcps = total / secs / 1e6
    detail = {"cliques": int(total), "k": k,
              "ms": round(secs * 1e3, 3), "nnz": g.nnz}
    from gardenia_tpu.mining.kcl import LAST_TIMINGS
    if LAST_TIMINGS:          # populated when GDN_KCL_TIME=1
        detail["stages"] = dict(LAST_TIMINGS)
    return {"metric": f"kcl{k}_mcps_rmat{scale}", "value": round(mcps, 3),
            "unit": "M cliques/s",
            "vs_baseline": round(mcps / BASELINE_KCL4_MCPS, 4),
            "detail": detail}


def bench_motif(scale: int, k: int = 4):
    from gardenia_tpu.mining.motif import motif_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    census, secs = time_op(lambda: motif_solver(g, k), warmup=1,
                           iters=2 if scale < 18 else 1)
    meps = g.nnz / secs / 1e6
    from gardenia_tpu.mining.wedgestream import LAST_TIMINGS
    return {"metric": f"motif{k}_meps_rmat{scale}",
            "value": round(meps, 3), "unit": "M edges/s",
            "vs_baseline": round(meps / BASELINE_MOTIF4_MEPS, 4),
            "detail": {"census": {nm: int(v) for nm, v in census.items()},
                       "ms": round(secs * 1e3, 3), "nnz": g.nnz,
                       "wedge_stream": dict(LAST_TIMINGS)}}


# A100-class stand-ins for the round-4 rows (the reference publishes no
# tables; order-of-magnitude rates from GPU graph literature so every
# kernel has a tracked number to optimize against, VERDICT r3 item 5).
# Per-constant sources (VERDICT r4 item 8):
# VC: Gunrock's speculative greedy coloring reports ~10-60 ms on
#   soc-LiveJournal (69M edges) across GPUs (Osama et al., "Graph
#   Coloring on the GPU", IPDPSW'19, Table 3) -> ~0.5-1 ms/Medge.
BASELINE_VC_MS_PER_MEDGE = 1.0
# SCC: Multistep/FB-Trim GPU & manycore SCC reach ~1 G edges/s on
#   scale-free inputs (Slota, Rajamanickam, Madduri, IPDPS'14, Fig. 7;
#   Hong, Rodia, Olukotun PPoPP'13 report similar CPU rates).
BASELINE_SCC_MS_PER_MEDGE = 1.0
# MST: GPU Boruvka at ~0.2-0.5 G edges/s (Vineet et al., HiPG'09;
#   Gunrock's MST primitive is in the same range on scale-free graphs).
BASELINE_MST_MS_PER_MEDGE = 2.0
# SYMGS: HPCG's color-serialized SymGS sustains roughly half of SpMV's
#   streaming rate; with cuSPARSE-class SpMV ~55 GF/s on A100 (above),
#   ~30 GF/s is the smoother-class figure (NVIDIA HPCG reports, e.g.
#   A100 HPCG ~0.1-0.15 of HPL, SymGS-bound).
BASELINE_SYMGS_GFLOPS = 30.0
# SGL: G2Miner lists diamonds on LiveJournal (69M edges) in ~1 s on
#   V100/A100-class parts (Chen & Arvind, "Efficient and Scalable Graph
#   Pattern Mining on GPUs", OSDI'22, Table 6) -> ~100 M edges/s.
BASELINE_SGL_MEPS = 100.0
# FSM: Pangolin's 2-edge FSM on LiveJournal-class labeled inputs runs
#   in seconds-to-tens-of-seconds on V100 (Chen et al., VLDB'20,
#   Table 5) -> ~5-10 M edges/s; 5.0 is the mid-class stand-in.
BASELINE_FSM_MEPS = 5.0


def bench_vc(scale: int):
    from gardenia_tpu.solvers.vc import vc_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    res, secs = time_op(lambda: vc_solver(g), warmup=1, iters=3)
    ms_per_medge = secs * 1e3 / (g.nnz / 1e6)
    return {"metric": f"vc_ms_rmat{scale}",
            "value": round(secs * 1e3, 3), "unit": "ms",
            "vs_baseline": round(BASELINE_VC_MS_PER_MEDGE / ms_per_medge,
                                 4),
            "detail": {"num_colors": int(res.num_colors),
                       "rounds": int(res.iterations), "nnz": g.nnz}}


def bench_scc(scale: int):
    """FB-Trim SCC on the DIRECTED R-MAT (symmetrized input would
    degenerate to CC)."""
    from gardenia_tpu.solvers.scc import scc_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph_directed(scale)
    res, secs = time_op(lambda: scc_solver(g), warmup=1, iters=2)
    ms_per_medge = secs * 1e3 / (g.nnz / 1e6)
    n_scc = len(np.unique(np.asarray(res.scc_root)))
    return {"metric": f"scc_ms_rmat{scale}d",
            "value": round(secs * 1e3, 3), "unit": "ms",
            "vs_baseline": round(
                BASELINE_SCC_MS_PER_MEDGE / ms_per_medge, 4),
            "detail": {"sccs": n_scc, "rounds": int(res.iterations),
                       "nnz": g.nnz}}


def bench_mst(scale: int):
    """Boruvka MST on the symmetrized R-MAT with synthetic integral
    weights (the reference driver's convention, src/mst/main.cu:171)."""
    from gardenia_tpu.core.graph import Graph
    from gardenia_tpu.solvers.mst import mst_solver
    from gardenia_tpu.utils.timer import time_op
    base_g = get_graph(scale, need_reverse=False)
    rng = np.random.default_rng(29)
    # symmetric weights: w(u,v) == w(v,u) via a hash of the unordered pair
    src = np.repeat(np.arange(base_g.m, dtype=np.int64),
                    np.diff(base_g.rowptr))
    dst = np.asarray(base_g.colidx, np.int64)
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    w = ((lo * 2654435761 + hi * 40503) % 97 + 1).astype(np.float64)
    g = Graph(base_g.rowptr, base_g.colidx, w, num_cols=base_g.n,
              symmetric=True)
    res, secs = time_op(lambda: mst_solver(g), warmup=1, iters=2)
    ms_per_medge = secs * 1e3 / (g.nnz / 1e6)
    return {"metric": f"mst_boruvka_ms_rmat{scale}",
            "value": round(secs * 1e3, 3), "unit": "ms",
            "vs_baseline": round(
                BASELINE_MST_MS_PER_MEDGE / ms_per_medge, 4),
            "detail": {"weight": float(res.total_weight),
                       "tree_edges": int(np.asarray(res.edge_mask).sum()),
                       "nnz": g.nnz}}


def bench_symgs(scale: int):
    """Colored symmetric Gauss-Seidel: fwd+bwd masked sweeps (~4*nnz
    flops).  Coloring is preprocessing (the reference composes VCSolver
    the same way, src/symgs/main.cc:52-61) and is not timed."""
    from gardenia_tpu.solvers.symgs import symgs_solver
    from gardenia_tpu.solvers.vc import vc_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=True)
    rng = np.random.default_rng(13)
    Ax = rng.random(g.nnz).astype(np.float32)
    x0 = rng.random(g.m).astype(np.float32)
    b = rng.random(g.m).astype(np.float32)
    diag = (g.degrees + 1).astype(np.float32)
    colors = np.asarray(vc_solver(g).colors)
    res, secs = time_op(
        lambda: symgs_solver(g, Ax, x0, b, diag, colors),
        warmup=1, iters=3)
    gflops = 4 * g.nnz / secs / 1e9
    return {"metric": f"symgs_gflops_rmat{scale}",
            "value": round(gflops, 3), "unit": "GFLOP/s",
            "vs_baseline": round(gflops / BASELINE_SYMGS_GFLOPS, 4),
            "detail": {"ms": round(secs * 1e3, 3),
                       "colors": int(colors.max()) + 1, "nnz": g.nnz}}


def bench_sgl(scale: int, pattern: str = "diamond"):
    from gardenia_tpu.mining.sgl import sgl_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    # diamond's formula path embeds a full kcl-4 solve: ~14 min at
    # scale 20, so one timed iteration there AND no warmup solve (the
    # r5 sweep's warmup+timed pair = 2 kcl-4 solves blew the 1 h row
    # timeout; run sgl after kcl in sweeps so the XLA disk cache is
    # hot and the timed iter pays cached-compile loads, not solves)
    total, secs = time_op(lambda: sgl_solver(g, pattern),
                          warmup=1 if scale < 18 else 0,
                          iters=2 if scale < 18 else 1)
    meps = g.nnz / secs / 1e6
    return {"metric": f"sgl_{pattern}_meps_rmat{scale}",
            "value": round(meps, 3), "unit": "M edges/s",
            "vs_baseline": round(meps / BASELINE_SGL_MEPS, 4),
            "detail": {"count": int(total), "ms": round(secs * 1e3, 3),
                       "nnz": g.nnz}}


def bench_fsm(scale: int, k: int = 2, minsup: int = 5000):
    """FSM wall-clock on a degree-bucket-labeled R-MAT (the converter's
    labeling fallback; the reference's FSM inputs are labeled .ctxt
    graphs we cannot fetch — zero egress).  gSpan canonicalization is
    host-side by design (patterns are tiny); embedding expansion and
    MNI domain counting run on device — detail records the split.
    Reference contract: mining/fsm/fsm.h:23 (k = max edges, minsup)."""
    from gardenia_tpu.mining.fsm import fsm_solver
    from gardenia_tpu.utils.timer import time_op
    g = get_graph(scale, need_reverse=False)
    # the aggregate engine rides the relabeled hybrid — reuse the
    # disk-cached layout (fresh host build is ~80 min at scale 20)
    warm_hybrid(g, scale)
    total, secs = time_op(lambda: fsm_solver(g, k, minsup),
                          warmup=1, iters=1)
    meps = g.nnz / secs / 1e6
    return {"metric": f"fsm{k}_minsup{minsup}_meps_rmat{scale}",
            "value": round(meps, 3), "unit": "M edges/s",
            "vs_baseline": round(meps / BASELINE_FSM_MEPS, 4),
            "detail": {"frequent_patterns": int(total), "k": k,
                       "minsup": minsup, "ms": round(secs * 1e3, 3),
                       "nnz": g.nnz}}


KERNELS = {"pr": bench_pr, "spmv": bench_spmv, "bfs": bench_bfs,
           "fsm": bench_fsm,
           "msbfs": bench_msbfs, "cc": bench_cc, "tc": bench_tc,
           "bc": bench_bc, "sgd": bench_sgd, "sssp": bench_sssp,
           "kcl": bench_kcl, "motif": bench_motif, "vc": bench_vc,
           "scc": bench_scc, "mst": bench_mst, "symgs": bench_symgs,
           "sgl": bench_sgl}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--kernel", default="pr", choices=sorted(KERNELS))
    ap.add_argument("--quick", action="store_true",
                    help="scale 16 for smoke runs")
    args = ap.parse_args()
    scale = 16 if args.quick else args.scale
    t0 = time.time()
    result = KERNELS[args.kernel](scale)
    result["detail"]["total_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
