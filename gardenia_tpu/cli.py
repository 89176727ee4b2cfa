"""Benchmark CLI — positional-argv-compatible drivers, one per kernel.

Mirrors the reference's per-binary mains:
  python -m gardenia_tpu.cli <kernel> <filetype> <graph-prefix> [args...]
e.g.
  python -m gardenia_tpu.cli pr mtx datasets/soc-LiveJournal1 0
  python -m gardenia_tpu.cli bfs mtx web-Google 1 0 0     # symmetrize, src
(reference Usage strings: src/bfs/main.cc:8-19, src/pr/main.cc:7-12, ...)

Every driver prints the reference's contract lines: the graph summary
('|V| <m> |E| <nnz>'), 'runtime [<variant>] = X ms', per-kernel quality
metrics, and the serial-oracle verdict 'Correct'/'Wrong'.
"""

from __future__ import annotations

import os
import sys

# persistent XLA compile cache (same location as bench.py): fused
# solver loops take minutes to compile through the axon remote-compile
# tunnel; cache them across CLI processes (run.py spawns one per
# kernel x dataset).  Must be set before jax initializes.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

from gardenia_tpu import load_graph
from gardenia_tpu.utils.report import report_runtime, gteps, spmv_bytes
from gardenia_tpu.utils.timer import time_op
from gardenia_tpu.verify import oracles, maximum_relative_error, check


def _load(args, symmetrize_default=False, need_reverse=False):
    filetype, prefix = args[0], args[1]
    symmetrize = bool(int(args[2])) if len(args) > 2 else symmetrize_default
    if filetype in ("rmat", "uniform"):
        # GAP-style synthetic graphs (reference include/command_line.h
        # '-g'/'-u' scale flags, include/generator.h): prefix is the scale
        from gardenia_tpu.core.generate import generate_graph
        g = generate_graph(filetype, scale=int(prefix),
                           symmetrize=symmetrize or symmetrize_default,
                           need_reverse=need_reverse)
    else:
        g = load_graph(prefix, filetype, symmetrize=symmetrize,
                       need_reverse=need_reverse)
    print(f"|V| {g.m} |E| {g.nnz}")
    return g, args[3:]


def run_pr(args, variant="pull"):
    print("PageRank by gardenia_tpu")
    g, _ = _load(args, need_reverse=True)
    from gardenia_tpu.solvers.pr import pr_solver, pr_print_trace, EPSILON
    res, secs = time_op(lambda: pr_solver(g, variant=variant))
    pr_print_trace(res)
    report_runtime(variant, secs)
    iters = int(res.iterations)
    print(f"GTEPS = {gteps(g.nnz, secs, iters):.4f}")
    resid = oracles.pagerank_push_residual(g, np.asarray(res.scores))
    check(resid < EPSILON, f"(residual {resid})")


def run_spmv(args, variant="ell"):
    print("Sparse Matrix-Vector Multiplication by gardenia_tpu")
    g, _ = _load(args)
    from gardenia_tpu.solvers.spmv import spmv_solver
    Ax = np.full(g.nnz, 0.2, np.float32) if g.weights is None \
        else np.asarray(g.weights, np.float32)
    x = np.full(g.n, 0.3, np.float32)
    y, secs = time_op(lambda: spmv_solver(g, Ax, x, variant=variant))
    gf = (2 * g.nnz / secs) / 1e9 if secs else 0
    gb = spmv_bytes(g.m, g.nnz) / secs / 1e9 if secs else 0
    report_runtime(variant, secs, gflops=gf, gbytes=gb)
    expect = oracles.spmv_serial(g, Ax, x)
    err = maximum_relative_error(np.asarray(y), expect)
    check(err < np.sqrt(np.finfo(np.float32).eps), f"(max rel err {err})")


def run_bfs(args, variant="pull"):
    """Usage parity: bfs <filetype> <prefix> [symmetrize] [reverse] [source]
    (src/bfs/main.cc:8-19)."""
    print("Breadth-first Search by gardenia_tpu")
    g, rest = _load(args, need_reverse=True)
    source = int(rest[1]) if len(rest) > 1 else 0
    from gardenia_tpu.solvers.bfs import bfs_solver
    res, secs = time_op(lambda: bfs_solver(g, source, variant=variant))
    print(f"\titerations = {int(res.iterations)}.")
    report_runtime(variant, secs)
    print(f"GTEPS = {gteps(g.nnz, secs):.4f}")
    expect = oracles.bfs_serial(g, source)
    check(bool((np.asarray(res.dist) == expect).all()))


def run_sssp(args, variant="delta"):
    print("Single Source Shortest Path by gardenia_tpu")
    g, rest = _load(args, need_reverse=True)
    source = int(rest[1]) if len(rest) > 1 else 0
    delta = int(rest[2]) if len(rest) > 2 else 1
    from gardenia_tpu.solvers.sssp import sssp_solver
    res, secs = time_op(
        lambda: sssp_solver(g, source, delta, variant=variant))
    print(f"\titerations = {int(res.iterations)}.")
    report_runtime(variant, secs)
    expect = oracles.sssp_serial(g, source)
    check(bool((np.asarray(res.dist) == expect).all()))


def run_cc(args, variant="sv"):
    print("Connected Components by gardenia_tpu")
    g, _ = _load(args, symmetrize_default=True, need_reverse=True)
    from gardenia_tpu.solvers.cc import cc_solver
    res, secs = time_op(lambda: cc_solver(g, variant=variant))
    report_runtime(variant, secs)
    comp = np.asarray(res.comp)
    expect = oracles.cc_serial(g)
    _, inv_a = np.unique(comp, return_inverse=True)
    _, inv_b = np.unique(expect, return_inverse=True)
    # bijection check: no oracle component split across solver labels AND
    # the label counts match (a solver that merges distinct components —
    # e.g. labels everything 0 — must fail; advisor finding r1)
    consistent = (len(np.unique(inv_a * (inv_b.max() + 1) + inv_b)) ==
                  len(np.unique(inv_b))
                  and len(np.unique(inv_a)) == len(np.unique(inv_b)))
    print(f"num_components = {len(np.unique(comp))}")
    check(consistent)


def run_vc(args, variant="base"):
    print("Vertex Coloring by gardenia_tpu")
    g, _ = _load(args, symmetrize_default=True)
    from gardenia_tpu.solvers.vc import vc_solver
    res, secs = time_op(lambda: vc_solver(g))
    ms = secs * 1e3
    print(f"\truntime [base] = {ms:f} ms, "
          f"num_colors = {int(res.num_colors)}.")
    check(oracles.vc_check(g, np.asarray(res.colors)))


def run_bc(args, variant="base"):
    print("Betweenness Centrality by gardenia_tpu")
    g, rest = _load(args, need_reverse=True)
    source = int(rest[1]) if len(rest) > 1 else 0
    from gardenia_tpu.solvers.bc import bc_solver
    res, secs = time_op(lambda: bc_solver(g, source))
    print(f"\titerations = {int(res.iterations)}.")
    report_runtime(variant, secs)
    expect = oracles.bc_serial(g, source)
    err = np.abs(np.asarray(res.scores) - expect)
    tol = 1e-4 * (np.abs(np.asarray(res.scores)) + np.abs(expect)) + 1e-4
    check(bool((err <= tol).all()))


def run_tc(args, variant="base"):
    """Usage parity: tc <filetype> <graph> (src/tc/main.cc:5-9, applies
    the DAG orientation itself)."""
    print("Triangle Counting by gardenia_tpu")
    print("Using DAG (static orientation)")
    g, _ = _load(args, symmetrize_default=True)
    from gardenia_tpu.solvers.tc import tc_solver
    total, secs = time_op(lambda: tc_solver(g))
    print(f"runtime [{variant}] = {secs:f} sec")
    print(f"total_num_triangles = {total}")
    expect = oracles.tc_serial(g.oriented())
    check(total == expect, f"(expected {expect})")


def run_scc(args, variant="color"):
    """--variant=color (max-id FB coloring, base.cu) or
    --variant=wcc (WCC-first decomposition, wcc.cu/two_phase.cu)."""
    print("Strongly Connected Components by gardenia_tpu")
    g, _ = _load(args)
    from gardenia_tpu.solvers.scc import scc_solver
    res, secs = time_op(lambda: scc_solver(g, variant=variant))
    report_runtime(variant, secs)
    root = np.asarray(res.scc_root)
    expect = oracles.scc_serial(g)
    _, ia = np.unique(root, return_inverse=True)
    _, ib = np.unique(expect, return_inverse=True)
    ok = len(np.unique(ia * (ib.max() + 1) + ib)) == len(np.unique(ib)) \
        and len(np.unique(ia)) == len(np.unique(ib))
    print(f"number of SCCs = {len(np.unique(root))}")
    check(ok)


def run_mst(args, variant="boruvka"):
    print("Minimum Spanning Tree by gardenia_tpu")
    g, _ = _load(args, symmetrize_default=True)
    from gardenia_tpu.solvers.mst import mst_solver
    res, secs = time_op(lambda: mst_solver(g))
    report_runtime(variant, secs)
    total = float(res.total_weight)
    print(f"MST weight = {total}")
    expect = oracles.mst_total_weight(g)
    check(abs(total - expect) < 1e-3 * max(1.0, expect),
          f"(expected {expect})")


def run_symgs(args, variant="base"):
    print("Symmetric Gauss-Seidel smoother by gardenia_tpu")
    g, _ = _load(args, symmetrize_default=True, need_reverse=True)
    from gardenia_tpu.solvers.symgs import symgs_solver
    from gardenia_tpu.solvers.vc import vc_solver
    from gardenia_tpu.verify import l2_error
    rng = np.random.default_rng(13)
    Ax = rng.random(g.nnz).astype(np.float32)
    x0 = rng.random(g.m).astype(np.float32)
    b = rng.random(g.m).astype(np.float32)
    diag = (g.degrees + 1).astype(np.float32)
    colors = np.asarray(vc_solver(g).colors)
    res, secs = time_op(
        lambda: symgs_solver(g, Ax, x0, b, diag, colors))
    report_runtime(variant, secs)
    order = np.argsort(colors, kind="stable")
    counts = np.bincount(colors, minlength=colors.max() + 1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    expect = oracles.symgs_serial(g, order, Ax, diag, x0, b, offsets)
    err = l2_error(np.asarray(res.x), expect)
    check(err < 1e-4, f"(l2 err {err})")


def run_sgd(args, variant="base"):
    print("Stochastic Gradient Descent by gardenia_tpu")
    g, rest = _load(args)
    lam = float(rest[1]) if len(rest) > 1 else 0.05
    step = float(rest[2]) if len(rest) > 2 else 0.003
    max_iters = int(rest[3]) if len(rest) > 3 else 3
    from gardenia_tpu.solvers.sgd import sgd_solver
    res, secs = time_op(
        lambda: sgd_solver(g, lam, step, max_iters, epsilon=0.0))
    rmse = np.asarray(res.rmse)
    for i in range(int(res.iterations)):
        print(f"Iteration {i + 1}: RMSE error = {rmse[i]:f}")
    print(f"\titerations = {int(res.iterations)}.")
    report_runtime(variant, secs)
    # quality bar (round 3 — "decreased at all" was the weakest CLI
    # verdict): the whole trace must be finite and MONOTONICALLY
    # non-increasing (0.1% slack for stochastic batching), with a
    # strict net decrease — a diverging or oscillating optimizer fails
    it = int(res.iterations)
    trace = rmse[:it]
    monotone = bool((trace[1:] <= trace[:-1] * 1.001).all())
    check(bool(np.isfinite(trace).all()) and monotone
          and bool(trace[-1] < trace[0]))


def run_kcl(args, variant="base"):
    """Usage parity: kcl <filetype> <prefix> <k>
    (mining/kcl_dfs driver)."""
    print("k-Clique Listing by gardenia_tpu")
    g, rest = _load(args, symmetrize_default=True)
    k = int(rest[0]) if rest else 4
    from gardenia_tpu.mining.kcl import kcl_solver, kcl_verifier
    total, secs = time_op(lambda: kcl_solver(g, k))
    report_runtime(variant, secs)
    print(f"total_num_cliques = {total}")
    if g.m <= 5000:
        check(total == kcl_verifier(g, k))
    elif k == 3:
        # at-scale cross-check: `total` rode the k==3 -> tc_solver
        # shortcut, so re-count through kcl's ACTUAL expansion machinery
        # (final-level rotation over edge embeddings, force_expand=True
        # bypasses the shortcut) — two independent implementations must
        # agree
        check(total == kcl_solver(g, 3, force_expand=True))
    else:
        print("(verification skipped: graph too large for serial oracle)")


def run_motif(args, variant="formula"):
    print("Motif Counting by gardenia_tpu")
    g, rest = _load(args, symmetrize_default=True)
    k = int(rest[0]) if rest else 3
    from gardenia_tpu.mining.motif import (motif_solver,
                                           motif_census_bruteforce)
    census, secs = time_op(lambda: motif_solver(g, k))
    report_runtime(variant, secs)
    for name, cnt in census.items():
        print(f"{name}: {cnt}")
    if g.m <= 80:
        check(census == motif_census_bruteforce(g, k))
    else:
        print("(verification skipped: graph too large for brute force)")


def run_sgl(args, variant="base"):
    print("Subgraph Listing by gardenia_tpu")
    g, rest = _load(args, symmetrize_default=True)
    pattern = rest[0] if rest else "diamond"
    from gardenia_tpu.mining.sgl import sgl_solver, sgl_verifier
    total, secs = time_op(lambda: sgl_solver(g, pattern))
    report_runtime(variant, secs)
    print(f"total_num_{pattern} = {total}")
    if g.m <= 40:
        check(total == sgl_verifier(g, pattern))
    else:
        print("(verification skipped: graph too large for brute force)")


def run_fsm(args, variant="base"):
    """Usage parity: fsm <filetype> <filename> <minsup> <max-size>
    (mining/fsm/main.cc:9-11)."""
    print("Frequent Subgraph Mining by gardenia_tpu")
    g, rest = _load(args[:2] + ["1"], symmetrize_default=True)
    minsup = int(args[2]) if len(args) > 2 else 2
    k = int(args[3]) if len(args) > 3 else 2
    print(f"minsup = {minsup}")
    print(f"k = {k}")
    from gardenia_tpu.mining.fsm import fsm_solver, fsm_verifier
    total, secs = time_op(lambda: fsm_solver(g, k, minsup))
    report_runtime(variant, secs)
    print(f"Number of frequent subgraphs (minsup={minsup}): {total}")
    if g.m <= 5000:
        check(total == fsm_verifier(g, k, minsup))


KERNELS = {
    "pr": run_pr,
    "spmv": run_spmv,
    "bfs": run_bfs,
    "sssp": run_sssp,
    "cc": run_cc,
    "vc": run_vc,
    "bc": run_bc,
    "tc": run_tc,
    "scc": run_scc,
    "mst": run_mst,
    "symgs": run_symgs,
    "sgd": run_sgd,
    "kcl": run_kcl,
    "motif": run_motif,
    "sgl": run_sgl,
    "fsm": run_fsm,
}


def _run_dist(kernel, n, args):
    """Multichip CLI path: pr/bfs/tc/vc/scc over an n-device mesh."""
    from gardenia_tpu.parallel import (bfs_solver_dist, make_mesh,
                                       pr_solver_dist, scc_solver_dist,
                                       tc_solver_dist, vc_solver_dist)
    mesh = make_mesh(n)
    print(f"mesh: {n} devices")
    g, rest = _load(args, symmetrize_default=kernel in ("vc", "tc"),
                    need_reverse=kernel in ("pr", "bfs"))
    if kernel == "pr":
        res, secs = time_op(lambda: pr_solver_dist(g, mesh=mesh))
        report_runtime(f"pr_dist{n}", secs)
        resid = oracles.pagerank_push_residual(g, np.asarray(res.scores))
        return 0 if check(resid < 1e-4) else 1
    if kernel == "bfs":
        src = int(rest[1]) if len(rest) > 1 else 0
        res, secs = time_op(lambda: bfs_solver_dist(g, src, mesh=mesh))
        report_runtime(f"bfs_dist{n}", secs)
        ok = bool((np.asarray(res.dist) ==
                   oracles.bfs_serial(g, src)).all())
        return 0 if check(ok) else 1
    if kernel == "tc":
        total, secs = time_op(lambda: tc_solver_dist(g, mesh=mesh))
        report_runtime(f"tc_dist{n}", secs)
        print(f"total_num_triangles = {total}")
        return 0 if check(total == oracles.tc_serial(g.oriented())) else 1
    if kernel == "vc":
        res, secs = time_op(lambda: vc_solver_dist(g, mesh=mesh))
        report_runtime(f"vc_dist{n}", secs)
        return 0 if check(oracles.vc_check(
            g, np.asarray(res.colors))) else 1
    if kernel == "scc":
        res, secs = time_op(lambda: scc_solver_dist(g, mesh=mesh))
        report_runtime(f"scc_dist{n}", secs)
        root = np.asarray(res.scc_root)
        expect = oracles.scc_serial(g)
        _, ia = np.unique(root, return_inverse=True)
        _, ib = np.unique(expect, return_inverse=True)
        ok = len(np.unique(ia * (ib.max() + 1) + ib)) == \
            len(np.unique(ib)) and len(np.unique(ia)) == len(np.unique(ib))
        return 0 if check(ok) else 1
    print(f"kernel {kernel!r} has no multichip path")
    return 1


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in KERNELS:
        names = " ".join(sorted(KERNELS))
        print(f"Usage: python -m gardenia_tpu.cli <kernel> <filetype> "
              f"<graph-prefix> [kernel args...]\nkernels: {names}")
        return 1
    kernel = argv[0]
    # flags may appear anywhere among the positional args (the
    # reference binaries are purely positional; --flags are ours)
    flags = [a for a in argv[1:] if a.startswith("--")]
    rest = [a for a in argv[1:] if not a.startswith("--")]
    # two passes so flag ORDER never matters: --device/--variant apply
    # first (a --device after --dist must still select the backend
    # before the mesh is probed), then --dist dispatches
    variant = None
    dist = None
    for flag in flags:
        if flag.startswith("--variant="):
            variant = flag.split("=", 1)[1]
        elif flag.startswith("--device="):
            # e.g. --device=cpu to bypass the axon TPU tunnel
            import jax
            jax.config.update("jax_platforms", flag.split("=", 1)[1])
        elif flag.startswith("--dist="):
            dist = int(flag.split("=", 1)[1])
        else:
            print(f"unknown flag {flag!r}")
            return 1
    if dist is not None:
        # multichip run over an n-device mesh (falls back to n
        # virtual CPU devices when fewer real chips are attached)
        import jax
        if variant is not None:
            print(f"(--variant={variant} is ignored for --dist runs: "
                  f"the multichip solvers pick their own mapping)")
        if jax.device_count() < dist:
            print(f"(only {jax.device_count()} device(s); re-run "
                  f"with XLA_FLAGS=--xla_force_host_platform_"
                  f"device_count={dist} and --device=cpu for a "
                  f"virtual mesh)")
            return 1
        return _run_dist(kernel, dist, rest)
    if variant:
        KERNELS[kernel](rest, variant=variant)
    else:
        KERNELS[kernel](rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
