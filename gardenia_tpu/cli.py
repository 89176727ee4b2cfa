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

import sys

import numpy as np

from gardenia_tpu import load_graph
from gardenia_tpu.utils.report import report_runtime, gteps, spmv_bytes
from gardenia_tpu.utils.timer import time_op
from gardenia_tpu.verify import oracles, maximum_relative_error, check


def _load(args, symmetrize_default=False, need_reverse=False):
    filetype, prefix = args[0], args[1]
    symmetrize = bool(int(args[2])) if len(args) > 2 else symmetrize_default
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


KERNELS = {
    "pr": run_pr,
    "spmv": run_spmv,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in KERNELS:
        names = " ".join(sorted(KERNELS))
        print(f"Usage: python -m gardenia_tpu.cli <kernel> <filetype> "
              f"<graph-prefix> [kernel args...]\nkernels: {names}")
        return 1
    kernel, rest = argv[0], argv[1:]
    variant = None
    if rest and rest[0].startswith("--variant="):
        variant = rest[0].split("=", 1)[1]
        rest = rest[1:]
    if variant:
        KERNELS[kernel](rest, variant=variant)
    else:
        KERNELS[kernel](rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
