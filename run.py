#!/usr/bin/env python
"""Run the whole benchmark surface — counterpart of the reference's `run`
script (loops every kernel over the dataset list, reference run:5-100).

    python run.py [--datasets d1,d2] [--kernels k1,k2] [--device cpu]

Defaults to the in-repo fixture datasets; external GAP-scale datasets
(soc-LiveJournal1, road_usa, ...) are used when present in ./datasets/.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

FIXTURES = [
    ("mtx", "/root/reference/datasets/chesapeake.mtx", "1"),
]

ANALYTICS = ["bfs", "sssp", "pr", "cc", "bc", "vc", "spmv", "symgs",
             "tc", "scc", "mst", "sgd"]
MINING = ["kcl", "motif", "sgl", "fsm"]
# kernels whose serial oracles stay tractable at scale 16 — these also
# run on the cached R-MAT-16 graph (1.8M edges) so the regression
# exercises real load-balancing, not just the 39-vertex fixture.
# Round 3 widened this from 7 to 12 kernels: bc (serial Brandes), scc
# (iterative Tarjan), symgs (colored serial sweeps), mst (Kruskal) and
# sgd (RMSE-decrease contract) all verify at this size.
SCALE16_KERNELS = {"bfs", "sssp", "pr", "cc", "vc", "spmv", "tc",
                   "bc", "scc", "symgs", "mst", "sgd"}
# mining kernels verify on a mid-scale R-MAT (scale 12 = 4096 vertices,
# under the CLI's serial-oracle gates); values are the FULL positional
# tail after <filetype> <path> (kcl: sym + k; fsm: minsup + max-size —
# its CLI has no symmetrize slot, main.cc:9-11)
MID12_KERNELS = {"kcl": ("1", "4"), "fsm": ("2", "2")}


def _rmat_prefix(scale: int):
    """Generate/cache an R-MAT binary (shared with bench.py)."""
    try:
        from bench import get_graph
        get_graph(scale, need_reverse=True)
        return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_cache", f"rmat{scale}")
    except Exception as ex:                       # pragma: no cover
        print(f"(skipping rmat{scale} regression: {ex})")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", default=",".join(ANALYTICS + MINING))
    ap.add_argument("--datasets", default=None,
                    help="comma-separated graph paths (default: fixtures)")
    ap.add_argument("--device", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="fixture datasets only (skip the rmat16 rows)")
    args = ap.parse_args()

    if args.datasets:
        datasets = [("mtx", p, "1") for p in args.datasets.split(",")]
    else:
        datasets = list(FIXTURES)
        extra = "datasets"
        if os.path.isdir(extra):
            for f in sorted(os.listdir(extra)):
                if f.endswith(".mtx"):
                    datasets.append(("mtx", os.path.join(extra, f), "1"))

    big = mid = None
    if not args.quick and not args.datasets:
        prefix = _rmat_prefix(16)
        if prefix:
            big = ("bin", prefix, "1")
        prefix12 = _rmat_prefix(12)
        if prefix12:
            mid = ("bin", prefix12, "1")

    kernels = args.kernels.split(",")
    failures = 0
    total_runs = 0
    for kernel in kernels:
        targets = [(ft, path, (sym,)) for ft, path, sym in datasets]
        if big and kernel in SCALE16_KERNELS:
            targets.append((big[0], big[1], (big[2],)))
        if mid and kernel in MID12_KERNELS:
            targets.append((mid[0], mid[1], MID12_KERNELS[kernel]))
        total_runs += len(targets)
        for ft, path, tail in targets:
            cmd = [sys.executable, "-u", "-m", "gardenia_tpu.cli", kernel]
            if args.device:
                cmd.append(f"--device={args.device}")
            cmd += [ft, path, *tail]
            t0 = time.time()
            env = dict(os.environ,
                       JAX_COMPILATION_CACHE_DIR=os.path.abspath(
                           ".bench_cache/xla"),
                       JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="5")
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  env=env)
            out = proc.stdout
            ok = "Correct" in out
            status = "PASS" if ok else "FAIL"
            if not ok:
                failures += 1
            runtime = next((ln.strip() for ln in out.splitlines()
                            if "runtime [" in ln), "")
            print(f"[{status}] {kernel:6s} {os.path.basename(path):22s} "
                  f"{runtime}  ({time.time()-t0:.1f}s)", flush=True)
            if not ok and proc.stderr:
                print("  stderr:", proc.stderr.strip().splitlines()[-1])
    print(f"\n{total_runs - failures} passed, {failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
