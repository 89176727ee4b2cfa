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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", default=",".join(ANALYTICS + MINING))
    ap.add_argument("--datasets", default=None,
                    help="comma-separated graph paths (default: fixtures)")
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    runs = []
    if args.datasets:
        datasets = [("mtx", p, "1") for p in args.datasets.split(",")]
    else:
        datasets = FIXTURES
        extra = "datasets"
        if os.path.isdir(extra):
            for f in sorted(os.listdir(extra)):
                if f.endswith(".mtx"):
                    datasets.append(("mtx", os.path.join(extra, f), "1"))

    kernels = args.kernels.split(",")
    failures = 0
    for kernel in kernels:
        for ft, path, sym in datasets:
            cmd = [sys.executable, "-u", "-m", "gardenia_tpu.cli", kernel]
            if args.device:
                cmd.append(f"--device={args.device}")
            cmd += [ft, path, sym]
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
    print(f"\n{len(kernels) * len(datasets) - failures} passed, "
          f"{failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
