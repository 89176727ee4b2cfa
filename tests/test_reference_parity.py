"""Head-to-head parity against the REFERENCE's own binaries.

Builds the reference's OpenMP solvers from its sources (g++ -fopenmp,
read-only access to /root/reference) and compares iteration-level
behavior with ours on the same fixtures.  The strongest parity evidence
available without GPUs: same convergence traces, same iteration counts,
same Correct verdicts from the reference's own verifiers.
"""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/gardenia_ref_build"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REF),
    reason="reference sources or g++ unavailable")


def _build(kernel: str, solver: str) -> str:
    os.makedirs(BUILD, exist_ok=True)
    out = os.path.join(BUILD, f"{kernel}_{solver}")
    if os.path.exists(out):
        return out
    srcs = [f"{REF}/src/{kernel}/main.cc",
            f"{REF}/src/{kernel}/{solver}.cc",
            f"{REF}/src/{kernel}/verifier.cc"]
    subprocess.run(["g++", "-O2", "-fopenmp", f"-I{REF}/include",
                    "-o", out] + srcs, check=True, capture_output=True)
    return out


def _run(exe, *args):
    env = dict(os.environ, OMP_NUM_THREADS="4")
    return subprocess.run([exe] + list(args), capture_output=True,
                          text=True, env=env, timeout=120).stdout


def test_pr_trace_matches_reference_binary():
    exe = _build("pr", "omp_base")
    out = _run(exe, "mtx", f"{REF}/test/graphs/pr")
    ref_trace = re.findall(r"^\s+\d+\s+([0-9.]+)$", out, re.M)
    ref_iters = int(re.search(r"iterations = (\d+)", out).group(1))
    assert "Correct" in out

    from gardenia_tpu import load_graph
    from gardenia_tpu.solvers.pr import pr_solver
    g = load_graph(f"{REF}/test/graphs/pr.mtx", "mtx", need_reverse=True)
    res = pr_solver(g)
    assert int(res.iterations) == ref_iters == 15
    ours = np.asarray(res.errors)[:ref_iters]
    theirs = np.asarray([float(x) for x in ref_trace[:ref_iters]])
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_bfs_iterations_match_reference_binary():
    exe = _build("bfs", "omp_beamer")
    out = _run(exe, "mtx", f"{REF}/datasets/chesapeake", "1", "0")
    assert "Correct" in out
    ref_iters = int(re.search(r"iterations = (\d+)", out).group(1))

    from gardenia_tpu import load_graph
    from gardenia_tpu.solvers.bfs import bfs_solver
    g = load_graph(f"{REF}/datasets/chesapeake.mtx", "mtx",
                   symmetrize=True)
    res = bfs_solver(g, 0, variant="pull")
    assert int(res.iterations) == ref_iters


def test_cc_reference_binary_agrees():
    exe = _build("cc", "omp_afforest")
    out = _run(exe, "mtx", f"{REF}/datasets/chesapeake", "1", "1")
    assert "Correct" in out

    from gardenia_tpu import load_graph
    from gardenia_tpu.solvers.cc import cc_solver
    from gardenia_tpu.verify import oracles
    g = load_graph(f"{REF}/datasets/chesapeake.mtx", "mtx",
                   symmetrize=True)
    res = cc_solver(g)
    comp = np.asarray(res.comp)
    assert len(np.unique(comp)) == len(np.unique(oracles.cc_serial(g)))
