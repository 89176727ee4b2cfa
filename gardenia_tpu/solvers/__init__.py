"""Benchmark solvers — one module per GARDENIA kernel (SURVEY.md §2.3)."""

from gardenia_tpu.solvers.spmv import spmv_solver
from gardenia_tpu.solvers.pr import pr_solver
from gardenia_tpu.solvers.bfs import bfs_solver
from gardenia_tpu.solvers.sssp import sssp_solver
from gardenia_tpu.solvers.cc import cc_solver
from gardenia_tpu.solvers.vc import vc_solver
from gardenia_tpu.solvers.bc import bc_solver
from gardenia_tpu.solvers.tc import tc_solver
from gardenia_tpu.solvers.scc import scc_solver
from gardenia_tpu.solvers.mst import mst_solver
from gardenia_tpu.solvers.symgs import symgs_solver
from gardenia_tpu.solvers.sgd import sgd_solver

__all__ = ["spmv_solver", "pr_solver", "bfs_solver", "sssp_solver",
           "cc_solver", "vc_solver", "bc_solver", "tc_solver",
           "scc_solver", "mst_solver", "symgs_solver", "sgd_solver"]
