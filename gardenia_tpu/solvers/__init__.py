"""Benchmark solvers — one module per GARDENIA kernel (SURVEY.md §2.3)."""

from gardenia_tpu.solvers.spmv import spmv_solver
from gardenia_tpu.solvers.pr import pr_solver

__all__ = ["spmv_solver", "pr_solver"]
