"""Graph mining kernels (reference L6: mining/{kcl_*,motif_*,sgl,fsm})."""

from gardenia_tpu.mining.kcl import kcl_solver
from gardenia_tpu.mining.motif import motif_solver
from gardenia_tpu.mining.sgl import sgl_solver
from gardenia_tpu.mining.fsm import fsm_solver

__all__ = ["kcl_solver", "motif_solver", "sgl_solver", "fsm_solver"]
