"""gardenia_tpu — a TPU-native graph-analytics + graph-mining framework.

A from-scratch rebuild of the capability surface of the GARDENIA benchmark
suite (chenxuhao/gardenia) designed for TPU hardware: graphs live in HBM as
CSR plus a degree-bucketed ELL ("slab") layout padded to VPU lanes; all
frontier/worklist algorithms are recast as dense-mask semiring-SpMV
iterations compiled by XLA (with Pallas kernels on the hot paths); multi-chip
scaling uses 1D/2D edge partitioning with ICI collectives under shard_map.

Public surface (mirrors reference benchmark surface, SURVEY.md §2.3):
  Graph, load_graph                       — core container + I/O
  solvers.{bfs,sssp,pr,cc,bc,scc,spmv,symgs,sgd,tc,vc,mst}
  mining.{kcl,motif,sgl,fsm}
  verify.oracles                          — serial (NumPy) oracles
"""

from gardenia_tpu.core.graph import Graph, load_graph
from gardenia_tpu.core import types

__version__ = "0.1.0"

__all__ = ["Graph", "load_graph", "types", "__version__"]
