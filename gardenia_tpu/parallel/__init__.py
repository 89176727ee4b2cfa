from gardenia_tpu.parallel.partition import ShardedEll, partition_ell_1d
from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.parallel.pr import pr_solver_dist
from gardenia_tpu.parallel.bfs import (bfs_multi_source_dist,
                                        bfs_solver_dist)
from gardenia_tpu.parallel.tc import tc_solver_dist
from gardenia_tpu.parallel.sgd import sgd_train_dist, make_dist_sgd_step
from gardenia_tpu.parallel.color import vc_solver_dist, scc_solver_dist
from gardenia_tpu.parallel.sssp import sssp_solver_dist
from gardenia_tpu.parallel.cc import cc_solver_dist
from gardenia_tpu.parallel.bc import bc_batched_dist
from gardenia_tpu.parallel.spmv import spmv_solver_dist
from gardenia_tpu.parallel.symgs import symgs_solver_dist
from gardenia_tpu.parallel.mst import mst_solver_dist

__all__ = ["ShardedEll", "partition_ell_1d", "make_mesh",
           "pr_solver_dist", "bfs_solver_dist",
           "bfs_multi_source_dist", "tc_solver_dist",
           "sgd_train_dist", "make_dist_sgd_step", "vc_solver_dist",
           "scc_solver_dist", "sssp_solver_dist", "cc_solver_dist",
           "bc_batched_dist", "spmv_solver_dist", "symgs_solver_dist", "mst_solver_dist"]
