from gardenia_tpu.parallel.partition import ShardedEll, partition_ell_1d
from gardenia_tpu.parallel.mesh import make_mesh
from gardenia_tpu.parallel.pr import pr_solver_dist

__all__ = ["ShardedEll", "partition_ell_1d", "make_mesh", "pr_solver_dist"]
