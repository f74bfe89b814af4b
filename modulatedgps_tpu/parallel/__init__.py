from .mesh import make_mesh, shard_batch, replicate_state, expert_shard_state
from .sharded import make_parallel_train_step, data_parallel_elbo
from .blocked import distributed_cholesky, distributed_solve_lower

__all__ = [
    "make_mesh", "shard_batch", "replicate_state", "expert_shard_state",
    "make_parallel_train_step", "data_parallel_elbo",
    "distributed_cholesky", "distributed_solve_lower",
]
