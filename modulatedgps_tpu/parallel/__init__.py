from .mesh import make_mesh, shard_batch, replicate_state, expert_shard_state
from .sharded import make_parallel_train_step, data_parallel_elbo
from .blocked import distributed_cholesky, distributed_solve_lower
from .inducing import (inducing_shard_state, inducing_sharded_elbo,
                       inducing_sharded_predict_f,
                       make_inducing_sharded_train_step)

__all__ = [
    "make_mesh", "shard_batch", "replicate_state", "expert_shard_state",
    "make_parallel_train_step", "data_parallel_elbo",
    "distributed_cholesky", "distributed_solve_lower",
    "inducing_shard_state", "inducing_sharded_elbo",
    "inducing_sharded_predict_f", "make_inducing_sharded_train_step",
]
