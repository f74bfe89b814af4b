from .mesh import make_mesh, shard_batch, replicate_state, expert_shard_state
from .sharded import make_parallel_train_step, data_parallel_elbo

__all__ = [
    "make_mesh", "shard_batch", "replicate_state", "expert_shard_state",
    "make_parallel_train_step", "data_parallel_elbo",
]
