from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import make_dp_train_step, make_dp_eval_step, shard_batch, replicate_state
from .sp import make_sp_forward, make_sp_train_step, shard_batch_sp

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "make_dp_train_step",
    "make_dp_eval_step",
    "shard_batch",
    "replicate_state",
    "make_sp_forward",
    "make_sp_train_step",
    "shard_batch_sp",
]
