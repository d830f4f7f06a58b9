"""Data-parallel train/eval steps over a device mesh.

Parameters and optimizer state are replicated; the batch is sharded on its
leading axis across the 'data' mesh axis. XLA inserts the gradient
all-reduce (psum over ICI) automatically because the loss sums over the
sharded batch axis while parameters carry a replicated sharding."""

import jax
from jax.sharding import Mesh

from ..batching import PaddedStructure
from ..train.step import build_eval_step_fn, build_train_step_fn
from .mesh import batch_sharding, replicated_sharding


def _batch_shardings(batch: PaddedStructure, mesh: Mesh):
    shard = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda _: shard, batch)


def shard_batch(batch: PaddedStructure, mesh: Mesh) -> PaddedStructure:
    """Place a host batch onto the mesh, sharded over the data axis.

    Multi-host: `batch` holds only this process's row slice of the global
    batch (BucketedLoader process_count/process_index row slicing under an
    identical global plan); the global array is assembled from the
    process-local shards. Single-host: a plain sharded device_put."""
    shard = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(shard, np.asarray(x)), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def make_dp_train_step(cfg, tx, mesh: Mesh, pos_weight_factor: float = 0.5, donate: bool = True):
    fn = build_train_step_fn(cfg, tx, pos_weight_factor)
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    def state_spec(state):
        return jax.tree_util.tree_map(lambda _: rep, state)

    def batch_spec(batch):
        return jax.tree_util.tree_map(lambda _: shard, batch)

    def step(state, batch):
        return fn(state, batch)

    # shardings resolved lazily at first call via explicit constraints
    jitted = jax.jit(
        step,
        in_shardings=(rep, shard),
        out_shardings=(rep, {"loss": rep, "losses": rep, "p": shard}),
        donate_argnums=(0,) if donate else (),
    )
    return jitted


def make_dp_eval_step(cfg, mesh: Mesh, pos_weight_factor: float = 0.5):
    fn = build_eval_step_fn(cfg, pos_weight_factor)
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep, shard),
        out_shardings={"loss": rep, "losses": rep, "p": shard},
    )
