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


def make_dp_train_step(cfg, tx, mesh: Mesh, pos_weight_factor: float = 0.5,
                       donate: bool = True, use_shard_map: bool = True):
    """Data-parallel train step.

    Default path: shard_map over the 'data' axis — each device runs the
    full model on ITS OWN structures (the flat-batch neighbor gathers
    stay device-local), with exactly three cross-device psums: the
    pos_ratios batch statistics, the loss normalizer/per-class sums, and
    the gradients. Under plain GSPMD jit, the flat-batch reshape folds
    the sharded batch axis into the atom axis and the partitioner
    inserts a full-state all-gather per scan group per direction (8 per
    step at 4 scan groups) — harmless at this model's size but avoidable;
    tests/test_hlo_collectives.py pins the shard_map pattern.

    use_shard_map=False keeps the GSPMD path (used by SP composition).
    """
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    if not use_shard_map:
        fn = build_train_step_fn(cfg, tx, pos_weight_factor)
        return jax.jit(
            fn,
            in_shardings=(rep, shard),
            out_shardings=(rep, {"loss": rep, "losses": rep, "p": shard}),
            donate_argnums=(0,) if donate else (),
        )

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..models import PestoModel
    from ..train.loss import masked_bce_with_pos_weight, update_pos_ratios
    from ..train.step import _batched_forward

    model = PestoModel(cfg)
    AX = "data"

    def local_step(state, batch):
        step = state.global_step + 1
        pos_ratios = jax.lax.stop_gradient(
            update_pos_ratios(state.pos_ratios, batch.y, batch.res_mask, step, axis_name=AX)
        )
        n_res = jnp.maximum(jax.lax.psum(jnp.sum(batch.res_mask), AX), 1.0)

        def loss_fn(params):
            z = _batched_forward(model, params, batch)
            per_class_local, total_local = masked_bce_with_pos_weight(
                z, batch.y, batch.res_mask, pos_ratios, pos_weight_factor, n_res=n_res
            )
            return total_local, (per_class_local, z)

        (_, (pc_local, z)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, AX)
        per_class = jax.lax.psum(pc_local, AX)
        new_state = state.apply_gradients(tx, grads).replace(
            pos_ratios=pos_ratios, global_step=step
        )
        return new_state, {
            "loss": jnp.sum(per_class),
            "losses": per_class,
            "p": jax.nn.sigmoid(z),
        }

    def batch_specs(batch):
        return jax.tree_util.tree_map(lambda _: P(AX), batch)

    def step_fn(state, batch):
        state_specs = jax.tree_util.tree_map(lambda _: P(), state)
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_specs, batch_specs(batch)),
            out_specs=(
                state_specs,
                {"loss": P(), "losses": P(), "p": P(AX)},
            ),
            check_vma=False,
        )(state, batch)

    return jax.jit(
        step_fn,
        in_shardings=(rep, shard),
        out_shardings=(rep, {"loss": rep, "losses": rep, "p": shard}),
        donate_argnums=(0,) if donate else (),
    )


def make_dp_eval_step(cfg, mesh: Mesh, pos_weight_factor: float = 0.5):
    fn = build_eval_step_fn(cfg, pos_weight_factor)
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep, shard),
        out_shardings={"loss": rep, "losses": rep, "p": shard},
    )
