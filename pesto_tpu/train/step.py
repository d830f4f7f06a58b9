"""Jitted train / eval steps over padded batches.

The returned step functions take (state, batch: PaddedStructure[B, ...])
and run the vmapped model, the dynamic pos_ratios update, the rebalanced
BCE, and (for training) the Adam update — one XLA program per bucket shape
(reference loop: model/main.py:179-204)."""

import jax
import jax.numpy as jnp

from ..batching import PaddedStructure
from ..models import PestoConfig, PestoModel
from .loss import masked_bce_with_pos_weight, update_pos_ratios
from .state import TrainState


def _batched_forward(model, params, batch: PaddedStructure):
    # the model flattens the batch into the atom axis internally (faster
    # than vmap on TPU for the gather-heavy layer stack); logits are cast
    # to fp32 so the BCE/softplus and pos_ratios math stay full-precision
    # even when the model computes in bfloat16 (fp32 master weights)
    z = model.apply(
        {"params": params}, batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask,
        batch.gather_cand, batch.gather_loc,
        nr=batch.res_mask.shape[-1],  # static; enables compact integer M
    )
    return z.astype(jnp.float32)


def build_train_step_fn(cfg: PestoConfig, tx, pos_weight_factor: float = 0.5):
    """The raw (unjitted) train step; jitted by make_train_step or, with
    explicit shardings, by parallel.dp.make_dp_train_step."""
    model = PestoModel(cfg)

    def train_step(state: TrainState, batch: PaddedStructure):
        step = state.global_step + 1
        pos_ratios = update_pos_ratios(state.pos_ratios, batch.y, batch.res_mask, step)
        pos_ratios = jax.lax.stop_gradient(pos_ratios)

        def loss_fn(params):
            z = _batched_forward(model, params, batch)
            per_class, total = masked_bce_with_pos_weight(
                z, batch.y, batch.res_mask, pos_ratios, pos_weight_factor
            )
            return total, (per_class, z)

        (total, (per_class, z)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(tx, grads).replace(
            pos_ratios=pos_ratios, global_step=step
        )
        p = jax.nn.sigmoid(z)
        return new_state, {"loss": total, "losses": per_class, "p": p}

    return train_step


def make_train_step(cfg: PestoConfig, tx, pos_weight_factor: float = 0.5, donate: bool = True):
    fn = build_train_step_fn(cfg, tx, pos_weight_factor)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def build_eval_step_fn(cfg: PestoConfig, pos_weight_factor: float = 0.5):
    model = PestoModel(cfg)

    def eval_step(state: TrainState, batch: PaddedStructure):
        # evaluation uses the current pos_ratios without mutating state
        # (the reference updates them during eval too; we keep eval pure
        # so results are independent of eval order)
        z = _batched_forward(model, state.params, batch)
        per_class, total = masked_bce_with_pos_weight(
            z, batch.y, batch.res_mask, state.pos_ratios, pos_weight_factor
        )
        return {"loss": total, "losses": per_class, "p": jax.nn.sigmoid(z)}

    return eval_step


def make_eval_step(cfg: PestoConfig, pos_weight_factor: float = 0.5):
    return jax.jit(build_eval_step_fn(cfg, pos_weight_factor))
