"""Train state: parameters, optimizer state, and the dynamic class-balance
running statistic (pos_ratios) carried as device state.

The reference keeps pos_ratios as a mutable tensor updated in-place
(model/main.py:50) and recovers it from the last log line on restart
(:131); here it is an explicit field of the train state, checkpointed with
everything else (optimizer moments included — the reference loses Adam
moments on resume, we don't)."""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import PestoConfig
from ..models.pesto import init_params


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    pos_ratios: jax.Array  # [C] running positive fraction per class
    global_step: jax.Array  # scalar int32

    def apply_gradients(self, tx, grads):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def make_lr_schedule(
    learning_rate: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 1_000_000,
):
    """constant | cosine | warmup_cosine (the reference uses constant Adam,
    model/main.py:159; schedules are standard production options).
    warmup_steps > 0 composes with every schedule — 'constant' + warmup is
    a linear ramp that then HOLDS learning_rate (it used to silently turn
    into warmup_cosine decaying to zero). Unknown names raise instead of
    silently training at constant LR."""
    if schedule == "constant":
        if warmup_steps == 0:
            return learning_rate
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            boundaries=[warmup_steps],
        )
    if schedule == "cosine" and warmup_steps == 0:
        return optax.cosine_decay_schedule(learning_rate, total_steps)
    if schedule in ("cosine", "warmup_cosine"):
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, max(warmup_steps, 1), total_steps
        )
    raise ValueError(f"unknown lr_schedule {schedule!r}: "
                     "constant | cosine | warmup_cosine")


def create_train_state(
    cfg: PestoConfig,
    learning_rate: float = 1e-5,
    rng: jax.Array = None,
    params: Any = None,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 1_000_000,
) -> tuple:
    """Returns (state, optimizer). Pass ported params to fine-tune."""
    tx = optax.adam(make_lr_schedule(learning_rate, schedule, warmup_steps, total_steps))
    if params is None:
        params = init_params(cfg, rng)
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        pos_ratios=0.5 * jnp.ones(cfg.dm_n2, dtype=jnp.float32),
        global_step=jnp.zeros((), dtype=jnp.int32),
    )
    return state, tx
