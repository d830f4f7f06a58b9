"""Training loss: dynamically rebalanced per-class BCE.

Matches the reference eval_step semantics (model/main.py:42-58) on padded
batches:
  - pos_ratios is a running mean of the per-class positive fraction with
    step size 1/(1+sqrt(global_step)),
  - the BCE pos_weight is pwf*(1-r)/(r+1e-6),
  - per-element losses are re-weighted by pos_ratios/sum(pos_ratios) and
    divided by the number of (real) residues in the batch.
"""

import jax
import jax.numpy as jnp


def update_pos_ratios(pos_ratios, y, res_mask, global_step, axis_name=None):
    """Running-mean update of the per-class positive fraction.

    y: [..., NR, C]; res_mask: [..., NR]; returns updated [C].
    With axis_name (inside shard_map), the positive fraction is the
    GLOBAL batch mean: the per-device sums are psum'd first."""
    w = res_mask[..., None]
    num = jnp.sum(y * w, axis=tuple(range(y.ndim - 1)))
    den = jnp.sum(w, axis=tuple(range(y.ndim - 1)))
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    mean_y = num / jnp.maximum(den, 1.0)
    rate = 1.0 / (1.0 + jnp.sqrt(global_step.astype(jnp.float32)))
    return pos_ratios + (mean_y - pos_ratios) * rate


def masked_bce_with_pos_weight(z, y, res_mask, pos_ratios, pos_weight_factor,
                               n_res=None):
    """Per-class summed weighted BCE over real residues.

    z, y: [..., NR, C] logits/labels; res_mask: [..., NR].
    Returns (losses_per_class [C], total scalar loss).

    n_res overrides the residue-count normalizer — inside shard_map, pass
    the psum'd GLOBAL count so each device computes its partial of the
    global loss (the caller then psums per_class/grads)."""
    pos_weight = pos_weight_factor * (1.0 - pos_ratios) / (pos_ratios + 1e-6)
    # numerically stable BCE-with-logits with positive-class weighting:
    #   l = pw * y * softplus(-z) + (1-y) * softplus(z)
    dloss = pos_weight * y * jax.nn.softplus(-z) + (1.0 - y) * jax.nn.softplus(z)
    dloss = dloss * res_mask[..., None]

    if n_res is None:
        n_res = jnp.maximum(jnp.sum(res_mask), 1.0)
    loss_factors = pos_ratios / jnp.sum(pos_ratios)
    losses = loss_factors * dloss / n_res
    per_class = jnp.sum(losses, axis=tuple(range(losses.ndim - 1)))
    return per_class, jnp.sum(per_class)
