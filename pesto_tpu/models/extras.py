"""Auxiliary model operations from the reference that the flagship Model
doesn't use but the library exposes (SURVEY.md §2.2):

  - state_max_pool: masked max pooling of scalar/vector states to residues
    (reference src/model_operations.py:157-168);
  - CrossStateUpdateLayer: runs a StateUpdateLayer on two structures and
    cross-attends their pooled scalar states
    (reference src/model_operations.py:245-334, experimental).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import LayerConfig
from .pesto import MLP3, StateUpdateLayer, safe_norm


def state_max_pool(q, p, M):
    """Masked max-pool of atom states to residues.

    q: [N,S], p: [N,3,S], M: [N,R] 0/1 mask. Returns (q_max [R,S],
    p_max [R,3,S]) where p_max takes, per (residue, channel), the vector of
    the atom whose masked vector norm is maximal — matching the reference's
    gather-by-argmax (src/model_operations.py:157-168)."""
    # the reference norms over the *channel* axis (pt.norm(p, dim=2)),
    # selecting the max-magnitude atom per (residue, xyz component)
    s = safe_norm(p, axis=2)  # [N,3]
    Mq = M[:, :, None]  # [N,R,1]
    q_max = jnp.max(Mq * q[:, None, :], axis=0)  # [R,S]
    s_ids = jnp.argmax(Mq * s[:, None, :], axis=0)  # [R,3]
    idx = jnp.broadcast_to(s_ids[:, :, None], s_ids.shape + (p.shape[2],))
    p_max = jnp.take_along_axis(p, idx, axis=0, mode="clip")  # [R,3,S]
    return q_max, p_max


class CrossStateUpdateLayer(nn.Module):
    """Per-structure geometric update + cross-attention between the scalar
    states of two structures (reference CrossStateUpdateLayer,
    src/model_operations.py:245-334)."""

    cfg: LayerConfig
    cNh: int = 2
    cNk: int = 3
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, Z0, Z1):
        """Z0/Z1: (q, p, ids_topk, D_nn, R_nn, atom_mask) per structure."""
        S = self.cfg.Ns
        Nh, Nk = self.cNh, self.cNk
        prec = self.precision
        sdk = jnp.sqrt(jnp.asarray(Nk, dtype=jnp.float32))

        sul = StateUpdateLayer(self.cfg, self.dtype, self.precision, name="sul")
        qa0, pz0 = sul(*Z0)
        qa1, pz1 = sul(*Z1)

        s0 = jnp.concatenate([qa0, safe_norm(pz0, axis=1)], axis=1)
        s1 = jnp.concatenate([qa1, safe_norm(pz1, axis=1)], axis=1)

        cqm = MLP3((S, S, Nk * Nh), self.dtype, prec, name="cqm")
        ckm = MLP3((S, S, Nk), self.dtype, prec, name="ckm")
        cvm = MLP3((S, S, S), self.dtype, prec, name="cvm")
        cpm = MLP3((S, S, S), self.dtype, prec, name="cpm")

        Q0 = cqm(s0).reshape(s0.shape[0], Nh, Nk)
        Q1 = cqm(s1).reshape(s1.shape[0], Nh, Nk)
        K0, K1 = ckm(s0), ckm(s1)  # [N,Nk]
        V0, V1 = cvm(s0), cvm(s1)  # [N,S]

        # padding atoms of the attended structure are masked out of the
        # softmax (the reference operates on unpadded structures)
        am0, am1 = Z0[5], Z1[5]
        bias0 = (am0 - 1.0) * 1e6  # [N0]
        bias1 = (am1 - 1.0) * 1e6

        # 1 -> 0: every atom of structure 0 attends over structure 1
        M10 = jax.nn.softmax(
            jnp.einsum("nhk,mk->nhm", Q0, K1 / sdk, precision=prec) + bias1[None, None, :],
            axis=2,
        )
        qh0 = jnp.einsum("nhm,ms->nhs", M10, V1, precision=prec).reshape(Q0.shape[0], -1)
        # 0 -> 1
        M01 = jax.nn.softmax(
            jnp.einsum("nhk,mk->nhm", Q1, K0 / sdk, precision=prec) + bias0[None, None, :],
            axis=2,
        )
        qh1 = jnp.einsum("nhm,ms->nhs", M01, V0, precision=prec).reshape(Q1.shape[0], -1)

        # re-zero sink/padding rows: qa is zeroed by the inner layer, but
        # the softmax-pooled qh (plus cpm's bias) is nonzero there, and the
        # next layer's neighbor gather assumes the state at id 0 is zero
        # (models/pesto.py StateUpdateLayer) — without this, small
        # structures' empty slots pull garbage from layer 2 onward
        qz0 = cpm(jnp.concatenate([qa0, qh0], axis=1)) * am0[:, None]
        qz1 = cpm(jnp.concatenate([qa1, qh1], axis=1)) * am1[:, None]
        return (qz0, pz0), (qz1, pz1)
