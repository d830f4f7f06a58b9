"""Paired-structure (dimer) model built on CrossStateUpdateLayer.

The reference ships CrossStateUpdateLayer unused by any model
(src/model_operations.py:245-334 — "experimental"); this exposes it end
to end: two structures are embedded, run through a stack of cross-state
layers (per-structure geometric update + scalar-state cross-attention),
pooled to residues, and decoded to per-residue interface logits EACH
CONDITIONED ON THE PARTNER. Intended for training partner-specific
interface predictors; no reference weights exist for it.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import PestoConfig
from .extras import CrossStateUpdateLayer
from .pesto import MLP3, StatePool, safe_norm, unpack_state_features


class CrossPestoModel(nn.Module):
    """Dimer model: (structure A, structure B) -> per-residue logits for
    both, each conditioned on the other via cross-attention."""

    cfg: PestoConfig

    @nn.compact
    def __call__(self, A, B) -> Tuple[jax.Array, jax.Array]:
        """A/B: (X [NA,3], ids_topk [NA,K], q0 [NA,F], M [NA,NR],
        atom_mask [NA]) per structure. Returns (zA [NRa,C], zB [NRb,C])."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        from .pesto import _PRECISIONS

        prec = _PRECISIONS[cfg.precision]

        # parameter sharing across the two structures comes from calling
        # the same submodules on both inputs (like the reference's single
        # `sul` used for both, src/model_operations.py:262-271)
        em = MLP3((cfg.em_n1,) if cfg.em_single else (cfg.em_n1,) * 3, dtype, prec, name="em")

        def embed(S):
            X, ids_topk, q0, M, am = S
            n_real = jnp.sum(am).astype(jnp.int32)
            D_nn, R_nn = unpack_state_features(X, ids_topk, am, n_real)
            q = em(q0) * am.astype(dtype)[:, None]
            p = jnp.zeros((X.shape[0], 3, cfg.em_n1), dtype=q.dtype)
            return [q, p, ids_topk, D_nn, R_nn, am], M

        Z0, M0 = embed(A)
        Z1, M1 = embed(B)

        for i, lc in enumerate(cfg.layers):
            layer = CrossStateUpdateLayer(lc, dtype=dtype, precision=prec, name=f"csul_{i}")
            (q0, p0), (q1, p1) = layer(tuple(Z0), tuple(Z1))
            Z0 = [q0, p0, *Z0[2:]]
            Z1 = [q1, p1, *Z1[2:]]

        spl = StatePool(cfg.spl_n0, cfg.spl_n1, cfg.spl_nh, dtype, prec, name="spl")
        dm_feats = (cfg.dm_n2,) if cfg.dm_single else (cfg.dm_n1, cfg.dm_n1, cfg.dm_n2)
        dm = MLP3(dm_feats, dtype, prec, name="dm")

        out = []
        for (q, p, *_), M in ((Z0, M0), (Z1, M1)):
            qr, pr = spl(q, p, M)
            zr = jnp.concatenate([qr, safe_norm(pr, axis=-2)], axis=-1)
            out.append(dm(zr))
        return out[0], out[1]


def init_cross_params(cfg: PestoConfig, rng=None, na: int = 64, nr: int = 8):
    """Initialize CrossPestoModel parameters on tiny dummy shapes."""
    import numpy as np

    if rng is None:
        rng = jax.random.PRNGKey(0)
    mk = lambda: (
        jnp.zeros((na, 3), jnp.float32),
        jnp.zeros((na, max(lc.nn for lc in cfg.layers)), jnp.int32),
        jnp.zeros((na, cfg.em_n0), jnp.float32),
        jnp.zeros((na, nr), jnp.float32),
        jnp.zeros((na,), jnp.float32),
    )
    model = CrossPestoModel(cfg)
    return model.init(rng, mk(), mk())["params"]
