"""The geometric transformer (rotation/translation-invariant state updates).

A TPU-first functional re-design of the reference architecture
(src/model_operations.py:26-213, model/model.py:6-52):

  - operates on a single *padded* structure (row 0 = sink, masked padding),
    so every shape is static; batches are vmapped over the leading axis;
  - neighbor geometry (D_nn, R_nn) is recomputed in-model from coordinates
    and neighbor ids, like the reference's unpack_state_features
    (src/model_operations.py:6-22), including its index-wrap semantics for
    missing-neighbor slots, so ported checkpoints reproduce logits exactly;
  - per-layer activation rematerialization (jax.checkpoint) replaces
    torch.utils.checkpoint (src/model_operations.py:236);
  - all contractions are einsums with configurable matmul precision
    (HIGHEST for fp32 parity on the MXU, DEFAULT/bf16 for throughput).

Math invariances come from using only distances, norms, and projections of
vector states onto unit displacement vectors — identical to the reference.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import LayerConfig, PestoConfig

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def safe_norm(x: jax.Array, axis: int) -> jax.Array:
    """L2 norm with a NaN-free gradient at 0 (the initial vector state is
    exactly zero; torch's norm subgradient there is 0, we match)."""
    ss = jnp.sum(jnp.square(x), axis=axis)
    return jnp.sqrt(jnp.maximum(ss, 1e-36))


class MLP3(nn.Module):
    """Linear-ELU-Linear-ELU-Linear, the reference's ubiquitous MLP shape."""

    features: tuple
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, precision=self.precision)(x)
            if i + 1 < len(self.features):
                x = nn.elu(x)
        return x


def unpack_state_features(X, ids_topk, atom_mask, n_real):
    """Compute per-neighbor distances/unit displacements from coordinates.

    Matches reference unpack_state_features (src/model_operations.py:6-22)
    on the padded layout: real rows 1..n; ids are padded-row indices with
    0 = sink. Missing-neighbor slots (id 0) resolve — exactly like the
    reference's `X[ids_topk-1]` with torch's negative-index wrap — to the
    last real atom for the distance features, while the gathered *state*
    at id 0 is the zeroed sink.
    """
    n = jnp.maximum(n_real, 1)
    i_raw = jnp.mod(ids_topk - 1, n)  # ids>=1 -> ids-1 ; id 0 -> n-1 (wrap)
    Xn = jnp.take(X, i_raw + 1, axis=0)
    R = Xn - X[:, None, :]
    D = safe_norm(R, axis=2)
    row = atom_mask[:, None]
    Dmax = jnp.max(jnp.where(row > 0, D, -jnp.inf))
    Dmax = jnp.maximum(Dmax, 0.0)
    D = D + Dmax * (D < 1e-2).astype(D.dtype)
    R = R / jnp.maximum(D, 1e-12)[..., None]
    # sink & padding rows carry zeros (reference prepends a zero row)
    D = D * row
    R = R * row[..., None]
    return D, R


class StateUpdate(nn.Module):
    """One rotation-invariant attention update of scalar state q [N,S] and
    vector state p [N,3,S] over each atom's nn nearest neighbors
    (reference StateUpdate, src/model_operations.py:26-154)."""

    cfg: LayerConfig
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, q, p, q_nn, p_nn, d_nn, r_nn):
        S, Nh, Nk = self.cfg.Ns, self.cfg.Nh, self.cfg.Nk
        N, n_nn = q_nn.shape[0], q_nn.shape[1]
        prec = self.precision
        sdk = jnp.sqrt(jnp.asarray(Nk, dtype=q.dtype))

        # node features: scalar state + vector state norms  [N, 2S]
        X_n = jnp.concatenate([q, safe_norm(p, axis=1)], axis=1)

        # edge features [N, nn, 6S+1]: distance, center state (tiled),
        # neighbor state, neighbor vector norms, and both vector states
        # projected on the unit displacement (the invariance core).
        p_proj = jnp.sum(p[:, None, :, :] * r_nn[:, :, :, None], axis=2)
        pnn_proj = jnp.sum(p_nn * r_nn[:, :, :, None], axis=2)
        X_e = jnp.concatenate(
            [
                d_nn[:, :, None],
                jnp.broadcast_to(X_n[:, None, :], (N, n_nn, X_n.shape[1])),
                q_nn,
                safe_norm(p_nn, axis=2),
                p_proj,
                pnn_proj,
            ],
            axis=2,
        )

        # five MLPs (names match the reference for checkpoint porting)
        Q = MLP3((S, S, 2 * Nk * Nh), self.dtype, prec, name="nqm")(X_n)
        Q = Q.reshape(N, 2, Nh, Nk)
        Kq = MLP3((S, S, Nk), self.dtype, prec, name="eqkm")(X_e)  # [N,nn,Nk]
        Kp = MLP3((S, S, 3 * Nk), self.dtype, prec, name="epkm")(X_e)
        # vector keys: 3 chunks of Nk stacked along the neighbor axis
        Kp = jnp.concatenate(jnp.split(Kp, 3, axis=2), axis=1)  # [N,3nn,Nk]
        V = MLP3((2 * S, 2 * S, 2 * S), self.dtype, prec, name="evm")(X_e)
        V = V.reshape(N, n_nn, 2, S)
        V0, V1 = V[:, :, 0, :], V[:, :, 1, :]

        # vector values [N, 3, 3nn, S]: r_nn-projected values, center p, p_nn
        Vp = jnp.concatenate(
            [
                V1[:, :, None, :] * r_nn[:, :, :, None],
                jnp.broadcast_to(p[:, None, :, :], (N, n_nn, 3, S)),
                p_nn,
            ],
            axis=1,
        ).transpose(0, 2, 1, 3)

        # two softmax attentions over neighbors
        Mq = jax.nn.softmax(
            jnp.einsum("nhk,nmk->nhm", Q[:, 0], Kq, precision=prec) / sdk, axis=2
        )
        Mp = jax.nn.softmax(
            jnp.einsum("nhk,nmk->nhm", Q[:, 1], Kp, precision=prec) / sdk, axis=2
        )

        Zq = jnp.einsum("nhm,nms->nhs", Mq, V0, precision=prec).reshape(N, Nh * S)
        Zp = jnp.einsum("nhm,nxms->nxhs", Mp, Vp, precision=prec).reshape(N, 3, Nh * S)

        qh = MLP3((S, S, S), self.dtype, prec, name="qpm")(Zq)
        ph = nn.Dense(S, use_bias=False, dtype=self.dtype, precision=prec, name="ppm")(Zp)

        return q + qh, p + ph


class StateUpdateLayer(nn.Module):
    """Gather each atom's first `nn` neighbors, run StateUpdate, and re-zero
    the sink/padding rows (reference StateUpdateLayer,
    src/model_operations.py:217-242)."""

    cfg: LayerConfig
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, q, p, ids_topk, D_nn, R_nn, atom_mask):
        nn_k = self.cfg.nn
        ids_nn = ids_topk[:, :nn_k]
        q, p = StateUpdate(self.cfg, self.dtype, self.precision, name="su")(
            q,
            p,
            jnp.take(q, ids_nn, axis=0),
            jnp.take(p, ids_nn, axis=0),
            D_nn[:, :nn_k],
            R_nn[:, :nn_k, :],
        )
        # sink & padding rows stay identically zero between layers
        q = q * atom_mask[:, None]
        p = p * atom_mask[:, None, None]
        return q, p


def layer_groups(cfg: PestoConfig):
    """Contiguous runs of identical layer configs (e.g. the flagship's
    8x8, 8x16, 8x32, 8x64 neighbor schedule -> 4 groups)."""
    groups = []
    for lc in cfg.layers:
        if groups and groups[-1][0] == lc:
            groups[-1][1] += 1
        else:
            groups.append([lc, 1])
    return [(lc, n) for lc, n in groups]


class _ScanBody(nn.Module):
    """StateUpdateLayer shaped for nn.scan: carry = (q, p), the topology
    is threaded through unchanged."""

    cfg: LayerConfig
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, carry, _):
        q, p, ids_topk, D_nn, R_nn, atom_mask = carry
        q, p = StateUpdateLayer(self.cfg, self.dtype, self.precision, name="sul")(
            q, p, ids_topk, D_nn, R_nn, atom_mask
        )
        return (q, p, ids_topk, D_nn, R_nn, atom_mask), None


class StatePool(nn.Module):
    """Atom -> residue multi-head attention pooling over the membership
    mask M (reference StatePoolLayer, src/model_operations.py:171-213)."""

    N0: int
    N1: int
    Nh: int
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, q, p, M):
        prec = self.precision
        # softmax filter: ~ +1e-6 for members, ~ -1e6 for non-members
        F = (1.0 - M + 1e-6) / (M - 1e-6)
        z = jnp.concatenate([q, safe_norm(p, axis=1)], axis=1)
        s = MLP3((self.N0, self.N0, 2 * self.Nh), self.dtype, prec, name="sam")(z)
        Ms = jax.nn.softmax(s[:, None, :] + F[:, :, None], axis=0)
        Ms = Ms.reshape(M.shape[0], M.shape[1], self.Nh, 2)
        # flattening is (state, head)-major to match the torch view()
        qh = jnp.einsum("as,arh->rsh", q, Ms[..., 0], precision=prec)
        qh = qh.reshape(M.shape[1], -1)
        ph = jnp.einsum("axs,arh->rxsh", p, Ms[..., 1], precision=prec)
        ph = ph.reshape(M.shape[1], 3, -1)
        qr = MLP3((self.N0, self.N0, self.N1), self.dtype, prec, name="zdm")(qh)
        pr = nn.Dense(self.N1, use_bias=False, dtype=self.dtype, precision=prec,
                      name="zdm_vec")(ph)
        return qr, pr


class PestoModel(nn.Module):
    """Full model: embed -> geometric transformer stack -> residue pool ->
    decoder (reference Model, model/model.py:6-52). Single padded
    structure in, per-residue logits out; vmap for batches."""

    cfg: PestoConfig

    @nn.compact
    def __call__(self, X, ids_topk, q0, M, atom_mask):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        prec = _PRECISIONS[cfg.precision]

        n_real = jnp.sum(atom_mask).astype(jnp.int32)

        # feature embedding; sink/padding rows are zero *after* the MLP,
        # matching the reference's zero-row prepend (model/model.py:34-40)
        q = MLP3((cfg.em_n1, cfg.em_n1, cfg.em_n1), dtype, prec, name="em")(q0)
        q = q * atom_mask[:, None]
        p = jnp.zeros((X.shape[0], 3, cfg.em_n1), dtype=q.dtype)

        D_nn, R_nn = unpack_state_features(X, ids_topk, atom_mask, n_real)

        if cfg.scan_layers:
            body = nn.remat(_ScanBody, prevent_cse=False) if cfg.remat else _ScanBody
            for g, (lc, n) in enumerate(layer_groups(cfg)):
                scan = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n,
                )(lc, dtype, prec, name=f"sulg_{g}")
                (q, p, *_), _ = scan((q, p, ids_topk, D_nn, R_nn, atom_mask), None)
        else:
            layer_cls = nn.remat(StateUpdateLayer) if cfg.remat else StateUpdateLayer
            for i, lc in enumerate(cfg.layers):
                q, p = layer_cls(lc, dtype, prec, name=f"sul_{i}")(
                    q, p, ids_topk, D_nn, R_nn, atom_mask
                )

        qr, pr = StatePool(cfg.spl_n0, cfg.spl_n1, cfg.spl_nh, dtype, prec,
                           name="spl")(q, p, M)

        zr = jnp.concatenate([qr, safe_norm(pr, axis=1)], axis=1)
        z = MLP3((cfg.dm_n1, cfg.dm_n1, cfg.dm_n2), dtype, prec, name="dm")(zr)
        return z


def init_params(cfg: PestoConfig, rng: Optional[jax.Array] = None, na: int = 256, nr: int = 32):
    """Initialize a parameter pytree for the given config."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = PestoModel(cfg)
    X = jnp.zeros((na, 3), jnp.float32)
    ids = jnp.zeros((na, 64), jnp.int32)
    q0 = jnp.zeros((na, cfg.em_n0), jnp.float32)
    M = jnp.zeros((na, nr), jnp.float32)
    am = jnp.zeros((na,), jnp.float32).at[1:4].set(1.0)
    return model.init(rng, X, ids, q0, M, am)["params"]
