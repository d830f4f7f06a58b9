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
from jax.ad_checkpoint import checkpoint_name

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


class _DenseParams(nn.Module):
    """Raw kernel/bias with nn.Dense's tree layout and initializers. Used
    by the packed edge path, which slices/packs kernels instead of calling
    nn.Dense on a concatenated edge tensor."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,)) if self.use_bias else None
        return k, b


class _EdgeMLPParams(nn.Module):
    """Parameter container matching MLP3's tree (Dense_0/1/2) for one edge
    MLP; returns the raw kernels/biases for cross-MLP packing."""

    in_dim: int
    features: tuple

    @nn.compact
    def __call__(self):
        k0, b0 = _DenseParams(self.in_dim, self.features[0], name="Dense_0")()
        k1, b1 = _DenseParams(self.features[0], self.features[1], name="Dense_1")()
        k2, b2 = _DenseParams(self.features[1], self.features[2], name="Dense_2")()
        return (k0, b0), (k1, b1), (k2, b2)


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
    Xn = jnp.take(X, i_raw + 1, axis=0, mode="clip")
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
    fused: bool = False
    pallas: bool = False

    @nn.compact
    def __call__(self, q, p, q_nn, p_nn, d_nn, r_nn, qp=None, ids=None):
        S, Nh, Nk = self.cfg.Ns, self.cfg.Nh, self.cfg.Nk
        prec = self.precision
        sdk = jnp.sqrt(jnp.asarray(Nk, dtype=q.dtype))

        if self.fused:
            return self._fused(q, p, q_nn, p_nn, d_nn, r_nn, qp, ids)
        N, n_nn = q_nn.shape[0], q_nn.shape[1]

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
        Kq = checkpoint_name(
            MLP3((S, S, Nk), self.dtype, prec, name="eqkm")(X_e), "edge_mlp_out"
        )  # [N,nn,Nk]
        Kp = MLP3((S, S, 3 * Nk), self.dtype, prec, name="epkm")(X_e)
        # vector keys: 3 chunks of Nk stacked along the neighbor axis
        Kp = checkpoint_name(
            jnp.concatenate(jnp.split(Kp, 3, axis=2), axis=1), "edge_mlp_out"
        )  # [N,3nn,Nk]
        V = checkpoint_name(
            MLP3((2 * S, 2 * S, 2 * S), self.dtype, prec, name="evm")(X_e),
            "edge_mlp_out",
        )
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
        Mq = checkpoint_name(jax.nn.softmax(
            jnp.einsum("nhk,nmk->nhm", Q[:, 0], Kq, precision=prec) / sdk, axis=2
        ), "edge_attn")
        Mp = checkpoint_name(jax.nn.softmax(
            jnp.einsum("nhk,nmk->nhm", Q[:, 1], Kp, precision=prec) / sdk, axis=2
        ), "edge_attn")

        Zq = jnp.einsum("nhm,nms->nhs", Mq, V0, precision=prec).reshape(N, Nh * S)
        Zp = jnp.einsum("nhm,nxms->nxhs", Mp, Vp, precision=prec).reshape(N, 3, Nh * S)

        qh = MLP3((S, S, S), self.dtype, prec, name="qpm")(Zq)
        ph = nn.Dense(S, use_bias=False, dtype=self.dtype, precision=prec, name="ppm")(Zp)

        return q + qh, p + ph

    def _fused(self, q, p, q_nn, p_nn, d_nn, r_nn, qp=None, ids=None):
        """Packed computation, same parameters and (up to fp summation
        order) the same math as the exact path, shaped for the TPU:

          - the [N,nn,6S+1] edge tensor is never built: its first Dense
            splits into a per-atom part (distance column + tiled center
            state) and a 4S-wide per-edge contraction;
          - the three edge MLPs (eqkm/epkm/evm) are packed into single
            MXU-aligned [4S x 4S] matmuls (concat for layer 0, block-
            diagonal for layers 1-2) instead of six skinny ones;
          - tiny-contraction attention einsums (Nk=3, Nh=2) run as fused
            VPU multiply+reduce instead of MXU dot_general;
          - the [N,3,3nn,S] vector-value tensor is never built: its three
            blocks contract separately (reference Vp packing:
            src/model_operations.py:131-136).
        """
        S, Nh, Nk = self.cfg.Ns, self.cfg.Nh, self.cfg.Nk
        N = q.shape[0]
        n_nn = d_nn.shape[1]
        prec = self.precision
        dt = self.dtype
        sdk = jnp.sqrt(jnp.asarray(Nk, dtype=q.dtype))

        X_n = jnp.concatenate([q, safe_norm(p, axis=1)], axis=1)

        # edge MLP parameters (tree layout identical to the exact path)
        in_dim = 6 * S + 1
        (k0q, b0q), (k1q, b1q), (k2q, b2q) = _EdgeMLPParams(in_dim, (S, S, Nk), name="eqkm")()
        (k0p, b0p), (k1p, b1p), (k2p, b2p) = _EdgeMLPParams(in_dim, (S, S, 3 * Nk), name="epkm")()
        (k0v, b0v), (k1v, b1v), (k2v, b2v) = _EdgeMLPParams(in_dim, (2 * S, 2 * S, 2 * S), name="evm")()

        H = 4 * S  # packed width: S + S + 2S = 128 for S=32
        K0 = jnp.concatenate([k0q, k0p, k0v], axis=1).astype(dt)       # [6S+1, 4S]
        B0 = jnp.concatenate([b0q, b0p, b0v]).astype(dt)               # [4S]
        K1 = jnp.zeros((H, H), dt)
        K1 = K1.at[:S, :S].set(k1q.astype(dt))
        K1 = K1.at[S : 2 * S, S : 2 * S].set(k1p.astype(dt))
        K1 = K1.at[2 * S :, 2 * S :].set(k1v.astype(dt))
        B1 = jnp.concatenate([b1q, b1p, b1v]).astype(dt)

        if self.pallas:
            from ..ops.geometric_pallas import fused_edge_attention, pack_k2_aligned

            Q = MLP3((S, S, 2 * Nk * Nh), dt, prec, name="nqm")(X_n)
            if qp is None:
                qp = jnp.concatenate([q, p.reshape(N, 3 * S)], axis=1)
                qp_t = jnp.swapaxes(
                    jnp.concatenate([q_nn, p_nn.reshape(N, n_nn, 3 * S)], axis=2),
                    0, 1,
                )
            else:
                # nn-major gather: same random-read cost as the atom-major
                # take, but the kernel's neighbor axis lands on the leading
                # dim with no 537MB transpose in between
                qp_t = jnp.take(qp, ids.T, axis=0, mode="clip")  # [nn, N, 4S]
            K2a, B2a = pack_k2_aligned(k2q, k2p, k2v, b2q, b2p, b2v, S, Nk, dt)
            Zq, Zp_flat = fused_edge_attention(
                qp_t, d_nn.T, jnp.transpose(r_nn, (1, 0, 2)), q,
                p.reshape(N, 3 * S),
                K0[: 1 + 2 * S], B0, K0[1 + 2 * S :], K1, B1, K2a, B2a, Q,
                S=S, Nh=Nh, Nk=Nk, nn=n_nn,
            )
            qh = MLP3((S, S, S), dt, prec, name="qpm")(Zq)
            ph = nn.Dense(S, use_bias=False, dtype=dt, precision=prec, name="ppm")(
                Zp_flat.reshape(N, 3, Nh * S)
            )
            return q + qh, p + ph

        n_out = Nk + 3 * Nk + 2 * S  # 3 + 9 + 64 = 76
        K2 = jnp.zeros((H, n_out), dt)
        K2 = K2.at[:S, :Nk].set(k2q.astype(dt))
        K2 = K2.at[S : 2 * S, Nk : 4 * Nk].set(k2p.astype(dt))
        K2 = K2.at[2 * S :, 4 * Nk :].set(k2v.astype(dt))
        B2 = jnp.concatenate([b2q, b2p, b2v]).astype(dt)

        # shared per-edge features [N, nn, 4S]. This CONCAT form is the
        # measured XLA optimum: round-4 tried (a) four split matmuls with
        # the p·r block folded algebraically ((p·r)@W == Σ_x r_x·(p_x@W))
        # and (c) a narrower 2-block concat with q_nn contracting straight
        # from the gather — both lost ~33 ms on the 32-layer forward
        # (309/308.7 vs 276.0 ms at 4x8k bf16): XLA fuses the concatenate
        # into the dot operand, so E never round-trips HBM, while each
        # extra skinny dot pays its own full output pass
        # (docs/PERFORMANCE.md §3, experiment log).
        proj_p = jnp.sum(p[:, None, :, :] * r_nn[:, :, :, None], axis=2)
        proj_pn = jnp.sum(p_nn * r_nn[:, :, :, None], axis=2)
        E = jnp.concatenate([q_nn, safe_norm(p_nn, axis=2), proj_p, proj_pn], axis=2)

        # layer 0 decomposition: per-edge 4S-contraction + per-atom terms
        per_atom = jnp.einsum("ns,sh->nh", X_n, K0[1 : 1 + 2 * S], precision=prec) + B0
        h = (
            jnp.einsum("njs,sh->njh", E, K0[1 + 2 * S :], precision=prec)
            + d_nn[..., None] * K0[0]
            + per_atom[:, None, :]
        )
        h = nn.elu(h)
        h = nn.elu(jnp.einsum("njh,hg->njg", h, K1, precision=prec) + B1)
        out = jnp.einsum("njh,hg->njg", h, K2, precision=prec) + B2   # [N,nn,76]
        out = checkpoint_name(out, "edge_mlp_out")
        Kq = out[..., :Nk]
        Kp3 = out[..., Nk : 4 * Nk]
        V0 = out[..., 4 * Nk : 4 * Nk + S]
        V1 = out[..., 4 * Nk + S :]

        Q = MLP3((S, S, 2 * Nk * Nh), dt, prec, name="nqm")(X_n)
        Q = Q.reshape(N, 2, Nh, Nk)

        # attention logits: contraction over Nk=3 -> fused VPU mul+reduce
        lq = jnp.sum(Q[:, 0][:, :, None, :] * Kq[:, None, :, :], axis=-1)  # [N,Nh,nn]
        Mq = checkpoint_name(jax.nn.softmax(lq / sdk, axis=2), "edge_attn")
        lp = jnp.concatenate(
            [
                jnp.sum(Q[:, 1][:, :, None, :] * Kp3[:, None, :, c * Nk : (c + 1) * Nk], axis=-1)
                for c in range(3)
            ],
            axis=2,
        )  # [N,Nh,3nn]
        Mp = checkpoint_name(jax.nn.softmax(lp / sdk, axis=2), "edge_attn")
        Mp1, Mp2, Mp3 = Mp[:, :, :n_nn], Mp[:, :, n_nn : 2 * n_nn], Mp[:, :, 2 * n_nn :]

        # attention-weighted sums: contraction over nn with Nh=2 heads ->
        # fused VPU multiply+reduce (MXU batched matmul would run at M=2)
        Zq = jnp.sum(Mq[:, :, :, None] * V0[:, None, :, :], axis=2)      # [N,Nh,S]
        Zq = Zq.reshape(N, Nh * S)
        #   block1: (V1 * r); fold r into the small attention tensor first
        MpR = Mp1[:, :, None, :] * jnp.swapaxes(r_nn, 1, 2)[:, None, :, :]  # [N,Nh,3,nn]
        Z1 = jnp.sum(MpR[:, :, :, :, None] * V1[:, None, None, :, :], axis=3)  # [N,Nh,3,S]
        #   block2: tiled center p; weights sum out over neighbors
        Z2 = jnp.sum(Mp2, axis=2)[:, :, None, None] * p[:, None, :, :]   # [N,Nh,3,S]
        #   block3: neighbor vector states
        Z3 = jnp.sum(Mp3[:, :, None, :, None] * p_nn.transpose(0, 2, 1, 3)[:, None], axis=3)
        Zp = (Z1 + Z2 + Z3).transpose(0, 2, 1, 3).reshape(N, 3, Nh * S)

        qh = MLP3((S, S, S), dt, prec, name="qpm")(Zq)
        ph = nn.Dense(S, use_bias=False, dtype=dt, precision=prec, name="ppm")(Zp)
        return q + qh, p + ph


class StateUpdateLayer(nn.Module):
    """Gather each atom's first `nn` neighbors, run StateUpdate, and re-zero
    the sink/padding rows (reference StateUpdateLayer,
    src/model_operations.py:217-242)."""

    cfg: LayerConfig
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    fused: bool = False
    pallas: bool = False

    @nn.compact
    def __call__(self, q, p, ids_topk, D_nn, R_nn, atom_mask, gather_cand=None, gather_loc=None):
        nn_k = self.cfg.nn
        # bf16 mode streams the whole layer (state, gathered neighbors,
        # geometry) in bf16 — the layer is HBM-traffic-bound, so halving
        # activation bytes matters more than MXU speed (measured: casting
        # only inside Dense left 88% of the fp32 layer time)
        q = q.astype(self.dtype)
        p = p.astype(self.dtype)
        D_nn = D_nn.astype(self.dtype)
        R_nn = R_nn.astype(self.dtype)
        # ONE combined 4S-wide gather for scalar+vector neighbor states:
        # gather cost on TPU is bound by row count, not bytes, so fusing
        # the q and p gathers halves the dominant per-layer cost
        N, S = q.shape
        qp = jnp.concatenate([q, p.reshape(N, 3 * S)], axis=1)  # [N, 4S]
        if self.pallas and self.fused:
            # the Pallas path gathers nn-MAJOR itself (jnp.take with
            # transposed ids inside StateUpdate._fused) — doing the
            # atom-major gather here would waste the dominant per-layer op
            q, p = StateUpdate(
                self.cfg, self.dtype, self.precision, self.fused, self.pallas,
                name="su",
            )(q, p, None, None, D_nn[:, :nn_k], R_nn[:, :nn_k, :],
              qp=qp, ids=ids_topk[:, :nn_k])
            am = atom_mask.astype(q.dtype)
            return q * am[:, None], p * am[:, None, None]
        if gather_cand is not None:
            # tile-local one-hot MXU selection (Morton-sorted layout): the
            # one-hot never reaches HBM (XLA fuses the iota-compare into
            # the dot operand) and the backward pass is the transposed
            # matmul instead of a row-rate-bound scatter-add
            T, U = gather_cand.shape
            tile = N // T
            cand_qp = jnp.take(qp, gather_cand, axis=0, mode="clip")  # [T, U, 4S]
            loc = gather_loc[:, :nn_k].reshape(T, tile * nn_k)
            oh = (loc[:, :, None] == jnp.arange(U)[None, None, :]).astype(qp.dtype)
            qp_nn = jnp.einsum(
                "tmu,tuf->tmf", oh, cand_qp, precision=self.precision
            ).reshape(N, nn_k, 4 * S)
            qp_nn = checkpoint_name(qp_nn, "edge_gather")
        else:
            # mode="clip": ids are in-bounds by construction; the default
            # fill mode makes XLA emit a NaN-select over every gathered
            # element (~23 ms of broadcast_select fusions per forward in
            # the round-3 profile)
            qp_nn = jnp.take(qp, ids_topk[:, :nn_k], axis=0, mode="clip")  # [N,nn,4S]
            qp_nn = checkpoint_name(qp_nn, "edge_gather")
        q_nn = qp_nn[..., :S]
        p_nn = qp_nn[..., S:].reshape(N, nn_k, 3, S)
        q, p = StateUpdate(self.cfg, self.dtype, self.precision, self.fused, self.pallas, name="su")(
            q,
            p,
            q_nn,
            p_nn,
            D_nn[:, :nn_k],
            R_nn[:, :nn_k, :],
        )
        # sink & padding rows stay identically zero between layers (cast the
        # mask, not the state: an f32 mask would silently upcast the whole
        # bf16 activation stream back to f32)
        am = atom_mask.astype(q.dtype)
        q = q * am[:, None]
        p = p * am[:, None, None]
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
    fused: bool = False
    pallas: bool = False

    @nn.compact
    def __call__(self, carry, _):
        q, p, ids_topk, D_nn, R_nn, atom_mask, gather_cand, gather_loc = carry
        q, p = StateUpdateLayer(self.cfg, self.dtype, self.precision, self.fused, self.pallas, name="sul")(
            q, p, ids_topk, D_nn, R_nn, atom_mask, gather_cand, gather_loc
        )
        return (q, p, ids_topk, D_nn, R_nn, atom_mask, gather_cand, gather_loc), None


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
        """q [NA,S] / p [NA,3,S] / M [NA,NR], or batched with a leading B."""
        prec = self.precision
        # softmax filter: ~ +1e-6 for members, ~ -1e6 for non-members
        F = (1.0 - M + 1e-6) / (M - 1e-6)
        z = jnp.concatenate([q, safe_norm(p, axis=-2)], axis=-1)
        s = MLP3((self.N0, self.N0, 2 * self.Nh), self.dtype, prec, name="sam")(z)
        if q.ndim == 3:  # batched
            B, NA, NR = M.shape[0], M.shape[1], M.shape[2]
            Ms = jax.nn.softmax(s[:, :, None, :] + F[..., None], axis=1)
            Ms = Ms.reshape(B, NA, NR, self.Nh, 2)
            qh = jnp.einsum("bas,barh->brsh", q, Ms[..., 0], precision=prec)
            qh = qh.reshape(B, NR, -1)
            ph = jnp.einsum("baxs,barh->brxsh", p, Ms[..., 1], precision=prec)
            ph = ph.reshape(B, NR, 3, -1)
        else:
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
    decoder (reference Model, model/model.py:6-52).

    Accepts a single padded structure ([NA, ...]) or a batch ([B, NA, ...]).
    Batches are FLATTENED into the atom axis for the layer stack rather
    than vmapped — neighbor ids never cross structures, so flattening is
    exact, and XLA lowers the flat gathers/matmuls ~1.6x faster than their
    batched counterparts. The residue pool stays per-structure (batched
    einsums)."""

    cfg: PestoConfig

    @nn.compact
    def __call__(self, X, ids_topk, q0, M, atom_mask, gather_cand=None,
                 gather_loc=None, nr=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        prec = _PRECISIONS[cfg.precision]
        if cfg.gather == "take":
            gather_cand = gather_loc = None

        # COMPACT host inputs: both q0 (vocabulary one-hot) and M (residue
        # membership) are one-hots of per-atom integer codes, so the host
        # may ship the codes ([NA] int32 each) and let the device expand
        # them — the dense M alone is NAxNR f32 (128 MB per 4x8k batch),
        # the dominant host->device transfer in serving. Integer dtype
        # selects the compact path; `nr` (static) is required for M codes.
        if jnp.issubdtype(q0.dtype, jnp.integer):
            q0 = jax.nn.one_hot(q0, cfg.em_n0, dtype=jnp.float32)
        if jnp.issubdtype(M.dtype, jnp.integer):
            if nr is None:
                raise ValueError("compact M (residue codes) requires static nr")
            M = jax.nn.one_hot(M, nr, dtype=jnp.float32)
            M = M * atom_mask[..., None].astype(M.dtype)

        batched = X.ndim == 3
        if batched:
            B, NA = X.shape[:2]
            n_real = jnp.sum(atom_mask, axis=1).astype(jnp.int32)  # [B]
            D_nn, R_nn = jax.vmap(unpack_state_features)(X, ids_topk, atom_mask, n_real)
            # flatten structures along the atom axis; each structure's ids
            # (incl. its sink 0) shift into its own row range
            offsets = (jnp.arange(B, dtype=ids_topk.dtype) * NA)[:, None, None]
            ids_flat = (ids_topk + offsets).reshape(B * NA, -1)
            X = X.reshape(B * NA, 3)
            q0 = q0.reshape(B * NA, -1)
            atom_mask_flat = atom_mask.reshape(B * NA)
            D_nn = D_nn.reshape(B * NA, -1)
            R_nn = R_nn.reshape(B * NA, -1, 3)
            ids_topk = ids_flat
            if gather_cand is not None:
                # candidate tables hold padded-row ids of their own
                # structure; shift into the flat row range like ids
                gather_cand = (gather_cand + offsets).reshape(-1, gather_cand.shape[-1])
                gather_loc = gather_loc.reshape(B * NA, -1)  # tile-local, no shift
        else:
            n_real = jnp.sum(atom_mask).astype(jnp.int32)
            D_nn, R_nn = unpack_state_features(X, ids_topk, atom_mask, n_real)
            atom_mask_flat = atom_mask

        # feature embedding; sink/padding rows are zero *after* the MLP,
        # matching the reference's zero-row prepend (model/model.py:34-40)
        em_feats = (cfg.em_n1,) if cfg.em_single else (cfg.em_n1, cfg.em_n1, cfg.em_n1)
        q = MLP3(em_feats, dtype, prec, name="em")(q0)
        q = q * atom_mask_flat.astype(q.dtype)[:, None]
        p = jnp.zeros((X.shape[0], 3, cfg.em_n1), dtype=q.dtype)

        if cfg.scan_layers:
            for g, (lc, n) in enumerate(layer_groups(cfg)):
                if cfg.remat:
                    policy = {
                        # save every matmul output (no recompute in backward);
                        # fits the 1k bucket at B=16 in bf16
                        "dots": jax.checkpoint_policies.dots_saveable,
                        # save only un-batched matmuls: keeps the edge-MLP
                        # activations but recomputes the per-atom batched
                        # einsums (attention + one-hot selection), whose
                        # outputs are the memory hogs under the gather tables
                        "dots_nb": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                        # named-checkpoint policy: save the gathered
                        # neighbor tensor, the packed edge-MLP output and
                        # the attention weights; recompute everything else
                        # (the h1/h2 edge-MLP hiddens — 256 of the 460
                        # saved bytes/edge under dots_nb — plus the cheap
                        # per-atom MLPs). Backward then never re-runs the
                        # gather (the dominant per-layer op) and the saved
                        # set is ~45% of dots_nb's, so bigger batches fit
                        "edges": jax.checkpoint_policies.save_only_these_names(
                            "edge_gather", "edge_mlp_out", "edge_attn"
                        ),
                    }.get(cfg.remat_policy)
                    # per-GROUP override: big-nn groups drop to full remat
                    # (their saved edge activations are the memory hog —
                    # ~9 GB for nn=64 at 4x8k), small groups keep the
                    # cheaper policy (config.remat_full_nn_min)
                    if (cfg.remat_full_nn_min is not None
                            and lc.nn >= cfg.remat_full_nn_min):
                        policy = None
                    body = nn.remat(_ScanBody, prevent_cse=False, policy=policy)
                else:
                    body = _ScanBody
                scan = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n,
                )(lc, dtype, prec, cfg.fused_edges, cfg.pallas_edges, name=f"sulg_{g}")
                (q, p, *_), _ = scan(
                    (q, p, ids_topk, D_nn, R_nn, atom_mask_flat, gather_cand, gather_loc), None
                )
        else:
            layer_cls = nn.remat(StateUpdateLayer) if cfg.remat else StateUpdateLayer
            for i, lc in enumerate(cfg.layers):
                q, p = layer_cls(lc, dtype, prec, cfg.fused_edges, cfg.pallas_edges, name=f"sul_{i}")(
                    q, p, ids_topk, D_nn, R_nn, atom_mask_flat, gather_cand, gather_loc
                )

        if batched:
            q = q.reshape(B, NA, -1)
            p = p.reshape(B, NA, 3, -1)
        qr, pr = StatePool(cfg.spl_n0, cfg.spl_n1, cfg.spl_nh, dtype, prec,
                           name="spl")(q, p, M)

        zr = jnp.concatenate([qr, safe_norm(pr, axis=-2)], axis=-1)
        dm_feats = (cfg.dm_n2,) if cfg.dm_single else (cfg.dm_n1, cfg.dm_n1, cfg.dm_n2)
        z = MLP3(dm_feats, dtype, prec, name="dm")(zr)
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
