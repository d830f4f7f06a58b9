"""Online-softmax (flash-attention style) Pallas kernel for the geometric
state update.

v2 of ops/geometric_pallas.py: the neighbor axis is processed in chunks on
a 2-D grid (atom tiles x neighbor chunks) with running-softmax statistics
in scratch, so live VMEM is O(tile x chunk) instead of O(tile x nn).
Layout note: neighbor-major inputs ([nn, N, .] / [nn, N]) put the chunked
axis on the leading (unconstrained) dimension — Mosaic requires dynamic
slices on the trailing sublane/lane dims to be tile-aligned, but leading
dims partition freely. Both attentions accumulate online; the three
vector-value blocks (V1*r, tiled center p, p_nn — reference
src/model_operations.py:131-136) contribute three logit sub-blocks per
chunk to one running softmax.

STATUS: numerically verified in interpret mode against v1/XLA (<2e-5).
Mosaic compilation fails with "Unsupported output implicit dimension";
isolated by elimination to the [1,A]<->[A,1] relayout transposes that
bridge the lane-oriented running stats and the sublane-oriented
accumulators (per-head full-ref scratch writes and per-k logit sums are
already in place). Round-2 item: restructure so both orientations are
never needed (e.g. keep accumulators lane-major and transpose once at
finalize), or await Mosaic support; see docs/ROADMAP.md.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _kernel(qp_nn_ref, d_ref, rx_ref, ry_ref, rz_ref, q_ref, p_ref,
            k0c_ref, b0_ref, k0e_ref, k1_ref, b1_ref, k2_ref, b2_ref, nq_ref,
            qp_out_ref, pp_out_ref,
            *scratch, S, Nh, Nk, nn, chunk):
    # scratch layout: per-head [8, tile] stat refs (full-ref writes only;
    # Mosaic rejects sub-sublane offset stores), then zq/zp accumulators
    mq_r = scratch[0:Nh]
    sq_r = scratch[Nh : 2 * Nh]
    mp_r = scratch[2 * Nh : 3 * Nh]
    sp_r = scratch[3 * Nh : 4 * Nh]
    zq_ref = scratch[4 * Nh]
    zp_ref = scratch[4 * Nh + 1]
    A = q_ref.shape[0]
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    NEG = jnp.float32(-1e30)

    q = q_ref[:]
    p_flat = p_ref[:]
    p_x = [p_flat[:, x * S : (x + 1) * S] for x in range(3)]
    qp_nn = qp_nn_ref[:]                       # [chunk, A, 4S] neighbor-major
    q_nn = qp_nn[:, :, :S]
    pn_x = [qp_nn[:, :, (1 + x) * S : (2 + x) * S] for x in range(3)]
    d_nn = d_ref[:]                            # [chunk, A]
    r_x = [rx_ref[:], ry_ref[:], rz_ref[:]]    # [chunk, A] each

    p_norm = jnp.sqrt(jnp.maximum(sum(v * v for v in p_x), 1e-36))
    X_n = jnp.concatenate([q, p_norm], axis=1)

    pn_norm = jnp.sqrt(jnp.maximum(sum(v * v for v in pn_x), 1e-36))
    proj_p = sum(p_x[x][None, :, :] * r_x[x][:, :, None] for x in range(3))
    proj_pn = sum(pn_x[x] * r_x[x][:, :, None] for x in range(3))
    E = jnp.concatenate([q_nn, pn_norm, proj_p, proj_pn], axis=2)  # [chunk, A, 4S]

    per_atom = jnp.dot(X_n, k0c_ref[1:], preferred_element_type=f32, precision=prec) + b0_ref[:]
    E2 = E.reshape(chunk * A, 4 * S)
    h = jnp.dot(E2, k0e_ref[:], preferred_element_type=f32, precision=prec)
    h = h.reshape(chunk, A, 4 * S) + d_nn[:, :, None] * k0c_ref[0] + per_atom[None, :, :]
    h = _elu(h).reshape(chunk * A, 4 * S)
    h = _elu(jnp.dot(h, k1_ref[:], preferred_element_type=f32, precision=prec) + b1_ref[:])
    out = jnp.dot(h, k2_ref[:], preferred_element_type=f32, precision=prec) + b2_ref[:]
    out = out.reshape(chunk, A, out.shape[-1])

    Kq = out[:, :, :Nk]
    Kp3 = out[:, :, Nk : 4 * Nk]
    V0 = out[:, :, 4 * Nk : 4 * Nk + S]
    V1 = out[:, :, 4 * Nk + S : 4 * Nk + 2 * S]

    nq = nq_ref[:]
    inv_sdk = 1.0 / jnp.sqrt(jnp.asarray(Nk, f32))

    @pl.when(j == 0)
    def _init():
        for r in list(mq_r) + list(mp_r):
            r[:] = jnp.full_like(r, NEG)
        for r in list(sq_r) + list(sp_r):
            r[:] = jnp.zeros_like(r)
        zq_ref[:] = jnp.zeros_like(zq_ref)
        zp_ref[:] = jnp.zeros_like(zp_ref)

    # stats are lane-oriented [8, tile] (atoms on lanes); accumulators are
    # sublane-oriented [tile, C]. Tiny [1,A]->[A,1] transposes bridge them.
    for hh in range(Nh):
        q0 = nq[:, hh * Nk : (hh + 1) * Nk]                      # [A, Nk]
        q1 = nq[:, Nh * Nk + hh * Nk : Nh * Nk + (hh + 1) * Nk]

        # ---- scalar attention (running softmax over neighbors) ----
        lq = sum(q0[:, k][None, :] * Kq[:, :, k] for k in range(Nk)) * inv_sdk  # [chunk, A]
        m_old = mq_r[hh][0:1, :]                           # [1, A]
        m_new = jnp.maximum(m_old, jnp.max(lq, axis=0, keepdims=True))
        scale = jnp.exp(m_old - m_new)                     # [1, A]
        w = jnp.exp(lq - m_new)                            # [chunk, A]
        mq_r[hh][:] = jnp.broadcast_to(m_new, mq_r[hh].shape)
        s_new = sq_r[hh][0:1, :] * scale + jnp.sum(w, axis=0, keepdims=True)
        sq_r[hh][:] = jnp.broadcast_to(s_new, sq_r[hh].shape)
        scale_col = scale.T                                # [A, 1]
        zq_ref[:, hh * S : (hh + 1) * S] = (
            zq_ref[:, hh * S : (hh + 1) * S] * scale_col
            + jnp.sum(w[:, :, None] * V0, axis=0)
        )

        # ---- vector attention (one softmax over the 3 value blocks) ----
        lps = [
            sum(q1[:, k][None, :] * Kp3[:, :, c * Nk + k] for k in range(Nk)) * inv_sdk
            for c in range(3)
        ]
        m_old = mp_r[hh][0:1, :]
        chunk_max = jnp.maximum(
            jnp.max(lps[0], axis=0, keepdims=True),
            jnp.maximum(jnp.max(lps[1], axis=0, keepdims=True),
                        jnp.max(lps[2], axis=0, keepdims=True)),
        )
        m_new = jnp.maximum(m_old, chunk_max)
        scale = jnp.exp(m_old - m_new)
        w1 = jnp.exp(lps[0] - m_new)
        w2 = jnp.exp(lps[1] - m_new)
        w3 = jnp.exp(lps[2] - m_new)
        mp_r[hh][:] = jnp.broadcast_to(m_new, mp_r[hh].shape)
        sp_new = sp_r[hh][0:1, :] * scale + (
            jnp.sum(w1, axis=0, keepdims=True)
            + jnp.sum(w2, axis=0, keepdims=True)
            + jnp.sum(w3, axis=0, keepdims=True)
        )
        sp_r[hh][:] = jnp.broadcast_to(sp_new, sp_r[hh].shape)
        scale_col = scale.T                                # [A, 1]
        sw2 = jnp.sum(w2, axis=0, keepdims=True).T         # [A, 1]
        for x in range(3):
            off = x * Nh * S + hh * S
            contrib = (
                jnp.sum((w1 * r_x[x])[:, :, None] * V1, axis=0)
                + sw2 * p_x[x]
                + jnp.sum(w3[:, :, None] * pn_x[x], axis=0)
            )
            zp_ref[:, off : off + S] = zp_ref[:, off : off + S] * scale_col + contrib

    @pl.when(j == nj - 1)
    def _finalize():
        for hh in range(Nh):
            qden = (1.0 / sq_r[hh][0:1, :]).T              # [A, 1]
            qp_out_ref[:, hh * S : (hh + 1) * S] = zq_ref[:, hh * S : (hh + 1) * S] * qden
            pden = (1.0 / sp_r[hh][0:1, :]).T
            for x in range(3):
                off = x * Nh * S + hh * S
                pp_out_ref[:, off : off + S] = zp_ref[:, off : off + S] * pden


@functools.partial(
    jax.jit, static_argnames=("S", "Nh", "Nk", "nn", "tile", "chunk", "interpret")
)
def fused_edge_attention_v2(
    qp_nn, d_nn, r_nn, q, p_flat, k0c, b0, k0e, k1, b1, k2, b2, nq,
    S=32, Nh=2, Nk=3, nn=64, tile=256, chunk=16, interpret=False,
):
    """Online-softmax variant; same contract as fused_edge_attention."""
    N = q.shape[0]
    nj = nn // chunk
    grid = (N // tile, nj)

    # neighbor-major layouts so the chunked axis leads (see module doc)
    qp_t = qp_nn.transpose(1, 0, 2)            # [nn, N, 4S]
    d_t = d_nn.T                               # [nn, N]
    rx, ry, rz = (r_nn[:, :, x].T for x in range(3))

    chunk_atom3 = lambda i, j: (j, i, 0)
    chunk_atom2 = lambda i, j: (j, i)
    atom_only = lambda i, j: (i, 0)

    out_shapes = (
        jax.ShapeDtypeStruct((N, Nh * S), jnp.float32),
        jax.ShapeDtypeStruct((N, 3 * Nh * S), jnp.float32),
    )
    kern = functools.partial(_kernel, S=S, Nh=Nh, Nk=Nk, nn=nn, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, tile, 4 * S), chunk_atom3, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), chunk_atom2, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), chunk_atom2, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), chunk_atom2, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), chunk_atom2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), atom_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * S), atom_only, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0e
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((tile, 2 * Nh * Nk), atom_only, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, Nh * S), atom_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * Nh * S), atom_only, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((8, tile), jnp.float32) for _ in range(4 * Nh)]
            + [
                pltpu.VMEM((tile, Nh * S), jnp.float32),      # zq
                pltpu.VMEM((tile, 3 * Nh * S), jnp.float32),  # zp
            ]
        ),
        interpret=interpret,
    )(qp_t, d_t, rx, ry, rz, q, p_flat, k0c, b0, k0e, k1, b1, k2, b2, nq)
