"""Fused Pallas TPU kernel for the geometric state update.

One kernel invocation per atom tile computes the entire post-gather layer
chain in VMEM — edge features, the packed 3-stage edge MLP, both softmax
attentions, and the value contractions — so the only HBM traffic per layer
is: read gathered neighbor states + geometry, write the attention outputs.
The XLA fused path (models/pesto.py:_fused) round-trips every intermediate
[N,nn,128] tensor through HBM instead.

Same math as the exact reference computation up to fp summation order
(reference StateUpdate, src/model_operations.py:87-154). The tiny
contraction dims (3 spatial components, Nh=2 heads, Nk=3 keys) are
unrolled as Python loops over 2D/3D ops — Mosaic lowers 4D transposes via
unsupported gathers, so the kernel never builds rank-4 tensors.

STATUS (measured on v5e, N=8192, nn=64, fp32): 8.3 ms vs 5.3 ms for the
equivalent XLA program — XLA's producer-consumer fusion already keeps this
chain efficient, and the per-layer bottleneck is the *neighbor gather*
(13.5 ms, row-rate-bound), which Mosaic cannot currently express across
vregs (tpu.dynamic_gather is single-vreg on the sublane dim). The kernel
is kept as an optional path (PestoConfig.pallas_edges) and as the base
for a future VMEM-resident-window design once spatially-sorted ids bound
the gather locality.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # expm1 has no Pallas TPU lowering; explicit exp-1 (equal up to 1 ulp)
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _softmax(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def _kernel(qp_nn_ref, d_ref, rx_ref, ry_ref, rz_ref, q_ref, p_ref,
            k0c_ref, b0_ref, k0e_ref, k1_ref, b1_ref, k2_ref, b2_ref,
            nq_ref, qp_out_ref, pp_out_ref,
            *, S, Nh, Nk, nn):
    A = q_ref.shape[0]
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST

    q = q_ref[:]                       # [A, S]
    p_flat = p_ref[:]                  # [A, 3S]
    p_x = [p_flat[:, x * S : (x + 1) * S] for x in range(3)]
    qp_nn = qp_nn_ref[:]               # [A, nn, 4S]
    q_nn = qp_nn[:, :, :S]
    pn_x = [qp_nn[:, :, (1 + x) * S : (2 + x) * S] for x in range(3)]
    d_nn = d_ref[:]                    # [A, nn]
    r_x = [rx_ref[:], ry_ref[:], rz_ref[:]]  # 3 x [A, nn]

    p_norm = jnp.sqrt(jnp.maximum(sum(v * v for v in p_x), 1e-36))       # [A,S]
    X_n = jnp.concatenate([q, p_norm], axis=1)                           # [A,2S]

    pn_norm = jnp.sqrt(jnp.maximum(sum(v * v for v in pn_x), 1e-36))     # [A,nn,S]
    proj_p = sum(p_x[x][:, None, :] * r_x[x][:, :, None] for x in range(3))
    proj_pn = sum(pn_x[x] * r_x[x][:, :, None] for x in range(3))
    E = jnp.concatenate([q_nn, pn_norm, proj_p, proj_pn], axis=2)        # [A,nn,4S]

    # packed edge MLP (edge rows flattened to 2D for clean MXU tiling)
    per_atom = (
        jnp.dot(X_n, k0c_ref[1:], preferred_element_type=f32, precision=prec)
        + b0_ref[:]
    )                                                                    # [A,4S]
    E2 = E.reshape(A * nn, 4 * S)
    h = jnp.dot(E2, k0e_ref[:], preferred_element_type=f32, precision=prec)
    h = h.reshape(A, nn, 4 * S) + d_nn[:, :, None] * k0c_ref[0] + per_atom[:, None, :]
    h = _elu(h).reshape(A * nn, 4 * S)
    h = _elu(jnp.dot(h, k1_ref[:], preferred_element_type=f32, precision=prec) + b1_ref[:])
    out = jnp.dot(h, k2_ref[:], preferred_element_type=f32, precision=prec) + b2_ref[:]
    out = out.reshape(A, nn, out.shape[-1])                              # [A,nn,128pad]

    Kq = out[:, :, :Nk]
    Kp3 = out[:, :, Nk : 4 * Nk]
    V0 = out[:, :, 4 * Nk : 4 * Nk + S]
    V1 = out[:, :, 4 * Nk + S : 4 * Nk + 2 * S]

    nq = nq_ref[:]                                                       # [A, 2*Nh*Nk]
    inv_sdk = 1.0 / jnp.sqrt(jnp.asarray(Nk, f32))

    zq_parts = []                                # per head [A,S]
    zp_parts = [[None] * Nh for _ in range(3)]   # [x][h] -> [A,S]
    for hh in range(Nh):
        q0 = nq[:, hh * Nk : (hh + 1) * Nk]                      # [A,Nk]
        q1 = nq[:, Nh * Nk + hh * Nk : Nh * Nk + (hh + 1) * Nk]  # [A,Nk]

        lq = sum(q0[:, k][:, None] * Kq[:, :, k] for k in range(Nk))     # [A,nn]
        Mq = _softmax(lq * inv_sdk, axis=1)
        zq_parts.append(jnp.sum(Mq[:, :, None] * V0, axis=1))            # [A,S]

        lp = [
            sum(q1[:, k][:, None] * Kp3[:, :, c * Nk + k] for k in range(Nk))
            for c in range(3)
        ]
        lp = jnp.concatenate(lp, axis=1) * inv_sdk                        # [A,3nn]
        Mp = _softmax(lp, axis=1)
        Mp1, Mp2, Mp3 = Mp[:, :nn], Mp[:, nn : 2 * nn], Mp[:, 2 * nn :]
        w2 = jnp.sum(Mp2, axis=1)[:, None]                                # [A,1]
        for x in range(3):
            z1 = jnp.sum((Mp1 * r_x[x])[:, :, None] * V1, axis=1)
            z3 = jnp.sum(Mp3[:, :, None] * pn_x[x], axis=1)
            zp_parts[x][hh] = z1 + w2 * p_x[x] + z3                       # [A,S]

    qp_out_ref[:] = jnp.concatenate(zq_parts, axis=1)                     # [A,Nh*S]
    pp_out_ref[:] = jnp.concatenate(
        [zp_parts[x][hh] for x in range(3) for hh in range(Nh)], axis=1
    )                                                                     # [A,3*Nh*S]


@functools.partial(
    jax.jit,
    static_argnames=("S", "Nh", "Nk", "nn", "tile", "interpret"),
)
def fused_edge_attention(
    qp_nn, d_nn, r_nn, q, p_flat, k0c, b0, k0e, k1, b1, k2, b2, nq,
    S=32, Nh=2, Nk=3, nn=64, tile=64, interpret=False,
):
    """Returns (Zq [N, Nh*S], Zp_flat [N, 3*Nh*S]) — the attention outputs
    before the qpm/ppm projections (per-atom MLPs left to XLA).

    qp_nn: [N, nn, 4S] gathered neighbor states; d_nn [N,nn]; r_nn
    [N,nn,3] (split into per-component planes internally — a [.,.,3]
    block would lane-pad 3->128 in VMEM); q [N,S]; p_flat [N,3S];
    k2/b2 lane-padded to 128.
    Zp_flat layout: x-major then head (matches Zp.reshape(N,3,Nh*S)).
    """
    N = q.shape[0]
    grid = (N // tile,)
    rx, ry, rz = r_nn[:, :, 0], r_nn[:, :, 1], r_nn[:, :, 2]

    def row_block(i):
        return (i, 0, 0)

    def row_block2(i):
        return (i, 0)

    out_shapes = (
        jax.ShapeDtypeStruct((N, Nh * S), jnp.float32),
        jax.ShapeDtypeStruct((N, 3 * Nh * S), jnp.float32),
    )
    kern = functools.partial(_kernel, S=S, Nh=Nh, Nk=Nk, nn=nn)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, nn, 4 * S), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nn), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nn), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nn), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nn), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * S), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0e
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((tile, 2 * Nh * Nk), row_block2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, Nh * S), row_block2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * Nh * S), row_block2, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(qp_nn, d_nn, rx, ry, rz, q, p_flat, k0c, b0, k0e, k1, b1, k2, b2, nq)
