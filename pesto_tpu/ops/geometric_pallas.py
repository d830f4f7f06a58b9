"""Fused Pallas TPU kernel for the geometric state update (v4, nn-major).

One kernel invocation per atom block computes the entire post-gather layer
chain in VMEM — edge-feature assembly, the packed 3-stage edge MLP, both
softmax attentions, and the value contractions — so the only HBM traffic
per layer is: read the gathered neighbor states + geometry once, write
the two attention outputs. Same math as the reference StateUpdate
(src/model_operations.py:87-154) up to fp summation order.

Why this exists (measured, v5e, B=4 x 8k atoms, bf16, round 3): the XLA
fused path spends ~17 ms per nn=64 layer of which <1 ms is MXU matmul
and ~4 ms is the neighbor gather — the rest is HBM round trips of
[N,nn,128] intermediates (edge assembly fusions, transpose copies,
masking selects, lane slices) plus VPU attention reads. Profiled leaf
breakdown of the 289 ms forward: gathers 58 ms, assembly/copies/slices
~105 ms, VPU attention ~45 ms, MXU ~12 ms. This kernel collapses the
assembly+attention into VMEM-resident compute; the gather stays in XLA
(its take-fusion runs at the hardware's ~540M rows/s gather rate, which
Mosaic cannot beat — tpu.dynamic_gather is single-vreg on the sublane
dim), but is issued TRANSPOSED so the kernel receives neighbor-major
data at no extra cost.

DESIGN — the *nn-major* layout [nn, A, lanes] makes every center<->edge
movement a leading-axis operation that never disturbs the (sublane,
lane) tiling:

  - center->edge broadcast (per-atom state repeated for each neighbor
    slot) is `pltpu.repeat(x, nn, axis=0)` — a vertical tile;
  - edge->center reduction (attention-weighted sums over neighbors) is
    `jnp.sum(y.reshape(nn, A, C), axis=0)` — a leading-axis reduce;
  - both heads' attention logits come from ONE elementwise mask-multiply
    plus ONE thin matmul per head: L_h = (out * repeat(nqpat_h)) @ G,
    where nqpat scatters the per-atom nqm outputs onto the lanes of the
    lane-aligned K2 output segments (pack_k2_aligned) and G is a
    constant 0/1 lane-group summing matrix. 1/sqrt(Nk) folds into nqpat.
  - the seven weighted value planes per head land in one [nn*A, 8S] f32
    scratch reduced to [A, 8S] in a single leading-axis sum (f32
    accumulation — better numerics than the XLA bf16 chain).

STATUS (measured on v5e, N=32768 flat atoms, nn=64, bf16 streams):
21.6 ms/layer vs ~13 ms for the XLA fused path excluding the shared
gather — correct (oracle-tested in interpret mode through the model
path) but NOT faster, so it stays behind `PestoConfig.pallas_edges`.
The per-stage split (probe series): input DMA floor 2.2 ms, E assembly
6.7, packed MLP ~2, logits+softmax 1.4, weighted-value contraction 9.4.
The limiting physics, measured with a calibration kernel: one Mosaic
elementwise pass over the [N*nn, <=128] edge set costs ~0.4 ms in f32
(~65% of VPU-VMEM bandwidth; lane width does not matter — a [AE,32]
pass costs the same as [AE,128]), and the kernel needs ~50 such passes
while XLA's HBM-roofline fusions amount to ~10 traversals at 1.3 ms
each. The winning variant — all passes in bf16 (2x) with fused-store
products (~20 passes, projected ~6-8 ms) — is blocked by a pinned
toolchain bug: bf16 broadcast ops ([AE,1]-column times [AE,S], and any
bf16 [A,S]->[A,1,S]/[A,nn]->[A,nn,1] shape cast) crash the remote
compile helper with an opaque HTTP-500; the same ops in f32 compile.

Toolchain archaeology (kept for the next kernel author):
  1. The DEFAULT 16 MB scoped-vmem budget is the cause of most opaque
     tpu_compile_helper HTTP-500s: any kernel whose scratch + f32
     transients exceed it dies with no diagnostic (one build surfaced
     the real error: "Scoped allocation with size 30.25M and limit
     16.00M"). Raise `CompilerParams(vmem_limit_bytes=...)` FIRST when
     bisecting a 500 — v5e has 128 MB physical VMEM.
  2. bf16 broadcast-reshapes crash even within budget (see above);
     route them through f32 or restructure.
  3. pltpu.repeat is np.tile-style (concatenated copies), not
     np.repeat; in nn-major layout tile-semantics is exactly the
     center->edge broadcast.
  4. Replacing repeats with 0/1 expand-matmuls ([AE,A] @ X on the MXU)
     compiles but is SLOWER (26.9 ms) — the MXU is idle here, but the
     f32 results still pay full passes.
v1 (round 2, plane-form fp32, tile=64) lost to XLA 8.3 vs 5.3
ms/layer; v2 (round 3, plane-form bf16, scratch-staged, A=64 max) ran
24 ms/layer — per-op overhead on ~100 half-lane [64,64] VPU ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane offsets of the K2 output segments (kernel-private packing)
_OQ = 0    # eqkm keys,  width Nk
_OP = 8    # epkm keys,  width 3*Nk
_OV0 = 32  # evm V0,     width S
_OV1 = 64  # evm V1,     width S


def _elu(x):
    # expm1 has no Pallas TPU lowering; explicit exp-1 (equal up to 1 ulp)
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def pack_k2_aligned(k2q, k2p, k2v, b2q, b2p, b2v, S, Nk, dtype):
    """Kernel-private K2/B2 packing: output segments at lane offsets
    _OQ/_OP/_OV0/_OV1 so in-kernel slices never straddle vreg lanes.
    Rows follow the block-diagonal layout of the packed edge MLP
    (eqkm rows 0:S, epkm rows S:2S, evm rows 2S:4S)."""
    H = 4 * S
    K2 = jnp.zeros((H, 128), dtype)
    K2 = K2.at[:S, _OQ : _OQ + Nk].set(k2q.astype(dtype))
    K2 = K2.at[S : 2 * S, _OP : _OP + 3 * Nk].set(k2p.astype(dtype))
    K2 = K2.at[2 * S :, _OV0 : _OV0 + S].set(k2v[:, :S].astype(dtype))
    K2 = K2.at[2 * S :, _OV1 : _OV1 + S].set(k2v[:, S:].astype(dtype))
    B2 = jnp.zeros((128,), dtype)
    B2 = B2.at[_OQ : _OQ + Nk].set(b2q.astype(dtype))
    B2 = B2.at[_OP : _OP + 3 * Nk].set(b2p.astype(dtype))
    B2 = B2.at[_OV0 : _OV0 + S].set(b2v[:S].astype(dtype))
    B2 = B2.at[_OV1 : _OV1 + S].set(b2v[S:].astype(dtype))
    return K2, B2


def _lane_group_mat(Nk, dtype):
    G = np.zeros((128, 4), np.float32)
    for k in range(Nk):
        G[_OQ + k, 0] = 1.0
        for c in range(3):
            G[_OP + c * Nk + k, 1 + c] = 1.0
    return jnp.asarray(G, dtype)


def _kernel(qp_t_ref, d_ref, rx_ref, ry_ref, rz_ref, q_ref, p_ref, nqp_ref,
            k0c_ref, b0_ref, k0e_ref, k1_ref, b1_ref, k2_ref, b2_ref, g_ref,
            zq_ref, zp_ref, e_scr, out_scr, wv_scr, *, S, Nh, Nk, nn, A):
    AE = nn * A
    dt = qp_t_ref.dtype
    f32 = jnp.float32

    qp = qp_t_ref[:].reshape(AE, 4 * S)      # gathered states, nn-major
    q = q_ref[:]                             # [A, S]
    p_flat = p_ref[:]                        # [A, 3S]
    d_e = d_ref[:].reshape(AE, 1)
    # stream dtype = dt everywhere (r4): loads/stores/spills of every
    # [AE, *] tensor stay in the input dtype — for bf16 inputs that
    # halves every VMEM pass (16 vs 8 sublanes per vreg), which is the
    # all-bf16 variant the bf16-broadcast Mosaic bug blocked until this
    # toolchain (docs/MOSAIC_BUGS.md probe log 2026-08-19). In-register
    # math stays f32 where numerics need it (norms, softmax normalizers,
    # the final cross-neighbor reduction); f32 inputs are unchanged.
    r_e = [
        rx_ref[:].reshape(AE, 1),
        ry_ref[:].reshape(AE, 1),
        rz_ref[:].reshape(AE, 1),
    ]

    p_x = [p_flat[:, x * S : (x + 1) * S] for x in range(3)]
    pn_e = [qp[:, (1 + x) * S : (2 + x) * S] for x in range(3)]

    # node features + per-atom part of the first edge matmul (f32 accum)
    p_norm = jnp.sqrt(jnp.maximum(sum(v.astype(f32) ** 2 for v in p_x), 1e-36))
    X_n = jnp.concatenate([q, p_norm.astype(dt)], axis=1)          # [A, 2S]
    per_atom = (
        jnp.dot(X_n, k0c_ref[1:], preferred_element_type=f32)
        + b0_ref[:].astype(f32)
    ).astype(dt)                                                   # [A, 4S]

    # center vector state tiled onto the neighbor axis (leading-dim tile)
    cp = pltpu.repeat(p_flat, nn, axis=0)                          # [AE, 3S]

    # edge features assembled into lane slices of the scratch
    e_scr[:, :S] = qp[:, :S]
    e_scr[:, S : 2 * S] = jnp.sqrt(
        jnp.maximum(sum(v.astype(f32) ** 2 for v in pn_e), 1e-36)
    ).astype(dt)
    e_scr[:, 2 * S : 3 * S] = sum(
        cp[:, x * S : (x + 1) * S].astype(f32) * r_e[x] for x in range(3)
    ).astype(dt)
    e_scr[:, 3 * S :] = sum(
        pn_e[x].astype(f32) * r_e[x] for x in range(3)
    ).astype(dt)

    # packed edge MLP: [AE, 4S] x [4S, 4S] twice, then the aligned K2;
    # the distance column enters as a [AE,1]x[1,4S] outer product. The
    # MXU always accumulates f32 — and Mosaic REJECTS bf16
    # preferred_element_type on dot_general (MLIR verification error,
    # probed 2026-08-19) — so dots emit f32 and are cast to the dt
    # stream immediately; every [AE, 4S] intermediate still
    # loads/stores at stream width. The elu runs f32 in-register.
    h = (
        jnp.dot(e_scr[:], k0e_ref[:], preferred_element_type=f32)
        + jnp.dot(d_e, k0c_ref[0:1], preferred_element_type=f32)
        + pltpu.repeat(per_atom, nn, axis=0).astype(f32)
    )
    h = _elu(h).astype(dt)
    h = _elu(
        jnp.dot(h, k1_ref[:], preferred_element_type=f32) + b1_ref[:].astype(f32)
    ).astype(dt)
    out_scr[:] = (
        jnp.dot(h, k2_ref[:], preferred_element_type=f32) + b2_ref[:].astype(f32)
    ).astype(dt)

    out = out_scr[:]
    V0 = out[:, _OV0 : _OV0 + S]
    V1 = out[:, _OV1 : _OV1 + S]
    G = g_ref[:]                                                   # [128, 4]

    for hh in range(Nh):
        # all 4 logit planes of this head in one mask-mul + thin matmul:
        # cols = [q-plane, c0, c1, c2]; 1/sqrt(Nk) folded into nqpat
        nq_rep = pltpu.repeat(
            nqp_ref[:, hh * 128 : (hh + 1) * 128], nn, axis=0
        )                                                          # [AE, 128]
        L = jnp.dot(out * nq_rep, G, preferred_element_type=f32)   # [AE, 4]
        L = L.astype(dt)

        # per-atom softmax over the nn edges: leading-axis max/sum,
        # normalizers tiled back; q softmaxes alone, the 3 c-planes
        # jointly (the reference's [N, 3nn] concat). exp and the
        # normalizer run f32 in-register; weights stream at dt.
        m4 = jnp.max(L.reshape(nn, A, 4), axis=0)                  # [A, 4]
        mp = jnp.maximum(jnp.maximum(m4[:, 1:2], m4[:, 2:3]), m4[:, 3:4])
        msel = jnp.concatenate([m4[:, 0:1], mp, mp, mp], axis=1)
        e4 = jnp.exp(
            (L - pltpu.repeat(msel, nn, axis=0)).astype(f32)
        ).astype(dt)                                               # [AE, 4]
        s4 = jnp.sum(e4.reshape(nn, A, 4).astype(f32), axis=0)     # [A, 4]
        sp = s4[:, 1:2] + s4[:, 2:3] + s4[:, 3:4]
        inv = (
            1.0 / jnp.concatenate([s4[:, 0:1], sp, sp, sp], axis=1)
        ).astype(dt)
        w = e4 * pltpu.repeat(inv, nn, axis=0)                     # [AE, 4] dt

        # seven weighted value planes + the plane-1 weight column at
        # stream width, one leading-axis f32-accumulated reduction for
        # the whole contraction
        u = w[:, 1:2] * V1
        wv_scr[:, 0:S] = w[:, 0:1] * V0
        wv_scr[:, S : 2 * S] = u * r_e[0]
        wv_scr[:, 2 * S : 3 * S] = u * r_e[1]
        wv_scr[:, 3 * S : 4 * S] = u * r_e[2]
        wv_scr[:, 4 * S : 5 * S] = w[:, 3:4] * pn_e[0]
        wv_scr[:, 5 * S : 6 * S] = w[:, 3:4] * pn_e[1]
        wv_scr[:, 6 * S : 7 * S] = w[:, 3:4] * pn_e[2]
        wv_scr[:, 7 * S : 7 * S + 1] = w[:, 2:3]
        res = jnp.sum(
            wv_scr[:].reshape(nn, A, 8 * S).astype(f32), axis=0
        )                                                          # [A, 8S] f32

        zq_ref[:, hh * S : (hh + 1) * S] = res[:, :S].astype(dt)
        s2 = res[:, 7 * S : 7 * S + 1]                             # [A, 1]
        for x in range(3):
            o = (x * Nh + hh) * S  # x-major then head, matches torch view
            zp_ref[:, o : o + S] = (
                res[:, (1 + x) * S : (2 + x) * S]
                + res[:, (4 + x) * S : (5 + x) * S]
                + s2 * p_x[x].astype(f32)
            ).astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("S", "Nh", "Nk", "nn", "tile", "interpret"),
)
def fused_edge_attention(
    qp_t, d_t, r_t, q, p_flat, k0c, b0, k0e, k1, b1, k2, b2, nq,
    S=32, Nh=2, Nk=3, nn=64, tile=None, interpret=False,
):
    """Returns (Zq [N, Nh*S], Zp_flat [N, 3*Nh*S]) — the attention outputs
    before the qpm/ppm projections (per-atom MLPs left to XLA).

    NN-MAJOR inputs: qp_t [nn, N, 4S] gathered neighbor states (issue the
    gather with transposed ids: `jnp.take(qp, ids.T, axis=0)`); d_t
    [nn, N]; r_t [nn, N, 3]; q [N, S]; p_flat [N, 3S]; k2/b2 must be the
    lane-ALIGNED packing from pack_k2_aligned; nq [N, 2*Nh*Nk] nqm
    outputs. Zp_flat layout: x-major then head (matches the torch
    Zp.reshape(N, 3, Nh*S)). Output dtype = input dtype.
    """
    N = q.shape[0]
    if tile is None:
        tile = max(32, 8192 // nn)  # constant 8192 edge rows per block
    tile = min(tile, N)
    while N % tile:
        tile //= 2
    grid = (N // tile,)
    dt = qp_t.dtype
    AE = nn * tile

    d3 = d_t[:, :, None]
    rx = r_t[:, :, 0:1]
    ry = r_t[:, :, 1:2]
    rz = r_t[:, :, 2:3]

    # per-atom logit-coefficient pattern on the aligned K2 lanes, one
    # 128-lane section per head; 1/sqrt(Nk) folded in
    inv_sdk = 1.0 / jnp.sqrt(jnp.asarray(Nk, jnp.float32))
    nqf = nq.astype(jnp.float32) * inv_sdk
    nqpat = jnp.zeros((N, Nh * 128), jnp.float32)
    for hh in range(Nh):
        base = hh * 128
        for k in range(Nk):
            nqpat = nqpat.at[:, base + _OQ + k].set(nqf[:, hh * Nk + k])
            q1k = nqf[:, Nh * Nk + hh * Nk + k]
            for c in range(3):
                nqpat = nqpat.at[:, base + _OP + c * Nk + k].set(q1k)
    nqpat = nqpat.astype(dt)

    G = _lane_group_mat(Nk, dt)

    def mid(i):
        return (0, i, 0)

    def row(i):
        return (i, 0)

    const = lambda *_: (0, 0)  # noqa: E731

    out_shapes = (
        jax.ShapeDtypeStruct((N, Nh * S), dt),
        jax.ShapeDtypeStruct((N, 3 * Nh * S), dt),
    )
    kern = functools.partial(_kernel, S=S, Nh=Nh, Nk=Nk, nn=nn, A=tile)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nn, tile, 4 * S), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, tile, 1), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, tile, 1), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, tile, 1), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, tile, 1), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, Nh * 128), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k0e
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((128, 4), const, memory_space=pltpu.VMEM),  # G
        ],
        out_specs=(
            pl.BlockSpec((tile, Nh * S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * Nh * S), row, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((AE, 4 * S), dt),         # E
            pltpu.VMEM((AE, 128), dt),           # K2 output
            pltpu.VMEM((AE, 8 * S), dt),         # weighted value planes
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default 16M scoped-vmem budget was the cause of every
            # opaque tpu_compile_helper HTTP-500 in the probe series: the
            # block's scratches + f32 transients peak ~30M at 8192 edge
            # rows. v5e VMEM is 128M; leave headroom for double-buffered
            # input blocks.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp_t, d3, rx, ry, rz, q, p_flat, nqpat,
      k0c, b0, k0e, k1, b1, k2, b2, G)
