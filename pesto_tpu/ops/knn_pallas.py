"""Exact kNN topology via a Pallas threshold-compaction kernel.

The reference extracts the 64-NN topology with a dense N^2 distance
matrix + full-width top-k (src/data_encoding.py:87-102). XLA's TopK is
element-bound (~4-5 Gelem/s on v5e), so the exact [8192, 8192] selection
costs ~19-24 ms however it is chunked. This module replaces the
full-width selection with a candidate-construction scheme whose largest
selection is 640 wide:

  1. *Static Morton band*: after spatial sorting, each atom's near
     neighbors are concentrated in a +-HALF window of the atom axis.
     The band's masked squared distances are computed gather-free in XLA
     (2*HALF rolls) and its 64th-smallest value `thr` is a TRUE upper
     bound on the row's 64th-smallest overall (the 64th-best of any >=64
     candidates bounds the global 64th-best).
  2. *Pallas compaction kernel*: blocked Gram distances in VMEM; every
     OFF-band atom with masked Dsq <= thr+margin is compacted into W
     candidate slots per row by per-chunk argmin-knockout (dynamic trip
     counts; f32/i32 loop carries only — i1 vector carries fail Mosaic
     legalization, see tests/test_pallas_knn.py for the probe). The
     kernel emits (id, value) pairs and the per-block valid max Dsq (for
     the reference's duplicate-distance feature semantics).
  3. *Narrow exact merge*: lexicographic (value, id) sort over the
     band's 2*HALF static candidates + W compacted candidates — ties
     break by atom id, matching lax.top_k's stable tie-break.

Exactness: candidates ⊇ true top-64 for every row whose off-band alive
count fits W; rows that overflow raise a flag and the caller falls back
to the exact XLA path for the whole structure (lax.cond), so the result
is exact unconditionally. The margin absorbs the Gram-form cancellation
noise of the in-kernel distances vs the displacement-form band values.

STATUS — exact and tested, but NOT the production default. Measured on
v5e at the 8192 bucket: the compaction kernel's knockout cost is driven
by the FAT TAIL of Morton-discontinuity rows (rows whose spatial
neighborhood is far away on the curve get a loose window threshold and
up to ~300 off-band alive candidates; e.g. 1OL5.pdb1 row thr 149 A^2 vs
typical 40). With W=384 (no overflow on the tested real structure) the
full pipeline runs 40 ms vs 27.5 ms for the chunked-exact XLA path — the
tail rows dominate the per-chunk argmin-knockout (its cost is
sum-over-chunks of the per-block MAX alive count). The fix — a per-row
tight threshold via in-kernel value bisection — now SHIPS in this kernel
(see the inline comment at the `bis` loop): the first bisection attempt
hung the remote compiler >590 s, which at the time was attributed to the
bisection pattern itself, and was later root-caused to the default 16 MB
scoped-vmem budget (raised here via CompilerParams). CAVEAT: that
root-cause has not yet been re-confirmed by an on-chip compile of THIS
kernel — the tunnel has been wedged since — so the hang stays pinned as
`bisecthang` in docs/MOSAIC_BUGS.md (runnable repro in
docs/mosaic_repros.py) until bench.py's `knn (exact pallas)` line lands.
Two further Mosaic limitations are pinned in tests/test_pallas_knn.py:
i1 vector loop carries fail scf.for legalization, and rank-0 bitcast is
unsupported. The kernel + exactness tests + fallback stay behind
`method="pallas"` so the avenue remains one flag away.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 128        # rows per kernel block
HALF = 256      # Morton band half-width (band = threshold window)
W = 384     # off-band candidate slots per row (covers measured Morton-discontinuity tails)
PUSH = np.float32(4e9)
BIG = np.float32(1e10)
BIGHALF = np.float32(5e9)
MARGIN = np.float32(1e-2)


def _kernel(na, k):
    def kernel(XT_ref, SQ_ref, XR_ref, out_ref, vout_ref):
        i = pl.program_id(0)
        XT = XT_ref[:]
        XB = XT_ref[:, pl.ds(i * RB, RB)]
        G = jax.lax.dot_general(
            XB, XT, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        sq_j = SQ_ref[0:1, :]
        sq_i = XR_ref[:, 3:4]
        thr_i = XR_ref[:, 4:5]
        Dsq = jnp.maximum(sq_i + sq_j - 2.0 * G, 0.0)

        rows = i * RB + jax.lax.broadcasted_iota(jnp.int32, (RB, na), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (RB, na), 1)
        delta = jnp.abs(cols - rows)
        inband = jnp.minimum(delta, na - delta) <= HALF  # cyclic, like the rolls
        dup = (rows == cols) | (Dsq < 1e-4)
        masked = Dsq + PUSH * dup.astype(jnp.float32)

        # per-row TIGHTENED threshold by value bisection (round 3): the
        # band's 64th-smallest is a valid but LOOSE upper bound — at
        # Morton discontinuities it admits ~300 off-band candidates per
        # row and their argmin-knockout dominated the kernel (40 ms vs
        # 27.5 exact-XLA, round-3 note). 16 bisection steps of a full-row
        # count tighten hi to within (band_thr/2^16) of the row's true
        # k-th smallest masked value; the invariant count(masked<=hi)>=k
        # holds at every step, so hi >= true k-th and exactness is
        # preserved. The early variant of this idea hung the remote
        # compiler — root cause was the default 16M scoped-vmem budget
        # (see ops/geometric_pallas.py docstring), not the bisection.
        def bis(_, carry):
            lo, hi = carry
            t = 0.5 * (lo + hi)
            cnt = jnp.sum((masked <= t).astype(jnp.int32), axis=1, keepdims=True)
            ge = cnt >= k
            return jnp.where(ge, lo, t), jnp.where(ge, t, hi)

        lo0 = jnp.zeros((RB, 1), jnp.float32)
        _, hi = jax.lax.fori_loop(0, 16, bis, (lo0, thr_i + MARGIN))

        # MARGIN guards the Gram-vs-displacement cancellation skew when
        # compacted (Gram) values are merged against band (displacement)
        # values downstream
        alive_all = (masked <= (hi + MARGIN)) & (~inband)
        val_all = jnp.where(alive_all, masked, BIG)

        # per-block max valid Dsq (for the global dup-feature distance)
        valid_pair = (sq_j < 1e11) & (thr_i > 0)
        bmax = jnp.max(jnp.where(valid_pair & ~dup, Dsq, -1.0))

        def run(scr):
            scr[:] = val_all
            lane = jax.lax.broadcasted_iota(jnp.int32, (RB, 128), 1)
            slot = jax.lax.broadcasted_iota(jnp.int32, (RB, W), 1)

            def chunk_body(c, carry):
                cnt, acc, vacc = carry
                val0 = scr[:, pl.ds(c * 128, 128)]
                maxcnt = jnp.max(jnp.sum((val0 < BIGHALF).astype(jnp.int32), axis=1))

                def knock(_, st):
                    cnt, acc, vacc, val = st
                    m = jnp.min(val, axis=1, keepdims=True)
                    has = m < BIGHALF
                    loc = jnp.min(
                        jnp.where(val <= m, lane, 10 ** 6), axis=1, keepdims=True
                    )
                    gid = c * 128 + loc
                    hot = (slot == cnt) & has
                    acc = acc + jnp.where(hot, gid, 0)
                    vacc = jnp.where(hot, m, vacc)
                    cnt = cnt + has.astype(jnp.int32)
                    val = jnp.where(lane == loc, BIG, val)
                    return cnt, acc, vacc, val

                cnt, acc, vacc, _ = jax.lax.fori_loop(
                    0, maxcnt, knock, (cnt, acc, vacc, val0)
                )
                return cnt, acc, vacc

            cnt, acc, vacc = jax.lax.fori_loop(
                0, na // 128, chunk_body,
                (jnp.zeros((RB, 1), jnp.int32), jnp.zeros((RB, W), jnp.int32),
                 jnp.full((RB, W), BIG, jnp.float32)),
            )
            out_ref[:, :W] = acc
            out_ref[:, W : W + 128] = jnp.broadcast_to(cnt, (RB, 128))
            out_ref[:, W + 128 :] = jnp.broadcast_to(
                jax.lax.bitcast_convert_type(
                    jnp.broadcast_to(bmax, (RB, 1)), jnp.int32
                ),
                (RB, 128),
            )
            vout_ref[:] = vacc

        pl.run_scoped(run, pltpu.VMEM((RB, na), jnp.float32))

    return kernel


def knn_candidates(Xp, atom_mask, k=64):
    """-> (cand_ids [NA, 2*HALF + W], cand_vals (masked Dsq), overflow,
    Dmax) on a padded Morton-sorted structure. cand_vals carry the
    reference's masked semantics (dup/self pushed by PUSH; invalid BIG).
    """
    NA = Xp.shape[0]
    assert NA % RB == 0 and NA >= 2 * HALF + RB, NA
    mask = atom_mask.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    center = jnp.sum(Xp * mask[:, None], axis=0) / n_valid
    Xc = jnp.where(mask[:, None] > 0, Xp - center, 1e6)
    sq = jnp.sum(Xc * Xc, axis=-1)

    offs = np.array([w for w in range(-HALF, HALF + 1) if w != 0], np.int32)
    rows_ = jnp.arange(NA, dtype=jnp.int32)[:, None]
    band_ids = (rows_ + offs[None, :]) % NA
    Xr = jnp.stack([jnp.roll(Xc, -int(w), axis=0) for w in offs], axis=1)
    dsq_w = jnp.sum((Xr - Xc[:, None, :]) ** 2, axis=-1)
    mr = jnp.stack([jnp.roll(mask, -int(w), axis=0) for w in offs], axis=1)
    mb = mr * mask[:, None]
    mw = jnp.where(mb > 0, dsq_w + PUSH * (dsq_w < 1e-4).astype(jnp.float32), BIG)
    neg = jax.lax.top_k(-mw, k)[0]
    thr = jnp.where(mask > 0, -neg[:, k - 1], -1.0)
    # the Gram-vs-displacement cancellation skew scales with |Xc|^2 (even
    # after centering): for very large structures (~1000 A capsids) the
    # fixed MARGIN=1e-2 under-covers it, so fold the structure-dependent
    # excess into the per-row threshold (exactness-preserving: a LARGER
    # threshold only admits more candidates)
    gram_eps = 1.2e-7 * 8.0 * jnp.max(jnp.where(mask > 0, sq, 0.0))
    thr = jnp.where(mask > 0, thr + jnp.maximum(gram_eps - MARGIN, 0.0), thr)

    XT = jnp.zeros((8, NA), jnp.float32).at[0:3, :].set(Xc.T)
    SQ = jnp.zeros((8, NA), jnp.float32).at[0, :].set(sq)
    XR = jnp.zeros((NA, 128), jnp.float32)
    XR = XR.at[:, 0:3].set(Xc).at[:, 3].set(sq).at[:, 4].set(thr)

    # off-TPU (tests, CPU virtual meshes) the kernel runs in the Pallas
    # interpreter — slow but semantically identical, so the contract is
    # testable without hardware
    interpret = jax.default_backend() != "tpu"
    out, vout = pl.pallas_call(
        _kernel(NA, k),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the default 16M scoped-vmem budget makes the remote compile
            # helper die with an opaque HTTP-500 once the [RB, na] f32
            # working set + transients exceed it (root-caused round 3,
            # see ops/geometric_pallas.py)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        grid=(NA // RB,),
        out_shape=(jax.ShapeDtypeStruct((NA, W + 256), jnp.int32),
                   jax.ShapeDtypeStruct((NA, W), jnp.float32)),
        in_specs=[
            pl.BlockSpec((8, NA), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NA), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RB, W + 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(XT, SQ, XR)
    cand, cnt = out[:, :W], out[:, W]
    bmax_bits = out[::RB, W + 128]
    Dsq_max = jnp.max(jax.lax.bitcast_convert_type(bmax_bits, jnp.float32))
    overflow = jnp.max(jnp.where(mask > 0, cnt, 0)) > W
    # n <= k structures: the exact/reference path fills missing slots with
    # the dup-pushed SELF candidate, which the band (w != 0) and the
    # compaction (~inband) both exclude — force the exact fallback instead
    # of silently diverging
    overflow = overflow | (n_valid <= k)
    vout = jnp.where(mask[:, None] > 0, vout, BIG)

    vals = jnp.concatenate([mw, vout], axis=1)
    ids = jnp.concatenate([band_ids, cand], axis=1)
    return ids.astype(jnp.int32), vals, overflow, Dsq_max


def knn_select(ids, vals, mask, k):
    """Lexicographic (value, id) top-k over the candidate columns."""
    svals, sids = jax.lax.sort((vals, ids), dimension=1, num_keys=2)
    svals, sids = svals[:, :k], sids[:, :k]
    ok = (svals < BIGHALF) & (mask[:, None] > 0)
    return jnp.where(ok, sids, 0).astype(jnp.int32), ok
