"""Device-side geometry: kNN topology and contact detection (JAX/XLA).

TPU-first re-design of the reference's dense N^2 topology extraction
(reference src/data_encoding.py:87-102) and contact finder (:116-167):

  - works on *padded* arrays with an atom-validity mask, so every shape is
    static and one compile per size bucket serves all structures;
  - the padded layout bakes in the reference's "sink" convention: row 0 is
    the sink/padding slot, real atoms live at rows 1..n, and neighbor ids
    are already indices into the padded array (so the reference's "+1
    index shift" in collate_batch_features happens for free);
  - row-blocked distance computation (lax.map over row tiles) keeps peak
    memory at O(block * NA) instead of O(NA^2) for large buckets.

Semantics matched to the reference:
  - near-duplicate distances (< 1e-2 A) are pushed to max(D) before the
    top-k, reproducing the self-distance masking trick
    (src/data_encoding.py:93);
  - neighbor slots beyond the number of real candidates resolve to the
    sink id 0, like the zero-padding in collate_batch_features
    (src/dataset.py:100-110).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# sentinel distance for invalid pairs; large but far from f32 overflow
_BIG = jnp.float32(1e10)


def _finish_topology(Xp, ids, ok, Dmax):
    """Shared neighbor finalization (reference unpack semantics): exact
    distances for the selected ids, duplicate-distance push by Dmax
    (src/data_encoding.py:93), invalid-slot zeroing, unit displacements.
    Used by both the exact-XLA tail and the Pallas path — the d<1e-2
    masking semantics must never drift between them."""
    r_top = jnp.take(Xp, ids, axis=0, mode="clip") - Xp[:, None, :]
    d_top = jnp.sqrt(jnp.maximum(jnp.sum(r_top * r_top, axis=-1), 0.0))
    d_top = d_top + Dmax * (d_top < 1e-2).astype(d_top.dtype)
    d_top = jnp.where(ok, d_top, 0.0)
    r_top = jnp.where(ok[..., None], r_top / jnp.maximum(d_top, 1e-12)[..., None], 0.0)
    return ids, d_top, r_top


def _knn_pallas_parts(Xp, atom_mask, k):
    """Run the threshold-compaction kernel and finish the topology
    (distances + unit displacements). Returns ((ids, D, R), overflow) or
    None when the bucket shape is outside the kernel's envelope. The
    overflow flag is returned, not branched on — callers pick the cond
    granularity (per structure, or one scalar across a batch)."""
    from .ops.knn_pallas import HALF, RB, knn_candidates, knn_select

    NA = Xp.shape[0]
    if not (NA % RB == 0 and NA >= 2 * HALF + RB and k <= 2 * HALF):
        return None
    cand_ids, cand_vals, overflow, dsq_max = knn_candidates(Xp, atom_mask, k=k)
    ids, ok = knn_select(cand_ids, cand_vals, atom_mask.astype(jnp.float32), k)
    Dmax = jnp.sqrt(jnp.maximum(dsq_max, 0.0))
    return _finish_topology(Xp, ids, ok, Dmax), overflow


@functools.partial(jax.jit, static_argnames=("k", "method", "with_overflow",
                                             "exact2_slack"))
def knn_topology_batch(Xb: jax.Array, atom_mask_b: jax.Array, k: int = 64,
                       method: str = "exact", with_overflow: bool = False,
                       exact2_slack: int = 192):
    """Batched kNN topology [B, NA, ...] -> ([B, NA, k], ...).

    For method="pallas" and method="exact2" this exists for a semantic
    reason, not convenience: vmapping knn_topology would batch the
    per-structure overflow predicate, turning its lax.cond into a select
    that runs the fast path AND the full exact path for every batch.
    Here the fast path vmaps and ONE scalar cond (any structure
    overflowed) picks the exact path for the whole batch — overflow is
    rare (W=384 covers the measured Morton-discontinuity tails; exact2's
    candidate slack covers every row with >= k real neighbors, and its
    count-based underflow guard fires only when the backend's
    PartialReduce returns lossy values), so the common case runs the
    fast path alone.

    with_overflow=True appends the scalar bool fallback flag to the
    returned tuple (always False for exact/fast) — serving telemetry
    counts how often the exact2/pallas candidate construction overflowed
    and the batch silently re-ran the plain exact path."""
    ovf_flag = jnp.asarray(False)
    if method == "exact2":
        parts = jax.vmap(lambda X, am: _knn_core(X, am, k, None, "exact2",
                                             exact2_slack))(
            Xb, atom_mask_b
        )
        ids, ok, Dmax, ovf = parts
        exact = lambda _: jax.vmap(  # noqa: E731
            lambda X, am: knn_topology(X, am, k=k, method="exact")
        )(Xb, atom_mask_b)
        ovf_flag = jnp.any(ovf)
        out = jax.lax.cond(
            ovf_flag,
            exact,
            lambda _: jax.vmap(_finish_topology)(Xb, ids, ok, Dmax),
            operand=None,
        )
        return out + (ovf_flag,) if with_overflow else out
    if method == "pallas":
        from .ops.knn_pallas import HALF, RB

        NA = Xb.shape[1]
        if NA % RB == 0 and NA >= 2 * HALF + RB and k <= 2 * HALF:
            (ids_p, d_p, r_p), overflow = jax.vmap(
                lambda X, am: _knn_pallas_parts(X, am, k)
            )(Xb, atom_mask_b)
            exact = lambda _: jax.vmap(  # noqa: E731
                lambda X, am: knn_topology(X, am, k=k, method="exact")
            )(Xb, atom_mask_b)
            ovf_flag = jnp.any(overflow)
            out = jax.lax.cond(
                ovf_flag,
                exact,
                lambda _: (ids_p, d_p, r_p),
                operand=None,
            )
            return out + (ovf_flag,) if with_overflow else out
        method = "exact"
    out = jax.vmap(lambda X, am: knn_topology(X, am, k=k, method=method))(
        Xb, atom_mask_b
    )
    return out + (ovf_flag,) if with_overflow else out


@functools.partial(jax.jit, static_argnames=("k", "row_block", "method",
                                             "exact2_slack"))
def knn_topology(
    Xp: jax.Array,
    atom_mask: jax.Array,
    k: int = 64,
    row_block: Optional[int] = None,
    method: str = "exact",
    exact2_slack: int = 192,
):
    """Top-k nearest-neighbor topology on a padded structure.

    MXU formulation: squared distances via the Gram matrix
    (|xi|^2 + |xj|^2 - 2 xi.xj, one [NA,3]x[3,NA] matmul per row block)
    instead of materializing the [NA, NA, 3] displacement tensor; top-k
    selects on squared distances (order-equivalent), and exact distances /
    unit displacements are recomputed only for the selected neighbors.

    Args:
      Xp:        [NA, 3] float32 padded coordinates; row 0 is the sink.
      atom_mask: [NA] float32/bool, 1 for real atoms (rows 1..n), 0 for the
                 sink row and padding rows.
      k:         number of neighbors (reference uses 64).
      row_block: row tile size for the blocked distance computation.
      method:    "exact" (reference-parity lax.top_k), "fast"
                 (ApproxTopK partial reduce + packed-key top-k; ~99.2%
                 neighbor-set agreement on protein-density clouds, far-tail
                 swaps only; ~3x faster selection — see the fast branch),
                 or "exact2" (EXACT results, count-VERIFIED per run:
                 partial-reduce threshold proposal + values-only candidate
                 compaction + tiny re-sort, with the ball counted on TRUE
                 distances; thresholds that over- OR under-shoot raise a
                 scalar flag and the structure re-runs the plain exact
                 path — see the exact2 branch).
                 Fast-mode tested contract (tests/test_topology.py
                 property cases): the exact top-32 PREFIX is never
                 dropped, and worst-case per-row neighbor-set recall on
                 adversarial geometries is >= 0.875 (regular lattice,
                 maximal ties), >= 0.984 (dense cluster + far outliers),
                 1.0 (colinear chain). Caveat: those properties are
                 proven under CPU lowering, where approx_max_k is exact
                 top_k, so they say nothing about the TPU PartialReduce's
                 recall; the on-chip guarantee is the MEASURED 99.2%
                 neighbor agreement and 0.003 median-AUC delta on
                 pdbs_test. fast is approximate by contract either way;
                 exact2's count guard is what restores exactness when
                 it matters. exact2 is bit-identical to exact
                 on every geometry (the fallback guarantees it).

    Returns:
      ids_topk:  [NA, k] int32 neighbor ids into the padded array; invalid
                 slots (and all slots of invalid rows) are 0 (the sink).
      D_topk:    [NA, k] float32 neighbor distances (0 for invalid slots).
      R_topk:    [NA, k, 3] float32 unit displacement vectors (0 invalid).
    """
    NA = Xp.shape[0]
    if method == "pallas":
        # threshold-compaction Pallas kernel (ops/knn_pallas.py): exact.
        # Requires a Morton-ordered padded layout for speed (NOT
        # correctness: rows whose off-band candidate set overflows W fall
        # back to the exact XLA path for the whole structure via a
        # SCALAR-predicate lax.cond — under vmap a per-structure cond
        # degenerates to select and runs BOTH paths, so batched callers
        # must use knn_topology_batch, which hoists one cond over the
        # whole batch). Small buckets use the exact path directly.
        parts = _knn_pallas_parts(Xp, atom_mask, k)
        if parts is not None:
            (ids_p, d_p, r_p), overflow = parts
            return jax.lax.cond(
                overflow,
                lambda _: knn_topology(Xp, atom_mask, k=k, row_block=row_block,
                                       method="exact"),
                lambda _: (ids_p, d_p, r_p),
                operand=None,
            )
        method = "exact"
    ids, ok, Dmax, ovf = _knn_core(Xp, atom_mask, k, row_block, method,
                                   exact2_slack)
    if method == "exact2":
        return jax.lax.cond(
            ovf,
            lambda _: knn_topology(Xp, atom_mask, k=k, row_block=row_block,
                                   method="exact"),
            lambda _: _finish_topology(Xp, ids, ok, Dmax),
            operand=None,
        )
    return _finish_topology(Xp, ids, ok, Dmax)


def _knn_core(Xp, atom_mask, k, row_block, method, exact2_slack=192):
    """Blocked distance computation + top-k selection (no finalization).

    Returns (ids [NA,k] int32, ok [NA,k] bool, Dmax scalar, overflow
    scalar bool). overflow is always False for "exact"/"fast"; for
    "exact2" it means at least one valid row's candidate set outgrew the
    slack and the caller must re-run the exact path."""
    NA = Xp.shape[0]
    if row_block is None:
        # one shot when the [row_block, NA] distance block fits comfortably
        # (<= ~256 MB); larger structures process in row blocks via lax.map
        row_block = min(NA, max(512, ((256 << 20) // (4 * NA)) // 512 * 512))
    mask = atom_mask.astype(jnp.float32)
    valid_col = mask[None, :]  # [1, NA]
    prec = jax.lax.Precision.HIGHEST

    # center on valid atoms to minimize cancellation in the Gram form
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    center = jnp.sum(Xp * mask[:, None], axis=0) / n_valid
    Xc = (Xp - center) * mask[:, None]
    sq = jnp.sum(Xc * Xc, axis=-1)  # [NA]

    nb = (NA + row_block - 1) // row_block
    pad_rows = nb * row_block - NA
    Xb = jnp.pad(Xc, ((0, pad_rows), (0, 0))).reshape(nb, row_block, 3)
    Sb = jnp.pad(sq, (0, pad_rows)).reshape(nb, row_block)
    Mb = jnp.pad(mask, (0, pad_rows)).reshape(nb, row_block)
    Ob = jnp.arange(nb, dtype=jnp.int32) * row_block  # global row offsets

    def block_dsq(xb, sb, mb):
        G = jnp.dot(xb, Xc.T, precision=prec)          # [rb, NA] on the MXU
        Dsq = jnp.maximum(sb[:, None] + sq[None, :] - 2.0 * G, 0.0)
        pair_ok = (mb[:, None] * valid_col) > 0
        return Dsq, pair_ok

    def block_dup(Dsq, ob):
        """Self/duplicate mask for one row block. The diagonal is masked
        STRUCTURALLY: the Gram form's cancellation noise (~|X|^2 * eps,
        i.e. ~1e-4 in Dsq) sits exactly at the reference's d < 1e-2
        threshold, so a value test alone can leak an atom's own row into
        its neighbor list and shift every slot (measured: ~5% of rows)."""
        rb = Dsq.shape[0]
        rows = ob + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, NA), 1)
        return (rows == cols) | (Dsq < 1e-4)

    # Duplicate pairs are pushed behind every real candidate but ahead of
    # invalid ones. A STATIC push value keeps this a single pass over the
    # distance matrix (a data-dependent Dmax+1 would need its own full
    # pass first — measured ~4 ms at 8k atoms); selection order is
    # identical for any push in (max real Dsq, _BIG): real Dsq is bounded
    # by the PDB coordinate field (|x| < 1e4 A => Dsq < ~1.6e9 after
    # centering; in practice << 1e8). The final *feature* value for
    # duplicate slots still uses the exact global Dmax (reference
    # src/data_encoding.py:93), computed below from the selected and
    # rejected candidates in the same pass.
    _PUSH = jnp.float32(4e9)

    # Blocked top-k on masked squared distances (order-equivalent to the
    # reference's D + Dmax*(D<1e-2) masking on true distances). The exact
    # path uses a two-level CHUNKED top-k: XLA's TopK cost is element-
    # bound (~4-5 Gelem/s on v5e, independent of k and dtype), but
    # narrower rows run faster per element — splitting each row into
    # W-wide chunks (L1), then reducing the per-chunk winners (L2), is
    # exact (every global top-k member is a top-k member of its chunk):
    # measured 19 ms vs 45 ms for the direct [8192, 8192] top-k on v5e.
    W = 512
    n_chunks = NA // W if (NA % W == 0 and NA // W >= 2) else 1

    def block_topk(xb, sb, mb, ob):
        """Returns (ids [rb,k] int32, ok [rb,k] bool, block Dsq max,
        block overflow bool)."""
        Dsq, pair_ok = block_dsq(xb, sb, mb)
        bmax = jnp.max(jnp.where(pair_ok, Dsq, -jnp.inf))
        Dsq = Dsq + _PUSH * block_dup(Dsq, ob).astype(Dsq.dtype)
        Dsq = jnp.where(pair_ok, Dsq, _BIG)
        rb = Dsq.shape[0]
        ovf = jnp.asarray(False)
        if method == "exact2" and n_chunks > 1:
            # EXACT selection at near-"fast" cost — with the exactness
            # CHECKED against true distances, not assumed. A partial
            # tournament reduce (aggregate_to_topk=False) proposes a
            # threshold thr (its k-th best value); the ball
            # {Dsq <= thr}, measured on the TRUE pushed distances,
            # contains every true top-k member IFF it has >= k members
            # (cnt >= k <=> thr >= the true k-th smallest Dsq). Both
            # failure directions raise the same scalar overflow flag and
            # the CALLER re-runs the plain exact path for the whole
            # structure/batch:
            #   cnt > kk — ball outgrew the candidate slack (>= slack
            #     f32-identical ties at thr, or rows with < k real
            #     candidates where thr lands in the pushed-duplicate/
            #     invalid clusters);
            #   cnt < k — thr undershot the true k-th distance. Never
            #     observed: CPU's approx_max_k lowers to exact top_k,
            #     and the on-chip probe (scripts/
            #     exp_partialreduce_subset.py, round 4) measured TPU's
            #     PartialReduce as an exact value-subset too (100% of
            #     entries, 0% undershoot at k=64). The guard exists so
            #     exactness is a CHECKED invariant on any backend
            #     rather than an argument about lowering behavior —
            #     the CPU regression test simulates a lossy backend by
            #     monkeypatching approx_max_k and the fallback fires.
            # The ball is compacted with values-only int top-ks (column
            # ids as keys — XLA's TopK with index tracking used to cost
            # ~3x a values-only pass on these shapes) and re-sorted by
            # true Dsq. Tie order matches "exact": candidates come out
            # in ascending column order and the final stable top_k picks
            # the earliest column among equal Dsq.
            L = min(k + 32, NA)
            neg_part = jax.lax.approx_max_k(
                jax.lax.optimization_barrier(-Dsq), L,
                recall_target=0.95, aggregate_to_topk=False,
            )[0]
            kth = min(k, neg_part.shape[1])
            thr = -jax.lax.top_k(neg_part, kth)[0][:, -1]
            kk = min(k + exact2_slack, NA)
            in_ball = Dsq <= thr[:, None]
            cols = jax.lax.broadcasted_iota(jnp.int32, (rb, NA), 1)
            keys = jnp.where(in_ball, cols, jnp.int32(NA))
            kc2 = min(kk, W)
            c1 = jax.lax.top_k(-keys.reshape(rb * n_chunks, W), kc2)[0]
            cand = -jax.lax.top_k(c1.reshape(rb, n_chunks * kc2), kk)[0]
            cnt = jnp.sum(in_ball, axis=1)
            ovf = jnp.any((mb > 0) & ((cnt > kk) | (cnt < min(k, NA))))
            dc = jnp.take_along_axis(Dsq, jnp.clip(cand, 0, NA - 1), axis=1)
            dc = jnp.where(cand >= NA, _BIG, dc)
            neg_top, i2 = jax.lax.top_k(-dc, k)  # [rb, kk] — tiny
            ids = jnp.take_along_axis(cand, i2, axis=1)
        elif method == "fast" and NA > 2 * k:
            # ApproxTopK PARTIAL reduce (aggregate_to_topk=False) is a
            # single cheap tournament pass (~1.5 ms at 8k); XLA's own
            # aggregation re-runs a full-width top-k WITH index tracking,
            # which costs ~3x a values-only top-k. So aggregate manually:
            # pack (quantized Dsq | candidate slot) into one int32 key and
            # select values-only; the index rides in the low bits.
            # the barrier keeps XLA from fusing the distance computation
            # into the PartialReduce, which changes its internal binning
            # and measurably degrades recall (99.2% -> 95.5% observed)
            neg_c, cand = jax.lax.approx_max_k(
                jax.lax.optimization_barrier(-Dsq),
                min(k + 32, NA), recall_target=0.95, aggregate_to_topk=False,
            )
            L = neg_c.shape[1]
            shift = max((L - 1).bit_length(), 1)  # slot bits
            q = jax.lax.bitcast_convert_type(-neg_c, jnp.int32)  # Dsq>=0: monotone
            slots = jax.lax.broadcasted_iota(jnp.int32, (rb, L), 1)
            keys = (q & jnp.int32(-(1 << shift))) | slots
            top = jax.lax.top_k(jnp.int32(0x7FFFFFFF) - keys, min(k, L))[0]
            dec = jnp.int32(0x7FFFFFFF) - top
            sel = dec & jnp.int32((1 << shift) - 1)
            neg_top = -jax.lax.bitcast_convert_type(
                dec & jnp.int32(-(1 << shift)), jnp.float32
            )
            ids = jnp.take_along_axis(cand, sel, axis=1, mode="clip")
            if ids.shape[1] < k:  # tiny-L corner: pad like the exact path
                pad = k - ids.shape[1]
                ids = jnp.pad(ids, ((0, 0), (0, pad)))
                neg_top = jnp.pad(neg_top, ((0, 0), (0, pad)), constant_values=-_BIG)
        elif n_chunks > 1:
            kc = min(k, W)
            v1, i1 = jax.lax.top_k(-Dsq.reshape(rb * n_chunks, W), kc)
            gl = i1.reshape(rb, n_chunks, kc) + (jnp.arange(n_chunks) * W)[None, :, None]
            neg_top, i2 = jax.lax.top_k(v1.reshape(rb, n_chunks * kc), k)
            ids = jnp.take_along_axis(gl.reshape(rb, n_chunks * kc), i2, axis=1, mode="clip")
        else:
            neg_top, ids = jax.lax.top_k(-Dsq, k)
        ok = -neg_top < (_BIG * 0.5)
        return jnp.where(ok, ids, 0).astype(jnp.int32), ok, bmax, ovf

    ids, ok, bmaxes, ovfs = jax.lax.map(
        lambda a: block_topk(*a), (Xb, Sb, Mb, Ob)
    )
    ids = ids.reshape(nb * row_block, k)[:NA]
    ok = ok.reshape(nb * row_block, k)[:NA]
    Dmax = jnp.sqrt(jnp.maximum(jnp.max(bmaxes), 0.0)).astype(jnp.float32)
    # exact distances / unit displacements happen in _finish_topology,
    # with the reference's self/duplicate masking (src/data_encoding.py:93)
    return ids, ok, Dmax, jnp.any(ovfs)


def extract_topology(X: np.ndarray, num_nn: int = 64):
    """Reference-compatible topology on an *unpadded* structure.

    Mirrors src/data_encoding.py:87-102: returns 0-based neighbor ids into
    X (not the padded/sink convention), with k = min(num_nn, N).
    Intended for host-side dataset construction and tests.
    """
    X = np.asarray(X, dtype=np.float32)
    n = X.shape[0]
    k = min(num_nn, n)
    NA = n + 1
    Xp = np.zeros((NA, 3), dtype=np.float32)
    Xp[1:] = X
    mask = np.zeros(NA, dtype=np.float32)
    mask[1:] = 1.0
    ids, d, r = knn_topology(jnp.asarray(Xp), jnp.asarray(mask), k=k)
    ids = np.asarray(ids)[1:] - 1  # back to 0-based raw indexing
    ids = np.clip(ids, 0, n - 1)
    return ids.astype(np.int64), np.asarray(d)[1:], np.asarray(r)[1:]


@functools.partial(jax.jit, static_argnames=())
def _pairwise_contact_mask(Xi, Xj, r_thr):
    D = jnp.sqrt(jnp.sum((Xi[:, None, :] - Xj[None, :, :]) ** 2, axis=-1))
    return D, D < r_thr


def locate_contacts(xyz_i: np.ndarray, xyz_j: np.ndarray, r_thr: float):
    """Find inter-subunit atom pairs within r_thr (reference
    src/data_encoding.py:116-135). Returns (ids_i, ids_j, d_ij) numpy."""
    Xi = jnp.asarray(np.asarray(xyz_i, dtype=np.float32))
    Xj = jnp.asarray(np.asarray(xyz_j, dtype=np.float32))
    D, m = _pairwise_contact_mask(Xi, Xj, jnp.float32(r_thr))
    m = np.asarray(m)
    ids_i, ids_j = np.where(m)
    d_ij = np.asarray(D)[ids_i, ids_j]
    return ids_i, ids_j, d_ij


def extract_all_contacts(subunits: dict, r_thr: float = 5.0) -> dict:
    """All pairwise inter-subunit contacts, both directions
    (reference src/data_encoding.py:138-167)."""
    snames = list(subunits)
    contacts = {}
    for i in range(len(snames)):
        cid_i = snames[i]
        for j in range(i + 1, len(snames)):
            cid_j = snames[j]
            ids_i, ids_j, d_ij = locate_contacts(
                subunits[cid_i]["xyz"], subunits[cid_j]["xyz"], r_thr
            )
            if ids_i.shape[0] > 0:
                contacts.setdefault(cid_i, {})[cid_j] = {
                    "ids": np.stack([ids_i, ids_j], axis=1),
                    "d": d_ij,
                }
                contacts.setdefault(cid_j, {})[cid_i] = {
                    "ids": np.stack([ids_j, ids_i], axis=1),
                    "d": d_ij,
                }
    return contacts
