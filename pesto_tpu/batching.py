"""Padding, size-bucketing and batch collation.

The TPU replacement for the reference's ragged concatenation + sink-offset
collation (src/dataset.py:91-112): instead of concatenating variable-size
structures into one ragged batch, every structure is padded into a fixed
(atom-bucket, residue-bucket) shape with

  - row 0 = the sink slot (exactly the reference's zero-padding target for
    missing neighbors),
  - rows 1..n = real atoms,
  - rows n+1.. = padding, handled identically to the sink by masking.

Batches are stacks of same-bucket structures; the model is vmapped over the
leading batch axis. One XLA compilation per bucket shape serves every
structure that falls in the bucket.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import encode_features, encode_structure
from .topology import knn_topology

# default bucket ladders (atoms include the +1 sink row). The reference
# hard-caps structures at 8192 atoms (model/config.py:12); the ladder
# extends beyond it — large buckets validated on-chip, and the atom axis
# can also shard across devices (parallel/sp.py).
# mega buckets (65k/131k atoms, 16k residues) serve structures far beyond
# the reference's 8192-atom cap; warmup() skips them by default and
# predict_structure_sp shards their atom axis over a mesh
ATOM_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 8448, 16384, 32768, 65536, 131072)
RES_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)
NUM_NN = 64


def pick_bucket(n: int, ladder) -> int:
    for b in ladder:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {ladder[-1]}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PaddedStructure:
    """A structure padded to static shapes. May carry a leading batch dim."""

    X: jax.Array          # [NA, 3] coords; row 0 sink, rows 1..n real
    ids_topk: jax.Array   # [NA, K] int32 neighbor ids into padded rows (0 = sink)
    q: jax.Array          # [NA, F] input features (0 on sink/padding rows)
    M: jax.Array          # [NA, NR] residue membership mask (0 on sink/pad)
    atom_mask: jax.Array  # [NA] 1.0 for real atoms
    res_mask: jax.Array   # [NR] 1.0 for real residues
    y: Optional[jax.Array] = None  # [NR, C] labels (training only)
    # one-hot gather tables (spatial.build_gather_tables; Morton-sorted
    # layouts only): per-tile candidate rows + tile-local neighbor indices
    gather_cand: Optional[jax.Array] = None  # [T, U] int32
    gather_loc: Optional[jax.Array] = None   # [NA, K] int32

    @property
    def num_atoms(self):
        return jnp.sum(self.atom_mask, axis=-1).astype(jnp.int32)


def pad_structure_arrays(
    X: np.ndarray,
    q: np.ndarray,
    M: np.ndarray,
    na: Optional[int] = None,
    nr: Optional[int] = None,
    y: Optional[np.ndarray] = None,
    ids_topk_raw: Optional[np.ndarray] = None,
    num_nn: int = NUM_NN,
    compact: bool = False,
) -> PaddedStructure:
    """Pad unpadded (X [n,3], q [n,F], M [n,r]) into a PaddedStructure.

    If ids_topk_raw (0-based raw neighbor ids, [n, k<=num_nn]) is given it
    is shifted into the padded/sink convention; otherwise ids are computed
    on device afterwards via compute_topology().

    compact=True ships q and M as per-atom integer CODES ([NA] int32:
    vocab index / residue index; sink+pad rows carry the out-of-range
    code so jax.nn.one_hot yields their zero rows) instead of dense
    one-hots — the model expands them on device (models/pesto.py compact
    path). The dense M alone is NAxNR f32 (33 MB per 8k structure), the
    dominant host pad + host->device transfer cost in training; valid
    whenever q is a single vocabulary one-hot (element-only models).
    """
    n, r = X.shape[0], M.shape[1]
    na = na or pick_bucket(n + 1, ATOM_BUCKETS)
    nr = nr or pick_bucket(r, RES_BUCKETS)
    if n + 1 > na or r > nr:
        raise ValueError(f"structure ({n} atoms, {r} res) exceeds bucket ({na},{nr})")

    Xp = np.zeros((na, 3), dtype=np.float32)
    Xp[1 : n + 1] = X
    if compact:
        # out-of-range codes (F / nr) one_hot to all-zero rows — exactly
        # the dense padding; real rows have exactly one 1 by construction
        qp = np.full(na, q.shape[1], dtype=np.int32)
        qp[1 : n + 1] = np.argmax(q, axis=1)
        Mp = np.full(na, nr, dtype=np.int32)
        Mp[1 : n + 1] = np.argmax(M, axis=1)
    else:
        qp = np.zeros((na, q.shape[1]), dtype=np.float32)
        qp[1 : n + 1] = q
        Mp = np.zeros((na, nr), dtype=np.float32)
        Mp[1 : n + 1, :r] = M
    am = np.zeros(na, dtype=np.float32)
    am[1 : n + 1] = 1.0
    rm = np.zeros(nr, dtype=np.float32)
    rm[:r] = 1.0

    ids = np.zeros((na, num_nn), dtype=np.int32)
    if ids_topk_raw is not None:
        k = ids_topk_raw.shape[1]
        ids[1 : n + 1, :k] = ids_topk_raw + 1  # raw 0-based -> padded rows

    yp = None
    if y is not None:
        yp = np.zeros((nr, y.shape[1]), dtype=np.float32)
        yp[:r] = y

    # numpy-backed on purpose: padding runs on the host (often in loader
    # worker PROCESSES that must never touch jax); jit/device_put converts
    # at the device boundary, so downstream consumers see no difference
    return PaddedStructure(
        X=Xp, ids_topk=ids, q=qp, M=Mp, atom_mask=am, res_mask=rm, y=yp,
    )


def compute_topology(ps: PaddedStructure, k: int = NUM_NN, method: str = "exact") -> PaddedStructure:
    """Fill ids_topk on device (one jit per bucket shape)."""
    ids, _, _ = knn_topology(ps.X, ps.atom_mask, k=k, method=method)
    return dataclasses.replace(ps, ids_topk=ids)


def attach_gather_tables(ps: PaddedStructure, u_fixed: Optional[int] = None) -> PaddedStructure:
    """Build tile-local one-hot gather tables from ids_topk (host-side).

    Meaningful on spatially sorted layouts (encode_and_pad spatial_sort);
    returns ps unchanged when a tile's candidate count exceeds the table
    budget (the model then falls back to the plain gather). Pass u_fixed
    when structures will be stacked into batches (tables must share U)."""
    from .spatial import build_gather_tables

    ids = np.asarray(ps.ids_topk)
    cand, loc = build_gather_tables(ids, ids.shape[0], u_fixed=u_fixed)
    if cand is None:
        return ps
    # numpy-backed (host path); jit/device_put converts at the boundary
    return dataclasses.replace(ps, gather_cand=cand, gather_loc=loc)


def encode_and_pad(
    structure: dict,
    feature_flags=(True, False, False),
    na: Optional[int] = None,
    nr: Optional[int] = None,
    with_topology: bool = True,
    knn_method: str = "exact",
    spatial_sort: bool = False,
    with_gather_tables: bool = False,
    gather_u: int = 1024,
) -> PaddedStructure:
    """Full host path: structure record -> padded device arrays.

    feature_flags selects (qe, qr, qn) like the reference data handler
    (model/data_handler.py:37-43); the flagship models use element-only.

    spatial_sort reorders atoms along a Morton curve (residue outputs are
    invariant to atom order up to fp summation); with_gather_tables also
    attaches the tile-local one-hot gather tables (implies spatial_sort).
    """
    X, M = encode_structure(structure)
    feats = encode_features(structure)
    q = np.concatenate([f for f, flag in zip(feats, feature_flags) if flag], axis=1)
    if (spatial_sort or with_gather_tables) and X.shape[0] > NUM_NN:
        # n <= k structures are NOT sort-invariant: missing-neighbor slots
        # wrap to the LAST real atom (reference torch negative-index
        # semantics, models/pesto.py unpack_state_features), so permuting
        # atoms changes which atom fills the empty slots and shifts the
        # logits (measured 0.24 on a 40-atom peptide). Sorting buys
        # nothing at this size anyway.
        from .spatial import morton_order

        perm = morton_order(X)
        X, q, M = X[perm], q[perm], M[perm]
    if with_gather_tables and not with_topology:
        raise ValueError(
            "with_gather_tables requires with_topology: the tables are "
            "built from the kNN ids (use attach_gather_tables after "
            "computing the topology yourself)"
        )
    ps = pad_structure_arrays(X, q, M, na=na, nr=nr)
    if with_topology:
        ps = compute_topology(ps, method=knn_method)
        if with_gather_tables:
            # fixed table width so same-bucket structures stack into batches
            ps = attach_gather_tables(ps, u_fixed=gather_u)
    return ps


def stack_batch(structures: list) -> PaddedStructure:
    """Stack same-bucket PaddedStructures into a batch (leading dim B)."""
    if not structures:
        raise ValueError("empty batch")
    shapes = {(s.X.shape, s.M.shape) for s in structures}
    if len(shapes) != 1:
        raise ValueError(f"mixed bucket shapes in batch: {shapes}")
    has_y = structures[0].y is not None
    # gather tables stack only if EVERY structure has same-shaped tables
    # (fallbacks or mixed U buckets drop to the plain gather path)
    t_shapes = {None if s.gather_cand is None else s.gather_cand.shape for s in structures}
    has_tables = len(t_shapes) == 1 and None not in t_shapes
    # keep the batch on the host (np.stack) when every field is numpy —
    # loader worker processes must not create device arrays; stack on
    # device otherwise to avoid a pointless device->host round trip
    all_np = all(isinstance(s.X, np.ndarray) for s in structures)
    stack = np.stack if all_np else jnp.stack
    return PaddedStructure(
        X=stack([s.X for s in structures]),
        ids_topk=stack([s.ids_topk for s in structures]),
        q=stack([s.q for s in structures]),
        M=stack([s.M for s in structures]),
        atom_mask=stack([s.atom_mask for s in structures]),
        res_mask=stack([s.res_mask for s in structures]),
        y=stack([s.y for s in structures]) if has_y else None,
        gather_cand=stack([s.gather_cand for s in structures]) if has_tables else None,
        gather_loc=stack([s.gather_loc for s in structures]) if has_tables else None,
    )


class BatchEncoder:
    """Reusable batch buffers for the hot serving path.

    Padding a 8k-atom structure allocates ~40 MB of fresh zeroed arrays;
    doing that per structure per batch (and then np.stack-copying into the
    batch layout) dominates host encode time and thrashes the allocator
    under threads. This encoder keeps ONE set of batch-shaped numpy
    buffers per (B, na, nr, F) signature and has worker threads write each
    structure's rows in place — no per-call allocation, no stack copy.

    MULTI-buffered per signature: consecutive encode() calls with the
    same shape rotate through `n_sets` buffer sets, so a software-
    pipelined consumer may keep `n_sets - 1` previous batches in flight
    while the next encodes (on the CPU backend jnp.asarray can alias
    numpy memory, so an in-flight batch's buffers must not be
    overwritten — a consumer holding `depth` pending batches needs
    n_sets >= depth + 1). NOT thread-safe across concurrent encode()
    calls on the same instance; the internal fill of one call is
    threaded.
    """

    def __init__(self, num_threads: int = 8, n_sets: int = 2):
        from concurrent.futures import ThreadPoolExecutor

        self.n_sets = max(2, int(n_sets))
        self._buffers = {}
        self._flip = {}
        self._pool = ThreadPoolExecutor(num_threads)

    def close(self):
        self._pool.shutdown(wait=False)

    def _get(self, key):
        self._flip[key] = (self._flip.get(key, -1) + 1) % self.n_sets
        slot = (key, self._flip[key])
        if slot not in self._buffers:
            B, na, nr, F, compact = key
            if compact:
                # integer codes instead of dense one-hots: the model
                # expands them on device (q -> [.,F], M -> [.,nr]),
                # shrinking both host memory and the H2D transfer by ~400x
                q = np.zeros((B, na), np.int32)
                M = np.zeros((B, na), np.int32)
            else:
                q = np.zeros((B, na, F), np.float32)
                M = np.zeros((B, na, nr), np.float32)
            self._buffers[slot] = dict(
                X=np.zeros((B, na, 3), np.float32),
                q=q,
                M=M,
                am=np.zeros((B, na), np.float32),
                rm=np.zeros((B, nr), np.float32),
                ids=np.zeros((B, na, NUM_NN), np.int32),
            )
        return self._buffers[slot]

    def encode(self, items, na: int, nr: int, spatial_sort: bool = True,
               n_features: int = None) -> PaddedStructure:
        """items: unpadded structures, either DENSE 3-tuples
        (X [n,3], q [n,F] one-hot, M [n,r] one-hot) or COMPACT 4-tuples
        (X [n,3], q_codes [n] int, rid_codes [n] int, n_res) — pass
        n_features with compact items. Returns a numpy-backed batch
        WITHOUT topology (ids all zero); compute ids on device afterwards
        (e.g. a vmapped knn_topology). Compact batches carry integer q/M
        that the model expands on device."""
        B = len(items)
        compact = len(items[0]) == 4
        F = n_features if compact else items[0][1].shape[1]
        buf = self._get((B, na, nr, F, compact))

        def fill(j):
            if compact:
                X, q, M, r = items[j]
            else:
                X, q, M = items[j]
                r = M.shape[1]
            n = X.shape[0]
            if n + 1 > na or r > nr:
                raise ValueError(f"structure ({n},{r}) exceeds bucket ({na},{nr})")
            if spatial_sort and X.shape[0] > NUM_NN:
                # n <= k structures are not sort-invariant (see
                # encode_and_pad) — leave them in input order
                from .spatial import morton_order

                perm = morton_order(X)
                X, q, M = X[perm], q[perm], M[perm]
            buf["X"][j, 1 : n + 1] = X
            buf["X"][j, n + 1 :] = 0
            buf["X"][j, 0] = 0
            buf["q"][j, 1 : n + 1] = q
            buf["q"][j, n + 1 :] = 0
            buf["q"][j, 0] = 0
            if compact:
                buf["M"][j, 1 : n + 1] = M
                buf["M"][j, n + 1 :] = 0
                buf["M"][j, 0] = 0
            else:
                buf["M"][j, 1 : n + 1, :r] = M
                buf["M"][j, 1 : n + 1, r:] = 0
                buf["M"][j, n + 1 :] = 0
                buf["M"][j, 0] = 0
            buf["am"][j, 1 : n + 1] = 1.0
            buf["am"][j, n + 1 :] = 0
            buf["am"][j, 0] = 0
            buf["rm"][j, :r] = 1.0
            buf["rm"][j, r:] = 0

        list(self._pool.map(fill, range(B)))
        return PaddedStructure(
            X=buf["X"], ids_topk=buf["ids"], q=buf["q"], M=buf["M"],
            atom_mask=buf["am"], res_mask=buf["rm"],
        )
