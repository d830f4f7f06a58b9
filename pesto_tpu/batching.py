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
ATOM_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 8448, 16384, 32768)
RES_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
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
) -> PaddedStructure:
    """Pad unpadded (X [n,3], q [n,F], M [n,r]) into a PaddedStructure.

    If ids_topk_raw (0-based raw neighbor ids, [n, k<=num_nn]) is given it
    is shifted into the padded/sink convention; otherwise ids are computed
    on device afterwards via compute_topology().
    """
    n, r = X.shape[0], M.shape[1]
    na = na or pick_bucket(n + 1, ATOM_BUCKETS)
    nr = nr or pick_bucket(r, RES_BUCKETS)
    if n + 1 > na or r > nr:
        raise ValueError(f"structure ({n} atoms, {r} res) exceeds bucket ({na},{nr})")

    Xp = np.zeros((na, 3), dtype=np.float32)
    Xp[1 : n + 1] = X
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
    if spatial_sort or with_gather_tables:
        from .spatial import morton_order

        perm = morton_order(X)
        X, q, M = X[perm], q[perm], M[perm]
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
