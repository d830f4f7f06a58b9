"""Spatial (Morton/Z-order) atom ordering and tile-local gather tables.

TPU rationale: the per-layer neighbor gather and the kNN top-k are the two
measured bottlenecks (docs/ROADMAP.md). Both become cheap when atoms that
are close in space are close in row index:

  - the kNN search can run on a static BAND of the distance matrix
    (topology.banded_topk) instead of all NA columns;
  - the neighbor gather can run as tile-local one-hot selection on the MXU
    (models.pesto one-hot path) instead of a row-rate-bound XLA gather —
    measured 1.8 ms (bf16) / 3.3 ms (f32 3-pass) vs 7.3 ms for jnp.take at
    2.1 M rows x 128 on one v5e chip.

Atom order is an internal degree of freedom: residue-level outputs are
invariant to it (the pool reduces over atoms through the membership mask
M), so sorting atoms by Morton code is exact up to fp summation order.
The sink row 0 stays in place; only real atom rows permute.

No reference analog: the reference gathers per neighbor row on the GPU
(src/model_operations.py:225-236), which its hardware does well and TPUs
do not.
"""

import numpy as np

# gather tile size (atoms per tile) and the bucket ladder for the
# per-tile candidate-table width U. tile=128 measured fastest on v5e
# (U ~700-1024 on real proteins; one-hot FLOPs scale with U).
GATHER_TILE = 128
U_BUCKETS = (256, 384, 512, 768, 1024, 1536, 2048)


def morton_order(X: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting rows of X [n,3] by 3-D Morton (Z-order) code."""
    X = np.asarray(X, dtype=np.float64)
    lo = X.min(axis=0)
    span = np.maximum(X.max(axis=0) - lo, 1e-9)
    q = np.minimum(((X - lo) / span * (1 << bits)).astype(np.uint64), (1 << bits) - 1)

    def spread(v):  # interleave: insert two zero bits between each bit
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def sort_structure_arrays(X, q, M, y=None):
    """Morton-sort the atom rows of (X [n,3], q [n,F], M [n,NR]).

    Returns (X, q, M, perm). Residue outputs are invariant; per-residue
    labels y are untouched (returned unchanged by the caller)."""
    perm = morton_order(X)
    return X[perm], q[perm], M[perm], perm


def sort_encoded_item(X, ids, q, M):
    """Morton-sort an already-encoded item (X [n,3], raw 0-based neighbor
    ids [n,k], q, M): permute atom rows and relabel ids. Per-neighbor
    distance order within each row is preserved."""
    perm = morton_order(X)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return X[perm], inv[np.asarray(ids)][perm], q[perm], M[perm]


def build_gather_tables(
    ids_padded: np.ndarray, na: int, tile: int = GATHER_TILE, u_fixed: int = None
):
    """Tile-local candidate tables for the one-hot MXU gather.

    Args:
      ids_padded: [NA, K] int neighbor ids in the padded convention
                  (0 = sink, real atoms at rows 1..n).
      na:         padded atom count (multiple of `tile`).
      u_fixed:    force this table width (batches need a uniform U to
                  stack); default: smallest fitting U_BUCKETS entry.

    Returns:
      cand: [T, U] int32 — per destination tile, the unique source rows its
            edges reference, padded with 0 (the sink, whose state is zero).
      loc:  [NA, K] int32 — each edge's index into its tile's cand list.
      or (None, None) if some tile's unique count exceeds the U budget
      (caller falls back to the plain gather path).
    """
    ids = np.asarray(ids_padded)
    NA, K = ids.shape
    assert NA == na and na % tile == 0, (NA, na, tile)
    T = na // tile
    per_tile = ids.reshape(T, tile * K)

    uniqs = [np.unique(per_tile[t]) for t in range(T)]
    u_max = max(int(u.shape[0]) for u in uniqs)
    if u_fixed is not None:
        U = u_fixed if u_max <= u_fixed else None
    else:
        U = next((b for b in U_BUCKETS if u_max <= b), None)
    if U is None:
        return None, None

    cand = np.zeros((T, U), dtype=np.int32)
    loc = np.empty((T, tile * K), dtype=np.int32)
    for t in range(T):
        u = uniqs[t]
        cand[t, : u.shape[0]] = u
        loc[t] = np.searchsorted(u, per_tile[t])
    return cand, loc.reshape(NA, K)
