"""Exact-kNN Pallas threshold-compaction kernel: parity with the exact
XLA path (ops/knn_pallas.py; runs interpreted off-TPU, compiled on TPU).

Mosaic probe notes (kept for future kernel work): dynamic-trip-count
fori_loops legalize with f32/i32 loop carries but FAIL with i1 (bool)
vector carries ("failed to legalize scf.for"); value-level dynamic_slice
is unsupported (slice Refs with pl.ds instead); scalar (rank-0) bitcast
is unsupported (precompute bitpatterns on host).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.spatial import morton_order
from pesto_tpu.topology import knn_topology


def _padded(X, NA):
    n = X.shape[0]
    Xp = np.zeros((NA, 3), np.float32)
    Xp[1 : n + 1] = X
    m = np.zeros(NA, np.float32)
    m[1 : n + 1] = 1.0
    return jnp.asarray(Xp), jnp.asarray(m), n


def _sorted_cloud(n, seed):
    from pesto_tpu.synthetic import random_structure_arrays

    X = random_structure_arrays(n_atoms=n, n_res=max(n // 8, 4), seed=seed)[0]
    return X[morton_order(X)]


def _check_match(Xp, m, n, k=64):
    ids_p, d_p, r_p = knn_topology(Xp, m, k=k, method="pallas")
    ids_e, d_e, r_e = knn_topology(Xp, m, k=k, method="exact")
    ids_p, ids_e = np.asarray(ids_p), np.asarray(ids_e)
    d_p, d_e = np.asarray(d_p), np.asarray(d_e)
    # distances identical (ids may only differ where distances tie)
    np.testing.assert_allclose(d_p, d_e, atol=2e-3, rtol=1e-5)
    mism = ids_p != ids_e
    if mism.any():
        np.testing.assert_allclose(d_p[mism], d_e[mism], atol=2e-3, rtol=1e-5)
    assert mism.mean() < 0.005
    # unit displacement vectors: tie-swapped slots point at a different
    # (equally distant) atom, so compare only where the ids agree
    same = ~mism
    np.testing.assert_allclose(
        np.asarray(r_p)[same], np.asarray(r_e)[same], atol=2e-3
    )


def test_pallas_knn_matches_exact_sorted_cloud():
    X = _sorted_cloud(900, seed=7)
    Xp, m, n = _padded(X, 1024)
    _check_match(Xp, m, n)


def test_pallas_knn_unsorted_input_still_exact():
    """Morton order is a performance assumption, not a correctness one:
    unsorted input inflates the off-band set and may trigger the
    overflow fallback, but the result must still be exact."""
    rng = np.random.RandomState(3)
    X = (rng.rand(800, 3) * 25).astype(np.float32)  # NOT sorted
    Xp, m, n = _padded(X, 1024)
    _check_match(Xp, m, n)


def test_pallas_knn_duplicates_and_small():
    X = _sorted_cloud(700, seed=11).copy()
    X[10] = X[500]  # exact duplicate pair far apart in Morton order
    Xp, m, n = _padded(X, 1024)
    _check_match(Xp, m, n)


def test_pallas_knn_small_bucket_falls_back():
    """Buckets below the kernel's minimum shape silently use the exact
    path (same signature, same results)."""
    X = _sorted_cloud(100, seed=5)
    Xp, m, n = _padded(X, 512)
    ids_p, d_p, _ = knn_topology(Xp, m, k=64, method="pallas")
    ids_e, d_e, _ = knn_topology(Xp, m, k=64, method="exact")
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_e))
