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


def test_knn_topology_batch_matches_per_structure():
    """knn_topology_batch must agree with per-structure knn_topology for
    every method — and for 'pallas' it must keep the overflow fallback a
    real scalar-cond branch (a vmapped per-structure cond degenerates to
    select and runs BOTH the kernel and the exact path per batch)."""
    from pesto_tpu.topology import knn_topology_batch

    Xs, ms = [], []
    for seed in (0, 1):
        X = _sorted_cloud(600, seed)
        Xp, m, _ = _padded(X, 640)
        Xs.append(Xp)
        ms.append(m)
    Xb, mb = jnp.stack(Xs), jnp.stack(ms)
    for method in ("exact", "fast", "pallas"):
        ids_b, d_b, r_b = knn_topology_batch(Xb, mb, k=64, method=method)
        for j in range(2):
            ids, d, r = knn_topology(Xs[j], ms[j], k=64, method=method)
            np.testing.assert_allclose(np.asarray(d_b)[j], np.asarray(d),
                                       atol=2e-3, rtol=1e-5)
            same = np.asarray(ids_b)[j] == np.asarray(ids)
            assert same.mean() > 0.995

    # the batched pallas lowering carries a scalar cond (stablehlo if/case),
    # not an unconditional inline of both paths
    txt = (
        jax.jit(lambda X, a: knn_topology_batch(X, a, k=64, method="pallas"))
        .lower(Xb, mb).as_text()
    )
    assert ("stablehlo.if" in txt) or ("stablehlo.case" in txt), (
        "pallas overflow fallback lost its scalar cond"
    )


def test_pallas_small_structure_forces_exact_fallback():
    """n <= k structures fill missing slots with the dup-pushed SELF
    candidate in the exact path — the band and the compaction both exclude
    it, so the kernel must force the exact fallback (overflow) instead of
    silently diverging (measured: 50/50 rows differed)."""
    X = _sorted_cloud(50, seed=3)
    Xp, m, n = _padded(X, 640)
    ids_p, d_p, r_p = knn_topology(Xp, m, k=64, method="pallas")
    ids_e, d_e, r_e = knn_topology(Xp, m, k=64, method="exact")
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_e))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e), atol=1e-5)
