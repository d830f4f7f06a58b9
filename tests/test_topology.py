import numpy as np
import pytest

from pesto_tpu.topology import extract_topology, knn_topology, extract_all_contacts
import jax.numpy as jnp


def _rand_coords(n, seed=0):
    return (np.random.RandomState(seed).rand(n, 3) * 30).astype(np.float32)


def _torch_reference_topology(X, num_nn):
    torch = pytest.importorskip("torch")
    X = torch.from_numpy(np.asarray(X, dtype=np.float32))
    R = X.unsqueeze(0) - X.unsqueeze(1)
    D = torch.norm(R, dim=2)
    D = D + torch.max(D) * (D < 1e-2).float()
    R = R / D.unsqueeze(2)
    knn = min(num_nn, D.shape[0])
    D_topk, ids_topk = torch.topk(D, knn, dim=1, largest=False)
    return ids_topk.numpy(), D_topk.numpy()


@pytest.mark.parametrize("n,k", [(100, 64), (37, 64), (200, 16), (500, 64)])
def test_knn_matches_torch_reference(n, k):
    X = _rand_coords(n, seed=n)
    ids, d, r = extract_topology(X, k)
    ids_ref, d_ref = _torch_reference_topology(X, k)
    np.testing.assert_allclose(np.sort(d, axis=1), d, err_msg="distances must be ascending")
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-5)
    # ids may differ only where distances tie (e.g. masked self vs true max)
    mism = ids != ids_ref
    np.testing.assert_allclose(d[mism], d_ref[mism], rtol=1e-5, atol=1e-5)
    assert np.mean(mism) < 0.01


def test_knn_duplicate_atoms():
    X = _rand_coords(50)
    X[10] = X[20]  # exact duplicate pair
    ids, d, r = extract_topology(X, 8)
    ids_ref, d_ref = _torch_reference_topology(X, 8)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-4)


def test_knn_padded_sink_convention():
    n, NA, k = 60, 128, 64
    X = _rand_coords(n, seed=3)
    Xp = np.zeros((NA, 3), dtype=np.float32)
    Xp[1 : n + 1] = X
    mask = np.zeros(NA, dtype=np.float32)
    mask[1 : n + 1] = 1.0
    ids, d, r = knn_topology(jnp.asarray(Xp), jnp.asarray(mask), k=k)
    ids = np.asarray(ids)
    # sink and padding rows point at the sink
    assert np.all(ids[0] == 0)
    assert np.all(ids[n + 1 :] == 0)
    # each real atom has exactly n valid candidates (incl. masked self)
    valid_per_row = np.sum(ids[1 : n + 1] > 0, axis=1)
    assert np.all(valid_per_row == n)
    # remaining slots are sink-padded
    assert np.all(ids[1 : n + 1, n:] == 0)
    # valid ids stay in the real-atom row range
    v = ids[1 : n + 1, :n]
    assert v.min() >= 1 and v.max() <= n


def test_knn_large_blocked():
    n = 3000
    X = _rand_coords(n, seed=7)
    ids, d, r = extract_topology(X, 64)
    ids_ref, d_ref = _torch_reference_topology(X, 64)
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-4)
    mism = ids != ids_ref
    np.testing.assert_allclose(d[mism], d_ref[mism], rtol=1e-4, atol=1e-4)
    assert np.mean(mism) < 0.01


def test_extract_all_contacts():
    a = _rand_coords(40, seed=1) + np.array([0, 0, 0], dtype=np.float32)
    b = a + np.array([2.0, 0, 0], dtype=np.float32)  # many contacts
    c = a + np.array([500.0, 0, 0], dtype=np.float32)  # none
    contacts = extract_all_contacts({"A": {"xyz": a}, "B": {"xyz": b}, "C": {"xyz": c}}, 5.0)
    assert "A" in contacts and "B" in contacts["A"]
    assert "C" not in contacts
    ids_ab = contacts["A"]["B"]["ids"]
    ids_ba = contacts["B"]["A"]["ids"]
    assert np.array_equal(ids_ab[:, 0], ids_ba[:, 1])
    # symmetric distances
    np.testing.assert_allclose(contacts["A"]["B"]["d"], contacts["B"]["A"]["d"])
    assert np.all(contacts["A"]["B"]["d"] < 5.0)


def test_knn_fast_method_agreement():
    n = 2000
    X = _rand_coords(n, seed=11) * 2  # protein-like density
    NA = n + 1
    Xp = np.zeros((NA, 3), dtype=np.float32)
    Xp[1:] = X
    mask = np.zeros(NA, dtype=np.float32)
    mask[1:] = 1.0
    ids_e, d_e, _ = knn_topology(jnp.asarray(Xp), jnp.asarray(mask), k=64, method="exact")
    ids_f, d_f, _ = knn_topology(jnp.asarray(Xp), jnp.asarray(mask), k=64, method="fast")
    ids_e, ids_f = np.asarray(ids_e)[1:], np.asarray(ids_f)[1:]
    agree = np.mean([len(set(ids_e[r]) & set(ids_f[r])) / 64 for r in range(0, n, 13)])
    assert agree > 0.98
    # the near-neighbor prefix (what small-nn layers consume) matches
    assert np.mean(ids_e[:, :16] == ids_f[:, :16]) > 0.999
