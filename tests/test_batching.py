import numpy as np
import pytest

from pesto_tpu.batching import ATOM_BUCKETS, RES_BUCKETS, pad_structure_arrays, pick_bucket


def test_bucket_ladder_extends_beyond_reference_cap():
    assert pick_bucket(8193, ATOM_BUCKETS) == 8448
    assert pick_bucket(9000, ATOM_BUCKETS) == 16384
    assert pick_bucket(20000, ATOM_BUCKETS) == 32768
    # mega buckets for sharded serving (predict_structure_sp)
    assert pick_bucket(40000, ATOM_BUCKETS) == 65536
    assert pick_bucket(100000, ATOM_BUCKETS) == 131072
    with pytest.raises(ValueError):
        pick_bucket(140000, ATOM_BUCKETS)


def test_pad_structure_large():
    n, r = 9000, 1100
    rng = np.random.RandomState(0)
    X = rng.rand(n, 3).astype(np.float32)
    q = rng.rand(n, 30).astype(np.float32)
    resid = np.sort(rng.randint(0, r, n))
    M = (resid[:, None] == np.arange(r)[None, :]).astype(np.float32)
    ps = pad_structure_arrays(X, q, M)
    assert ps.X.shape[0] == 16384
    assert ps.M.shape[1] == 2048
    assert int(np.asarray(ps.atom_mask).sum()) == n


def test_batch_encoder_double_buffering_and_parity():
    """BatchEncoder must (a) reproduce pad_structure_arrays exactly,
    (b) alternate buffer sets so one in-flight batch survives the next
    encode, and (c) zero stale rows when a smaller structure reuses a slot."""
    import numpy as np

    from pesto_tpu.batching import BatchEncoder, pad_structure_arrays

    rng = np.random.RandomState(3)

    def item(n, r, F=7):
        X = rng.rand(n, 3).astype(np.float32)
        q = np.eye(F, dtype=np.float32)[rng.randint(0, F, n)]
        rid = np.sort(rng.randint(0, r, n)); rid[0], rid[-1] = 0, r - 1
        M = (rid[:, None] == np.arange(r)[None, :]).astype(np.float32)
        return X, q, M

    enc = BatchEncoder(2)
    a, b = item(40, 8), item(50, 10)
    batch1 = enc.encode([a, b], na=64, nr=16, spatial_sort=False)
    for j, it in enumerate((a, b)):
        ref = pad_structure_arrays(*it, na=64, nr=16)
        np.testing.assert_array_equal(batch1.X[j], ref.X)
        np.testing.assert_array_equal(batch1.q[j], ref.q)
        np.testing.assert_array_equal(batch1.M[j], ref.M)
        np.testing.assert_array_equal(batch1.atom_mask[j], ref.atom_mask)
        np.testing.assert_array_equal(batch1.res_mask[j], ref.res_mask)

    # double buffering: encoding a second batch must not clobber batch1
    x1_snapshot = batch1.X.copy()
    c, d = item(30, 6), item(20, 5)
    batch2 = enc.encode([c, d], na=64, nr=16, spatial_sort=False)
    np.testing.assert_array_equal(batch1.X, x1_snapshot)
    assert batch2.X is not batch1.X

    # third encode flips back onto batch1's buffers; smaller structures
    # must leave no stale rows from the first fill
    e, f = item(10, 3), item(12, 4)
    batch3 = enc.encode([e, f], na=64, nr=16, spatial_sort=False)
    assert batch3.X is batch1.X  # same underlying buffer set
    ref_e = pad_structure_arrays(*e, na=64, nr=16)
    np.testing.assert_array_equal(batch3.X[0], ref_e.X)
    np.testing.assert_array_equal(batch3.M[0], ref_e.M)
    np.testing.assert_array_equal(batch3.atom_mask[0], ref_e.atom_mask)

    # compact mode: integer codes, same masks
    rid_e = np.argmax(e[2], axis=1).astype(np.int32)
    qc_e = np.argmax(e[1], axis=1).astype(np.int32)
    cb = enc.encode([(e[0], qc_e, rid_e, e[2].shape[1])], na=64, nr=16,
                    spatial_sort=False, n_features=7)
    assert cb.q.dtype == np.int32 and cb.M.dtype == np.int32
    np.testing.assert_array_equal(cb.q[0, 1:11], qc_e)
    np.testing.assert_array_equal(cb.M[0, 1:11], rid_e)
    assert cb.q[0, 0] == 0 and (cb.q[0, 11:] == 0).all()
    enc.close()


def test_small_structure_sort_invariance():
    """Structures with n <= 64 atoms skip the Morton sort: their missing-
    neighbor slots wrap to the LAST real atom (reference torch semantics),
    so permuting atoms would change the logits (measured 0.24 on a
    40-atom peptide). encode_and_pad with and without spatial_sort must
    now agree exactly for small structures."""
    import jax

    from pesto_tpu.batching import encode_and_pad
    from pesto_tpu.models import PestoModel, get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.synthetic import random_structure_record

    base = get_config("i_v4_0", remat=False)
    cfg = base.replace(layers=base.layers[:2])
    params = init_params(cfg)
    model = PestoModel(cfg)
    rec = dict(random_structure_record(n_atoms=40, n_res=8, seed=5))

    outs = []
    for sort in (False, True):
        ps = encode_and_pad(rec, feature_flags=cfg.feature_flags,
                            spatial_sort=sort)
        z = model.apply({"params": params}, ps.X, ps.ids_topk, ps.q, ps.M,
                        ps.atom_mask)
        outs.append(np.asarray(z))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
