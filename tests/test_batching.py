import numpy as np
import pytest

from pesto_tpu.batching import ATOM_BUCKETS, RES_BUCKETS, pad_structure_arrays, pick_bucket


def test_bucket_ladder_extends_beyond_reference_cap():
    assert pick_bucket(8193, ATOM_BUCKETS) == 8448
    assert pick_bucket(9000, ATOM_BUCKETS) == 16384
    assert pick_bucket(20000, ATOM_BUCKETS) == 32768
    with pytest.raises(ValueError):
        pick_bucket(40000, ATOM_BUCKETS)


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
