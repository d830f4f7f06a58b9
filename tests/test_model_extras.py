import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.models.config import LayerConfig
from pesto_tpu.models.extras import CrossStateUpdateLayer, state_max_pool
from pesto_tpu.models.pesto import unpack_state_features


def test_state_max_pool_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    N, S, R = 30, 8, 6
    q = rng.randn(N, S).astype(np.float32)
    p = rng.randn(N, 3, S).astype(np.float32)
    resid = np.sort(rng.randint(0, R, N))
    resid[:R] = np.arange(R)
    M = (resid[:, None] == np.arange(R)[None, :]).astype(np.float32)

    q_max, p_max = state_max_pool(jnp.asarray(q), jnp.asarray(p), jnp.asarray(M))

    # torch oracle (reference src/model_operations.py:157-168)
    qt, pt_, Mt = torch.from_numpy(q), torch.from_numpy(p), torch.from_numpy(M)
    s = torch.norm(pt_, dim=2)
    q_ref, _ = torch.max(Mt.unsqueeze(2) * qt.unsqueeze(1), dim=0)
    _, s_ids = torch.max(Mt.unsqueeze(2) * s.unsqueeze(1), dim=0)
    p_ref = torch.gather(pt_, 0, s_ids.unsqueeze(2).repeat((1, 1, pt_.shape[2])))

    np.testing.assert_allclose(np.asarray(q_max), q_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_max), p_ref.numpy(), atol=1e-5)


def _padded_state(seed, na=64, n=40, S=32, k=16):
    rng = np.random.RandomState(seed)
    X = np.zeros((na, 3), np.float32)
    X[1 : n + 1] = rng.rand(n, 3) * 20
    am = np.zeros(na, np.float32)
    am[1 : n + 1] = 1
    ids = np.zeros((na, k), np.int32)
    ids[1 : n + 1] = rng.randint(1, n + 1, (n, k))
    q = rng.randn(na, S).astype(np.float32) * am[:, None]
    p = rng.randn(na, 3, S).astype(np.float32) * am[:, None, None]
    D, R = unpack_state_features(jnp.asarray(X), jnp.asarray(ids), jnp.asarray(am), jnp.asarray(n))
    return (jnp.asarray(q), jnp.asarray(p), jnp.asarray(ids), D, R, jnp.asarray(am))


def test_cross_state_update_layer():
    layer = CrossStateUpdateLayer(LayerConfig(nn=16))
    Z0 = _padded_state(0)
    Z1 = _padded_state(1, n=30)
    params = layer.init(jax.random.PRNGKey(0), Z0, Z1)["params"]
    (q0, p0), (q1, p1) = layer.apply({"params": params}, Z0, Z1)
    assert q0.shape == Z0[0].shape and p0.shape == Z0[1].shape
    for t in (q0, p0, q1, p1):
        assert np.all(np.isfinite(np.asarray(t)))

    # masked (padding) atoms of the attended structure must not influence
    # the real atoms' outputs
    q1_mod = Z1[0].at[50:].set(123.0)  # rows beyond n=30 are padding
    Z1_mod = (q1_mod,) + Z1[1:]
    (q0b, _), _ = layer.apply({"params": params}, Z0, Z1_mod)
    n0 = 40
    np.testing.assert_allclose(
        np.asarray(q0)[1 : n0 + 1], np.asarray(q0b)[1 : n0 + 1], atol=1e-5
    )
