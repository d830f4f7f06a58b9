import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.ops.geometric_pallas import fused_edge_attention
from pesto_tpu.ops.geometric_pallas_v2 import fused_edge_attention_v2


def test_v2_online_softmax_matches_v1_interpret():
    S, Nh, Nk, nn, N = 32, 2, 3, 64, 256
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    args = (f(N, nn, 4 * S), f(N, nn) ** 2, f(N, nn, 3), f(N, S), f(N, 3 * S),
            f(1 + 2 * S, 4 * S), f(4 * S), f(4 * S, 4 * S), f(4 * S, 4 * S),
            f(4 * S), f(4 * S, 128), f(128), f(N, 2 * Nh * Nk))
    Zq1, Zp1 = fused_edge_attention(*args, interpret=True, tile=128)
    Zq2, Zp2 = fused_edge_attention_v2(*args, interpret=True, tile=128, chunk=16)
    np.testing.assert_allclose(np.asarray(Zq1), np.asarray(Zq2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Zp1), np.asarray(Zp2), atol=5e-5)
