"""Data-parallel correctness on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.batching import stack_batch
from pesto_tpu.models import get_config
from pesto_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from pesto_tpu.train import create_train_state, make_train_step

from tests.test_train_step import TINY, _random_padded


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_dp_train_step_matches_single_device(mesh):
    batch = stack_batch([_random_padded(i) for i in range(8)])

    state1, tx1 = create_train_state(TINY, learning_rate=1e-3)
    single = make_train_step(TINY, tx1, donate=False)
    s1, o1 = single(state1, batch)

    state2, tx2 = create_train_state(TINY, learning_rate=1e-3)
    dp = make_dp_train_step(TINY, tx2, mesh, donate=False)
    state2 = replicate_state(state2, mesh)
    sharded = shard_batch(batch, mesh)
    s2, o2 = dp(state2, sharded)

    np.testing.assert_allclose(float(o1["loss"]), float(o2["loss"]), rtol=1e-5)
    # parameters after one step must agree between DP and single-device
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_dp_eval_step(mesh):
    batch = stack_batch([_random_padded(i) for i in range(8)])
    state, _ = create_train_state(TINY)
    state = replicate_state(state, mesh)
    ev = make_dp_eval_step(TINY, mesh)
    out = ev(state, shard_batch(batch, mesh))
    assert np.isfinite(float(out["loss"]))
    assert out["p"].shape[0] == 8
