"""Atom-axis (sequence-parallel) sharding correctness on the CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.batching import stack_batch
from pesto_tpu.models import PestoModel, get_config
from pesto_tpu.models.pesto import init_params
from pesto_tpu.parallel.mesh import make_mesh
from pesto_tpu.parallel.sp import make_sp_forward, make_sp_train_step, shard_batch_sp
from pesto_tpu.synthetic import random_padded_structure
from pesto_tpu.train import create_train_state, make_train_step

from tests.test_train_step import TINY, _random_padded


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=1, n_model=8)


@pytest.fixture(scope="module")
def mesh2x4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=2, n_model=4)


def test_sp_forward_matches_single_device(mesh8):
    cfg = get_config("i_v4_0", remat=False)
    cfg = cfg.replace(layers=cfg.layers[:4])
    params = init_params(cfg, na=256, nr=32)
    model = PestoModel(cfg)
    ps = random_padded_structure(n_atoms=500, n_res=60, na=512, nr=64, seed=0)

    z_ref = jax.jit(lambda pp: model.apply(
        {"params": pp}, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask))(params)
    fwd = make_sp_forward(cfg, mesh8)
    z_sp = fwd(params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask)
    np.testing.assert_allclose(np.asarray(z_sp), np.asarray(z_ref), atol=2e-6)


def test_sp_train_step_2d_mesh(mesh2x4):
    batch = stack_batch([_random_padded(i, na=256, nr=32) for i in range(2)])

    state1, tx1 = create_train_state(TINY, learning_rate=1e-3)
    single = make_train_step(TINY, tx1, donate=False)
    s1, o1 = single(state1, batch)

    state2, tx2 = create_train_state(TINY, learning_rate=1e-3)
    sp_step = make_sp_train_step(TINY, tx2, mesh2x4, donate=False)
    s2, o2 = sp_step(state2, shard_batch_sp(batch, mesh2x4))

    np.testing.assert_allclose(float(o1["loss"]), float(o2["loss"]), rtol=1e-5)
    # sharded-reduction fp order differs slightly from single-device
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
