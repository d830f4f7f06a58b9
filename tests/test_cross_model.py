"""CrossPestoModel: paired-structure (dimer) model exposing the
reference's unused CrossStateUpdateLayer end to end
(src/model_operations.py:245-334)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.models import get_config
from pesto_tpu.models.cross import CrossPestoModel, init_cross_params
from pesto_tpu.synthetic import random_padded_structure


def _tiny_cfg():
    base = get_config("i_v4_0")
    return base.replace(layers=tuple([base.layers[0]] * 2))


def _inputs(seed, na=64, nr=8):
    ps = random_padded_structure(n_atoms=40, n_res=nr, na=na, nr=nr, seed=seed)
    return (
        jnp.asarray(ps.X), jnp.asarray(ps.ids_topk), jnp.asarray(ps.q),
        jnp.asarray(ps.M), jnp.asarray(ps.atom_mask),
    )


def test_cross_model_shapes_and_symmetry():
    cfg = _tiny_cfg()
    params = init_cross_params(cfg)
    model = CrossPestoModel(cfg)
    A, B = _inputs(0), _inputs(1)
    zA, zB = jax.jit(model.apply)({"params": params}, A, B)
    assert zA.shape == (8, cfg.dm_n2) and zB.shape == (8, cfg.dm_n2)
    assert np.isfinite(np.asarray(zA)).all()

    # swapping the pair swaps the outputs exactly (shared parameters)
    zB2, zA2 = model.apply({"params": params}, B, A)
    np.testing.assert_allclose(np.asarray(zA), np.asarray(zA2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zB), np.asarray(zB2), atol=1e-5)

    # partner-conditioning: a different partner changes the logits
    C = _inputs(2)
    zA3, _ = model.apply({"params": params}, A, C)
    assert np.abs(np.asarray(zA3) - np.asarray(zA)).max() > 1e-6


def test_cross_model_gradients_flow():
    cfg = _tiny_cfg()
    params = init_cross_params(cfg)
    model = CrossPestoModel(cfg)
    A, B = _inputs(3), _inputs(4)

    def loss(p):
        zA, zB = model.apply({"params": p}, A, B)
        return jnp.sum(zA**2) + jnp.sum(zB**2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.sum(x**2)) for x in jax.tree.leaves(g)]
    assert sum(norms) > 0
    # the cross-attention parameters themselves receive gradient
    flat = {"/".join(map(str, k)): v for k, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    cross_keys = [k for k in flat if "cqm" in k or "cvm" in k]
    assert cross_keys and any(float(jnp.sum(flat[k] ** 2)) > 0 for k in cross_keys)
