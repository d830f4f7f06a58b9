import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pesto_tpu.batching import PaddedStructure, pad_structure_arrays, compute_topology, stack_batch
from pesto_tpu.models import get_config
from pesto_tpu.models.pesto import init_params
from pesto_tpu.train import create_train_state, make_eval_step, make_train_step
from pesto_tpu.train.loss import masked_bce_with_pos_weight, update_pos_ratios

TINY = get_config(
    "i_v4_1",
    layers=tuple([get_config("i_v4_1").layers[0]] * 2),
    remat=True,
)


def _random_padded(seed=0, n=50, r=12, C=5, na=128, nr=32):
    rng = np.random.RandomState(seed)
    X = (rng.rand(n, 3) * 20).astype(np.float32)
    q = np.eye(30, dtype=np.float32)[rng.randint(0, 30, n)]
    resid = np.sort(rng.randint(0, r, n))
    resid[0] = 0
    M = (resid[:, None] == np.arange(r)[None, :]).astype(np.float32)
    y = (rng.rand(r, C) < 0.2).astype(np.float32)
    ps = pad_structure_arrays(X, q, M, na=na, nr=nr, y=y)
    return compute_topology(ps)


def test_pos_ratio_update_matches_reference_semantics():
    C, r = 5, 10
    y = np.zeros((r, C), dtype=np.float32)
    y[:3, 0] = 1.0  # class 0: 30% positive
    mask = np.ones(r, dtype=np.float32)
    pr = 0.5 * np.ones(C, dtype=np.float32)
    out = update_pos_ratios(jnp.asarray(pr), jnp.asarray(y), jnp.asarray(mask), jnp.asarray(1))
    expected = pr + (y.mean(axis=0) - pr) / (1 + np.sqrt(1))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_loss_matches_torch_bce():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    r, C = 20, 5
    z = rng.randn(r, C).astype(np.float32)
    y = (rng.rand(r, C) < 0.3).astype(np.float32)
    pos_ratios = rng.uniform(0.1, 0.9, C).astype(np.float32)
    pwf = 0.5

    per_class, total = masked_bce_with_pos_weight(
        jnp.asarray(z), jnp.asarray(y), jnp.ones(r), jnp.asarray(pos_ratios), pwf
    )

    crit = torch.nn.BCEWithLogitsLoss(reduction="none")
    crit.pos_weight = torch.from_numpy(pwf * (1.0 - pos_ratios) / (pos_ratios + 1e-6))
    dloss = crit(torch.from_numpy(z), torch.from_numpy(y))
    lf = torch.from_numpy(pos_ratios / pos_ratios.sum()).reshape(1, -1)
    losses_ref = (lf * dloss) / dloss.shape[0]
    np.testing.assert_allclose(np.asarray(per_class), losses_ref.sum(dim=0).numpy(), rtol=1e-4)
    np.testing.assert_allclose(float(total), float(losses_ref.sum()), rtol=1e-4)


def test_loss_ignores_padding():
    rng = np.random.RandomState(1)
    r, C = 16, 5
    z = rng.randn(r, C).astype(np.float32)
    y = (rng.rand(r, C) < 0.3).astype(np.float32)
    pr = 0.5 * np.ones(C, dtype=np.float32)
    mask = np.ones(r, dtype=np.float32)
    mask[10:] = 0.0
    # garbage in the padded region must not change the loss
    z2 = z.copy()
    z2[10:] = 1e3
    y2 = y.copy()
    y2[10:] = 1.0
    _, t1 = masked_bce_with_pos_weight(jnp.asarray(z), jnp.asarray(y), jnp.asarray(mask), jnp.asarray(pr), 0.5)
    _, t2 = masked_bce_with_pos_weight(jnp.asarray(z2), jnp.asarray(y2), jnp.asarray(mask), jnp.asarray(pr), 0.5)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)


def test_train_step_runs_and_learns():
    import optax

    state, tx = create_train_state(TINY, learning_rate=1e-3)
    step = make_train_step(TINY, tx, donate=False)
    batch = stack_batch([_random_padded(i) for i in range(2)])

    losses = []
    for _ in range(30):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.global_step) == 30
    # the loss is non-stationary early (pos_ratios re-weighting); compare
    # settled windows: the tiny model must memorize the 2 structures
    assert np.mean(losses[-3:]) < np.mean(losses[3:6])
    # no NaNs anywhere in params (norm-at-zero gradients are the trap)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_eval_step_pure():
    state, tx = create_train_state(TINY)
    ev = make_eval_step(TINY)
    batch = stack_batch([_random_padded(7)])
    o1 = ev(state, batch)
    o2 = ev(state, batch)
    np.testing.assert_allclose(float(o1["loss"]), float(o2["loss"]))


def test_edges_remat_policy_matches_full_remat_grads():
    """The named-checkpoint "edges" policy (save gathered neighbors +
    edge-MLP output + attention weights, recompute the rest) must be a
    pure memory/speed trade: identical loss and identical updated params
    vs full remat on a config spanning both a small-nn and the nn=64
    group (the policy's target)."""
    base = get_config("i_v4_1")
    layers = (base.layers[0],) * 2 + (base.layers[-1],) * 2
    batch = stack_batch([_random_padded(i, n=90, r=16) for i in range(2)])
    results = {}
    for pol in ("full", "edges"):
        cfg = get_config("i_v4_1", layers=layers, remat=True, remat_policy=pol)
        state, tx = create_train_state(cfg, learning_rate=1e-5)
        step = make_train_step(cfg, tx, donate=False)
        st, out = step(state, batch)
        results[pol] = (
            float(out["loss"]),
            jax.tree_util.tree_leaves(st.params),
        )
    assert results["full"][0] == pytest.approx(results["edges"][0], abs=1e-6)
    for a, b in zip(results["full"][1], results["edges"][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_compact_batch_matches_dense():
    """Compact integer q/M codes (pad_structure_arrays(compact=True),
    expanded on device at models/pesto.py:518-523) must produce the SAME
    train step as the dense one-hot batch: identical loss and identical
    updated params. This is the training-path guard for the serving-side
    compact contract (the dense M is NAxNR f32, the dominant host->device
    transfer; round-5 sustained-throughput work ships codes instead)."""

    def _pair(seed, compact):
        rng = np.random.RandomState(seed)
        n, r, C = 50, 12, 5
        X = (rng.rand(n, 3) * 20).astype(np.float32)
        q = np.eye(30, dtype=np.float32)[rng.randint(0, 30, n)]
        resid = np.sort(rng.randint(0, r, n))
        resid[0] = 0
        M = (resid[:, None] == np.arange(r)[None, :]).astype(np.float32)
        y = (rng.rand(r, C) < 0.2).astype(np.float32)
        dense = compute_topology(pad_structure_arrays(X, q, M, na=128, nr=32, y=y))
        if not compact:
            return dense
        ps = pad_structure_arrays(X, q, M, na=128, nr=32, y=y, compact=True)
        return dataclasses.replace(ps, ids_topk=dense.ids_topk)  # same topology

    state0, tx = create_train_state(TINY, learning_rate=1e-3)
    step = make_train_step(TINY, tx, donate=False)

    bd = stack_batch([_pair(i, False) for i in range(2)])
    bc = stack_batch([_pair(i, True) for i in range(2)])
    assert bc.q.ndim == 2 and bc.M.ndim == 2  # codes, not one-hots
    assert bc.q.dtype == np.int32 and bc.M.dtype == np.int32

    sd, od = step(state0, bd)
    sc, oc = step(state0, bc)
    np.testing.assert_allclose(float(od["loss"]), float(oc["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(od["p"]), np.asarray(oc["p"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sd.params), jax.tree_util.tree_leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_restore_params_only(tmp_path):
    """restore_params pulls the params subtree out of a TrainState
    checkpoint without reconstructing the optimizer state — consumers
    like `benchmark_ppi --orbax-ckpt` must not need to know which lr
    schedule the run used (the opt_state tree differs across schedule
    families)."""
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.train.checkpoint import restore_params, save_checkpoint

    state, tx = create_train_state(TINY, learning_rate=1e-3)
    step = make_train_step(TINY, tx, donate=False)
    state, _ = step(state, stack_batch([_random_padded(3)]))
    save_checkpoint(str(tmp_path / "ck"), state)

    # a fresh template carries none of the run's optimizer knowledge
    template = init_params(TINY, jax.random.PRNGKey(7))
    params = restore_params(str(tmp_path / "ck"), template)
    assert params is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    assert restore_params(str(tmp_path / "nope"), template) is None


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer writes must be restorable and identical to the
    state snapshotted at save() time, even if training mutates the state
    afterwards (the device_get snapshot happens on the caller thread)."""
    from pesto_tpu.train.checkpoint import AsyncCheckpointer, restore_checkpoint

    state, tx = create_train_state(TINY, learning_rate=1e-3)
    step = make_train_step(TINY, tx, donate=False)
    batch = stack_batch([_random_padded(3)])
    state, _ = step(state, batch)
    snap_step = int(state.global_step)
    snap_leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()

    ck = AsyncCheckpointer()
    ck.save(str(tmp_path / "ck"), state)
    # keep training while the write is in flight
    state, _ = step(state, batch)
    ck.wait()
    ck.close()

    restored = restore_checkpoint(str(tmp_path / "ck"), state)
    assert int(restored.global_step) == snap_step
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]), snap_leaf, atol=0
    )
