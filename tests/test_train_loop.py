"""End-to-end training: mini dataset -> train() -> logs, checkpoints,
resume. Uses a tiny 2-layer model on the 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.data.build import build_dataset_h5
from pesto_tpu.models import get_config
from pesto_tpu.train.loop import TrainConfig, train

from tests.test_data import _two_chain_pdb


@pytest.fixture(scope="module")
def mini_h5(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini_ds")
    pdbs = [_two_chain_pdb(d, name=f"{i}abc.pdb1") for i in "123"]
    h5 = str(d / "mini.h5")
    build_dataset_h5(pdbs, h5, progress=False)
    return h5


def _tiny_cfg():
    base = get_config("i_v4_1")
    return base.replace(layers=tuple([base.layers[0]] * 2), remat=True)


def _tc(h5, **kw):
    defaults = dict(
        dataset_filepath=h5,
        num_epochs=2,
        learning_rate=1e-3,
        log_step=1,
        eval_step=2,
        eval_size=2,
        atoms_per_batch=2048,
        min_num_res=4,
        use_mesh=True,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_train_end_to_end_and_resume(mini_h5, tmp_path):
    out = str(tmp_path / "run")
    cfg = _tiny_cfg()
    train(cfg, _tc(mini_h5), out)

    # artifacts: log, dat, config snapshot, checkpoints
    assert os.path.isfile(os.path.join(out, "train.log"))
    assert os.path.isfile(os.path.join(out, "train.dat"))
    assert os.path.isfile(os.path.join(out, "run_config.json"))
    assert os.path.isdir(os.path.join(out, "ckpt"))

    entries = [json.loads(l) for l in open(os.path.join(out, "train.dat")) if l.strip()]
    assert any(e["step_type"] == "train" for e in entries)
    assert any(e["step_type"] == "test" for e in entries)
    steps1 = max(e["global_step"] for e in entries)
    assert steps1 >= 2
    for e in entries:
        assert np.isfinite(e["loss"])

    # resume: a second run must pick up at the checkpointed step
    train(cfg, _tc(mini_h5, num_epochs=3), out)
    log = open(os.path.join(out, "train.log")).read()
    assert "Reloaded checkpoint at step" in log


def test_eval_budget_counts_structures():
    """eval_size is a STRUCTURE budget, not a batch budget: with batches of
    4 structures and eval_size=6, exactly 2 batches (8 structures) run."""
    import jax.numpy as jnp

    from pesto_tpu.train.loop import run_eval

    class FakeBatch:
        def __init__(self, n):
            self.y = np.zeros((n, 3, 5), dtype=np.float32)
            self.y[:, 0, 0] = 1.0
            self.res_mask = np.ones((n, 3), dtype=np.float32)

    calls = []

    def fake_eval_step(state, tb):
        calls.append(tb)
        p = jnp.asarray(np.random.RandomState(len(calls)).rand(tb.y.shape[0], 3, 5))
        return {"losses": np.ones(5, dtype=np.float32), "p": p}

    loader = [FakeBatch(4) for _ in range(10)]
    scores, n_structs = run_eval(None, loader, fake_eval_step, lambda b: b, eval_size=6)
    assert n_structs == 8  # 2 batches x 4 structures (first crossing >= 6)
    assert len(calls) == 2
    assert np.isfinite(scores["loss"])
