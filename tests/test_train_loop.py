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
