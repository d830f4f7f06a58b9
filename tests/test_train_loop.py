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


def test_lr_schedule_constant_with_warmup_holds():
    """constant + warmup must ramp then HOLD the learning rate (it used to
    silently become warmup_cosine decaying to zero); unknown names raise."""
    import pytest as _pytest

    from pesto_tpu.train.state import make_lr_schedule

    sched = make_lr_schedule(1e-3, "constant", warmup_steps=100, total_steps=10_000)
    assert float(sched(0)) < 1e-4
    assert abs(float(sched(100)) - 1e-3) < 1e-9
    assert abs(float(sched(9_999)) - 1e-3) < 1e-9  # no decay
    with _pytest.raises(ValueError, match="unknown lr_schedule"):
        make_lr_schedule(1e-3, "Cosine")


def test_aggregate_handles_empty_results():
    """A zero-batch eval (empty test selection) or a process whose slices
    were all dummies must yield NaN scores, not an np.stack crash."""
    import numpy as _np

    from pesto_tpu.train.loop import _aggregate

    out = _aggregate([])
    assert _np.isnan(out["loss"])
    # losses present but no per-structure scores (all rows were dummies)
    out2 = _aggregate([(_np.ones(5, _np.float32), [])])
    assert abs(out2["loss"] - 5.0) < 1e-6
    assert _np.isnan(out2["0/auc"])


def test_restore_min_loss_reads_dat(tmp_path):
    from pesto_tpu.train.logger import Logger
    from pesto_tpu.train.loop import _restore_min_loss

    lg = Logger(str(tmp_path), "train")
    assert _restore_min_loss(lg) == 1e9
    lg.store(step_type="test", loss=0.42, global_step=1)
    lg.store(step_type="test", loss=0.35, global_step=2)
    lg.store(step_type="train", loss=0.01, global_step=3)  # ignored
    assert abs(_restore_min_loss(lg) - 0.35) < 1e-9


def test_prefetch_producer_exits_on_early_break():
    """Breaking out of the loader mid-epoch (the eval-budget pattern) must
    not leave the producer thread blocked on a full queue forever."""
    import threading
    import time as _time

    import numpy as _np

    from pesto_tpu.data.loader import BucketedLoader

    class DS:
        def __getitem__(self, i):
            n = 16
            X = _np.zeros((n, 3), _np.float32)
            ids = _np.zeros((n, 64), _np.int32)
            q = _np.zeros((n, 30), _np.float32)
            M = _np.eye(n, 4, dtype=_np.float32)
            y = _np.zeros((4, 5), _np.float32)
            return X, ids, q, M, y

    sizes = _np.tile([16, 4], (40, 1))
    loader = BucketedLoader(DS(), sizes, atoms_per_batch=32, max_batch=1,
                            shuffle=False, prefetch=2)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # early break: generator finalizer must stop the producer
    deadline = _time.time() + 10.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before, "producer threads leaked"
