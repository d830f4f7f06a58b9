"""Smoke tests for the two CLIs with no prior coverage: train_cli and
benchmark_ppi, on tiny real data (the mini self-built HDF5 and one real
pdbs_test golden pair)."""

import csv
import glob
import os
import shutil

import numpy as np
import pytest

jax = pytest.importorskip("jax")

CKPT = "/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt"
PDBS_TEST = "/root/reference/pdbs_test"


@pytest.fixture(scope="module")
def mini_h5(tmp_path_factory, example_pdb, example_complex_pdb):
    from pesto_tpu.data.build import build_dataset_h5

    d = tmp_path_factory.mktemp("mini_ds_cli")
    h5 = str(d / "mini.h5")
    build_dataset_h5([example_pdb, example_complex_pdb], h5, progress=False)
    return h5


def test_train_cli_end_to_end(mini_h5, tmp_path, monkeypatch):
    """The training CLI drives the full loop (2-layer override via the
    config registry) and leaves logs + a checkpoint behind."""
    from pesto_tpu.apps import train_cli
    from pesto_tpu.models import config as config_mod

    base = config_mod.get_config("i_v4_1")
    tiny = base.replace(layers=tuple([base.layers[0]] * 2), remat=True)
    monkeypatch.setitem(config_mod.PRESETS, "tiny_cli_test", tiny)

    out = str(tmp_path / "run")
    train_cli.main([
        "--dataset", mini_h5, "--out", out, "--model", "tiny_cli_test",
        "--epochs", "1", "--log-step", "1", "--eval-step", "2",
        "--eval-size", "2", "--atoms-per-batch", "2048",
        "--min-num-res", "4", "--num-workers", "0", "--lr", "1e-3",
    ])
    assert os.path.isfile(os.path.join(out, "train.log"))
    assert os.path.isfile(os.path.join(out, "train.dat"))
    assert os.path.isdir(os.path.join(out, "ckpt"))


@pytest.mark.skipif(not os.path.isdir(PDBS_TEST), reason="golden set absent")
def test_benchmark_ppi_one_structure(tmp_path):
    """benchmark_ppi scores one real golden triple against the reference's
    own prediction and writes the per-structure CSV."""
    from pesto_tpu.apps import benchmark_ppi

    # smallest golden triple keeps the CPU forward quick
    triples = sorted(glob.glob(os.path.join(PDBS_TEST, "*_T.pdb")),
                     key=os.path.getsize)
    base = triples[0][:-6]
    d = tmp_path / "golden"
    d.mkdir()
    for suf in (".pdb", "_T.pdb", "_M.pdb"):
        if os.path.isfile(base + suf):
            shutil.copy(base + suf, d / os.path.basename(base + suf))
    out = str(tmp_path / "bench.csv")
    benchmark_ppi.main([str(d), "--ckpt", CKPT, "--out", out])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1
    auc = float(rows[0]["auc_ours"])
    ref = float(rows[0]["auc_reference"])
    # PIN the deterministic value (ported i_v4_0 on the smallest pdbs_test
    # structure, 2V9T_1_B): a regime check alone would absorb serious
    # scoring/bucketing bugs. The committed reference prediction (0.9673,
    # different weights) is sanity only.
    assert abs(auc - 0.9416) < 0.01, auc
    assert ref > 0.9
