"""Application-layer tests: interfaceome pipeline, split, store, benchmark."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.data.split import parse_clusters, split_dataset
from pesto_tpu.data.store import StructuresStore, store_pdbs

from tests.test_data import _two_chain_pdb


def test_store_roundtrip(tmp_path):
    pdbs = [(f"key{i}", _two_chain_pdb(tmp_path, name=f"{i}xyz.pdb1")) for i in range(2)]
    h5 = str(tmp_path / "store.h5")
    keys = store_pdbs(h5, pdbs)
    assert keys == ["key0", "key1"]
    store = StructuresStore(h5)
    assert len(store) == 2
    s = store["key0"]
    assert s["xyz"].shape[0] > 0
    assert s["element"].dtype.kind == "U"


def test_split_dataset():
    clusters = parse_clusters(["1ABC_A 2DEF_A", "3GHI_B", "4JKL_A 4JKL_B"])
    sids = [
        "1ABC_1_A:0", "2DEF_1_A:0",   # cluster 0
        "3GHI_1_B:0",                  # cluster 1
        "4JKL_1_A:0", "4JKL_1_B:0",   # cluster 2
        "5MNO_1_A:0",                  # unclustered singleton
        "6PQR_1_A:0",                  # excluded benchmark
    ]
    train, test, val = split_dataset(sids, clusters, exclude_pdbids=["6PQR"], test_fraction=0.25)
    assert val == ["6PQR_1_A:0"]
    assert len(train) + len(test) == 6
    # cluster co-membership: 1ABC and 2DEF end up on the same side
    side_1abc = "train" if "1ABC_1_A:0" in train else "test"
    side_2def = "train" if "2DEF_1_A:0" in train else "test"
    assert side_1abc == side_2def
    # deterministic
    train2, test2, _ = split_dataset(sids, clusters, exclude_pdbids=["6PQR"], test_fraction=0.25)
    assert train == train2 and test == test2


def test_interfaceome_pipeline(tmp_path):
    from pesto_tpu.apps import interfaceome

    pdb = _two_chain_pdb(tmp_path)
    store_h5 = str(tmp_path / "store.h5")
    pred_h5 = str(tmp_path / "pred.h5")
    agg_h5 = str(tmp_path / "agg.h5")
    out_json = str(tmp_path / "interfaces.json")

    interfaceome.main(["pack", pdb, "--out", store_h5])

    # tiny random-weight model for speed: monkeypatch config via argv model
    import pesto_tpu.apps.interfaceome as io_app
    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params

    cfg = get_config("i_v4_0", remat=False)
    cfg = cfg.replace(layers=cfg.layers[:2])

    orig = Predictor.from_reference_checkpoint
    Predictor.from_reference_checkpoint = classmethod(
        lambda cls, path, _cfg: Predictor(cfg, init_params(cfg))
    )
    try:
        interfaceome.main(["predict", store_h5, "--out", pred_h5, "--ckpt", "ignored"])
    finally:
        Predictor.from_reference_checkpoint = orig

    import h5py

    with h5py.File(pred_h5, "r") as hf:
        keys = list(hf.keys())
        assert len(keys) == 1
        p = np.array(hf[keys[0]])
        assert p.shape[1] == 5
        assert np.all((p >= 0) & (p <= 1))

    interfaceome.main(["aggregate", store_h5, pred_h5, "--out", agg_h5])
    with h5py.File(agg_h5, "r") as hf:
        g = hf[keys[0]]
        assert "x" in g and "p0" in g and "afs" in g

    interfaceome.main(["cluster", agg_h5, "--out", out_json, "--afs-thr", "-1"])
    out = json.load(open(out_json))
    assert keys[0] in out
    assert len(out[keys[0]]) == 5  # per class

    # aggregate now carries the reference field set (resid/resname/ss)
    with h5py.File(agg_h5, "r") as hf:
        g = hf[keys[0]]
        assert "resid" in g and "resname" in g and "ss" in g

    # downstream analyses over the aggregated store + clustered interfaces
    report_json = str(tmp_path / "report.json")
    interfaceome.main(["analyze", agg_h5, out_json, "--out", report_json, "--p-thr", "0.0"])
    report = json.load(open(report_json))
    assert "residue_propensity" in report and len(report["residue_propensity"]) == 5
    assert "ss_propensity" in report
    assert "coverage" in report
