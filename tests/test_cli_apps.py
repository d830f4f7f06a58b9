"""CLI app smoke tests with a tiny random-weight model (CPU)."""

import csv
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.infer import Predictor
from pesto_tpu.models import get_config
from pesto_tpu.models.pesto import init_params

from tests.test_data import _two_chain_pdb


@pytest.fixture()
def tiny_predictor(monkeypatch):
    cfg = get_config("i_v4_0", remat=False)
    cfg = cfg.replace(layers=cfg.layers[:2])
    monkeypatch.setattr(
        Predictor,
        "from_reference_checkpoint",
        classmethod(lambda cls, path, _cfg: Predictor(cfg, init_params(cfg))),
    )
    return cfg


@pytest.fixture()
def mini_h5(tmp_path):
    from pesto_tpu.data.build import build_dataset_h5

    pdb = _two_chain_pdb(tmp_path)
    h5 = str(tmp_path / "m.h5")
    build_dataset_h5([pdb], h5, progress=False)
    return h5


def test_apply_model_cli(tmp_path, tiny_predictor):
    from pesto_tpu.apps import apply_model

    pdb = _two_chain_pdb(tmp_path)
    out = str(tmp_path / "out")
    apply_model.main([pdb, "--out", out, "--model", "i_v4_0", "--ckpt", "x"])
    files = sorted(os.listdir(out))
    assert [f[-7:] for f in files] == [f"_i{k}.pdb" for k in range(5)]
    # predictions in the b-factor column, within [0, 1]
    bf = [float(l[60:66]) for l in open(os.path.join(out, files[0])) if l.startswith("ATOM")]
    assert all(0.0 <= b <= 1.0 for b in bf)


def test_apply_model_knn_default_matches_production_pick():
    """Drift guard: the CLI's --knn default must match the documented
    production pick (exact — PERFORMANCE.md section 5) and Predictor's own
    default. Round 4 caught apply_model shipping the demoted exact2 after
    the serving-default revert missed this one surface."""
    import inspect

    from pesto_tpu.apps.apply_model import build_parser

    assert build_parser().get_default("knn") == "exact"
    sig = inspect.signature(Predictor.__init__)
    assert sig.parameters["knn_method"].default == "exact"


def test_profiling_cli(tmp_path, tiny_predictor):
    from pesto_tpu.apps import profiling

    pdb = _two_chain_pdb(tmp_path)
    out = str(tmp_path / "prof.csv")
    profiling.main([pdb, "--out", out, "--min-atoms", "1"])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1
    assert float(rows[0]["t_run"]) > 0
    assert int(rows[0]["size"]) > 100


def test_evaluate_cli(tmp_path, tiny_predictor, mini_h5):
    from pesto_tpu.apps import evaluate

    out = str(tmp_path / "eval.csv")
    evaluate.main(["--dataset", mini_h5, "--out", out, "--min-num-res", "4", "--per-class", "4"])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) >= 1
    assert "auc" in rows[0]


def test_confidence_cli(tmp_path, tiny_predictor, mini_h5):
    from pesto_tpu.apps import confidence

    out = str(tmp_path / "conf.csv")
    confidence.main(["--dataset", mini_h5, "--out", out, "--limit", "4", "--bins", "5"])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 5
    total = sum(int(r["count"]) for r in rows)
    assert total > 0


def test_md_cli(tmp_path, tiny_predictor):
    from pesto_tpu.apps import md as md_app
    from pesto_tpu.io import read_pdb, save_traj_pdb
    from pesto_tpu.structure import preprocess_structure, concatenate_chains

    ref_pdb = _two_chain_pdb(tmp_path, name="ref.pdb1")
    # build a 3-frame trajectory of the A chain
    subunits = preprocess_structure(read_pdb(ref_pdb))
    a_chains = {c: subunits[c] for c in subunits if c.startswith("A")}
    merged = concatenate_chains(a_chains)
    # add hydrogen atoms: the MD pipeline must drop them from BOTH the
    # topology and the frame coordinates (regression: mask alignment)
    nH = 7
    for key, extra in [("name", ["H"] * nH), ("element", ["H"] * nH),
                       ("resname", [merged["resname"][0]] * nH),
                       ("het_flag", ["A"] * nH)]:
        merged[key] = np.concatenate([merged[key], np.array(extra)])
    merged["resid"] = np.concatenate([merged["resid"], np.full(nH, merged["resid"][-1])])
    merged["xyz"] = np.concatenate([merged["xyz"], np.random.RandomState(5).rand(nH, 3).astype(np.float32)])
    rng = np.random.RandomState(0)
    frames = np.stack([merged["xyz"] + 0.02 * t * rng.rand(*merged["xyz"].shape).astype(np.float32)
                       for t in range(3)])
    su = {k: dict(merged) for k in ["A"]}
    su["A"]["xyz"] = frames
    su["A"].pop("chain_name", None)
    traj_pdb = str(tmp_path / "traj.pdb")
    save_traj_pdb(su, traj_pdb)

    out = str(tmp_path / "md.csv")
    md_app.main([traj_pdb, "--ref", ref_pdb, "--every", "1", "--chunk", "2",
                 "--ckpt", "x", "--out", out])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 3


def test_apply_model_orbax_checkpoint(tmp_path, monkeypatch):
    """Load weights from an orbax checkpoint dir in the CLI (--orbax)."""
    from pesto_tpu.apps import apply_model
    from pesto_tpu.models import get_config
    from pesto_tpu.train import create_train_state
    from pesto_tpu.train.checkpoint import save_checkpoint

    cfg = get_config("i_v4_0", remat=False)
    tiny = cfg.replace(layers=cfg.layers[:2])
    state, _ = create_train_state(tiny)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=7)

    # the CLI builds the model from --model; force the tiny config
    import pesto_tpu.models.config as mcfg

    presets = dict(mcfg.PRESETS)
    presets["i_v4_0"] = tiny
    monkeypatch.setattr(mcfg, "PRESETS", presets)

    pdb = _two_chain_pdb(tmp_path)
    out = str(tmp_path / "out_orbax")
    apply_model.main([pdb, "--out", out, "--model", "i_v4_0", "--orbax", ckpt_dir])
    assert len(os.listdir(out)) == 5


def test_export_compiled_roundtrip(tmp_path):
    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.synthetic import random_padded_structure

    cfg = get_config("i_v4_0", remat=False)
    cfg = cfg.replace(layers=cfg.layers[:2])
    pred = Predictor(cfg, init_params(cfg))

    path = str(tmp_path / "model.stablehlo.pkl")
    pred.export_compiled(path, buckets=((256, 32),))
    fns = Predictor.load_exported(path)
    assert (256, 32) in fns

    ps = random_padded_structure(n_atoms=100, n_res=20, na=256, nr=32, seed=3)
    z_exported = fns[(256, 32)](pred.params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask)
    z_live = pred.logits(ps)
    np.testing.assert_allclose(np.asarray(z_exported), np.asarray(z_live), atol=1e-6)


def test_complexes_cli(tmp_path, tiny_predictor):
    """Predicted-complex evaluation: per-chain AUC vs contact truth
    (reference eukaryotic_protein_complexes notebooks)."""
    import h5py

    from pesto_tpu.apps import complexes
    from pesto_tpu.io import save_pdb

    # partial-contact dimer: chain B drifts away along the helix so only
    # the first ~half of the residues are within the 5 A contact shell
    rng = np.random.RandomState(0)
    n_res, apr = 52, 5

    def chain(tilt):
        xyz = []
        for r in range(n_res):
            base = np.array([r * 1.6, tilt * r * 1.6, 0.0])
            for a in range(apr):
                xyz.append(base + rng.rand(3))
        return np.array(xyz, dtype=np.float32)

    names = np.tile(["N", "CA", "C", "O", "CB"], n_res)
    elements = np.tile(["N", "C", "C", "O", "C"], n_res)
    resnames = np.repeat(np.array(["ALA"] * n_res), apr)
    resids = np.repeat(np.arange(1, n_res + 1), apr)
    su = {}
    for cid, tilt in [("A", 0.0), ("B", 0.25)]:
        s = {
            "xyz": chain(tilt), "name": names, "element": elements,
            "resname": resnames, "resid": resids,
            "het_flag": np.array(["A"] * (n_res * apr)),
        }
        if cid == "B":
            s["xyz"][:, 1] += 4.0
        su[cid] = s
    pdb = str(tmp_path / "5xyz.pdb1")
    save_pdb(su, pdb)

    out_h5 = str(tmp_path / "cplx.h5")
    summary = complexes.main([pdb, "--out", out_h5, "--ckpt", "ignored", "--fp32"])
    assert summary["n_chains"] == 2
    assert 0.0 <= summary["auc_median"] <= 1.0
    with h5py.File(out_h5) as hf:
        key = list(hf.keys())[0]
        g = hf[key]
        assert "p0" in g and "y0" in g and "p1" in g and "y1" in g
        y0 = np.array(g["y0"])
        assert set(np.unique(y0)) <= {0.0, 1.0}
        assert 0 < y0.sum() < len(y0)  # genuinely partial contact labels
