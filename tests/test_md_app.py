"""MD pipeline: trajectory reader, frozen-topology batched inference."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pesto_tpu.apps.md import interface_labels_from_reference, predict_trajectory
from pesto_tpu.infer import Predictor
from pesto_tpu.io import read_pdb, read_traj_pdb, save_traj_pdb
from pesto_tpu.models import get_config
from pesto_tpu.models.pesto import init_params
from pesto_tpu.structure import clean_structure, preprocess_structure

from tests.test_data import _two_chain_pdb


def test_read_traj_pdb(tmp_path):
    rng = np.random.RandomState(0)
    n, T = 30, 4
    xyz = rng.rand(n, 3).astype(np.float32) * 10
    frames = np.stack([xyz + 0.1 * t for t in range(T)])
    su = {
        "A": {
            "xyz": frames,
            "name": np.array(["CA"] * n),
            "element": np.array(["C"] * n),
            "resname": np.array(["ALA"] * n),
            "resid": np.arange(1, n + 1),
            "het_flag": np.array(["A"] * n),
        }
    }
    path = tmp_path / "traj.pdb"
    save_traj_pdb(su, str(path))
    structure, out_frames = read_traj_pdb(str(path))
    assert out_frames.shape == (T, n, 3)
    np.testing.assert_allclose(out_frames[0], xyz, atol=2e-3)
    np.testing.assert_allclose(out_frames[3], xyz + 0.3, atol=2e-3)
    assert structure["name"][0] == "CA"


def test_predict_trajectory_frozen_topology(tmp_path):
    # tiny random-weight model; 3 frames of a small structure
    cfg = get_config("i_v4_0", remat=False)
    cfg = cfg.replace(layers=cfg.layers[:2])
    pred = Predictor(cfg, init_params(cfg))

    pdb = _two_chain_pdb(tmp_path)
    structure = clean_structure(read_pdb(pdb))
    n = structure["xyz"].shape[0]
    rng = np.random.RandomState(0)
    frames = np.stack([structure["xyz"] + 0.05 * t * rng.rand(n, 3).astype(np.float32) for t in range(3)])

    probs = predict_trajectory(pred, structure, frames, chunk=2)
    assert probs.shape[0] == 3
    assert probs.shape[2] == 5
    assert np.all((probs >= 0) & (probs <= 1))
    # frame 0 equals the static prediction (same coords, same topology)
    p_static = pred.predict_structure(structure)
    np.testing.assert_allclose(probs[0], p_static, atol=1e-4)
    # later frames differ (coords moved)
    assert np.abs(probs[2] - probs[0]).max() > 1e-6


def test_interface_labels_from_reference(tmp_path):
    pdb = _two_chain_pdb(tmp_path)
    subunits = preprocess_structure(read_pdb(pdb))
    chains = [c for c in subunits if c.startswith("A")]
    y = interface_labels_from_reference(subunits, chains)
    assert y.dtype == bool
    assert y.sum() > 0  # chains A and B are in contact
