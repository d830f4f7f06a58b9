"""PLY reader + MaSIF-site benchmark kit (reference protocol:
masif_sppider_Intpred_comp.ipynb; data: masif-site_benchmark/)."""

import numpy as np
import pytest

from pesto_tpu.analysis.masif_kit import (
    paired_residue_arrays,
    read_pdb_bfactors,
    residue_ground_truth,
    residue_scores_from_bfactor,
    residue_scores_from_mesh,
    score_structure_vs_mesh,
)
from pesto_tpu.io.ply import read_ply, vertex_areas

BENCH = "/root/reference/masif-site_benchmark"


def _toy_ply(tmp_path):
    # unit right triangle pair (square), 4 vertices, 2 faces, iface on 2
    txt = """ply
format ascii 1.0
comment toy
element vertex 4
property float x
property float y
property float z
property float iface
element face 2
property list uchar int vertex_indices
end_header
0 0 0 0
1 0 0 0
0 1 0 1
1 1 0 1
3 0 1 2
3 1 3 2
"""
    p = tmp_path / "toy.ply"
    p.write_text(txt)
    return str(p)


def test_read_ply_toy(tmp_path):
    m = read_ply(_toy_ply(tmp_path))
    assert m["vertices"].shape == (4, 3)
    assert m["faces"].shape == (2, 3)
    np.testing.assert_array_equal(m["iface"], [0, 0, 1, 1])
    a = vertex_areas(m["vertices"], m["faces"])
    # two triangles of area 0.5, lumped 1/3 per corner
    assert a.sum() == pytest.approx(1.0)
    assert a[2] == pytest.approx(2 * 0.5 / 3)  # shared corner


def test_read_ply_real():
    m = read_ply(f"{BENCH}/ground_truth/1EWY_A.ply")
    assert m["vertices"].shape[0] == 5890
    assert m["faces"].shape == (11780, 3)
    for prop in ("charge", "hbond", "hphob", "iface", "nx", "ny", "nz"):
        assert m[prop].shape == (5890,)
    assert set(np.unique(m["iface"])) <= {0.0, 1.0}
    a = vertex_areas(m["vertices"], m["faces"])
    assert a.shape == (5890,) and (a > 0).all()


def test_ground_truth_and_scoring_protocol(tmp_path):
    m_path = _toy_ply(tmp_path)
    # two residues: res 1 owns the iface vertices, res 2 the others
    structure = {
        "xyz": np.array([[0, 0.9, 0], [1, 1.1, 0], [0, 0.05, 0], [1, -0.05, 0]], np.float32),
        "name": np.array(["CA", "CB", "CA", "CB"]),
        "chain_name": np.array(["A", "A", "A", "A"]),
        "resid": np.array([1, 1, 2, 2], np.int32),
        "icode": np.array(["", "", "", ""]),
    }
    m = read_ply(m_path)
    labels = residue_ground_truth(structure, m, min_area=0.1, min_frac=0.04)
    assert labels["A:1"] == 1.0 and labels["A:2"] == 0.0

    bf = np.array([0.9, 0.8, 0.1, -1.0], np.float32)
    preds = residue_scores_from_bfactor(structure, bf, alpha=1.0)
    assert preds == {"A:1": pytest.approx(0.9), "A:2": pytest.approx(0.1)}

    rp = residue_scores_from_mesh(structure, m, np.array([0.0, 0.0, 1.0, 1.0]))
    assert rp["A:1"] == pytest.approx(1.0) and rp["A:2"] == pytest.approx(0.0)

    y, p = paired_residue_arrays(labels, preds)
    assert y.tolist() == [1.0, 0.0] and p.tolist() == [pytest.approx(0.9), pytest.approx(0.1)]

    pl, pp, rl, rp2 = score_structure_vs_mesh(structure, bf, m_path, alpha=1.0)
    assert pl.shape == pp.shape == (4,)
    # vertex preds = nearest atom's bfactor
    np.testing.assert_allclose(pp, [0.1, -1.0, 0.9, 0.8], rtol=1e-6)


def test_read_pdb_bfactors_real():
    s, bf = read_pdb_bfactors(f"{BENCH}/sppider_pred/1EWY_A.pdb")
    assert s["xyz"].shape[0] == bf.shape[0] > 1000
    assert (s["name"] == "CA").sum() > 100


def test_sppider_auc_matches_expected_range():
    """End-to-end single protein vs mesh: AUC is deterministic given the
    committed data; pin it to guard the whole protocol."""
    from sklearn.metrics import roc_auc_score

    s, bf = read_pdb_bfactors(f"{BENCH}/sppider_pred/1EWY_A.pdb")
    pl, pp, rl, rp = score_structure_vs_mesh(s, bf, f"{BENCH}/ground_truth/1EWY_A.ply")
    assert 0.0 < pl.mean() < 1.0
    assert len(rl) > 100
    # the ACTUAL pinned AUCs (deterministic given the committed data):
    # shape-only checks would certify a shuffled or zeroed prediction
    assert abs(roc_auc_score(pl, pp) - 0.6446) < 0.01
    assert abs(roc_auc_score(rl, rp) - 0.7031) < 0.01
