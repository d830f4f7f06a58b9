import numpy as np
import pytest

from pesto_tpu.analysis.surface_map import nearest_atoms, vertex_labels_to_residues
from pesto_tpu.data.pdb_dataset import PDBFolderDataset
from pesto_tpu.traj.match import align, identify

from tests.test_data import _two_chain_pdb


def _struct(n=12, chain="A", resid_start=1):
    rng = np.random.RandomState(0)
    names = np.tile(["N", "CA", "C"], n // 3)
    return {
        "xyz": rng.rand(n, 3).astype(np.float32),
        "name": names,
        "element": np.array([nm[0] for nm in names]),
        "resname": np.repeat(["ALA"], n),
        "resid": np.repeat(np.arange(resid_start, resid_start + n // 3), 3),
        "chain_name": np.array([f"{chain}:0"] * n),
    }


def test_identify_exact_match():
    a = _struct()
    b = _struct()
    ia, ib = identify(a, b)
    assert len(ia) == 12
    np.testing.assert_array_equal(ia, ib)


def test_identify_with_offset_and_subset():
    a = _struct(n=12, resid_start=1)
    b = _struct(n=9, resid_start=101)  # renumbered + missing last residue
    ia, ib = identify(a, b)
    assert len(ia) == 9
    assert np.array_equal(a["name"][ia], b["name"][ib])


def test_align_ca_only():
    a = _struct()
    b = _struct(n=9, resid_start=101)
    out = align(a, b, selection_names=("CA",))
    assert out.shape[1] == 2
    assert np.all(a["name"][out[:, 0]] == "CA")
    assert np.all(b["name"][out[:, 1]] == "CA")


def test_nearest_atoms_and_residue_mapping():
    xyz = np.array([[0, 0, 0], [10, 0, 0], [20, 0, 0]], dtype=np.float32)
    verts = np.array([[0.1, 0, 0], [19.5, 0, 0]], dtype=np.float32)
    ids = nearest_atoms(verts, xyz)
    np.testing.assert_array_equal(ids, [0, 2])

    structure = {"xyz": xyz, "resid": np.array([1, 2, 3])}
    labels, ures = vertex_labels_to_residues(verts, [1.0, 0.5], structure)
    np.testing.assert_array_equal(ures, [1, 2, 3])
    assert labels[0] == 1.0 and labels[2] == 0.5 and labels[1] == 0.0


def test_pdb_folder_dataset(tmp_path):
    good = _two_chain_pdb(tmp_path)
    bad = tmp_path / "broken.pdb"
    bad.write_text("NOT A PDB\n")
    ds = PDBFolderDataset([good, str(bad)])
    assert len(ds) == 2
    subunits, path = ds[0]
    assert subunits is not None and len(subunits) >= 2
    nothing, path2 = ds[1]
    assert nothing is None


def test_code_snapshot(tmp_path):
    from pesto_tpu.train.checkpoint import save_code_snapshot

    out = save_code_snapshot(str(tmp_path))
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert any(n.endswith("models/pesto.py") for n in names)
    assert any(n.endswith("native/pdbparse.cpp") for n in names)
