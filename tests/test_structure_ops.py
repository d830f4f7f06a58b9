import numpy as np
import pytest

from pesto_tpu.io import read_pdb
from pesto_tpu.structure import (
    clean_structure,
    concatenate_chains,
    encode_bfactor,
    filter_non_atomic_subunits,
    preprocess_structure,
    remove_duplicate_tagged_subunits,
    split_by_chain,
    tag_hetatm_chains,
)


def _mini_structure():
    # 2 chains, waters, hydrogens, hetatm ligand
    n = 10
    return {
        "xyz": np.arange(n * 3, dtype=np.float32).reshape(n, 3),
        "name": np.array(["N", "CA", "H", "C", "O", "CA", "C1", "O", "O", "ZN"]),
        "element": np.array(["N", "C", "H", "C", "O", "C", "C", "O", "O", "Zn"]),
        "resname": np.array(["ALA", "ALA", "ALA", "ALA", "ALA", "GLY", "LIG", "HOH", "HOH", "ZN"]),
        "resid": np.array([1, 1, 1, 1, 1, 2, 90, 91, 92, 99], dtype=np.int32),
        "het_flag": np.array(["A", "A", "A", "A", "A", "A", "H", "H", "H", "H"]),
        "chain_name": np.array(["A:0"] * 6 + ["B:0"] * 4),
        "icode": np.array([""] * 10),
    }


def test_clean_structure_removes_water_and_h():
    s = clean_structure(_mini_structure())
    assert "HOH" not in s["resname"]
    assert "H" not in s["element"]
    assert "icode" not in s
    # renumbered resids: ALA(4 atoms)=1, GLY=2, LIG=3, ZN=4
    assert list(s["resid"]) == [1, 1, 1, 1, 2, 3, 4]


def test_clean_structure_resid_renumber_on_chain_change():
    s = _mini_structure()
    # same author resid across a chain boundary must still split residues
    s["resid"] = np.array([5, 5, 5, 5, 5, 5, 5, 5, 5, 5], dtype=np.int32)
    out = clean_structure(s)
    assert out["resid"][0] == 1
    assert out["resid"][-1] == 2  # new chain => new residue


def test_tag_hetatm_chains():
    s = clean_structure(_mini_structure())
    s = tag_hetatm_chains(s)
    tags = set(s["chain_name"][s["het_flag"] == "H"])
    # LIG and ZN are different hetatm residues -> distinct pseudo chains
    assert tags == {"B:0:0", "B:0:1"}
    assert set(s["chain_name"][s["het_flag"] == "A"]) == {"A:0"}


def test_split_concat_roundtrip():
    s = clean_structure(_mini_structure())
    subunits = split_by_chain(s)
    assert set(subunits) == {"A:0", "B:0"}
    merged = concatenate_chains(subunits)
    assert merged["xyz"].shape[0] == s["xyz"].shape[0]
    assert set(np.unique(merged["chain_name"])) == {"A:0", "B:0"}


def test_filter_non_atomic_subunits():
    subs = {
        "ions": {"xyz": np.zeros((3, 3)), "resid": np.array([1, 2, 3])},
        "prot": {"xyz": np.zeros((6, 3)), "resid": np.array([1, 1, 1, 2, 2, 2])},
        "single": {"xyz": np.zeros((1, 3)), "resid": np.array([1])},
    }
    out = filter_non_atomic_subunits(subs)
    assert set(out) == {"prot", "single"}


def test_remove_duplicate_tagged_subunits():
    xyz = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    subs = {
        "A:0:0": {"xyz": xyz.copy()},
        "B:0:1": {"xyz": xyz + 0.05},   # duplicate within 0.2 A
        "C:0:2": {"xyz": xyz + 5.0},    # distinct
        "A:0": {"xyz": xyz.copy()},      # untagged: never removed
    }
    out = remove_duplicate_tagged_subunits(subs)
    assert "B:0:1" not in out
    assert {"A:0:0", "C:0:2", "A:0"} <= set(out)


def test_preprocess_example(example_complex_pdb):
    s = read_pdb(example_complex_pdb)
    subunits = preprocess_structure(s)
    assert len(subunits) >= 2
    for name, su in subunits.items():
        assert su["xyz"].shape[0] > 0
        assert "chain_name" not in su


def test_encode_bfactor_per_residue():
    s = clean_structure(_mini_structure())
    n_res = np.unique(s["resid"]).shape[0]
    p = np.linspace(0.1, 0.9, n_res).astype(np.float32)
    s = encode_bfactor(s, p)
    assert s["bfactor"].shape[0] == s["xyz"].shape[0]
    # all atoms of residue 1 share its probability
    assert np.all(s["bfactor"][s["resid"] == 1] == p[0])


def test_clean_matches_reference_oracle(example_complex_pdb):
    """Compare against the reference implementation executed as an oracle."""
    ref = pytest.importorskip("numpy")  # noqa: F841  (always present)
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from src.structure import clean_structure as ref_clean
        from src.structure import tag_hetatm_chains as ref_tag
    except Exception:
        pytest.skip("reference modules not importable")
    finally:
        sys.path.remove("/root/reference")

    s1 = read_pdb(example_complex_pdb)
    s2 = {k: v.copy() for k, v in s1.items()}
    ours = tag_hetatm_chains(clean_structure(s1))
    theirs = ref_tag(ref_clean(s2))
    assert np.array_equal(ours["resid"], theirs["resid"])
    assert np.array_equal(ours["chain_name"].astype(str), theirs["chain_name"].astype(str))
    np.testing.assert_allclose(ours["xyz"], theirs["xyz"])
