import numpy as np
import pytest

from pesto_tpu.io import read_pdb, save_pdb


def test_read_example_pdb(example_pdb):
    s = read_pdb(example_pdb)
    n = s["xyz"].shape[0]
    assert n > 100
    for key in ["name", "element", "resname", "resid", "het_flag", "chain_name", "icode"]:
        assert s[key].shape[0] == n
    assert s["xyz"].dtype == np.float32
    # first atom of 1OL5_A.pdb: N of SER 123 chain A
    assert s["name"][0] == "N"
    assert s["resname"][0] == "SER"
    assert int(s["resid"][0]) == 123
    assert s["element"][0] == "N"
    assert s["chain_name"][0] == "A:0"
    assert s["het_flag"][0] == "A"
    np.testing.assert_allclose(s["xyz"][0], [174.192, 196.109, 19.556], atol=1e-3)


def test_read_complex_with_hetatms(example_complex_pdb):
    s = read_pdb(example_complex_pdb)
    assert set(np.unique(s["het_flag"])) <= {"A", "H"}
    # multiple chains expected
    assert len(np.unique(s["chain_name"])) >= 2


def test_roundtrip_write_read(tmp_path, example_pdb):
    s = read_pdb(example_pdb)
    su = {"A:0": {k: v for k, v in s.items() if k not in ("chain_name", "icode")}}
    su["A:0"]["bfactor"] = np.linspace(0, 1, s["xyz"].shape[0]).astype(np.float32)
    out = tmp_path / "out.pdb"
    save_pdb(su, str(out))
    s2 = read_pdb(str(out))
    assert s2["xyz"].shape == s["xyz"].shape
    np.testing.assert_allclose(s2["xyz"], s["xyz"], atol=1.5e-3)
    assert np.array_equal(s2["name"], s["name"])
    assert np.array_equal(s2["element"], s["element"])
    assert np.array_equal(s2["resname"], s["resname"])
    assert np.array_equal(s2["resid"].astype(np.int64), s["resid"].astype(np.int64))


def test_reader_matches_reference_writer_format(reference_dir):
    # files under examples/*_i0.pdb were written by the reference writer;
    # our reader must parse them and find sane b-factors in [0,1].
    p = reference_dir / "examples" / "kinase" / "1OL5_A_i0.pdb"
    if not p.exists():
        pytest.skip("golden output missing")
    s = read_pdb(str(p))
    assert s["xyz"].shape[0] > 100


def test_multimodel_parsing(tmp_path):
    text = """MODEL        1
ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N
ENDMDL
MODEL        2
ATOM      1  N   ALA A   1       1.000   0.000   0.000  1.00  0.00           N
ENDMDL
END
"""
    f = tmp_path / "mm.pdb"
    f.write_text(text)
    s = read_pdb(str(f))
    assert s["xyz"].shape[0] == 2
    assert list(s["chain_name"]) == ["A:0", "A:1"]


def test_altloc_keeps_first(tmp_path):
    text = """ATOM      1  CA ASER A   1       0.000   0.000   0.000  0.50  0.00           C
ATOM      2  CA BSER A   1       9.000   0.000   0.000  0.50  0.00           C
END
"""
    f = tmp_path / "al.pdb"
    f.write_text(text)
    s = read_pdb(str(f))
    assert s["xyz"].shape[0] == 1
    assert s["xyz"][0, 0] == 0.0


def test_element_guess_when_blank(tmp_path):
    text = """ATOM      1  CA  ALA A   1       0.000   0.000   0.000  1.00  0.00
HETATM    2 ZN    ZN A   2       3.000   0.000   0.000  1.00  0.00
END
"""
    f = tmp_path / "el.pdb"
    f.write_text(text)
    s = read_pdb(str(f))
    assert s["element"][0] == "C"
    assert s["element"][1] == "Zn"


def test_bfactor_parsed_and_survives_cleaning():
    """Both parsers carry the B-factor column (the reference's gemmi reader
    keeps it; pLDDT filtering and benchmark truths live there), and the
    cleaning chain propagates it."""
    import numpy as np

    from pesto_tpu.io import read_pdb
    from pesto_tpu.structure import clean_structure

    path = "/root/reference/examples/kinase/1OL5_A.pdb"
    s = read_pdb(path)
    assert "bfactor" in s and s["bfactor"].shape == s["resid"].shape
    raw = np.array(
        [float(l[60:66]) for l in open(path) if l.startswith(("ATOM", "HETATM"))]
    )
    # the values must ACTUALLY match (a silent `if counts align` guard
    # would skip the only value comparison exactly when the reader starts
    # dropping rows while misassigning columns); this file carries no
    # altloc duplicates, so the counts are required to align
    assert len(raw) == len(s["bfactor"]), (len(raw), len(s["bfactor"]))
    np.testing.assert_allclose(s["bfactor"], raw, atol=1e-3)
    assert s["bfactor"].std() > 0  # real values, not zeros

    c = clean_structure(s)
    assert "bfactor" in c and c["bfactor"].shape == c["resid"].shape

    import os

    os.environ["PESTO_NO_NATIVE"] = "1"
    try:
        s_py = read_pdb(path)
    finally:
        del os.environ["PESTO_NO_NATIVE"]
    np.testing.assert_allclose(s_py["bfactor"], s["bfactor"], atol=1e-4)


def test_pdb_multimodel_altlocs_kept_per_model(tmp_path):
    """Altloc dedup key includes the MODEL id (NMR ensembles repeat each
    altloc-flagged atom per model; gemmi keeps the first altloc per model,
    reference src/structure_io.py:6-55)."""
    lines = []
    for m in (1, 2):
        lines.append(f"MODEL     {m:>4}")
        for alt, x in (("A", 1.0), ("B", 9.0)):
            lines.append(
                f"ATOM      1  CA {alt}ALA A   1    {x:8.3f}{x:8.3f}{x:8.3f}"
                f"  1.00  0.00           C"
            )
        lines.append("ENDMDL")
    p = tmp_path / "nmr.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    from pesto_tpu.io import read_pdb

    s = read_pdb(str(p))
    assert list(s["chain_name"]) == ["A:0", "A:1"]
    np.testing.assert_allclose(s["xyz"][:, 0], [1.0, 1.0])


def test_save_pdb_blank_chain(tmp_path):
    """A blank chain column parses to chain ':0'-style names; the writer
    must fall back to 'A' for the 1-char chain field instead of crashing."""
    from pesto_tpu.io import read_pdb, save_pdb
    from pesto_tpu.structure import split_by_chain

    src = tmp_path / "blank_chain.pdb"
    src.write_text(
        "ATOM      1  N   ALA     1      11.104   6.134  -6.504  1.00  0.00           N\n"
        "ATOM      2  CA  ALA     1      11.639   6.071  -5.147  1.00  0.00           C\n"
        "END\n"
    )
    s = read_pdb(str(src))
    out = tmp_path / "out.pdb"
    save_pdb(split_by_chain(s), str(out))
    lines = [ln for ln in out.read_text().splitlines() if ln.startswith("ATOM")]
    assert len(lines) == 2
    assert lines[0][21] == "A"
    # the fixed columns still parse
    assert abs(float(lines[0][30:38]) - 11.104) < 1e-6


def test_guess_element_standard_residues():
    """HG in SER is a gamma-hydrogen, not mercury; NA stays sodium only
    when the residue IS the ion."""
    from pesto_tpu.io.pdb import _guess_element

    assert _guess_element("HG", "SER") == "H"
    assert _guess_element("1HG2", "THR") == "H"
    assert _guess_element("NA", "HEM") == "N"
    assert _guess_element("NA", "NA") == "Na"
    assert _guess_element("HG", "HG") == "Hg"
    assert _guess_element("ZN", "ZN") == "Zn"
    assert _guess_element("CL", "LIG") == "Cl"  # unambiguous two-letter


def test_read_traj_pdb_mismatched_frames_raise(tmp_path):
    from pesto_tpu.io.pdb import read_traj_pdb

    src = tmp_path / "traj.pdb"
    src.write_text(
        "MODEL     1\n"
        "ATOM      1  N   ALA A   1      1.000   0.000   0.000  1.00  0.00           N\n"
        "ATOM      2  CA  ALA A   1      2.000   0.000   0.000  1.00  0.00           C\n"
        "ENDMDL\n"
        "MODEL     2\n"
        "ATOM      1  N   ALA A   1      1.100   0.000   0.000  1.00  0.00           N\n"
        "ENDMDL\n"
        "END\n"
    )
    with pytest.raises(ValueError, match="atom counts"):
        read_traj_pdb(str(src))


def test_save_traj_pdb_roundtrips_tagged_chains(tmp_path):
    """save_traj_pdb writes the 1-char chain column (a tagged 'A:0' name
    used to shift every downstream fixed column)."""
    import numpy as np_

    from pesto_tpu.io.pdb import read_traj_pdb, save_traj_pdb

    su = {
        "A:0": {
            "xyz": np_.array([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]] * 3),
            "name": np_.array(["N", "CA"]),
            "element": np_.array(["N", "C"]),
            "resname": np_.array(["ALA", "ALA"]),
            "resid": np_.array([1, 1]),
            "het_flag": np_.array(["A", "A"]),
        }
    }
    out = tmp_path / "traj.pdb"
    save_traj_pdb(su, str(out))
    s, frames = read_traj_pdb(str(out))
    assert frames.shape == (3, 2, 3)
    np_.testing.assert_allclose(frames[0, 0], [1.0, 2.0, 3.0], atol=1e-3)
