"""mmCIF structure reader: record-equivalence with read_pdb on converted
real structures (capability beyond the reference, which reads only legacy
PDB + component CIFs — src/structure_io.py)."""

import gzip

import numpy as np
import pytest

from pesto_tpu.io import read_mmcif, read_pdb, read_structure

KINASE = "/root/reference/examples/kinase/1OL5_A.pdb"


def _pdb_to_mmcif_text(structure) -> str:
    """Minimal mmCIF writer for round-trip testing (auth_* fields)."""
    lines = [
        "data_test",
        "#",
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.type_symbol",
        "_atom_site.auth_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.auth_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.pdbx_PDB_model_num",
    ]
    for i in range(structure["xyz"].shape[0]):
        chain, mid = structure["chain_name"][i].rsplit(":", 1)
        x, y, z = structure["xyz"][i]
        group = "ATOM" if structure["het_flag"][i] == "A" else "HETATM"
        icode = structure["icode"][i] or "?"
        lines.append(
            f"{group} {i+1} {structure['element'][i]} {structure['name'][i]} . "
            f"{structure['resname'][i]} {chain} {structure['resid'][i]} {icode} "
            f"{x:.3f} {y:.3f} {z:.3f} {int(mid)+1}"
        )
    lines.append("#")
    return "\n".join(lines) + "\n"


def test_mmcif_matches_pdb_on_real_structure(tmp_path):
    ref = read_pdb(KINASE)
    cif_path = tmp_path / "s.cif"
    cif_path.write_text(_pdb_to_mmcif_text(ref))
    got = read_mmcif(str(cif_path))
    np.testing.assert_allclose(got["xyz"], ref["xyz"], atol=1e-3)
    for field in ("name", "element", "resname", "resid", "het_flag", "chain_name", "icode"):
        np.testing.assert_array_equal(got[field], ref[field], err_msg=field)


def test_mmcif_gz_multimodel_and_altloc(tmp_path):
    txt = """data_x
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.auth_atom_id
_atom_site.label_alt_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 C CA A ALA A 1 ? 0.0 0.0 0.0 1
ATOM 2 C CA B ALA A 1 ? 9.0 9.0 9.0 1
HETATM 3 O O . HOH B 2 ? 1.0 1.0 1.0 1
ATOM 4 C CA . ALA A 1 ? 0.5 0.5 0.5 2
#
"""
    p = tmp_path / "m.cif.gz"
    with gzip.open(p, "wt") as f:
        f.write(txt)
    s = read_structure(str(p))
    # altloc B dropped, two models -> chain suffixes :0/:1, HETATM flagged
    assert s["xyz"].shape == (3, 3)
    assert list(s["chain_name"]) == ["A:0", "B:0", "A:1"]
    assert list(s["het_flag"]) == ["A", "H", "A"]
    np.testing.assert_allclose(s["xyz"][0], [0, 0, 0])


def test_read_structure_dispatch():
    s = read_structure(KINASE)
    assert s["xyz"].shape[0] > 1000
    with pytest.raises(ValueError):
        read_mmcif(KINASE)  # not a cif: no atom_site loop


def test_mmcif_multimodel_altlocs_kept_per_model(tmp_path):
    """Altloc dedup is per-model: NMR ensembles repeat every atom per
    model; a model-less key would drop all altloc atoms of models >= 2."""
    txt = """data_x
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.auth_atom_id
_atom_site.label_alt_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 C CA A ALA A 1 ? 0.0 0.0 0.0 1
ATOM 2 C CA B ALA A 1 ? 9.0 9.0 9.0 1
ATOM 3 C CA A ALA A 1 ? 0.5 0.5 0.5 2
ATOM 4 C CA B ALA A 1 ? 9.5 9.5 9.5 2
#
"""
    p = tmp_path / "nmr.cif"
    p.write_text(txt)
    s = read_mmcif(str(p))
    # first altloc kept in EACH model
    assert list(s["chain_name"]) == ["A:0", "A:1"]
    np.testing.assert_allclose(s["xyz"][:, 0], [0.0, 0.5])


def test_mmcif_quoted_values_and_header_gap(tmp_path):
    """Quoted values containing spaces must not shift columns, and a
    comment/blank line between the tag block and the first data row must
    not abort the parse."""
    txt = """data_x
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.auth_atom_id
_atom_site.label_alt_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
# comment between header and data

ATOM 1 C "CA X" . ALA A 1 ? 1.0 2.0 3.0 1
ATOM 2 N 'N 1' . GLY A 2 ? 4.0 5.0 6.0 1
#
"""
    p = tmp_path / "q.cif"
    p.write_text(txt)
    s = read_mmcif(str(p))
    assert s["xyz"].shape == (2, 3)
    assert list(s["name"]) == ["CA X", "N 1"]
    assert list(s["resid"]) == [1, 2]
    np.testing.assert_allclose(s["xyz"][1], [4.0, 5.0, 6.0])
