"""Interfaceome downstream analyses (reference: interfaceome/
analysis_clinvar.ipynb, analysis_interfaces_uniprot_features.ipynb,
analysis_cointerfaces.ipynb — logic as library functions; the notebooks'
input datasets are not in the mount, so synthetic fixtures exercise the
exact aggregation semantics)."""

import numpy as np
import pytest

from pesto_tpu.analysis.interfaceome_analyses import (
    aggregate_interfaces_tags,
    annotate_interfaces,
    classify_clinvar,
    cointerface_statistics,
    extract_dbsnp_ids,
    feature_interface_overlap,
    filter_quality_interfaces,
    interface_coverage,
    interface_type_counts,
    tag_enrichment,
    variant_interface_overlap,
)


def _structures():
    # two proteins, 10 residues each; p0 high on 0..4 for A, low for B
    mk = lambda hi: {
        f"p{i}": (np.r_[np.full(5, hi if i == 0 else 0.1), np.full(5, 0.1)])
        for i in range(5)
    }
    A = mk(0.9); A["resid"] = np.arange(10)
    B = mk(0.3); B["resid"] = np.arange(10)
    return {"A": A, "B": B}


def test_filter_quality_and_coverage():
    structures = _structures()
    multi = {
        "A": {"protein": [[0, 1, 2]], "protein+ion": [[3, 4]]},
        "B": {"protein": [[0, 1, 2]]},
    }
    q = filter_quality_interfaces(structures, multi, p_thr=0.8)
    assert q["A"]["protein"] == [[0, 1, 2]]          # mean p0 = 0.9 > 0.8
    assert q["B"]["protein"] == []                   # mean p0 = 0.3
    # multi-type itype not in itypes_sel passes through unfiltered
    assert q["A"]["protein+ion"] == [[3, 4]]

    cov = interface_coverage(structures, q)
    # A: residues {0,1,2,3,4} = 5 of 10; B: none of 10
    assert cov.tolist() == [[5, 10], [0, 10]]


def test_aggregate_tags_and_enrichment():
    structures = _structures()
    interfaces = {
        "A": [[[0, 1, 2]], [], [], [], []],
        "B": [[[0, 1]], [], [], [], []],
    }
    tags = {"A": ["Nucleus", "Cytoplasm"], "B": ["Nucleus"]}
    mp, counts = aggregate_interfaces_tags(structures, tags, interfaces)
    assert counts == {"Nucleus": 2, "Cytoplasm": 1}
    assert mp[0]["Nucleus"] == [pytest.approx(0.9), pytest.approx(0.3)]
    assert mp[0]["Cytoplasm"] == [pytest.approx(0.9)]

    H, sel = tag_enrichment(mp, counts, sel_tags=["Nucleus", "Cytoplasm"], p_thr=0.8)
    # Nucleus: 1 of 2 proteins has a >0.8 protein interface; Cytoplasm: 1/1
    assert H[0, 0] == pytest.approx(0.5)
    assert H[1, 0] == pytest.approx(1.0)


def test_clinvar_classification_and_overlap():
    pd = pytest.importorskip("pandas")
    assert extract_dbsnp_ids("in dbSNP:rs123 and dbSNP:rs456") == [123, 456]
    assert classify_clinvar("Pathogenic;Benign") == "pathogenic"
    assert classify_clinvar("Likely benign") == "benign"
    assert classify_clinvar("Uncertain significance") == ""

    df = pd.DataFrame(
        {
            "ftype": ["mutagenesis site"] * 4,
            "mpi": [0.9, 0.6, -1.0, 0.9],
            "itype": ["protein", "protein", "", "ion"],
        }
    )
    # mpi_thr=0.8 keeps rows 0, 2, 3 -> 2 of 3 overlap an interface
    assert feature_interface_overlap(df, ["mutagenesis site"], 0.8) == pytest.approx(100 * 2 / 3)

    dfv = pd.DataFrame(
        {"RS# (dbSNP)": [11, 22], "ClinicalSignificance": ["Pathogenic", "Benign"]}
    )
    feats = pd.DataFrame(
        {
            "ftype": ["sequence variant"] * 3,
            "mpi": [0.9, 0.9, -1.0],
            "itype": ["protein", "", ""],
            "desc": ["x dbSNP:rs11", "y dbSNP:rs22", "z dbSNP:rs22"],
        }
    )
    out = variant_interface_overlap(feats, dfv, 0.8)
    assert out["pathogenic"] == pytest.approx(100.0)  # rs11 row overlaps
    assert out["benign"] == pytest.approx(0.0)        # rs22 rows do not


def test_annotate_and_cointerfaces():
    structures = _structures()
    structures["A"]["annotation"] = np.array(["Active site:Site"] * 5 + [""] * 5)
    multi = {
        "A": {"protein": [[0, 1], [5, 6]], "ion": [[7, 8]], "protein+ion": [[2, 3]]},
        "B": {"protein": [[0, 1]]},
    }
    recs = annotate_interfaces(structures, multi, sel_tags=["Active site"])
    assert len(recs) == 5
    r0 = [r for r in recs if r["itype"] == "protein" and r["uniprot"] == "A"][0]
    assert r0["mpi"] == pytest.approx(0.9)
    assert r0["notes"] == "Active site"

    counts = interface_type_counts(recs)
    assert counts["A"] == {"protein": 2, "ion": 1, "protein+ion": 1}
    co = cointerface_statistics(counts)
    # A has a joint protein+ion interface AND separate protein (2) and ion
    # (1) interfaces — single-type and joint interfaces are disjoint
    # records, so A counts for both the joint and the separate statistic
    assert co["protein+ion"] == 1.0
    assert co["protein|ion"] == 1.0
    # pair with no joint itype: dna/rna never present
    assert co["protein+dna/rna"] == 0.0


def test_per_residue_ratios_and_sasa():
    from pesto_tpu.analysis.interfaceome_analyses import (
        SS_CLASS,
        interface_sasa_statistics,
        per_residue_interface_ratios,
    )

    entry = {
        "resname": np.array(["ALA", "ALA", "GLY", "GLY"]),
        "ss": np.array(["H", "E", "T", "H"]),
        "afs": np.array([90.0, 90.0, 90.0, 50.0]),  # last residue excluded
        "annotation": np.array(["Active site:Site", "", "Site", ""]),
    }
    for j in range(5):
        entry[f"p{j}"] = np.array([0.9, 0.1, 0.9, 0.9]) if j == 0 else np.zeros(4)
    data = {"A": entry}

    r = per_residue_interface_ratios(data, "resname", p_thr=0.8)
    assert r[0]["ALA"] == pytest.approx(0.5)   # one of two confident ALA
    assert r[0]["GLY"] == pytest.approx(1.0)   # 4th residue dropped by afs
    assert r[1]["ALA"] == 0.0

    rs = per_residue_interface_ratios(data, "ss", key_map=SS_CLASS)
    assert rs[0]["helix"] == pytest.approx(1.0)
    assert rs[0]["strand"] == pytest.approx(0.0)
    assert rs[0]["coil"] == pytest.approx(1.0)

    ra = per_residue_interface_ratios(data, "annotation", split_notes=True)
    assert ra[0]["Active site"] == pytest.approx(1.0)
    assert ra[0]["Site"] == pytest.approx(1.0)  # residues 0 and 2, both hits

    sasa = {"A": np.array([10.0, 20.0, 30.0, 40.0])}
    multi = {"A": {"protein": [[0, 1]], "ion": [[2]]}}
    surf, rel = interface_sasa_statistics(sasa, multi)
    assert surf["protein"] == [pytest.approx(30.0)]
    assert rel["ion"] == [pytest.approx(30.0 / 100.0)]


def test_curated_feature_table_and_af_selection():
    from pesto_tpu.analysis.interfaceome_analyses import (
        alphafold_model_metrics,
        curate_feature_interface_table,
        flatten_single_type_interfaces,
        select_alphafold_models,
    )

    structures = _structures()
    structures["A"]["afs"] = np.full(10, 90.0)
    multi = {"A": {"protein": [[0, 1, 2]], "protein+ion": [[5, 6]]}}
    flat = flatten_single_type_interfaces(multi)
    assert flat["A"] == [{"iid": 0, "itype": "protein", "iids": [0, 1, 2]}]

    features = {
        "A": [
            {"ftype": "mutagenesis site", "pos": 2, "desc": "d1"},      # residue idx 1
            {"ftype": "mutagenesis site", "pos": (8, 9), "desc": "d2"}, # idx 7-8, no overlap
            {"ftype": "sequence variant", "pos": 99, "desc": "d3"},     # beyond model
        ]
    }
    rows = curate_feature_interface_table(structures, flat, features)
    assert len(rows) == 3
    assert rows[0]["itype"] == "protein" and rows[0]["mpi"] == pytest.approx(0.9)
    assert rows[0]["Nc"] == 1 and rows[0]["Ni"] == 3
    assert rows[1]["itype"] == "" and rows[1]["mpi"] == -1.0
    assert rows[2]["itype"] == "" and rows[2]["mafs"] == -1.0

    afs = np.array([90.0] * 8 + [10.0] * 2)
    pae = np.full((10, 10), 5.0)
    m = alphafold_model_metrics(afs, pae)
    assert m["r_size"] == pytest.approx(0.8)
    assert m["s_mPAE"] == pytest.approx(5.0)
    sel = select_alphafold_models([m, {**m, "s_mPAE": 20.0}, {**m, "r_size": 0.5}])
    assert sel.tolist() == [True, False, False]
