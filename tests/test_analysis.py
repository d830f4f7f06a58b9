import json

import numpy as np
import pytest

from pesto_tpu.analysis.secondary_structure import assign_secondary_structure_ca, secondary_structure
from pesto_tpu.analysis.uniprot import (
    pack_uniprot,
    parse_features,
    parse_go_terms,
    parse_keywords,
    parse_subcellular_locations,
)
from pesto_tpu.analysis.data_manager import DataManager


def _ideal_helix(n, rise=1.5, radius=2.3, turn=100.0):
    t = np.radians(turn) * np.arange(n)
    return np.stack([radius * np.cos(t), radius * np.sin(t), rise * np.arange(n)], axis=1)


def _ideal_strand(n, rise=3.45):
    # extended chain: ~6.9 A per 2 residues with small zigzag
    xyz = np.zeros((n, 3))
    xyz[:, 0] = rise * np.arange(n)
    xyz[:, 1] = 0.5 * (np.arange(n) % 2)
    return xyz


def test_ss_helix():
    ss = assign_secondary_structure_ca(_ideal_helix(20))
    assert (ss == "H").mean() > 0.7


def test_ss_strand():
    ss = assign_secondary_structure_ca(_ideal_strand(12))
    assert (ss == "E").mean() > 0.5
    assert not (ss == "H").any()


def test_ss_structure_record(example_pdb):
    from pesto_tpu.io import read_pdb
    from pesto_tpu.structure import clean_structure

    s = clean_structure(read_pdb(example_pdb))
    ss = secondary_structure(s)
    assert len(ss) == len(np.unique(s["resid"]))
    # a kinase domain has plenty of helix and strand
    assert (ss == "H").mean() > 0.15
    assert (ss == "E").mean() > 0.05


UNIPROT_RECORD = {
    "sequence": {"value": "MKT"},
    "keywords": [{"name": "Kinase"}, {"name": "Membrane"}],
    "features": [
        {"type": "Domain", "description": "Protein kinase",
         "location": {"start": {"value": 10}, "end": {"value": 270}}},
    ],
    "comments": [
        {"commentType": "SUBCELLULAR LOCATION",
         "subcellularLocations": [{"location": {"value": "Cytoplasm"}}]},
    ],
    "uniProtKBCrossReferences": [
        {"database": "GO", "id": "GO:0004672",
         "properties": [{"key": "GoTerm", "value": "F:protein kinase activity"}]},
        {"database": "PDB", "id": "1OL5"},
    ],
}


def test_uniprot_parsers():
    assert parse_keywords(UNIPROT_RECORD) == ["Kinase", "Membrane"]
    feats = parse_features(UNIPROT_RECORD)
    assert feats[0]["type"] == "Domain" and feats[0]["begin"] == 10
    gos = parse_go_terms(UNIPROT_RECORD)
    assert gos[0]["id"] == "GO:0004672" and gos[0]["aspect"] == "F"
    assert parse_subcellular_locations(UNIPROT_RECORD) == ["Cytoplasm"]


def test_pack_uniprot(tmp_path):
    d = tmp_path / "uniprot"
    d.mkdir()
    (d / "P12345.json").write_text(json.dumps(UNIPROT_RECORD))
    out = str(tmp_path / "uniprot.h5")
    n = pack_uniprot(str(d), out)
    assert n == 1
    import h5py

    with h5py.File(out) as hf:
        assert "P12345" in hf
        assert hf["P12345/sequence"][()] == b"MKT"


def test_data_manager(tmp_path):
    for sid in ["1abc", "2def"]:
        for rep in ["run_0", "run_1"]:
            (tmp_path / sid / rep).mkdir(parents=True)
    dm = DataManager(str(tmp_path), "{sid}/run_{rep}")
    assert len(dm.keys()) == 4
    dm.save_info({"ok": 1}, "1abc", "0")
    assert dm.load_info("1abc", "0") == {"ok": 1}
    dm.save_data("rmsd", np.arange(5.0), "1abc", "0")
    assert dm.has_data("rmsd", "1abc", "0")
    np.testing.assert_array_equal(dm.load_data("rmsd", "1abc", "0"), np.arange(5.0))


def test_parse_pae_both_formats(tmp_path):
    from pesto_tpu.analysis.afdb import mean_interface_pae, parse_pae

    rec_v2 = {"predicted_aligned_error": [[0, 5], [5, 0]]}
    pae = parse_pae(rec_v2)
    assert pae.shape == (2, 2) and pae[0, 1] == 5

    rec_v1 = [{"residue1": [1, 1, 2, 2], "residue2": [1, 2, 1, 2],
               "distance": [0.0, 7.0, 7.0, 0.0]}]
    pae1 = parse_pae(rec_v1)
    assert pae1[0, 1] == 7.0
    assert mean_interface_pae(pae1, [0], [1]) == 7.0


def test_cluster_md_interface_patterns():
    from pesto_tpu.analysis.clustering import cluster_md_interface_patterns

    rng = np.random.RandomState(0)
    # two interface modes over 40 frames
    a = (rng.rand(20, 30) * 0.2)
    a[:, :10] += 0.8
    b = (rng.rand(20, 30) * 0.2)
    b[:, 20:] += 0.8
    probs = np.concatenate([a, b])
    labels, centers = cluster_md_interface_patterns(probs, n_clusters=2)
    assert len(set(labels[:20])) == 1
    assert labels[0] != labels[25]


def test_download_uniprot_fake_transport(tmp_path):
    """The full fetch path (URL construction, atomic write, skip-existing,
    per-item tolerance) driven through an injected transport — no network."""
    from pesto_tpu.analysis.uniprot import UNIPROT_REST_URL, download_uniprot

    calls = []

    def fetch(url):
        calls.append(url)
        acc = url.rsplit("/", 1)[1][:-5]
        if acc == "BAD404":
            raise ValueError("HTTP 404")
        return json.dumps({"sequence": {"value": "MKT"}, "keywords": []}).encode()

    out = download_uniprot(["P12345", "BAD404"], str(tmp_path), fetch=fetch,
                           num_workers=1)
    assert out == [str(tmp_path / "P12345.json")]
    assert calls[0] == UNIPROT_REST_URL.format(acc="P12345")
    assert json.loads((tmp_path / "P12345.json").read_text())["sequence"]["value"] == "MKT"
    # skip_existing: a second run touches no transport for the written acc
    calls.clear()
    out2 = download_uniprot(["P12345"], str(tmp_path), fetch=fetch, num_workers=1)
    assert out2 == out and calls == []


def test_download_af_pae_fake_transport(tmp_path):
    from pesto_tpu.analysis.afdb import AF_PAE_URL, download_af_pae

    rec = [{"residue1": [1, 1, 2, 2], "residue2": [1, 2, 1, 2],
            "distance": [0.0, 7.0, 7.0, 0.0]}]
    seen = []

    def fetch(url):
        seen.append(url)
        return json.dumps(rec).encode()

    paths = download_af_pae(["AF-P12345-F1"], str(tmp_path), version="v4", fetch=fetch)
    assert seen == [AF_PAE_URL.format(key="AF-P12345-F1", ver="v4")]
    pae = np.load(paths[0])
    assert pae.dtype == np.float16 and pae.shape == (2, 2) and pae[0, 1] == 7.0
    # resume: no refetch
    seen.clear()
    assert download_af_pae(["AF-P12345-F1"], str(tmp_path), fetch=fetch) == paths
    assert seen == []


def test_download_offline_error_is_actionable(tmp_path, monkeypatch):
    """With the DEFAULT transport and no egress, the failure must name the
    remedy (local files + parse_*) instead of a bare socket error."""
    import urllib.error

    from pesto_tpu.analysis import uniprot as up

    monkeypatch.setattr(
        "urllib.request.urlopen",
        lambda *a, **k: (_ for _ in ()).throw(urllib.error.URLError("blocked")),
    )
    with pytest.raises(RuntimeError, match="place UniProt REST JSON"):
        up.download_uniprot(["P12345"], str(tmp_path), num_workers=1)


def test_default_fetch_distinguishes_http_errors(monkeypatch, tmp_path):
    """HTTPError (the server ANSWERED: 404/500) must stay a per-item
    failure — it subclasses URLError, and misclassifying it as the
    offline condition aborts a whole batch over one bad key."""
    import io
    import urllib.error

    from pesto_tpu.analysis.uniprot import download_uniprot

    def fake_urlopen(url, timeout=0):
        if "BAD404" in url:
            raise urllib.error.HTTPError(url, 404, "not found", {}, io.BytesIO())

        class R:
            def read(self_inner):
                return b"{}"

            def __enter__(self_inner):
                return self_inner

            def __exit__(self_inner, *a):
                return False

        return R()

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    out = download_uniprot(["BAD404", "P12345"], str(tmp_path), num_workers=1)
    assert out == [str(tmp_path / "P12345.json")]
