"""Interfaceome downstream analyses: UniProt features, ClinVar variants,
subcellular-location / GO-term aggregation, interface coverage.

Library form of the reference's interfaceome notebooks — the mount ships
the notebooks but not their input datasets, so the logic lives here as
plain tested functions over the documented inputs:

  - analysis_clinvar.ipynb: feature/variant <-> interface overlap
    probabilities, ClinVar pathogenic/benign classification via dbSNP ids
    (cells 4-8), quality-interface filtering and coverage (cells 11-13);
  - analysis_interfaces_uniprot_features.ipynb: per-tag aggregation of
    best-interface predictions and the high-confidence fraction per
    subcellular location / GO term (cells 3, 7, 11).

Data model (matching the reference's aggregated stores):
  structures:  {uniprot: {"p0".."p4": [n_res] per-class interface probs,
                          "resid": [n_res]}}
  interfaces:  {uniprot: [list of interfaces per class i in 0..4], each
                interface a list of residue indices}
  multi_interfaces: {uniprot: {itype ("protein", "protein+ion", ...):
                [interfaces (residue-index lists)]}}
"""

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

INTERFACE_LABELS = ["protein", "dna/rna", "ion", "ligand", "lipid"]
_LABELS_MAP = {"protein": "p0", "dna/rna": "p1", "ion": "p2", "ligand": "p3", "lipid": "p4"}

# ClinVar ClinicalSignificance keyword sets (analysis_clinvar.ipynb cell 6)
PATHOGENIC_KEYWORDS = [
    "Likely pathogenic", "Likely pathogenic, Affects",
    "Likely pathogenic, other", "Likely pathogenic, risk factor",
    "Pathogenic", "Pathogenic, Affects", "Pathogenic, drug response",
    "Pathogenic, other", "Pathogenic, risk factor",
    "Pathogenic/Likely pathogenic",
    "Pathogenic/Likely pathogenic, drug response",
    "Pathogenic/Likely pathogenic, other",
    "Pathogenic/Likely pathogenic, risk factor",
]
BENIGN_KEYWORDS = [
    "Benign", "Benign, confers sensitivity", "Benign, other",
    "Benign, risk factor", "Benign/Likely benign",
    "Benign/Likely benign, other", "Benign/Likely benign, risk factor",
    "Likely benign", "Likely benign, drug response, other",
    "Likely benign, other",
]


def extract_dbsnp_ids(desc: str) -> List[int]:
    """dbSNP rs-numbers from a UniProt feature description (cell 6)."""
    return [int(i) for i in re.findall(r"dbSNP:rs([0-9]*)", desc or "")]


def clinvar_significance(variant_table, rs_ids: Sequence[int]) -> str:
    """';'-joined unique ClinicalSignificance strings for the given
    dbSNP ids. variant_table: pandas DataFrame of ClinVar's
    variant_summary.txt (columns 'RS# (dbSNP)', 'ClinicalSignificance')."""
    sig = []
    for rs in rs_ids:
        rows = variant_table[variant_table["RS# (dbSNP)"] == rs]["ClinicalSignificance"]
        sig.extend(list(rows))
    return ";".join(np.unique(sig)) if sig else ""


def classify_clinvar(clinvar: str) -> str:
    """'pathogenic' / 'benign' / '' by the notebook's keyword sets."""
    parts = clinvar.split(";")
    if any(kw in parts for kw in PATHOGENIC_KEYWORDS):
        return "pathogenic"
    if any(kw in parts for kw in BENIGN_KEYWORDS):
        return "benign"
    return ""


def feature_interface_overlap(features, ftypes: Sequence[str], mpi_thr: float) -> float:
    """Probability [%] that a UniProt feature of the given types overlaps
    ANY predicted interface (cell 4). `features`: pandas DataFrame with
    columns 'ftype', 'mpi' (mean prediction at the feature site; < 0 =
    feature outside any interface) and 'itype' ('' = no interface)."""
    dfs = features[features["ftype"].isin(list(ftypes))]
    dfs = dfs[(dfs["mpi"] > mpi_thr) | (dfs["mpi"] < 0)]
    frac = dfs["itype"].value_counts(normalize=True)
    return 1e2 * (1.0 - float(frac.get("", 0.0)))


def variant_interface_overlap(features, variant_table, mpi_thr: float) -> Dict[str, float]:
    """Overlap probability [%] of 'sequence variant' features with any
    interface, split by ClinVar class (cell 6). Returns
    {'pathogenic': %, 'benign': %}."""
    dfs = features[features["ftype"].isin(["sequence variant"])]
    dfs = dfs[(dfs["mpi"] > mpi_thr) | (dfs["mpi"] < 0)].copy()
    dfs["clinvar"] = [
        clinvar_significance(variant_table, extract_dbsnp_ids(d)) for d in dfs["desc"].values
    ]
    out = {}
    for label, keywords in (("pathogenic", PATHOGENIC_KEYWORDS), ("benign", BENIGN_KEYWORDS)):
        m = np.array([any(kw in v.split(";") for kw in keywords) for v in dfs["clinvar"].values])
        sub = dfs[m]
        frac = sub["itype"].value_counts(normalize=True)
        out[label] = 1e2 * (1.0 - float(frac.get("", 0.0))) if len(sub) else float("nan")
    return out


def filter_quality_interfaces(
    structures: dict, multi_interfaces: dict, p_thr: float = 0.8,
    itypes_sel: Sequence[str] = tuple(INTERFACE_LABELS),
) -> dict:
    """Keep single-type interfaces whose mean per-class prediction exceeds
    p_thr for every class in the itype (analysis_clinvar.ipynb cell 11)."""
    out = {}
    for uniprot, per_itype in multi_interfaces.items():
        if uniprot not in structures:
            continue
        entry = structures[uniprot]
        out[uniprot] = {itype: [] for itype in per_itype}
        for itype, int_l in per_itype.items():
            if itype in itypes_sel:
                for ids_int in int_l:
                    ids = np.asarray(ids_int, dtype=int)
                    p = np.stack(
                        [np.asarray(entry[_LABELS_MAP[it]])[ids] for it in itype.split("+")],
                        axis=1,
                    )
                    if np.all(np.mean(p, axis=0) > p_thr):
                        out[uniprot][itype].append(list(ids_int))
            else:
                out[uniprot][itype] = list(int_l)
    return out


def interface_coverage(structures: dict, multi_interfaces: dict) -> np.ndarray:
    """[(n_interface_residues, n_residues)] per uniprot (cells 12-13)."""
    sizes = []
    for uniprot, per_itype in multi_interfaces.items():
        if uniprot not in structures:
            continue
        all_ids = sum((sum(int_l, []) for int_l in per_itype.values()), [])
        ni = np.unique(np.asarray(all_ids, dtype=int)).shape[0] if all_ids else 0
        na = np.asarray(structures[uniprot]["resid"]).shape[0]
        sizes.append([ni, na])
    return np.asarray(sizes, dtype=np.int64)


def aggregate_interfaces_tags(
    data: dict, tag_dict: Dict[str, Sequence[str]], interfaces: dict
) -> Tuple[List[Dict[str, list]], Dict[str, int]]:
    """Best-interface mean prediction per (class, tag) + tag counts
    (analysis_interfaces_uniprot_features.ipynb cell 3)."""
    n_cls = 0
    for uniprot in interfaces:
        n_cls = max(n_cls, len(interfaces[uniprot]))
    mp_tags = [{} for _ in range(n_cls)]
    for uniprot in data:
        if uniprot in tag_dict and uniprot in interfaces:
            entry = data[uniprot]
            int_l = interfaces[uniprot]
            tags = np.unique(tag_dict[uniprot])
            for i in range(len(int_l)):
                if len(int_l[i]) > 0:
                    mp = np.max(
                        [np.mean(np.asarray(entry[f"p{i}"])[np.asarray(ids_int, dtype=int)])
                         for ids_int in int_l[i]]
                    )
                    for tag in tags:
                        mp_tags[i].setdefault(tag, []).append(mp)
    tag_counts: Dict[str, int] = {}
    for uniprot in data:
        if uniprot in tag_dict and uniprot in interfaces:
            for tag in np.unique(tag_dict[uniprot]):
                tag_counts[tag] = tag_counts.get(tag, 0) + 1
    return mp_tags, tag_counts


def tag_enrichment(
    mp_tags: List[Dict[str, list]],
    tag_counts: Dict[str, int],
    sel_tags: Sequence[str] = None,
    p_thr: float = 0.8,
    min_sampling: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fraction of proteins per tag whose best interface of each class is
    high-confidence (> p_thr); rows = tags, cols = 5 classes (cells 7/11).
    Tags with total counts <= min_sampling are dropped. Returns (H, tags)."""
    if sel_tags is None:
        sel_tags = np.unique(np.concatenate([list(mp_tags[i]) for i in range(5)]))
    sel_tags = np.asarray(sel_tags)
    H = []
    for i in range(5):
        H.append([
            int(np.sum(np.asarray(mp_tags[i].get(tag, [])) > p_thr)) for tag in sel_tags
        ])
    H = np.asarray(H, dtype=np.float64).T
    if min_sampling:
        m = np.sum(H, axis=1) > min_sampling
        H, sel_tags = H[m], sel_tags[m]
    denom = np.array([tag_counts[tag] for tag in sel_tags], dtype=np.float64).reshape(-1, 1)
    return H / np.maximum(denom, 1.0), sel_tags


def annotate_interfaces(data: dict, multi_interfaces: dict, sel_tags: Sequence[str] = ()):
    """Flat per-interface records with mean-min prediction, sizes, and
    annotations (analysis_cointerfaces.ipynb cell 4). Optional per-residue
    'annotation' (":"-joined notes), 'ss' (secondary structure codes) and
    'afs' (AlphaFold pLDDT) arrays enrich the records when present."""
    labels = np.array(INTERFACE_LABELS)
    records = []
    for uniprot, per_itype in multi_interfaces.items():
        if uniprot not in data:
            continue
        entry = data[uniprot]
        for itype, int_l in per_itype.items():
            iids = [int(np.where(k == labels)[0][0]) for k in itype.split("+")]
            for ids_int in int_l:
                ids = np.asarray(ids_int, dtype=int)
                mpi = float(np.mean(np.min(np.stack(
                    [np.asarray(entry[f"p{i}"])[ids] for i in iids], axis=1), axis=1)))
                rec = {"uniprot": uniprot, "itype": itype, "mpi": mpi, "size": len(ids)}
                if "annotation" in entry:
                    unotes = np.unique(sum(
                        (note.split(":") for note in np.asarray(entry["annotation"])[ids]), []))
                    rec["notes"] = ":".join([n for n in unotes if not sel_tags or n in sel_tags])
                if "ss" in entry:
                    rec["ss"] = ":".join(sorted(set(np.asarray(entry["ss"])[ids].tolist())))
                if "afs" in entry:
                    rec["mafs"] = float(np.mean(np.asarray(entry["afs"])[ids]))
                records.append(rec)
    return records


def interface_type_counts(records) -> dict:
    """{uniprot: {itype: count}} from annotate_interfaces records
    (cell 11)."""
    out: dict = {}
    for rec in records:
        out.setdefault(rec["uniprot"], {})
        out[rec["uniprot"]][rec["itype"]] = out[rec["uniprot"]].get(rec["itype"], 0) + 1
    return out


def cointerface_statistics(itype_counts: dict) -> Dict[str, float]:
    """Shared-vs-separate co-interface counts for every class pair
    (cells 16-19): 'a+b' counts proteins with a JOINT a∩b interface,
    'a|b' proteins with separate a and b interfaces beyond the joint
    ones. Returns {pair-key: count}."""
    labels = INTERFACE_LABELS
    out: Dict[str, float] = {}
    for i in range(5):
        for j in range(i + 1, 5):
            joint_k = f"{labels[i]}+{labels[j]}"
            sep_k = f"{labels[i]}|{labels[j]}"
            joint = sep = 0
            for counts in itype_counts.values():
                nj = counts.get(joint_k, 0) + counts.get(f"{labels[j]}+{labels[i]}", 0)
                ni, nk = counts.get(labels[i], 0), counts.get(labels[j], 0)
                if nj > 0:
                    joint += 1
                # single-type and joint interfaces are DISJOINT records in
                # itype_counts, so separate single-type interfaces of both
                # kinds is simply ni>0 and nk>0 (the old ni>nj comparison
                # undercounted proteins that also carry a joint interface)
                if ni > 0 and nk > 0:
                    sep += 1
            out[joint_k] = float(joint)
            out[sep_k] = float(sep)
    return out


# DSSP code -> coarse class (analysis_structure_regions.ipynb)
SS_CLASS = {
    "H": "helix", "G": "helix", "I": "helix",
    "B": "strand", "E": "strand",
    "T": "coil", "S": "coil", " ": "coil", "": "coil", "-": "coil",
}


def per_residue_interface_ratios(
    data: dict, key: str, afs_thr: float = 70.0, p_thr: float = 0.8,
    key_map: dict = None, split_notes: bool = False,
) -> List[Dict[str, float]]:
    """Fraction of residues of each category predicted as interface, per
    class (analysis_structure_regions.ipynb: key='resname' for amino-acid
    propensities, key='ss' with key_map=SS_CLASS for secondary structure,
    key='annotation' with split_notes=True for UniProt feature tags).
    Residues below the AlphaFold-confidence threshold (entry['afs']) are
    excluded when present. Returns [ {category: ratio} per class i ]."""
    p_dict: Dict[str, list] = {}
    # class count from the DATA (p0..p{C-1} keys), never hard-coded 5:
    # non-5-class configs (i_v3_1 dm_n2=1) crashed here with KeyError
    n_cls = 0
    for entry in data.values():
        n_cls = max(n_cls, len([k for k in entry
                                if k.startswith("p") and k[1:].isdigit()]))
    for entry in data.values():
        vals = np.asarray(entry[key])
        afs = np.asarray(entry.get("afs", np.full(len(vals), np.inf)))
        probs = np.stack([np.asarray(entry[f"p{j}"]) for j in range(n_cls)], axis=1)
        for i in range(len(vals)):
            if afs[i] <= afs_thr:
                continue
            cats = str(vals[i]).split(":") if split_notes else [str(vals[i])]
            for cat in cats:
                if key_map is not None:
                    cat = key_map.get(cat, cat)
                p_dict.setdefault(cat, []).append(probs[i])
    out = []
    for i in range(n_cls):
        out.append(
            {cat: float(np.mean(np.asarray(pl)[:, i] > p_thr)) for cat, pl in p_dict.items()}
        )
    return out


def interface_sasa_statistics(
    sasa_dict: Dict[str, np.ndarray], multi_interfaces: dict
) -> Tuple[Dict[str, list], Dict[str, list]]:
    """Per-interface-type SASA sums and per-protein-relative sizes
    (analysis_sasa.ipynb): sasa_dict maps uniprot -> per-residue SASA.
    Returns (absolute surfaces, relative surfaces) keyed by itype."""
    surfaces: Dict[str, list] = {}
    relative: Dict[str, list] = {}
    for uniprot, per_itype in multi_interfaces.items():
        if uniprot not in sasa_dict:
            continue
        sasa = np.asarray(sasa_dict[uniprot], dtype=np.float64)
        total = float(np.sum(sasa))
        for itype, int_l in per_itype.items():
            for ids in int_l:
                s = float(np.sum(sasa[np.asarray(ids, dtype=int)]))
                surfaces.setdefault(itype, []).append(s)
                relative.setdefault(itype, []).append(s / max(total, 1e-12))
    return surfaces, relative


def curate_feature_interface_table(
    structures: dict,
    interfaces_flat: Dict[str, list],
    features_dict: Dict[str, list],
) -> list:
    """Join UniProt features with predicted interfaces
    (curated_interfaces_with_uniprot_features.ipynb cell 4): one record
    per (feature, overlapping interface) — or one no-overlap record with
    itype='' and mpi=-1 — with the feature<->interface overlap size and
    mean prediction/confidence over the overlap.

    interfaces_flat: {uniprot: [{"iid", "itype", "iids"}]} (single-type
    interfaces); features_dict: {uniprot: [{"ftype", "pos" (1-based int
    or (start, end)), "desc"}]}. Produces the table analysis_clinvar.ipynb
    consumes (columns ftype/mpi/itype/desc)."""
    label_ids = {k: i for i, k in enumerate(INTERFACE_LABELS)}
    rows = []
    fid = -1
    for uniprot, entry in structures.items():
        if uniprot not in interfaces_flat or uniprot not in features_dict:
            continue
        afs = np.asarray(entry.get("afs", np.full(len(entry["p0"]), np.nan)))
        for ftr in features_dict[uniprot]:
            fid += 1
            pos = ftr["pos"]
            fids = (
                np.arange(pos - 1, pos) if isinstance(pos, int)
                else np.arange(pos[0] - 1, pos[1])
            )
            base = {
                "uniprot": uniprot, "fid": fid, "ftype": ftr["ftype"],
                "pos": pos, "Nf": len(fids), "desc": ftr.get("desc", ""),
            }
            if afs.shape[0] <= fids[-1]:  # feature beyond the model
                rows.append({**base, "iid": -1, "itype": "", "Ni": 0,
                             "Nc": 0, "mafs": -1.0, "mpi": -1.0})
                continue
            overlapped = False
            for interface in interfaces_flat[uniprot]:
                cids = np.intersect1d(np.asarray(interface["iids"], dtype=int), fids)
                if len(cids) == 0:
                    continue
                overlapped = True
                p = np.asarray(entry[f"p{label_ids[interface['itype']]}"])
                rows.append({
                    **base, "iid": interface["iid"], "itype": interface["itype"],
                    "Ni": len(interface["iids"]), "Nc": len(cids),
                    "mafs": float(np.mean(afs[cids])), "mpi": float(np.mean(p[cids])),
                })
            if not overlapped:
                rows.append({**base, "iid": -1, "itype": "", "Ni": 0, "Nc": 0,
                             "mafs": float(np.mean(afs[fids])), "mpi": -1.0})
    return rows


def flatten_single_type_interfaces(multi_interfaces: dict) -> Dict[str, list]:
    """{uniprot: {itype: [iids]}} -> {uniprot: [{"iid","itype","iids"}]},
    single-type interfaces only, with globally unique iids (nb cell 3)."""
    out: Dict[str, list] = {}
    k = -1
    for uniprot, per_itype in multi_interfaces.items():
        out[uniprot] = []
        for itype, int_l in per_itype.items():
            if "+" in itype:
                continue
            for iids in int_l:
                k += 1
                out[uniprot].append({"iid": k, "itype": itype, "iids": list(iids)})
    return out


def alphafold_model_metrics(
    afs: np.ndarray, pae: np.ndarray, afs_thr: float = 70.0
) -> Dict[str, float]:
    """Whole-model AlphaFold quality metrics used for model selection
    (selecting_alphafold_models.ipynb): structured-region relative size
    and mean PAE within/over the structured region."""
    afs = np.asarray(afs, dtype=np.float32)
    pae = np.asarray(pae, dtype=np.float32)
    m = afs > afs_thr
    out = {
        "size": int(afs.shape[0]),
        "mafs": float(np.mean(afs)),
        "s_size": int(m.sum()),
        "r_size": float(m.mean()),
        "mPAE": float(np.mean(pae)),
    }
    out["s_mPAE"] = float(np.mean(pae[m][:, m])) if m.any() else float("nan")
    return out


def select_alphafold_models(
    metrics: Sequence[Dict[str, float]],
    min_ratio_size: float = 0.7,
    max_mean_pae: float = 10.0,
) -> np.ndarray:
    """Selection mask over per-model metrics (nb final criterion: mostly
    structured AND confident inter-residue geometry)."""
    return np.array(
        [
            (m["r_size"] > min_ratio_size) and (m["s_mPAE"] < max_mean_pae)
            for m in metrics
        ],
        dtype=bool,
    )
