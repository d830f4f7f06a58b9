"""Dataset selection filters over HDF5 metadata
(reference src/dataset.py:8-47)."""

import numpy as np


def _normalize_sid(sid: str) -> str:
    """Accept all three selection-file formats: the reference's "1ABC_A"
    (data/datasets/subunits_*.txt), the dataset-key-derived "1ABC_1_A:0"
    (pdbid_bid_chain:model), and a full dataset key "AB/1ABC/1/A:0"
    (data/build.py's metadata/keys layout) — the latter two silently
    selected NOTHING before."""
    sid = str(sid)
    if "/" in sid:  # full dataset key
        parts = sid.split("/")
        chain = parts[3].split(":")[0] if len(parts) > 3 else ""
        return f"{parts[1].upper()}_{chain}"
    parts = str(sid).split("_")
    if len(parts) == 1:
        return parts[0].upper()
    # uppercase only the pdb id — chain ids are case-sensitive
    chain = parts[-1].split(":")[0] if len(parts) > 2 else parts[1].split(":")[0]
    return f"{parts[0].upper()}_{chain}"


def select_by_sid(dataset, sids_sel):
    sids = np.array(
        ["_".join([s.split(":")[0] for s in key.split("/")[1::2]]) for key in dataset.keys]
    )
    norm = np.array([_normalize_sid(s) for s in np.asarray(sids_sel).tolist()])
    return np.isin(sids, norm)


def select_by_max_ba(dataset, max_ba):
    aids = np.array([int(key.split("/")[2]) for key in dataset.keys])
    return aids <= max_ba


def select_complete_assemblies(dataset, m):
    """Keep only entries of assemblies with no removed subunit. (The
    reference's version references an undefined `rkeys` attribute and is
    effectively dead code; this implements the intended semantics against
    H5Dataset.rkeys = per-entry assembly root keys.)"""
    rm_roots = np.unique(dataset.rkeys[~m])
    return ~np.isin(dataset.rkeys, rm_roots)


def select_by_interface_types(dataset, l_types, r_types):
    t0 = np.where(np.isin(dataset.mids, l_types))[0]
    t1 = np.where(np.isin(dataset.mids, r_types))[0]
    cm = np.isin(dataset.ctypes[:, 1], t0) & np.isin(dataset.ctypes[:, 2], t1)
    return np.isin(np.arange(dataset.keys.shape[0]), dataset.ctypes[cm, 0])
