"""AlphaFold DB artifacts: PAE parsing and model-confidence helpers
(reference interfaceome/download_af_pae.py + model-selection notebook).
Downloading requires network access (unavailable here) and is stubbed."""

import json

import numpy as np


def download_af_pae(*_a, **_k):
    raise RuntimeError(
        "network access is unavailable; place AlphaFold PAE JSON files on "
        "disk and use parse_pae (reference interfaceome/download_af_pae.py)"
    )


def parse_pae(path_or_record) -> np.ndarray:
    """Parse an AlphaFold PAE JSON (either the legacy residue1/residue2/
    distance triplet format or the v2 predicted_aligned_error matrix)
    into a dense [R, R] float32 matrix."""
    rec = path_or_record
    if isinstance(rec, str):
        with open(rec) as f:
            rec = json.load(f)
    if isinstance(rec, list):
        rec = rec[0]
    if "predicted_aligned_error" in rec:
        return np.asarray(rec["predicted_aligned_error"], dtype=np.float32)
    r1 = np.asarray(rec["residue1"], dtype=np.int64) - 1
    r2 = np.asarray(rec["residue2"], dtype=np.int64) - 1
    d = np.asarray(rec["distance"], dtype=np.float32)
    n = int(max(r1.max(), r2.max())) + 1
    pae = np.zeros((n, n), dtype=np.float32)
    pae[r1, r2] = d
    return pae


def plddt_from_structure(structure) -> np.ndarray:
    """Per-residue pLDDT from the B-factor column of an AlphaFold model."""
    bf = np.asarray(structure.get("bfactor"))
    resids = np.asarray(structure["resid"])
    ures = np.unique(resids)
    return np.array([bf[resids == r].mean() for r in ures], dtype=np.float32)


def mean_interface_pae(pae: np.ndarray, patch_a, patch_b) -> float:
    """Mean cross-PAE between two residue patches (model-selection metric)."""
    pa = np.asarray(patch_a, dtype=np.int64)
    pb = np.asarray(patch_b, dtype=np.int64)
    return float(pae[np.ix_(pa, pb)].mean())
