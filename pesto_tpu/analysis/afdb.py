"""AlphaFold DB artifacts: PAE fetching/parsing and model-confidence
helpers (reference interfaceome/download_af_pae.py + model-selection
notebook). The fetcher takes an injectable transport — this environment
has no egress, so the default transport's failure raises a clear offline
error, and tests drive the full path through a fake transport."""

import json
import os
from typing import Callable, Iterable, List, Optional

import numpy as np

AF_PAE_URL = "https://alphafold.ebi.ac.uk/files/{key}-predicted_aligned_error_{ver}.json"


def download_af_pae(
    keys: Iterable[str],
    out_dir: str,
    version: str = "v4",
    fetch: Optional[Callable[[str], bytes]] = None,
    skip_existing: bool = True,
) -> List[str]:
    """Fetch AlphaFold PAE JSONs for model keys like 'AF-P12345-F1' and
    save each as a dense float16 `.npy` next to the reference's layout
    (`{key}-predicted_aligned_error_{ver}.npy`, reference
    interfaceome/download_af_pae.py:10-35). Existing files are skipped so
    interrupted runs resume; keys the server rejects are skipped with a
    note on stderr (the reference prints the key). Returns written paths."""
    import sys

    if fetch is None:
        from .uniprot import _default_fetch

        fetch = _default_fetch
    os.makedirs(out_dir, exist_ok=True)
    out = []
    for key in keys:
        path = os.path.join(out_dir, f"{key}-predicted_aligned_error_{version}.npy")
        if skip_existing and os.path.exists(path):
            out.append(path)
            continue
        try:
            body = fetch(AF_PAE_URL.format(key=key, ver=version))
            pae = parse_pae(json.loads(body))  # malformed body = that item only
        except RuntimeError:
            raise  # offline — fail loudly
        except Exception as e:  # noqa: BLE001 — per-item tolerance
            print(f"af_pae {key}: {e}", file=sys.stderr)
            continue
        tmp = path + ".tmp.npy"
        np.save(tmp, pae.astype(np.float16))
        os.replace(tmp, path)  # atomic: skip_existing never trusts a torso
        out.append(path)
    return out


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
