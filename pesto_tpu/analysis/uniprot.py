"""UniProt record parsing and packing (host-side, offline).

The reference's interfaceome joins predictions with UniProt annotations via
download_uniprot.py / uniprot_features.py / pack_uniprot.py /
subcellularlocation.py / uniprot_keywords.py / uniprot_goterms.py. This
module provides the parsing/packing half against *local* UniProt JSON
records (the REST api format); downloading requires network access and is
stubbed with a clear error in this environment.
"""

import glob
import json
import os
from typing import List, Optional

import numpy as np


def download_uniprot(*_args, **_kwargs):
    raise RuntimeError(
        "network access is unavailable in this environment; place UniProt "
        "REST JSON records on disk and use load_uniprot_record/parse_* "
        "(reference interfaceome/download_uniprot.py)"
    )


def load_uniprot_record(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def parse_features(record: dict) -> List[dict]:
    """Sequence features: [{type, description, begin, end}]
    (reference uniprot_features.py)."""
    out = []
    for feat in record.get("features", []):
        loc = feat.get("location", {})
        try:
            begin = int(loc.get("start", {}).get("value"))
            end = int(loc.get("end", {}).get("value"))
        except (TypeError, ValueError):
            continue
        out.append(
            {
                "type": feat.get("type", ""),
                "description": feat.get("description", ""),
                "begin": begin,
                "end": end,
            }
        )
    return out


def parse_keywords(record: dict) -> List[str]:
    return [kw.get("name", "") for kw in record.get("keywords", [])]


def parse_go_terms(record: dict) -> List[dict]:
    out = []
    for ref in record.get("uniProtKBCrossReferences", []):
        if ref.get("database") == "GO":
            props = {p["key"]: p["value"] for p in ref.get("properties", [])}
            term = props.get("GoTerm", "")
            out.append(
                {
                    "id": ref.get("id", ""),
                    "aspect": term[:1],
                    "term": term[2:] if len(term) > 2 else term,
                }
            )
    return out


def parse_subcellular_locations(record: dict) -> List[str]:
    out = []
    for comment in record.get("comments", []):
        if comment.get("commentType") == "SUBCELLULAR LOCATION":
            for loc in comment.get("subcellularLocations", []):
                v = loc.get("location", {}).get("value")
                if v:
                    out.append(v)
    return out


def parse_sequence(record: dict) -> Optional[str]:
    return record.get("sequence", {}).get("value")


def pack_uniprot(json_dir: str, out_h5: str) -> int:
    """Pack a directory of <accession>.json records into one HDF5
    (reference pack_uniprot.py): per-accession groups with sequence,
    keywords, GO ids, locations, and feature tables."""
    import h5py

    paths = sorted(glob.glob(os.path.join(json_dir, "*.json")))
    n = 0
    with h5py.File(out_h5, "w") as hf:
        for path in paths:
            acc = os.path.basename(path)[:-5]
            try:
                rec = load_uniprot_record(path)
            except Exception as e:
                print(f"skip {path}: {e}")
                continue
            g = hf.create_group(acc)
            seq = parse_sequence(rec)
            if seq:
                g["sequence"] = np.bytes_(seq)
            g["keywords"] = np.array(parse_keywords(rec), dtype="S")
            g["go_ids"] = np.array([t["id"] for t in parse_go_terms(rec)], dtype="S")
            g["locations"] = np.array(parse_subcellular_locations(rec), dtype="S")
            feats = parse_features(rec)
            g["feature_types"] = np.array([f["type"] for f in feats], dtype="S")
            g["feature_begin"] = np.array([f["begin"] for f in feats], dtype=np.int32)
            g["feature_end"] = np.array([f["end"] for f in feats], dtype=np.int32)
            n += 1
    return n
