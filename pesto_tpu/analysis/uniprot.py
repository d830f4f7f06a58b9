"""UniProt record parsing and packing (host-side, offline).

The reference's interfaceome joins predictions with UniProt annotations via
download_uniprot.py / uniprot_features.py / pack_uniprot.py /
subcellularlocation.py / uniprot_keywords.py / uniprot_goterms.py. This
module provides the parsing/packing half against *local* UniProt JSON
records (the REST api format) plus a real fetcher with an injectable
transport — this environment has no egress, so the default transport's
failure raises a clear offline error, and tests drive the full download
path through a fake transport.
"""

import glob
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, List, Optional

import numpy as np

UNIPROT_REST_URL = "https://rest.uniprot.org/uniprotkb/{acc}.json"


def _default_fetch(url: str, timeout: float = 30.0) -> bytes:
    """GET `url` via stdlib urllib; translate connectivity failures into
    the actionable offline message (this host has zero egress)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.read()
    except urllib.error.HTTPError:
        # the server ANSWERED (404/500/...): a per-item failure, not an
        # offline condition — HTTPError subclasses URLError, so it must
        # be re-raised before the connectivity clause below or one bad
        # key would abort a whole batch claiming the host has no egress
        raise
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"cannot reach {url} ({e}); this environment has no network "
            "access — place UniProt REST JSON records on disk and use "
            "load_uniprot_record/parse_* directly"
        ) from e


def download_uniprot(
    accessions: Iterable[str],
    out_dir: str,
    fetch: Optional[Callable[[str], bytes]] = None,
    skip_existing: bool = True,
    num_workers: int = 8,
) -> List[str]:
    """Fetch UniProt REST JSON records to `out_dir/<acc>.json`, in worker
    threads like the reference's 8-process pool (reference
    interfaceome/download_uniprot.py:9-27 fetched txt/xml/rdf/fasta/gff
    from the legacy endpoint; this targets the current REST JSON API,
    which is what parse_features/parse_keywords/... consume). Existing
    files are skipped so interrupted runs resume. Returns written paths;
    accessions whose fetch fails with a non-connectivity error are
    skipped with a note on stderr, mirroring the reference's tolerance of
    missing entries."""
    import sys

    fetch = fetch or _default_fetch
    os.makedirs(out_dir, exist_ok=True)

    def one(acc: str) -> Optional[str]:
        path = os.path.join(out_dir, f"{acc}.json")
        if skip_existing and os.path.exists(path):
            return path
        try:
            body = fetch(UNIPROT_REST_URL.format(acc=acc))
        except RuntimeError:
            raise  # offline — fail loudly, every other acc would fail too
        except Exception as e:  # noqa: BLE001 — per-item tolerance
            print(f"uniprot {acc}: {e}", file=sys.stderr)
            return None
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)
        return path

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        return [p for p in pool.map(one, list(accessions)) if p]


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
