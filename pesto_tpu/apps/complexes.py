"""Predicted-complex evaluation: per-chain interface AUC against
contact-derived truth.

The reference's eukaryotic-protein-complexes workflow
(interfaceome/eukaryotic_protein_complexes_predictions.ipynb +
_scoring_analysis.ipynb): for every two-chain complex model (e.g.
AlphaFold-multimer output), derive each chain's true interface residues
from the inter-chain contacts at r_thr, run the interface predictor on
each chain ALONE, and score prediction-vs-truth per chain — overall and
restricted to confident residues (CA B-factor = pLDDT > afs_thr).

Usage:
  python -m pesto_tpu.apps.complexes "complexes/*.pdb" --out preds.h5 \
      [--model i_v4_0 --ckpt model.pt] [--r-thr 5.0] [--afs-thr 70]
"""

import argparse
import glob
import json
import sys

import numpy as np


def evaluate_complex(pred, structure, r_thr: float = 5.0):
    """One two-chain complex -> per-chain (probs, labels, afs).

    structure: raw parsed record with exactly two chains after cleaning."""
    from ..structure import clean_structure, split_by_chain, tag_hetatm_chains
    from ..topology import extract_all_contacts

    s = clean_structure(structure)
    s = tag_hetatm_chains(s)
    subunits = split_by_chain(s)
    cids = sorted(subunits)
    if len(cids) < 2:
        raise ValueError(f"expected 2 chains, found {cids}")
    if len(cids) > 2:
        # keep the two largest polymer chains (hetatm-tagged chains and
        # ions drop out), like the reference's A/B complex assumption
        cids = sorted(sorted(subunits, key=lambda c: -subunits[c]["xyz"].shape[0])[:2])
    contacts = extract_all_contacts(subunits, r_thr)
    if not contacts or cids[1] not in contacts.get(cids[0], {}):
        raise ValueError("no inter-chain contacts")

    out = {}
    for a, b in ((0, 1), (1, 0)):
        sa = subunits[cids[a]]
        ids_ctc = contacts[cids[a]][cids[b]]["ids"][:, 0]
        resid_ctc = np.unique(sa["resid"][ids_ctc])
        ures = np.unique(sa["resid"])
        y = np.isin(ures, resid_ctc).astype(np.float32)
        p = pred.predict_structure(sa)[:, 0]  # protein-interface channel
        # per-residue confidence from CA B-factor when available
        afs = np.zeros(len(ures), dtype=np.float32)
        bfac = sa.get("bfactor")
        if bfac is not None:
            for i, rid in enumerate(ures):
                m = (sa["resid"] == rid) & (sa["name"] == "CA")
                if not m.any():
                    m = sa["resid"] == rid
                afs[i] = float(np.asarray(bfac)[m][0])
        out[cids[a]] = (p[: len(ures)], y, afs)
    return out


def _auc(y, p):
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(y, p))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", default=None, help="HDF5 of per-chain p/y/afs")
    ap.add_argument("--model", default="i_v4_0")
    ap.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    ap.add_argument("--r-thr", type=float, default=5.0)
    ap.add_argument("--afs-thr", type=float, default=70.0)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args(argv)

    from ..infer import Predictor
    from ..io import read_structure
    from ..models import get_config
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.model, remat=False)
    if not args.fp32:
        cfg = cfg.replace(dtype="bfloat16", precision="default")
    pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)

    paths = sorted({p for inp in args.inputs for p in glob.glob(inp)})
    hf = None
    if args.out:
        import h5py

        hf = h5py.File(args.out, "w")

    aucs_all, aucs_conf = [], []
    for path in paths:
        try:
            per_chain = evaluate_complex(pred, read_structure(path), args.r_thr)
        except Exception as e:
            print(f"skip {path}: {e}", file=sys.stderr)
            continue
        key = path.split("/")[-1].split(".")[0]
        row = []
        for j, (cid, (p, y, afs)) in enumerate(sorted(per_chain.items())):
            if hf is not None:
                g = hf.require_group(key)
                g[f"p{j}"], g[f"y{j}"], g[f"afs{j}"] = p, y, afs
            if 0 < y.sum() < len(y):
                row.append(_auc(y, p))
                m = afs > args.afs_thr
                if m.any() and 0 < y[m].sum() < m.sum():
                    aucs_conf.append(_auc(y[m], p[m]))
        if row:
            aucs_all.extend(row)
            print(f"{key}: AUC {' / '.join(f'{a:.3f}' for a in row)}")
    if hf is not None:
        hf.close()

    summary = {
        "n_chains": len(aucs_all),
        "auc_mean": float(np.mean(aucs_all)) if aucs_all else None,
        "auc_median": float(np.median(aucs_all)) if aucs_all else None,
        "auc_confident_median": float(np.median(aucs_conf)) if aucs_conf else None,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
