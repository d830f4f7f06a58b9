"""Proteome-scale batch interface prediction (the reference's
interfaceome pipeline, interfaceome/apply_model.py:13-86 +
pack_structures.py + aggregate_data.py + cluster_interfaces.py).

Subcommands:
  pack     PDB files -> structure store HDF5
  predict  structure store -> per-key [n_res, C] probabilities HDF5,
           batched through padding buckets on TPU
  aggregate  join predictions with coordinates/confidence into per-key
           residue tables (x, y, z, afs, p0..pC)
  cluster  connected interface patches per class -> JSON

Usage:
  python -m pesto_tpu.apps.interfaceome pack "afdb/*.pdb" --out store.h5
  python -m pesto_tpu.apps.interfaceome predict store.h5 --out pred.h5 --ckpt model.pt
  python -m pesto_tpu.apps.interfaceome aggregate store.h5 pred.h5 --out agg.h5
  python -m pesto_tpu.apps.interfaceome cluster agg.h5 --out interfaces.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np


def cmd_pack(args):
    from ..data.store import store_pdbs

    paths = sorted({p for g in args.inputs for p in glob.glob(g)})
    # unique keys: duplicate basename stems (two dirs, or biounits
    # x.pdb1/x.pdb2) used to collide in hf.create_group mid-pack
    pairs, seen = [], {}
    for p in paths:
        key = os.path.basename(p).split(".")[0]
        if key in seen:
            seen[key] += 1
            key = f"{key}_{seen[key]}"
        else:
            seen[key] = 1
        pairs.append((key, p))
    keys = store_pdbs(args.out, pairs)
    print(f"packed {len(keys)} structures into {args.out}")


def cmd_predict(args):
    import h5py

    from ..data.store import StructuresStore
    from ..infer import Predictor
    from ..models import get_config
    from ..structure import concatenate_chains, preprocess_structure
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.model, remat=False)
    pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)

    store = StructuresStore(args.h5)
    structures, keys = [], []
    for key in store:
        try:
            subunits = preprocess_structure(store[key])
            structures.append(concatenate_chains(subunits))
            keys.append(key)
        except Exception as e:
            print(f"error with {key}: {e}", file=sys.stderr)

    probs = pred.predict_batch(structures)
    n_ok = 0
    with h5py.File(args.out, "w") as hf:
        for key, p in zip(keys, probs):
            if p is None:  # over-bucket / unpredictable: warned upstream
                print(f"skip {key}: no prediction", file=sys.stderr)
                continue
            hf[key] = p
            n_ok += 1
    print(f"predicted {n_ok}/{len(keys)} structures -> {args.out}")


def cmd_aggregate(args):
    """Join per-residue predictions with C-alpha coordinates and the
    B-factor column (pLDDT for AlphaFold models) into flat residue tables
    (reference aggregate_data.py)."""
    import h5py

    from ..data.store import StructuresStore
    from ..structure import clean_structure

    store = StructuresStore(args.store)
    features = None
    if getattr(args, "features_csv", None):
        import pandas as pd

        features = pd.read_csv(args.features_csv)
    with h5py.File(args.pred, "r") as hp, h5py.File(args.out, "w") as ho:
        for key in hp.keys():
            p = np.array(hp[key])
            structure = clean_structure(store[key])
            # clean_structure filters every per-atom key, so the cleaned
            # record's own bfactor stays atom-aligned (the raw array is
            # misaligned once waters/hydrogens are dropped)
            bf_by_atom = structure.get("bfactor")
            m_ca = (structure["name"] == "CA") & (structure["element"] == "C")
            resids = structure["resid"]
            ures = np.unique(resids)
            if len(ures) != p.shape[0]:
                print(f"skip {key}: residue mismatch", file=sys.stderr)
                continue
            xyz_ca = np.zeros((len(ures), 3), dtype=np.float32)
            afs = np.zeros(len(ures), dtype=np.float32)
            for i, rid in enumerate(ures):
                m = (resids == rid) & m_ca
                if not m.any():
                    m = resids == rid
                xyz_ca[i] = structure["xyz"][m][0]
                if bf_by_atom is not None:
                    afs[i] = float(np.asarray(bf_by_atom)[m][0])
            # per-residue identity + P-SEA secondary structure (the
            # reference also stores resid/resname/ss/annotation,
            # interfaceome/aggregate_data.py:59-86)
            resnames = np.array(
                [structure["resname"][resids == rid][0] for rid in ures]
            )
            from ..analysis.secondary_structure import assign_secondary_structure_ca

            ss = assign_secondary_structure_ca(xyz_ca)

            annotation = None
            if features is not None:
                name = key.split("/")[-2] if "/" in key else key
                dfs = features[features["NAME"] == name]
                notes = [[] for _ in range(len(ures))]
                for _, row in dfs.iterrows():
                    region = np.arange(int(row["START"]), int(row["END"]) + 1)
                    for k in np.where(np.isin(ures, region))[0]:
                        notes[k].append(str(row["TYPE"]))
                annotation = np.array([":".join(n) for n in notes])

            g = ho.create_group(key)
            g["x"], g["y"], g["z"] = xyz_ca[:, 0], xyz_ca[:, 1], xyz_ca[:, 2]
            g["afs"] = afs
            g["resid"] = ures.astype(np.int32)
            g["resname"] = resnames.astype(np.bytes_)
            g["ss"] = ss.astype(np.bytes_)
            if annotation is not None:
                g["annotation"] = annotation.astype(np.bytes_)
            for c in range(p.shape[1]):
                g[f"p{c}"] = p[:, c]
    print(f"aggregated -> {args.out}")


def cmd_cluster(args):
    import h5py

    from ..analysis import cluster_interfaces

    out = {}
    with h5py.File(args.agg, "r") as hf:
        for key in hf.keys():
            entry = {k: np.array(hf[key][k]) for k in hf[key].keys()}
            out[key] = cluster_interfaces(
                entry, afs_thr=args.afs_thr, p_thr=args.p_thr, d_thr=args.d_thr
            )
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"clustered {len(out)} entries -> {args.out}")


def cmd_analyze(args):
    """Downstream analyses over an aggregated store + clustered interfaces
    (the interfaceome notebooks as one command): coverage, per-residue /
    secondary-structure / annotation interface propensities, optional tag
    enrichment. Writes one JSON report."""
    import h5py

    from ..analysis.interfaceome_analyses import (
        SS_CLASS,
        aggregate_interfaces_tags,
        interface_coverage,
        per_residue_interface_ratios,
        tag_enrichment,
    )

    data = {}
    with h5py.File(args.agg, "r") as hf:
        for key in hf.keys():
            entry = {}
            for k in hf[key].keys():
                v = np.array(hf[key][k])
                entry[k] = v.astype("U") if v.dtype.kind == "S" else v
            data[key] = entry
    interfaces = json.load(open(args.interfaces))

    report = {}
    # coverage needs the per-itype dict form; the cluster JSON stores a
    # per-class list — adapt
    multi = {
        u: {f"class{i}": ints for i, ints in enumerate(l)} for u, l in interfaces.items()
    }
    cov = interface_coverage(data, multi)
    if len(cov):
        r = cov[:, 0] / np.maximum(cov[:, 1], 1)
        report["coverage"] = {"mean": float(r.mean()), "std": float(r.std()), "n": int(len(r))}

    report["residue_propensity"] = per_residue_interface_ratios(
        data, "resname", p_thr=args.p_thr
    )
    if all("ss" in e for e in data.values()):
        report["ss_propensity"] = per_residue_interface_ratios(
            data, "ss", p_thr=args.p_thr, key_map=SS_CLASS
        )
    if all("annotation" in e for e in data.values()) and data:
        report["annotation_propensity"] = per_residue_interface_ratios(
            data, "annotation", p_thr=args.p_thr, split_notes=True
        )
    if args.tags_json:
        tags = json.load(open(args.tags_json))
        mp, counts = aggregate_interfaces_tags(data, tags, interfaces)
        H, sel = tag_enrichment(mp, counts, p_thr=args.p_thr)
        report["tag_enrichment"] = {
            "tags": [str(t) for t in sel], "fractions": H.tolist()
        }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"analysis report -> {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("predict")
    p.add_argument("h5")
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="i_v4_0")
    p.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("aggregate")
    p.add_argument("store")
    p.add_argument("pred")
    p.add_argument("--out", required=True)
    p.add_argument("--features-csv", default=None,
                   help="UniProt regions table (NAME,START,END,TYPE) for per-residue annotations")
    p.set_defaults(fn=cmd_aggregate)

    p = sub.add_parser("analyze")
    p.add_argument("agg")
    p.add_argument("interfaces", help="clustered interfaces JSON (from `cluster`)")
    p.add_argument("--out", required=True)
    p.add_argument("--p-thr", type=float, default=0.8)
    p.add_argument("--tags-json", default=None,
                   help="optional {uniprot: [tags]} (e.g. subcellular locations / GO terms)")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("cluster")
    p.add_argument("agg")
    p.add_argument("--out", required=True)
    p.add_argument("--afs-thr", type=float, default=70.0)
    p.add_argument("--p-thr", type=float, default=0.5)
    p.add_argument("--d-thr", type=float, default=10.0)
    p.set_defaults(fn=cmd_cluster)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
