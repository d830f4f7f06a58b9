"""MaSIF-site benchmark: compare interface predictors on the transient set.

Reproduces masif_sppider_Intpred_comp.ipynb end to end without
pymesh/pyflann/Biopython: per-point and per-residue ROC AUC for

  - mesh-level MaSIF predictions (vertex_iface in masif_pred/*.ply),
  - residue-level SPPIDER / IntPred / PSIVER predictions (CA B-factors),
  - this framework's own predictions (run on the benchmark PDBs),

against the labeled ground-truth meshes (ground_truth/*.ply), using the
SPPIDER area criterion for residue labels.

Usage:
  python -m pesto_tpu.apps.masif_benchmark /root/reference/masif-site_benchmark \
      [--checkpoint /path/model_ckpt.pt --model i_v4_1] [--out results.csv]
"""

import argparse
import json
import os

import numpy as np


def _auc(y, p):
    from ..metrics import roc_auc

    y = np.asarray(y, dtype=np.float32)[:, None]
    p = np.asarray(p, dtype=np.float32)[:, None]
    P = np.array([y.sum()])
    N = np.array([len(y) - y.sum()])
    return float(roc_auc(y, p, P, N)[0])


def _transient_ids(bench_dir):
    path = os.path.join(bench_dir, "testing_transient.txt")
    return {line[:4] for line in open(path).read().splitlines() if line.strip()}


def bench_residue_method(bench_dir, pred_subdir, alpha=1e-2, pdb_suffix=".pdb"):
    """Pool per-point/per-residue labels+scores for a B-factor predictor
    (notebook cells 7-9). Returns dict with pooled and per-protein AUCs."""
    from ..analysis.masif_kit import read_pdb_bfactors, score_structure_vs_mesh

    transient = _transient_ids(bench_dir)
    pred_dir = os.path.join(bench_dir, pred_subdir)
    gt_dir = os.path.join(bench_dir, "ground_truth")
    pls, pps, rls, rps, point_aucs, res_aucs, names = [], [], [], [], [], [], []
    for fn in sorted(os.listdir(pred_dir)):
        if not fn.endswith(pdb_suffix):
            continue
        myid = fn.split(".")[0]
        if myid[:4] not in transient:
            continue
        gt_path = os.path.join(gt_dir, myid + ".ply")
        if not os.path.exists(gt_path):
            continue
        structure, bf = read_pdb_bfactors(os.path.join(pred_dir, fn))
        pl, pp, rl, rp = score_structure_vs_mesh(structure, bf, gt_path, alpha)
        pls.append(pl); pps.append(pp); rls.append(rl); rps.append(rp)
        # guard single-class meshes like the residue path: one degenerate
        # ground truth otherwise NaN-poisons the median
        point_aucs.append(_auc(pl, pp) if len(np.unique(pl)) > 1 else 0.5)
        res_aucs.append(_auc(rl, rp) if len(np.unique(rl)) > 1 else 0.5)
        names.append(myid)
    if not names:
        return None
    return {
        "n": len(names),
        "names": names,
        "auc_point_global": _auc(np.concatenate(pls), np.concatenate(pps)),
        "auc_res_global": _auc(np.concatenate(rls), np.concatenate(rps)),
        "auc_point_median": float(np.median(point_aucs)),
        "auc_res_median": float(np.median(res_aucs)),
        "auc_point_per_protein": dict(zip(names, map(float, point_aucs))),
        "auc_res_per_protein": dict(zip(names, map(float, res_aucs))),
    }


def bench_masif(bench_dir):
    """Mesh-level MaSIF scoring (notebook cells 11-13)."""
    from ..analysis.masif_kit import (
        paired_residue_arrays,
        read_pdb_bfactors,
        residue_ground_truth,
        residue_scores_from_mesh,
    )
    from ..io.ply import read_ply

    transient = _transient_ids(bench_dir)
    gt_dir = os.path.join(bench_dir, "ground_truth")
    pred_dir = os.path.join(bench_dir, "masif_pred")
    # the notebook maps residues via the SPPIDER pdbs
    pdb_dir = os.path.join(bench_dir, "sppider_pred")
    pls, pps, rls, rps, point_aucs, res_aucs, names = [], [], [], [], [], [], []
    for fn in sorted(os.listdir(pred_dir)):
        if not fn.endswith(".ply"):
            continue
        myid = fn.split(".")[0]
        if myid[:4] not in transient:
            continue
        gt = read_ply(os.path.join(gt_dir, myid + ".ply"))
        pred = read_ply(os.path.join(pred_dir, fn))
        y_point = (np.asarray(gt["iface"]) > 0).astype(np.float32)
        p_point = np.asarray(pred["iface"], dtype=np.float32)
        pdb_path = os.path.join(pdb_dir, myid + ".pdb")
        if not os.path.exists(pdb_path):
            continue
        structure, _ = read_pdb_bfactors(pdb_path)
        from ..analysis.surface_map import nearest_atoms

        ids = nearest_atoms(gt["vertices"], structure["xyz"])
        res_labels = residue_ground_truth(structure, gt, ids=ids)
        res_preds = residue_scores_from_mesh(structure, gt, p_point, ids=ids)
        rl, rp = paired_residue_arrays(res_labels, res_preds)
        pls.append(y_point); pps.append(p_point); rls.append(rl); rps.append(rp)
        point_aucs.append(_auc(y_point, p_point))
        res_aucs.append(_auc(rl, rp) if len(np.unique(rl)) > 1 else 0.5)
        names.append(myid)
    if not names:
        return None
    return {
        "n": len(names),
        "names": names,
        "auc_point_global": _auc(np.concatenate(pls), np.concatenate(pps)),
        "auc_res_global": _auc(np.concatenate(rls), np.concatenate(rps)),
        "auc_point_median": float(np.median(point_aucs)),
        "auc_res_median": float(np.median(res_aucs)),
        "auc_point_per_protein": dict(zip(names, map(float, point_aucs))),
        "auc_res_per_protein": dict(zip(names, map(float, res_aucs))),
    }


def bench_ours(bench_dir, checkpoint, model="i_v4_1", fast=True):
    """Score this framework's predictions on the benchmark proteins: run
    the model on each sppider_pred PDB (coordinates only), write per-atom
    probabilities, and evaluate with the identical mesh protocol."""
    from ..analysis.masif_kit import read_pdb_bfactors, score_structure_vs_mesh
    from ..infer import Predictor
    from ..models import get_config
    from ..structure import concatenate_chains, preprocess_structure

    cfg = get_config(model)
    if fast:
        cfg = cfg.replace(dtype="bfloat16", precision="default")
    pred = Predictor.from_reference_checkpoint(checkpoint, cfg)

    transient = _transient_ids(bench_dir)
    gt_dir = os.path.join(bench_dir, "ground_truth")
    pdb_dir = os.path.join(bench_dir, "sppider_pred")
    pls, pps, rls, rps, point_aucs, res_aucs, names = [], [], [], [], [], [], []
    for fn in sorted(os.listdir(gt_dir)):
        if not fn.endswith(".ply"):
            continue
        myid = fn.split(".")[0]
        if myid[:4] not in transient:
            continue
        pdb_path = os.path.join(pdb_dir, myid + ".pdb")
        if not os.path.exists(pdb_path):
            continue
        from ..io import read_pdb

        subunits = preprocess_structure(read_pdb(pdb_path))
        structure = concatenate_chains(subunits)
        probs = pred.predict_structure(structure)  # [n_res, C]
        # protein-protein interface channel, spread to atoms via resid
        ures = np.unique(structure["resid"])
        res_score = dict(zip(ures.tolist(), probs[:, 0].tolist()))
        atom_scores = np.array([res_score[int(r)] for r in structure["resid"]], dtype=np.float32)

        # evaluate with OUR cleaned structure (atom order differs from raw);
        # mesh mapping only needs coordinates + residue identity
        pl, pp, rl, rp = score_structure_vs_mesh(
            structure, atom_scores, os.path.join(gt_dir, myid + ".ply"), alpha=1.0
        )
        pls.append(pl); pps.append(pp); rls.append(rl); rps.append(rp)
        # guard single-class meshes like the residue path: one degenerate
        # ground truth otherwise NaN-poisons the median
        point_aucs.append(_auc(pl, pp) if len(np.unique(pl)) > 1 else 0.5)
        res_aucs.append(_auc(rl, rp) if len(np.unique(rl)) > 1 else 0.5)
        names.append(myid)
    if not names:
        return None
    return {
        "n": len(names),
        "names": names,
        "auc_point_global": _auc(np.concatenate(pls), np.concatenate(pps)),
        "auc_res_global": _auc(np.concatenate(rls), np.concatenate(rps)),
        "auc_point_median": float(np.median(point_aucs)),
        "auc_res_median": float(np.median(res_aucs)),
        "auc_point_per_protein": dict(zip(names, map(float, point_aucs))),
        "auc_res_per_protein": dict(zip(names, map(float, res_aucs))),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench_dir")
    ap.add_argument("--checkpoint", default=None, help="reference .pt to score ourselves")
    ap.add_argument("--model", default="i_v4_1")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--out", default=None, help="write full JSON results here")
    args = ap.parse_args(argv)

    results = {}
    for label, sub, alpha in (
        ("sppider", "sppider_pred", 1e-2),
        ("intpred", "intpred_pred/intpred_pdbs", 1e-2),
        ("psiver", "psiver_pred/psiver_pdbs", 1e-2),
    ):
        r = bench_residue_method(args.bench_dir, sub, alpha)
        if r:
            results[label] = r
    r = bench_masif(args.bench_dir)
    if r:
        results["masif"] = r
    if args.checkpoint:
        r = bench_ours(args.bench_dir, args.checkpoint, args.model, fast=not args.fp32)
        if r:
            results["pesto_tpu"] = r

    for name, r in results.items():
        print(
            f"{name:10s} n={r['n']:3d}  point: global {r['auc_point_global']:.3f} "
            f"median {r['auc_point_median']:.3f}   residue: global {r['auc_res_global']:.3f} "
            f"median {r['auc_res_median']:.3f}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
