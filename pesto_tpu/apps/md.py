"""MD-trajectory interface prediction.

The reference pipeline (md_analysis/apply_model_md.ipynb cells 1,5-6):
topology and kNN graph frozen at frame 0, only coordinates change per
frame (D_nn/R_nn are recomputed inside the model), predictions per frame
compared to the contacts of the bound reference complex via ROC AUC.

TPU-native twist: frames are *batched* through the vmapped forward —
a whole chunk of frames runs as one XLA call.

Usage:
  python -m pesto_tpu.apps.md TRAJ.pdb --ref COMPLEX.pdb --ligand-chains B \
      [--model i_v4_0 --ckpt model.pt] [--every 100] [--out results.csv]
"""

import argparse
import dataclasses

import numpy as np


def predict_trajectory(predictor, structure, xyz_frames, chunk: int = 8):
    """Per-frame per-residue probabilities [T, n_res, C] with the kNN
    topology frozen from frame 0 (reference nb cell 6)."""
    import jax
    import jax.numpy as jnp

    from ..batching import encode_and_pad

    ps = encode_and_pad(structure, feature_flags=predictor.cfg.feature_flags)
    nr = int(np.sum(np.asarray(ps.res_mask)))
    na = ps.X.shape[0]
    n = structure["xyz"].shape[0]

    T = xyz_frames.shape[0]
    probs = []
    for t0 in range(0, T, chunk):
        frames = xyz_frames[t0 : t0 + chunk]
        Xp = np.zeros((frames.shape[0], na, 3), dtype=np.float32)
        Xp[:, 1 : n + 1] = frames
        batch = dataclasses.replace(
            ps,
            X=jnp.asarray(Xp),
            ids_topk=jnp.broadcast_to(ps.ids_topk, (frames.shape[0],) + ps.ids_topk.shape),
            q=jnp.broadcast_to(ps.q, (frames.shape[0],) + ps.q.shape),
            M=jnp.broadcast_to(ps.M, (frames.shape[0],) + ps.M.shape),
            atom_mask=jnp.broadcast_to(ps.atom_mask, (frames.shape[0],) + ps.atom_mask.shape),
        )
        probs.append(predictor.probabilities(batch)[:, :nr])
    return np.concatenate(probs, axis=0)


def interface_labels_from_reference(ref_subunits, receptor_chains, r_thr=5.0):
    """Ground-truth per-residue interface labels of the receptor from the
    bound complex (reference nb cell 6 via extract_all_contacts)."""
    from ..structure import concatenate_chains
    from ..topology import extract_all_contacts

    contacts = extract_all_contacts(ref_subunits, r_thr)
    rec = {c: ref_subunits[c] for c in receptor_chains}
    rec_merged = concatenate_chains(rec)
    resids = rec_merged["resid"]
    labels = np.zeros(np.unique(resids).shape[0], dtype=bool)

    offset = 0
    for c in receptor_chains:
        n_c = ref_subunits[c]["xyz"].shape[0]
        for other, data in contacts.get(c, {}).items():
            if other in receptor_chains:
                continue
            ids_c = data["ids"][:, 0] + offset
            rids = np.unique(resids[ids_c])
            labels[np.searchsorted(np.unique(resids), rids)] = True
        offset += n_c
    return labels


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("traj", help="multi-model PDB trajectory of the receptor")
    parser.add_argument("--ref", required=True, help="bound reference complex PDB")
    parser.add_argument("--receptor-chains", default=None,
                        help="comma list of receptor chain names in the reference (default: chains present in the trajectory)")
    parser.add_argument("--model", default="i_v4_0")
    parser.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    parser.add_argument("--every", type=int, default=100, help="use every k-th frame")
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--class-index", type=int, default=0, help="interface class (0=protein)")
    parser.add_argument("--out", default="md_results.csv")
    args = parser.parse_args(argv)

    from sklearn.metrics import roc_auc_score

    from ..infer import Predictor
    from ..io import read_pdb, read_traj_pdb
    from ..models import get_config
    from ..structure import clean_structure, preprocess_structure
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    pred = Predictor.from_reference_checkpoint(args.ckpt, get_config(args.model, remat=False))

    structure, frames = read_traj_pdb(args.traj)
    # apply the cleaning mask to the FRAMES too, so coordinates stay
    # aligned with the cleaned topology (waters/hydrogens dropped)
    keep = (
        (structure["resname"] != "HOH")
        & (structure["resname"] != "DOD")
        & (structure["element"] != "H")
        & (structure["element"] != "D")
    )
    frames = frames[:: args.every][:, keep]
    structure = clean_structure(structure)
    assert structure["xyz"].shape[0] == frames.shape[1]

    ref_subunits = preprocess_structure(read_pdb(args.ref))
    if args.receptor_chains:
        receptor_chains = [c if ":" in c else f"{c}:0" for c in args.receptor_chains.split(",")]
    else:
        traj_chains = {c.split(":")[0] for c in np.unique(structure["chain_name"])}
        receptor_chains = [c for c in ref_subunits if c.split(":")[0] in traj_chains]
    y = interface_labels_from_reference(ref_subunits, receptor_chains)

    probs = predict_trajectory(pred, structure, frames, chunk=args.chunk)

    if probs.shape[1] != len(y):
        raise SystemExit(
            f"trajectory has {probs.shape[1]} residues but the reference "
            f"receptor has {len(y)}; positional scoring would be misaligned."
            " Pass --receptor-chains matching the trajectory, or renumber"
            " the inputs (see pesto_tpu.traj.match for sequence alignment)."
        )
    rows = []
    for t in range(probs.shape[0]):
        p = probs[t, :, args.class_index]
        n = len(y)
        auc = roc_auc_score(y, p) if 0 < y.sum() < n else float("nan")
        rows.append((t * args.every, auc))
        print(f"frame {t * args.every}: AUC={auc:.4f}")

    import csv

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "auc"])
        w.writerows(rows)
    aucs = np.array([a for _, a in rows])
    print(f"mean AUC over {len(rows)} frames: {np.nanmean(aucs):.4f}")


if __name__ == "__main__":
    main()
