"""PPI benchmark on golden prediction/ground-truth PDB pairs.

The reference's interface_ppi_benchmark.ipynb workflow over the pdbs_test
layout: for every `X.pdb` (a committed reference prediction with
probability in the B-factor column) and its `X_T.pdb` (binary ground
truth), run OUR model on the coordinates and report per-structure ROC AUC
side-by-side with the committed reference prediction's AUC (and any other
method's `X_<tag>.pdb` files, e.g. `_M` = MaSIF-site).

Usage:
  python -m pesto_tpu.apps.benchmark_ppi /root/reference/pdbs_test \
      --model i_v4_0 --ckpt model.pt --out results.csv [--limit N]
"""

import argparse
import csv
import glob
import os
import sys

import numpy as np


def _read_bfactors_per_residue(path):
    """Per-residue max b-factor + the raw structure, using our reader and
    the cleaning chain so residue numbering matches the model's."""
    from ..io import read_pdb
    from ..structure import clean_structure

    s = clean_structure(read_pdb(path))
    bf = np.array(
        [float(line[60:66]) for line in open(path) if line.startswith(("ATOM", "HETATM"))]
    )
    # cleaning drops waters/H/altloc-duplicates; if the file contains any,
    # positional alignment of raw b-factors to cleaned atoms breaks — fail
    # loudly rather than silently shifting every downstream residue score
    resids = s["resid"]
    if len(bf) != len(resids):
        raise ValueError(
            f"{path}: raw atom count {len(bf)} != cleaned atom count "
            f"{len(resids)} (altloc/water/H present?); cannot align b-factors"
        )
    ures = np.unique(resids)
    per_res = np.array([bf[resids == r].max() for r in ures])
    return s, per_res


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("testdir", help="directory with X.pdb / X_T.pdb golden pairs")
    parser.add_argument("--model", default="i_v4_0")
    parser.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    parser.add_argument("--orbax-ckpt", default=None,
                        help="benchmark a model trained HERE: an orbax "
                             "checkpoint dir from train_cli (e.g. "
                             "<run>/best); overrides --ckpt")
    parser.add_argument("--orbax-step", type=int, default=None,
                        help="specific step in --orbax-ckpt (default: latest)")
    parser.add_argument("--class-index", type=int, default=0)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--fast-knn", action="store_true")
    parser.add_argument("--out", default="ppi_benchmark.csv")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--methods", default="M", help="comma list of extra method tags to score")
    args = parser.parse_args(argv)

    from sklearn.metrics import roc_auc_score

    from ..infer import Predictor
    from ..models import get_config
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.model, remat=False)
    if args.bf16:
        cfg = cfg.replace(dtype="bfloat16", precision="default")
    if args.orbax_ckpt:
        # a model trained by OUR trainer: restore params out of the
        # TrainState the loop checkpoints (train/checkpoint.py), then
        # serve them through the same Predictor path as ported weights
        import jax

        from ..models.pesto import init_params
        from ..train.checkpoint import restore_params

        template = init_params(cfg, jax.random.PRNGKey(0))
        params = restore_params(args.orbax_ckpt, template,
                                step=args.orbax_step)
        if params is None:
            parser.error(f"no checkpoint found in {args.orbax_ckpt}")
        pred = Predictor(cfg, params)
    else:
        pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)
    if args.fast_knn:
        pred.knn_method = "fast"

    bases = sorted(
        p[:-4]
        for p in glob.glob(os.path.join(args.testdir, "*.pdb"))
        if not any(p.endswith(f"_{t}.pdb") for t in ["T"] + args.methods.split(","))
    )
    if args.limit:
        bases = bases[: args.limit]

    rows = []
    for base in bases:
        try:
            truth_path = base + "_T.pdb"
            if not os.path.isfile(truth_path):
                continue
            s_in, ref_p = _read_bfactors_per_residue(base + ".pdb")
            _, y = _read_bfactors_per_residue(truth_path)
            y = (y > 0.5).astype(np.float32)
            if y.sum() in (0, len(y)):
                continue

            ours = pred.predict_structure(s_in)[:, args.class_index]
            if not (len(ours) == len(y) == len(ref_p)):
                # a count mismatch means POSITIONAL misalignment, not a
                # shorter tail — truncating would score residue i of one
                # file against residue i of another
                import sys as _sys

                print(f"skip {base}: residue counts differ "
                      f"(ours {len(ours)}, truth {len(y)}, ref {len(ref_p)})",
                      file=_sys.stderr)
                continue
            n = len(y)
            row = {
                "id": os.path.basename(base),
                "n_res": n,
                "auc_ours": roc_auc_score(y[:n], ours[:n]),
                "auc_reference": roc_auc_score(y[:n], ref_p[:n]),
            }
            for tag in args.methods.split(","):
                mp = f"{base}_{tag}.pdb"
                if os.path.isfile(mp):
                    try:
                        _, other = _read_bfactors_per_residue(mp)
                        m = min(len(other), len(y))
                        row[f"auc_{tag}"] = roc_auc_score(y[:m], other[:m])
                    except Exception:
                        pass
            rows.append(row)
            print(f"{row['id']}: ours={row['auc_ours']:.3f} ref={row['auc_reference']:.3f}")
        except Exception as e:
            print(f"error {base}: {e}", file=sys.stderr)

    if rows:
        fields = sorted({k for r in rows for k in r}, key=lambda k: (k != "id", k))
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)
        med_ours = np.median([r["auc_ours"] for r in rows])
        med_ref = np.median([r["auc_reference"] for r in rows])
        print(f"\nmedian AUC over {len(rows)} structures: ours={med_ours:.4f} "
              f"reference-committed={med_ref:.4f}")


if __name__ == "__main__":
    main()
