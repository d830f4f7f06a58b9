"""Per-class interface-type evaluation over an HDF5 dataset selection
(the reference's interface_type_evaluation.ipynb): forward the model on up
to --per-class structures containing each interface type, report the 8
bc_scoring metrics per class.

Usage:
  python -m pesto_tpu.apps.evaluate --dataset data.h5 [--sel validation.txt]
      --ckpt model.pt [--model i_v4_0] [--per-class 512] [--out eval.csv]
"""

import argparse
import csv

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--sel", default=None, help="sid selection file")
    parser.add_argument("--model", default="i_v4_0")
    parser.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    parser.add_argument("--per-class", type=int, default=512)
    parser.add_argument("--max-size", type=int, default=8192)
    parser.add_argument("--min-num-res", type=int, default=48)
    parser.add_argument("--out", default="interface_type_eval.csv")
    args = parser.parse_args(argv)

    from ..batching import pad_structure_arrays
    from ..infer import Predictor
    from ..metrics import bc_score_names, bc_scoring, nanmean
    from ..models import get_config
    from ..train.loop import TrainConfig, setup_dataset
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.model, remat=False)
    pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)

    tc = TrainConfig(
        dataset_filepath=args.dataset,
        max_size=args.max_size,
        min_num_res=args.min_num_res,
    )
    ds = setup_dataset(tc, args.sel, cfg.feature_flags)

    n_classes = cfg.dm_n2
    per_class_scores = [[] for _ in range(n_classes)]
    counts = np.zeros(n_classes, dtype=int)

    for k in range(len(ds)):
        if np.all(counts >= args.per_class):
            break
        X, ids_topk, q, M, y = ds[k]
        present = np.where(y.sum(axis=0) > 0)[0]
        if not any(counts[c] < args.per_class for c in present):
            continue
        ps = pad_structure_arrays(X, q, M, ids_topk_raw=ids_topk)
        p = pred.probabilities(ps)[: M.shape[1]]
        scores = bc_scoring(y, p)
        for c in present:
            if counts[c] < args.per_class:
                per_class_scores[c].append(scores[:, c])
                counts[c] += 1

    rows = []
    for c in range(n_classes):
        if per_class_scores[c]:
            m = nanmean(np.stack(per_class_scores[c]), axis=0)
            row = {"class": c, "n": counts[c]}
            row.update({name: float(m[j]) for j, name in enumerate(bc_score_names)})
            rows.append(row)
            print(f"class {c} (n={counts[c]}): " + ", ".join(f"{k}={v:.3f}" for k, v in row.items() if k not in ("class", "n")))

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["class", "n"] + bc_score_names)
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main()
