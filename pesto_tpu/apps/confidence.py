"""Prediction-confidence calibration analysis
(the reference's interface_ppi_confidence.ipynb): distribution of the
predicted probability for correct vs wrong predictions over a dataset
selection, plus reliability-curve bins.

Usage:
  python -m pesto_tpu.apps.confidence --dataset data.h5 [--sel val.txt]
      --ckpt model.pt [--limit 8192] [--out confidence.csv]
"""

import argparse
import csv

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--sel", default=None)
    parser.add_argument("--model", default="i_v4_0")
    parser.add_argument("--ckpt", default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt")
    parser.add_argument("--class-index", type=int, default=0)
    parser.add_argument("--limit", type=int, default=8192)
    parser.add_argument("--bins", type=int, default=20)
    parser.add_argument("--out", default="confidence.csv")
    args = parser.parse_args(argv)

    from ..batching import pad_structure_arrays
    from ..infer import Predictor
    from ..models import get_config
    from ..train.loop import TrainConfig, setup_dataset
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.model, remat=False)
    pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)

    tc = TrainConfig(dataset_filepath=args.dataset)
    ds = setup_dataset(tc, args.sel, cfg.feature_flags)

    all_p, all_y = [], []
    for k in range(min(len(ds), args.limit)):
        X, ids_topk, q, M, y = ds[k]
        ps = pad_structure_arrays(X, q, M, ids_topk_raw=ids_topk)
        p = pred.probabilities(ps)[: M.shape[1], args.class_index]
        all_p.append(p)
        all_y.append(y[:, args.class_index])
    p = np.concatenate(all_p)
    y = np.concatenate(all_y)

    q = (p > 0.5).astype(np.float32)
    correct = q == y
    print(f"{len(p)} residues; accuracy {correct.mean():.4f}")
    print(f"confidence (|p-0.5|*2): correct {np.abs(p[correct]-0.5).mean()*2:.3f}, "
          f"wrong {np.abs(p[~correct]-0.5).mean()*2:.3f}")

    edges = np.linspace(0, 1, args.bins + 1)
    rows = []
    for i in range(args.bins):
        m = (p >= edges[i]) & (p < edges[i + 1])
        rows.append(
            {
                "bin_lo": edges[i],
                "bin_hi": edges[i + 1],
                "count": int(m.sum()),
                "mean_p": float(p[m].mean()) if m.any() else float("nan"),
                "frac_positive": float(y[m].mean()) if m.any() else float("nan"),
            }
        )
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"reliability table -> {args.out}")


if __name__ == "__main__":
    main()
