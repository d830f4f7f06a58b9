"""Quickstart: predict binding interfaces for one PDB file.

    python examples/quickstart.py INPUT.pdb --ckpt /path/to/model.pt
"""

import argparse

import numpy as np

from pesto_tpu import Predictor, get_config
from pesto_tpu.io import save_pdb
from pesto_tpu.structure import encode_bfactor, split_by_chain

CLASSES = ["protein", "dna_rna", "ion", "ligand", "lipid"]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("pdb")
    parser.add_argument("--model", default="i_v4_0")
    parser.add_argument(
        "--ckpt",
        default="/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt",
    )
    args = parser.parse_args()

    pred = Predictor.from_reference_checkpoint(args.ckpt, get_config(args.model, remat=False))
    structure, probs = pred.predict_pdb_file(args.pdb)  # [n_res, 5]

    for k, name in enumerate(CLASSES[: probs.shape[1]]):
        top = np.argsort(-probs[:, k])[:5]
        print(f"{name}: top residues {list(top + 1)} (p={np.round(probs[top, k], 3)})")
        out = args.pdb.rsplit(".", 1)[0] + f"_i{k}.pdb"
        save_pdb(split_by_chain(encode_bfactor(dict(structure), probs[:, k])), out)
        print(f"  wrote {out}")


if __name__ == "__main__":
    main()
