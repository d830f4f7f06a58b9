"""Dataset-build CLI (the reference's processing/build_dataset.py).

Usage:
  python -m pesto_tpu.apps.build_dataset "biounits/*/*.pdb[0-9]*.gz" \
      --out contacts_rr5A_64nn_8192.h5 [--r-thr 5.0 --max-atoms 8192]
"""

import argparse
import glob


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="PDB file globs")
    parser.add_argument("--out", required=True)
    parser.add_argument("--r-thr", type=float, default=5.0)
    parser.add_argument("--max-atoms", type=int, default=8192)
    parser.add_argument("--max-num-nn", type=int, default=64)
    parser.add_argument("--num-workers", type=int, default=8,
                        help="parse/encode worker processes (reference "
                             "builds with 16, processing/build_dataset.py:179)")
    args = parser.parse_args(argv)

    from ..data.build import build_dataset_h5
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    paths = sorted({p for inp in args.inputs for p in glob.glob(inp)})
    n = build_dataset_h5(
        paths,
        args.out,
        config={
            "r_thr": args.r_thr,
            "max_num_atoms": args.max_atoms,
            "max_num_nn": args.max_num_nn,
        },
        progress=True,
        num_workers=args.num_workers,
    )
    print(f"wrote {n} subunit entries to {args.out}")


if __name__ == "__main__":
    main()
