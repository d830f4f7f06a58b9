"""Interface-prediction CLI: folder of PDBs -> per-class *_i{k}.pdb files
with predictions in the B-factor column.

The reference's apply_model.ipynb cell 6 as a batch-throughput tool: all
structures are encoded host-side, grouped into padding buckets, and
predicted in batched jitted calls.

Usage:
  python -m pesto_tpu.apps.apply_model INPUT... --out DIR \
      [--ckpt /path/model.pt | --orbax /path/ckpt] [--model i_v4_1] [--bf16]
"""

import argparse
import glob
import os
import sys


def collect_pdbs(inputs):
    paths = []
    for inp in inputs:
        if os.path.isdir(inp):
            for pat in ("*.pdb", "*.pdb[0-9]*", "*.pdb.gz", "*.pdb[0-9]*.gz",
                        "*.cif", "*.cif.gz", "*.mmcif", "*.mmcif.gz"):
                paths.extend(glob.glob(os.path.join(inp, pat)))
        else:
            paths.extend(glob.glob(inp))
    # drop our own outputs (stems ending in _i<digit>, e.g. x_i0.pdb) —
    # but nothing else: a stem like "verify_in" must survive
    import re

    return sorted(
        {p for p in paths if not re.search(r"_i\d$", os.path.basename(p).split(".")[0])}
    )


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="PDB files, globs, or directories")
    parser.add_argument("--out", default=None, help="output dir (default: next to input)")
    parser.add_argument("--model", default=None,
                        help="config preset name (default: inferred from "
                             "--ckpt tensor shapes, else i_v4_1)")
    parser.add_argument("--ckpt", default=None, help="reference torch .pt checkpoint")
    parser.add_argument("--orbax", default=None, help="orbax checkpoint dir")
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument("--fast-knn", action="store_true",
                        help="partial-reduce kNN (~1.8x; 99.2%% neighbor agreement, "
                             "far-tail swaps only); shorthand for --knn fast")
    parser.add_argument("--knn", default="exact",
                        choices=("exact", "exact2", "fast", "pallas"),
                        help="kNN method (exact is the production default; "
                             "exact2 = count-verified threshold-compaction "
                             "selection, 2x exact's cost on the current "
                             "toolchain — PERFORMANCE.md section 4)")
    parser.add_argument("--classes", default=None, help="comma list of class indices to write")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..infer import Predictor
    from ..io import save_pdb
    from ..models import get_config
    from ..structure import encode_bfactor, split_by_chain
    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    knn_method = "fast" if args.fast_knn else args.knn

    def _bf16(c):
        return c.replace(dtype="bfloat16", precision="default") if args.bf16 else c

    if args.ckpt:
        if args.model is None:
            # infer the variant from the checkpoint's tensor shapes (a
            # wrong preset used to die in a flax scope error); one load
            from ..port import load_reference_checkpoint

            params, cfg = load_reference_checkpoint(args.ckpt)
            print(f"model variant inferred from checkpoint: em {cfg.em_n0}, "
                  f"{len(cfg.layers)} layers, {cfg.dm_n2} classes",
                  file=sys.stderr)
            cfg = _bf16(cfg)
            pred = Predictor(cfg, params, knn_method=knn_method)
        else:
            cfg = _bf16(get_config(args.model, remat=False))
            pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)
            pred.knn_method = knn_method
    elif args.orbax:
        cfg = _bf16(get_config(args.model or "i_v4_1", remat=False))
        from ..train.checkpoint import restore_checkpoint
        from ..train.state import create_train_state

        state, _ = create_train_state(cfg)
        restored = restore_checkpoint(args.orbax, state)
        if restored is None:
            parser.error(f"no checkpoint found in {args.orbax}")
        pred = Predictor(cfg, restored.params, knn_method=knn_method)
    else:
        default_ckpt = "/root/reference/model/save/i_v4_0_2021-09-07_11-20/model.pt"
        if os.path.isfile(default_ckpt) and args.model == "i_v4_0":
            cfg = _bf16(get_config("i_v4_0", remat=False))
            pred = Predictor.from_reference_checkpoint(default_ckpt, cfg)
            pred.knn_method = knn_method
        else:
            parser.error("need --ckpt or --orbax")

    paths = collect_pdbs(args.inputs)
    if not paths:
        parser.error("no input PDBs found")
    classes = (
        [int(c) for c in args.classes.split(",")] if args.classes else list(range(cfg.dm_n2))
    )

    # threaded host-side parse/clean (the native parser releases the
    # GIL), then bucketed batch prediction; unreadable files degrade to
    # None entries with a ReadError warning on stderr
    structures, probs = pred.predict_pdb_files(paths)

    for path, structure, p in zip(paths, structures, probs):
        if structure is None:  # unreadable file, ReadError already printed
            continue
        if p is None:  # over-bucket / unpredictable structure, already warned
            print(f"SkipError: {path}: no prediction", file=sys.stderr)
            continue
        base = os.path.basename(path).split(".")[0]
        out_dir = args.out or os.path.dirname(path) or "."
        os.makedirs(out_dir, exist_ok=True)
        for k in classes:
            s = encode_bfactor(dict(structure), p[:, k])
            out_path = os.path.join(out_dir, f"{base}_i{k}.pdb")
            save_pdb(split_by_chain(s), out_path)
        print(f"{path}: {p.shape[0]} residues -> {out_dir}/{base}_i*.pdb")


if __name__ == "__main__":
    main()
