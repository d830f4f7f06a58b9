"""From-scratch training demonstration on every usable complex in the mount.

The reference trained i_v4_1 for 1.35M steps on a 104 GB HDF5 built from
the full PDB (model/main.py:103-255, processing/build_dataset.py); that
dataset is external. This experiment proves the SAME pipeline end-to-end
at the scale the mount allows:

  build     assemble every experimentally-determined multi-chain complex
            (md_analysis/pdbs_clusters/*_C.pdb + examples/ biounits;
            AlphaFold/ColabFold predictions are excluded — predicted
            contacts are not labels) into a reference-schema HDF5 via
            data/build.py, exactly like processing/build_dataset.py.
  split     cluster split with the REAL RCSB bc-30.out shipped in
            /root/reference/datasets (the file the reference's
            split_dataset.ipynb used): sids sharing a 30%-identity
            cluster with any pdbs_test chain are DROPPED (leakage
            control against the held-out benchmark), the rest split
            80/20 by cluster into train.txt/test.txt.
  summarize parse the run dir's train.dat into a committed artifact
            (loss + per-step AUC trajectories, resume markers) for
            docs/artifacts/from_scratch_run.json.

Training itself runs through the production CLI (so the demonstration
exercises train/loop.py, orbax checkpointing and the bucketed loader,
not a bespoke harness):

  python scripts/exp_from_scratch.py build --out /tmp/fs.h5
  python scripts/exp_from_scratch.py split --h5 /tmp/fs.h5 --outdir /tmp/fs_sel
  python -m pesto_tpu.apps.train_cli --dataset /tmp/fs.h5 \
      --train-sel /tmp/fs_sel/train.txt --test-sel /tmp/fs_sel/test.txt \
      --out /tmp/fs_run --model i_v4_0 ...
  (kill mid-run; re-invoke: restore_checkpoint resumes exactly)
  python scripts/exp_from_scratch.py summarize --run /tmp/fs_run \
      --out docs/artifacts/from_scratch_run.json
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def collect_pool():
    """Every experimentally-determined multi-chain complex in the mount."""
    pool = sorted(glob.glob(f"{REF}/md_analysis/pdbs_clusters/*_C.pdb"))
    # examples: biounits preferred; plain .pdb only without a .pdb1
    # sibling; skip prediction outputs (_i0..4) and hetero-subset
    # duplicates (1ZNS_ion, 7KHT_lipid, 2VGO_A ... same deposition)
    seen = set()
    for p in sorted(glob.glob(f"{REF}/examples/*/*.pdb1")):
        pool.append(p)
        seen.add(os.path.basename(p).split(".")[0])
    for p in sorted(glob.glob(f"{REF}/examples/*/*.pdb")):
        base = os.path.basename(p)[:-4]
        if re.search(r"_i[0-9]$|_[a-zA-Z]+$", base):
            continue  # prediction output or subset variant
        if base in seen:
            continue
        pool.append(p)
        seen.add(base)
    return pool


def cmd_build(args):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from pesto_tpu.data.build import build_dataset_h5

    pool = collect_pool()
    print(f"building from {len(pool)} complex files -> {args.out}")
    n = build_dataset_h5(pool, args.out, progress=True,
                         num_workers=args.workers)
    print(f"stored {n} subunit entries")


def _pdbs_test_pdbids():
    ids = set()
    for p in glob.glob(f"{REF}/pdbs_test/*.pdb"):
        parts = os.path.basename(p).split("_")
        if len(parts) >= 2:
            ids.add(parts[1].upper())
    return sorted(ids)


def cmd_split(args):
    """COMPLEX-level 80/20 split: all subunits of one deposition stay on
    one side (at this dataset size, chains of the same complex on both
    sides would leak its interface), complexes sharing a bc-30 cluster
    stay on one side (union-find), and complexes sharing a cluster with
    any pdbs_test chain are DROPPED (the final number is pdbs_test AUC).
    The reference splits subunit-wise at 300k-subunit scale
    (split_dataset.ipynb -> data/split.py); complex-level is the same
    logic with a stricter grouping that tiny data requires."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import h5py
    import numpy as np

    from pesto_tpu.data.split import (parse_clusters, sid_to_cluster_map,
                                      write_selection)

    with h5py.File(args.h5) as hf:
        sids = [k.decode() for k in hf["metadata/keys"][()]]
    with open(f"{REF}/datasets/bc-30.out") as f:
        clusters = parse_clusters(f)
    cmap = sid_to_cluster_map(clusters)

    def sid_entry(sid):  # "AK/1AK4_C/1/0:0" -> ("1AK4_C", "1AK4", "0")
        parts = sid.split("/")
        chain = parts[3].split(":")[0] if len(parts) > 3 else ""
        return parts[1], parts[1].split("_")[0].upper(), chain

    # union-find over complex entries, merged by shared bc-30 cluster
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    entry_sids = {}
    cluster_to_entry = {}
    for sid in sids:
        entry, pdbid4, chain = sid_entry(sid)
        entry_sids.setdefault(entry, []).append(sid)
        ci = cmap.get(f"{pdbid4}_{chain}")
        if ci is not None:
            if ci in cluster_to_entry:
                union(entry, cluster_to_entry[ci])
            else:
                cluster_to_entry[ci] = entry

    bench_ids = set(_pdbs_test_pdbids())
    bench_clusters = {ci for e, ci in cmap.items()
                      if e.split("_")[0] in bench_ids}

    groups = {}
    dropped = []
    for entry, esids in entry_sids.items():
        pdbid4 = entry.split("_")[0].upper()
        entry_clusters = {
            cmap.get(f"{pdbid4}_{sid_entry(s)[2]}") for s in esids
        } - {None}
        if entry_clusters & bench_clusters or pdbid4 in bench_ids:
            dropped.append(entry)
            continue
        groups.setdefault(find(entry), []).extend(esids)
    print(f"{len(sids)} sids / {len(entry_sids)} complexes; dropped as "
          f"pdbs_test homologs: {sorted(dropped)}")

    gids = sorted(groups)
    rng = np.random.RandomState(args.seed)
    rng.shuffle(gids)
    n_total = sum(len(groups[g]) for g in gids)
    test, train = [], []
    for g in gids:
        (test if len(test) < args.test_fraction * n_total else train).extend(
            sorted(groups[g]))
    os.makedirs(args.outdir, exist_ok=True)
    write_selection(os.path.join(args.outdir, "train.txt"), sorted(train))
    write_selection(os.path.join(args.outdir, "test.txt"), sorted(test))
    train_e = {sid_entry(s)[0] for s in train}
    test_e = {sid_entry(s)[0] for s in test}
    assert not (train_e & test_e)
    print(f"train {len(train)} subunits ({len(train_e)} complexes) / "
          f"test {len(test)} subunits ({len(test_e)} complexes) "
          f"-> {args.outdir}")


def cmd_summarize(args):
    entries = []
    with open(os.path.join(args.run, "train.dat")) as f:
        for line in f:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            if "step_type" not in e:
                continue
            rec = {
                "step": e.get("global_step"),
                "type": e["step_type"],
                "loss": e.get("loss"),
                "auc_protein": e.get("0/auc"),
                "steps_per_sec": e.get("steps_per_sec"),
            }
            entries.append(rec)
    # resume markers: a step that appears twice (pre-kill + post-resume
    # logs) or a log line sequence that goes backwards
    resumes = sum(
        1 for a, b in zip(entries, entries[1:])
        if a["type"] == b["type"] and b["step"] is not None
        and a["step"] is not None and b["step"] <= a["step"]
    )
    test_aucs = [e["auc_protein"] for e in entries
                 if e["type"] == "test" and e["auc_protein"] is not None]
    out = {
        "run_dir": args.run,
        "n_log_entries": len(entries),
        "resume_markers": resumes,
        "final_test_auc_protein": test_aucs[-1] if test_aucs else None,
        "best_test_auc_protein": max(test_aucs) if test_aucs else None,
        "trajectory": entries,
    }
    if args.extra and os.path.exists(args.extra):
        with open(args.extra) as f:
            out["pdbs_test_benchmark"] = json.load(f)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(entries)} log entries, {resumes} resume markers, "
          f"best test AUC {out['best_test_auc_protein']} -> {args.out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--out", default="/tmp/from_scratch.h5")
    b.add_argument("--workers", type=int, default=8)
    s = sub.add_parser("split")
    s.add_argument("--h5", default="/tmp/from_scratch.h5")
    s.add_argument("--outdir", default="/tmp/fs_sel")
    s.add_argument("--test-fraction", type=float, default=0.2)
    s.add_argument("--seed", type=int, default=1337)
    m = sub.add_parser("summarize")
    m.add_argument("--run", required=True)
    m.add_argument("--out", default="docs/artifacts/from_scratch_run.json")
    m.add_argument("--extra", default=None,
                   help="optional pdbs_test benchmark JSON to embed")
    args = ap.parse_args()
    {"build": cmd_build, "split": cmd_split, "summarize": cmd_summarize}[args.cmd](args)


if __name__ == "__main__":
    main()
