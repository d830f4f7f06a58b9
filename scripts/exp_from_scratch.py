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
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-pure (see augment)
    from pesto_tpu.data.build import build_dataset_h5

    pool = collect_pool()
    print(f"building from {len(pool)} complex files -> {args.out}")
    n = build_dataset_h5(pool, args.out, progress=True,
                         num_workers=args.workers)
    print(f"stored {n} subunit entries")


def _resseq(s):
    """Residue resname sequence in resid order (the residue identity a
    conformation shares with its bound chain)."""
    import numpy as np

    _, idx = np.unique(s["resid"], return_index=True)
    return tuple(s["resname"][np.sort(idx)].tolist())


def cmd_augment(args):
    """Conformational augmentation: append the md_analysis unbound MD
    cluster conformations (1AK4_uL_3_AUC78_N9.pdb etc., 547 single-chain
    files) to an existing build, with interface labels TRANSFERRED from
    the bound complex ({pdbid}_C.pdb) — the md_analysis ground-truth
    protocol (apply_model_md.ipynb cell 6: labels = contacts of the bound
    reference complex, geometry = the sampled conformation). Residue
    correspondence is exact (same chain, same resid order; asserted by
    resname-sequence identity), so the bound subunit's sparse Y quads
    apply verbatim to the conformation's residue indexing.

    This multiplies the mount's trainable data ~4x and teaches the model
    conformational robustness — the property md_analysis benchmarks."""
    # CPU-pure: extract_topology jits, and the sitecustomize-registered
    # device plugin routes compiles through the remote tunnel even under
    # JAX_PLATFORMS=cpu — a concurrent chip user (or an unhealthy tunnel)
    # then kills this host-only job mid-append (observed round 5). Scrub
    # the plugin trigger BEFORE anything imports jax.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import h5py
    import numpy as np

    from pesto_tpu.data.build import (
        DEFAULT_CONFIG,
        pack_dataset_items,
        pack_structure_data,
        preprocess_for_build,
        store_dataset_items,
    )
    from pesto_tpu.encoding import encode_features, encode_structure
    from pesto_tpu.io import read_pdb
    from pesto_tpu.structure import preprocess_structure
    from pesto_tpu.topology import extract_all_contacts, extract_topology

    confs = {}
    for p in sorted(glob.glob(f"{REF}/md_analysis/pdbs_clusters/*.pdb")):
        base = os.path.basename(p)
        if base.endswith("_C.pdb"):
            continue
        confs.setdefault(base.split("_")[0], []).append(p)

    n_added = n_skipped = 0
    metadata_new = []
    with h5py.File(args.h5, "a") as hf:
        # Idempotence: metadata is extended only at the END of the append,
        # so a run killed mid-append (observed round 5: a concurrent chip
        # user took down this host-only job) leaves conformation groups
        # (":u" keys) with no metadata row. Purge such orphans so the
        # augment can be re-run on the same file.
        known = {k.decode() for k in hf["metadata/keys"][()]}
        orphans = []
        for g2 in hf["data/structures"]:
            for pid in hf[f"data/structures/{g2}"]:
                for bid in hf[f"data/structures/{g2}/{pid}"]:
                    for cid in hf[f"data/structures/{g2}/{pid}/{bid}"]:
                        key = f"{g2}/{pid}/{bid}/{cid}"
                        if ":u" in cid and key not in known:
                            orphans.append(key)
        for key in orphans:
            del hf[f"data/structures/{key}"]
            if f"data/contacts/{key}" in hf:
                del hf[f"data/contacts/{key}"]
        if orphans:
            print(f"purged {len(orphans)} orphan conformation groups "
                  "from an interrupted append")
        for pdbid, files in sorted(confs.items()):
            cpath = f"{REF}/md_analysis/pdbs_clusters/{pdbid}_C.pdb"
            if not os.path.exists(cpath):
                continue
            subunits = preprocess_for_build(read_pdb(cpath))
            if subunits is None:
                continue
            contacts = extract_all_contacts(subunits, DEFAULT_CONFIG["r_thr"])
            if not contacts:
                continue
            _, contacts_data = pack_dataset_items(
                subunits, contacts, DEFAULT_CONFIG["molecule_ids"],
                DEFAULT_CONFIG["max_num_nn"],
            )
            seqs = {cid: _resseq(subunits[cid]) for cid in contacts_data}
            for j, fp in enumerate(files):
                try:
                    u_subunits = preprocess_structure(read_pdb(fp))
                except Exception as e:
                    print(f"ReadError: {fp}: {e}")
                    n_skipped += 1
                    continue
                if len(u_subunits) != 1:
                    n_skipped += 1
                    continue
                su = next(iter(u_subunits.values()))
                useq = _resseq(su)
                cid = next((c for c, s in seqs.items() if s == useq), None)
                if cid is None or not contacts_data.get(cid):
                    n_skipped += 1  # no exact residue correspondence
                    continue
                qe, qr, qn = encode_features(su)
                X, M = encode_structure(su)
                ids_topk, _, _ = extract_topology(X, DEFAULT_CONFIG["max_num_nn"])
                conf_cid = f"{cid}:u{j}"
                sdata = {conf_cid: pack_structure_data(X, qe, qr, qn, M, ids_topk)}
                cdata = {conf_cid: dict(contacts_data[cid])}
                for partner, (_, attrs) in contacts_data[cid].items():
                    assert attrs["Y_shape"][0] == M.shape[1], (fp, cid)
                metadata_new.extend(
                    store_dataset_items(hf, pdbid, "1", sdata, cdata)
                )
                n_added += 1
        if metadata_new:
            keys = np.concatenate([
                np.array(hf["metadata/keys"]).astype(np.dtype("U")),
                np.array([m["key"] for m in metadata_new]),
            ])
            sizes = np.concatenate([
                np.array(hf["metadata/sizes"]),
                np.array([m["size"] for m in metadata_new]),
            ])
            ckeys = np.concatenate([
                np.array(hf["metadata/ckeys"]).astype(np.dtype("U")),
                np.array([m["ckey"] for m in metadata_new]),
            ])
            n_old = len(hf["metadata/keys"])
            ctypes_new = np.stack(
                np.where(np.array([m["ctype"] for m in metadata_new])), axis=1
            ).astype(np.uint32)
            ctypes_new[:, 0] += n_old  # row index into the extended table
            ctypes = np.concatenate([np.array(hf["metadata/ctypes"]), ctypes_new])
            for name, val in (
                ("keys", keys.astype(np.bytes_)),
                ("sizes", sizes),
                ("ckeys", ckeys.astype(np.bytes_)),
                ("ctypes", ctypes),
            ):
                del hf[f"metadata/{name}"]
                hf[f"metadata/{name}"] = val
    print(f"appended {n_added} conformation entries ({n_skipped} skipped) -> {args.h5}")


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
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-pure (see augment)
    import h5py
    import numpy as np

    from pesto_tpu.data.split import (parse_clusters, sid_to_cluster_map,
                                      write_selection)

    with h5py.File(args.h5) as hf:
        sids = [k.decode() for k in hf["metadata/keys"][()]]
    with open(f"{REF}/datasets/bc-30.out") as f:
        clusters = parse_clusters(f)
    cmap = sid_to_cluster_map(clusters)

    def sid_entry(sid):  # "AK/1AK4_C/1/0:0" -> ("1AK4", "1AK4", "0")
        # group by DEPOSITION (pdbid), not by file stem: augmented
        # conformation entries ("1AK4") must stay on the same split side
        # as their bound complex ("1AK4_C") — their labels ARE its labels
        parts = sid.split("/")
        chain = parts[3].split(":")[0] if len(parts) > 3 else ""
        return parts[1].split("_")[0].upper(), parts[1].split("_")[0].upper(), chain

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
    # a CLEAN resume (kill between checkpoint and next log boundary)
    # leaves monotonic steps in train.dat; the .log records it explicitly
    reload_lines = []
    try:
        with open(os.path.join(args.run, "train.log")) as f:
            reload_lines = [ln.strip() for ln in f
                            if "Reloaded checkpoint at step" in ln]
    except OSError:
        pass
    resumes = max(resumes, len(reload_lines))
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
    a = sub.add_parser("augment")
    a.add_argument("--h5", default="/tmp/from_scratch.h5")
    m = sub.add_parser("summarize")
    m.add_argument("--run", required=True)
    m.add_argument("--out", default="docs/artifacts/from_scratch_run.json")
    m.add_argument("--extra", default=None,
                   help="optional pdbs_test benchmark JSON to embed")
    args = ap.parse_args()
    {"build": cmd_build, "split": cmd_split, "augment": cmd_augment,
     "summarize": cmd_summarize}[args.cmd](args)


if __name__ == "__main__":
    main()
