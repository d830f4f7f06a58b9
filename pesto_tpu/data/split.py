"""Sequence-identity-cluster train/test split
(the reference's processing/split_dataset.ipynb): subunit ids are grouped
by their 30%-identity cluster (RCSB bc-30.out format), benchmark PDBs are
excluded into a validation set, the remaining clusters are shuffled with a
fixed seed and split 80/20 by cluster so no cluster spans train and test.
"""

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def parse_clusters(cluster_lines: Iterable[str]) -> List[List[str]]:
    """Parse RCSB bc-out cluster lines: one cluster per line, entries like
    "1ABC_A" separated by whitespace."""
    clusters = []
    for line in cluster_lines:
        entries = line.split()
        if entries:
            clusters.append(entries)
    return clusters


def sid_to_cluster_map(clusters: Sequence[Sequence[str]]) -> Dict[str, int]:
    return {e.upper(): i for i, cluster in enumerate(clusters) for e in cluster}


def _sid_pdbid_chain(sid: str) -> Tuple[str, str]:
    """Dataset keys are "XX/PDBID/BID/CHAIN:MODEL" (data/build.py mirrors
    processing/build_dataset.py:143-173's layout); legacy flat sids look
    like "1ABC_1_A:0". A non-RCSB source file like "1AK4_C.pdb" yields
    pdbid "1AK4_C" — map it to its 4-char entry id for cluster lookup."""
    if "/" in sid:
        parts = sid.split("/")
        pdbid = parts[1]
        chain = parts[3].split(":")[0] if len(parts) > 3 else ""
    else:
        parts = sid.split("_")
        pdbid = parts[0]
        chain = parts[-1].split(":")[0]
    return pdbid.split("_")[0].upper(), chain


def _sid_pdb_chain(sid: str) -> str:
    """Map a dataset sid -> "1ABC_A" (the bc-30.out entry format)."""
    pdbid, chain = _sid_pdbid_chain(sid)
    return f"{pdbid}_{chain}"


def split_dataset(
    sids: Sequence[str],
    clusters: Sequence[Sequence[str]],
    exclude_pdbids: Sequence[str] = (),
    test_fraction: float = 0.2,
    seed: int = 1337,
) -> Tuple[List[str], List[str], List[str]]:
    """Returns (train_sids, test_sids, validation_sids).

    - sids whose PDB id is in exclude_pdbids (benchmark sets) go to
      validation,
    - remaining sids are grouped by cluster (unclustered sids form
      singleton clusters) and clusters are shuffled with `seed`, then cut
      80/20 into train/test by cluster.
    """
    exclude = {p.upper() for p in exclude_pdbids}
    cmap = sid_to_cluster_map(clusters)

    validation, by_cluster = [], {}
    for sid in sids:
        pdbid, _ = _sid_pdbid_chain(sid)
        if pdbid in exclude:
            validation.append(sid)
            continue
        key = cmap.get(_sid_pdb_chain(sid))
        if key is None:
            # unclustered chains group per PDB ENTRY (not per sid): the
            # subunits of one deposition share a structure, and scattering
            # them across train/test leaks the complex's interface
            key = f"pdb:{pdbid}"
        by_cluster.setdefault(key, []).append(sid)

    cluster_ids = sorted(by_cluster, key=str)
    rng = np.random.RandomState(seed)
    rng.shuffle(cluster_ids)

    n_test = int(round(test_fraction * len(cluster_ids)))
    test_clusters = set(cluster_ids[:n_test])

    train, test = [], []
    for cid in sorted(by_cluster, key=str):
        (test if cid in test_clusters else train).extend(by_cluster[cid])
    return train, test, validation


def write_selection(path: str, sids: Sequence[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(sids) + ("\n" if sids else ""))
