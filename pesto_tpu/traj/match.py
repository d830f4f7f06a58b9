"""Atom matching across topologies (the reference's identify/align,
md_analysis/mdtraj_utils/trajectory_utils.py:67-171): find the common
atoms of two structure records so trajectories from different
preparations can be compared. Matching key: (chain, resid-offset-corrected
residue position, residue name, atom name); per-chain resid offsets are
estimated from the best overlap."""

from typing import Tuple

import numpy as np


def _keys(structure, resid_offset=0):
    chains = structure.get("chain_name")
    if chains is None:
        chains = np.full(len(structure["resid"]), "A")
    return np.array(
        [
            f"{str(c).split(':')[0]}|{int(r) + resid_offset}|{rn}|{n}"
            for c, r, rn, n in zip(
                chains, structure["resid"], structure["resname"], structure["name"]
            )
        ]
    )


def _best_offsets(ra, rb) -> list:
    """Candidate resid offsets ranked by residue-id overlap, searched over
    every difference between the two sets' anchor residues (truncated +
    renumbered preparations need offsets no endpoint pair predicts).
    Overlap ties (e.g. truncation + renumbering) are resolved by the
    caller on matched atom keys."""
    ua, ub = np.unique(ra), np.unique(rb)
    cands = {0}
    # anchor a bounded set of candidates: every ua against ub's ends, and
    # ub's first few against ua's ends — covers truncation at either
    # terminus with arbitrary renumbering at O(|ua|) candidates
    for a in ua.tolist():
        cands.add(int(a - ub.min()))
        cands.add(int(a - ub.max()))
    for b in ub[:8].tolist():
        cands.add(int(ua.min() - b))
        cands.add(int(ua.max() - b))
    scored = sorted(
        ((int(np.isin(ub + off, ua).sum()), -abs(off), off) for off in cands),
        reverse=True,
    )
    # top candidates by resid overlap (ties broken toward small |offset|);
    # identify() disambiguates among them by actual matched atom KEYS
    return [off for n, _, off in scored[:4] if n > 0] or [0]


def identify(structure_a: dict, structure_b: dict) -> Tuple[np.ndarray, np.ndarray]:
    """Indices (ids_a, ids_b) of atoms present in both structures, in
    matching order (reference identify, trajectory_utils.py:67-141).
    Tries the top candidate resid offsets and keeps the one matching the
    most atom keys (resid overlap alone ties for truncated+renumbered
    preparations)."""
    ka = _keys(structure_a)
    pos_a = {}
    for i, k in enumerate(ka):
        pos_a.setdefault(k, i)  # first occurrence wins

    best = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    for off in _best_offsets(structure_a["resid"], structure_b["resid"]):
        kb = _keys(structure_b, resid_offset=off)
        ids_a, ids_b = [], []
        seen = set()
        for j, k in enumerate(kb):
            i = pos_a.get(k)
            if i is not None and k not in seen:
                ids_a.append(i)
                ids_b.append(j)
                seen.add(k)
        if len(ids_a) > len(best[0]):
            best = (np.array(ids_a, dtype=np.int64), np.array(ids_b, dtype=np.int64))
    return best


def align(structure_ref: dict, *structures, selection_names=("CA",)) -> np.ndarray:
    """Column-stacked matched atom ids across all structures restricted to
    the named atoms (reference align, trajectory_utils.py:144-171):
    returns [n_matched, 1 + len(structures)]."""
    m_ref = np.isin(structure_ref["name"], selection_names)
    ids = [np.where(m_ref)[0]]
    common = None
    per_struct = []
    for s in structures:
        ia, ib = identify(structure_ref, s)
        keep = m_ref[ia]
        per_struct.append((ia[keep], ib[keep]))
    if not per_struct:
        return ids[0][:, None]
    # intersect matches on the reference side
    common = per_struct[0][0]
    for ia, _ in per_struct[1:]:
        common = np.intersect1d(common, ia)
    cols = [common]
    for ia, ib in per_struct:
        order = {a: b for a, b in zip(ia, ib)}
        cols.append(np.array([order[a] for a in common], dtype=np.int64))
    return np.stack(cols, axis=1)
