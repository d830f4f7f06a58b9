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


def _best_offset(ra, rb) -> int:
    """Resid offset maximizing overlap of two residue-id sets."""
    ua, ub = np.unique(ra), np.unique(rb)
    best, best_n = 0, -1
    for off in np.unique(ua[:1] - ub[:1]).tolist() + [0, int(ua.min() - ub.min())]:
        n = np.isin(ub + off, ua).sum()
        if n > best_n:
            best, best_n = int(off), int(n)
    return best


def identify(structure_a: dict, structure_b: dict) -> Tuple[np.ndarray, np.ndarray]:
    """Indices (ids_a, ids_b) of atoms present in both structures, in
    matching order (reference identify, trajectory_utils.py:67-141)."""
    off = _best_offset(structure_a["resid"], structure_b["resid"])
    ka = _keys(structure_a)
    kb = _keys(structure_b, resid_offset=off)

    pos_a = {}
    for i, k in enumerate(ka):
        pos_a.setdefault(k, i)  # first occurrence wins
    ids_a, ids_b = [], []
    seen = set()
    for j, k in enumerate(kb):
        i = pos_a.get(k)
        if i is not None and k not in seen:
            ids_a.append(i)
            ids_b.append(j)
            seen.add(k)
    return np.array(ids_a, dtype=np.int64), np.array(ids_b, dtype=np.int64)


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
