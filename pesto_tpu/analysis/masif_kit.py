"""MaSIF-site benchmark kit: mesh-based ground truth and method scoring.

Reproduces the reference's masif_sppider_Intpred_comp.ipynb protocol
(which depends on pymesh + pyflann + Biopython) with the framework's own
PLY reader and exact nearest-atom mapping:

  - residue ground truth from a labeled surface mesh via the SPPIDER
    criterion: a residue is interface iff its vertices' interface area
    exceeds 5 A^2 AND 4% of the residue's surface area (nb cell 5);
  - per-point and per-residue scoring of residue-level predictors that
    store scores in the CA B-factor (SPPIDER / IntPred / PSIVER / PeSTo,
    nb cell 6) and of mesh-level predictors (MaSIF, nb cells 11-12).
"""

from typing import Dict, Tuple

import numpy as np

from ..io.ply import read_ply, vertex_areas
from .surface_map import nearest_atoms


def _res_keys(structure) -> np.ndarray:
    """Per-atom residue identity keys (chain + resid + icode)."""
    n = structure["xyz"].shape[0]
    icode = structure.get("icode")
    if icode is None:
        icode = np.full(n, "", dtype="U4")
    return np.char.add(
        np.char.add(structure["chain_name"].astype("U"), ":"),
        np.char.add(structure["resid"].astype("U"), icode.astype("U")),
    )


def read_pdb_bfactors(path: str) -> Tuple[dict, np.ndarray]:
    """Minimal raw PDB parse keeping per-atom B-factors.

    The benchmark's residue-level predictors (SPPIDER/IntPred/PSIVER and
    PeSTo itself) encode scores in the B-factor column; the notebook reads
    them with Biopython (first altloc kept), which this mirrors. Returns
    (structure-like dict, bfactors [N])."""
    xyz, names, chains, resids, icodes, bfs = [], [], [], [], [], []
    seen_altloc = set()
    opener = open
    if str(path).endswith(".gz"):
        import gzip

        opener = lambda p: gzip.open(p, "rt")
    with opener(path) as f:
        for line in f:
            if not line.startswith(("ATOM  ", "HETATM")) or len(line) < 66:
                continue
            altloc = line[16:17]
            name = line[12:16].strip()
            chain = line[21:22].strip()
            try:
                resid = int(line[22:26])
                x, y, z = float(line[30:38]), float(line[38:46]), float(line[46:54])
                b = float(line[60:66])
            except ValueError:
                continue
            if altloc not in (" ", ""):
                key = (chain, resid, name)
                if key in seen_altloc:
                    continue
                seen_altloc.add(key)
            xyz.append((x, y, z))
            names.append(name)
            chains.append(chain)
            resids.append(resid)
            icodes.append(line[26:27].strip())
            bfs.append(b)
    structure = {
        "xyz": np.asarray(xyz, dtype=np.float32),
        "name": np.asarray(names),
        "chain_name": np.asarray(chains),
        "resid": np.asarray(resids, dtype=np.int32),
        "icode": np.asarray(icodes),
    }
    return structure, np.asarray(bfs, dtype=np.float32)


def residue_ground_truth(
    structure: dict, mesh: Dict[str, np.ndarray],
    min_area: float = 5.0, min_frac: float = 0.04,
    ids: np.ndarray = None,
) -> Dict[str, float]:
    """SPPIDER-criterion residue interface labels from a labeled mesh.

    mesh must carry "vertices", "faces" and "iface" (vertex_iface). Pass
    ids (nearest atom per vertex) to reuse an existing mapping."""
    areas = vertex_areas(mesh["vertices"], mesh["faces"]).astype(np.float64)
    if ids is None:
        ids = nearest_atoms(mesh["vertices"], structure["xyz"])
    iface = np.asarray(mesh["iface"], dtype=np.float32) > 0

    ukeys, inv = np.unique(_res_keys(structure), return_inverse=True)
    vres = inv[ids]  # residue index per vertex
    n = len(ukeys)
    a_iface = np.bincount(vres[iface], weights=areas[iface], minlength=n)
    a_total = np.bincount(vres, weights=areas, minlength=n)
    present = a_total > 0
    lab = (a_iface > min_area) & (a_iface / np.maximum(a_total, 1e-9) > min_frac)
    return {str(k): float(v) for k, v, p in zip(ukeys, lab, present) if p}


def residue_scores_from_bfactor(structure: dict, bfactors: np.ndarray, alpha: float = 1e-2) -> Dict[str, float]:
    """CA B-factor -> per-residue score (negative = no prediction, skipped),
    exactly like the notebook's res_pred (cell 6)."""
    keys = _res_keys(structure)
    names = structure["name"].astype("U")
    out = {}
    for i in np.where(names == "CA")[0]:
        b = float(bfactors[i])
        if b >= 0:
            out[str(keys[i])] = b * alpha
    return out


def vertex_scores_from_atoms(
    structure: dict, mesh: Dict[str, np.ndarray], atom_scores: np.ndarray
) -> np.ndarray:
    """Per-vertex prediction = nearest atom's score (nb cell 6 point path)."""
    ids = nearest_atoms(mesh["vertices"], structure["xyz"])
    return np.asarray(atom_scores, dtype=np.float32)[ids]


def residue_scores_from_mesh(
    structure: dict, mesh: Dict[str, np.ndarray], vertex_scores: np.ndarray,
    ids: np.ndarray = None,
) -> Dict[str, float]:
    """Mesh-level predictor -> per-residue mean vertex score (nb cell 11)."""
    if ids is None:
        ids = nearest_atoms(mesh["vertices"], structure["xyz"])
    ukeys, inv = np.unique(_res_keys(structure), return_inverse=True)
    vres = inv[ids]
    scores = np.asarray(vertex_scores, dtype=np.float64)
    n = len(ukeys)
    cnt = np.bincount(vres, minlength=n)
    tot = np.bincount(vres, weights=scores, minlength=n)
    present = cnt > 0
    mean = tot / np.maximum(cnt, 1)
    return {str(k): float(v) for k, v, p in zip(ukeys, mean, present) if p}


def paired_residue_arrays(
    labels: Dict[str, float], preds: Dict[str, float]
) -> Tuple[np.ndarray, np.ndarray]:
    """Intersect label/prediction residue keys into aligned arrays."""
    common = [k for k in labels if k in preds]
    y = np.array([labels[k] for k in common], dtype=np.float32)
    p = np.array([preds[k] for k in common], dtype=np.float32)
    return y, p


def score_structure_vs_mesh(
    structure: dict,
    bfactors: np.ndarray,
    truth_mesh_path: str,
    alpha: float = 1e-2,
):
    """One protein, one residue-level predictor (B-factor encoded):
    returns (point_labels, point_preds, res_labels, res_preds) pooled
    arrays, mirroring compute_roc_auc_sppider_intpred_psiver."""
    mesh = read_ply(truth_mesh_path)
    ids = nearest_atoms(mesh["vertices"], structure["xyz"])
    point_labels = (np.asarray(mesh["iface"], dtype=np.float32) > 0).astype(np.float32)
    point_preds = (np.asarray(bfactors, dtype=np.float32) * alpha)[ids]
    res_labels = residue_ground_truth(structure, mesh, ids=ids)
    res_preds = residue_scores_from_bfactor(structure, bfactors, alpha)
    y, p = paired_residue_arrays(res_labels, res_preds)
    return point_labels, point_preds, y, p
