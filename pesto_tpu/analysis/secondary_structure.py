"""Secondary-structure assignment from C-alpha geometry (P-SEA style).

Replaces the reference's mdtraj compute_dssp dependency
(interfaceome/secondary_structures.py) with a native implementation:
helix/strand/coil assignment from CA(i)-CA(i+k) distances and dihedrals
(Labesse et al. 1997 thresholds), which matches DSSP to ~85-90% without
needing hydrogen-bond energies.
"""

import numpy as np

HELIX, STRAND, COIL = "H", "E", "C"


def _dihedral(p0, p1, p2, p3):
    b0 = p1 - p0
    b1 = p2 - p1
    b2 = p3 - p2
    n1 = np.cross(b0, b1)
    n2 = np.cross(b1, b2)
    m1 = np.cross(n1, b1 / np.maximum(np.linalg.norm(b1, axis=-1, keepdims=True), 1e-9))
    x = np.sum(n1 * n2, axis=-1)
    y = np.sum(m1 * n2, axis=-1)
    return np.degrees(np.arctan2(y, x))


def _angle(p0, p1, p2):
    v1 = p0 - p1
    v2 = p2 - p1
    c = np.sum(v1 * v2, axis=-1) / np.maximum(
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1), 1e-9
    )
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def assign_secondary_structure_ca(xyz_ca: np.ndarray) -> np.ndarray:
    """P-SEA assignment from CA coordinates [R, 3] -> array of 'H'/'E'/'C'."""
    xyz = np.asarray(xyz_ca, dtype=np.float64)
    n = xyz.shape[0]
    ss = np.full(n, COIL, dtype="U1")
    if n < 5:
        return ss

    def d(i, k):
        return np.linalg.norm(xyz[i + k] - xyz[i], axis=-1)

    idx = np.arange(n)
    # distances d2(i)=|CA_i-CA_i+2|, d3, d4 where defined
    d2 = np.full(n, np.nan)
    d3 = np.full(n, np.nan)
    d4 = np.full(n, np.nan)
    d2[: n - 2] = np.linalg.norm(xyz[2:] - xyz[:-2], axis=1)
    d3[: n - 3] = np.linalg.norm(xyz[3:] - xyz[:-3], axis=1)
    d4[: n - 4] = np.linalg.norm(xyz[4:] - xyz[:-4], axis=1)

    tau = np.full(n, np.nan)  # angle CA(i-1), CA(i), CA(i+1)
    tau[1 : n - 1] = _angle(xyz[:-2], xyz[1:-1], xyz[2:])
    alpha = np.full(n, np.nan)  # dihedral CA(i-1..i+2)
    alpha[1 : n - 2] = _dihedral(xyz[:-3], xyz[1:-2], xyz[2:-1], xyz[3:])

    # helix: ideal alpha geometry d2=5.4, d3=5.1, d4=6.2, tau=89, |alpha|=50
    helix = (
        (np.abs(d3 - 5.1) <= 0.55) & (np.abs(d4 - 6.2) <= 0.70)
    ) | ((np.abs(tau - 89.0) <= 12.0) & (np.abs(np.abs(alpha) - 50.0) <= 20.0))
    # strand: extended geometry d2=6.7, d3=9.9, tau=124, alpha ~ +-180
    strand = (
        (np.abs(d2 - 6.70) <= 0.70) & (np.abs(d3 - 9.90) <= 1.50)
    ) | (
        (np.abs(tau - 124.0) <= 16.0) & (np.abs(np.abs(alpha) - 180.0) <= 60.0)
    )

    helix = np.where(np.isnan(d3), False, helix)
    strand = np.where(np.isnan(d2), False, strand)

    # require minimum run lengths (helix >= 5, strand >= 3 like P-SEA)
    def runs(mask, min_len):
        out = np.zeros_like(mask)
        i = 0
        while i < n:
            if mask[i]:
                j = i
                while j < n and mask[j]:
                    j += 1
                if j - i >= min_len:
                    out[i:j] = True
                i = j
            else:
                i += 1
        return out

    h = runs(helix, 5)
    e = runs(strand & ~h, 3)
    ss[h] = HELIX
    ss[e] = STRAND
    return ss


def secondary_structure(structure: dict) -> np.ndarray:
    """Per-residue H/E/C for a structure record (CA-based)."""
    m_ca = (structure["name"] == "CA") & (structure["element"] == "C")
    resids = structure["resid"]
    ures = np.unique(resids)
    xyz_ca = np.full((len(ures), 3), np.nan)
    for i, r in enumerate(ures):
        m = (resids == r) & m_ca
        if m.any():
            xyz_ca[i] = structure["xyz"][m][0]
    ok = ~np.isnan(xyz_ca[:, 0])
    ss = np.full(len(ures), COIL, dtype="U1")
    if ok.sum() >= 5:
        ss[ok] = assign_secondary_structure_ca(xyz_ca[ok])
    return ss
