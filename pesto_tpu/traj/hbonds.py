"""Geometric hydrogen-bond detection between two subunits
(reference md_analysis/mdtraj_utils/trajectory_utils.py:441-471 uses
mdtraj's Baker-Hubbard; here: donor-acceptor N/O pairs within a distance
cutoff, hydrogen-free criterion suitable for heavy-atom-only structures)."""

import numpy as np

DONOR_ACCEPTOR_ELEMENTS = ("N", "O")
HBOND_DISTANCE = 3.5  # Angstrom heavy-atom donor-acceptor cutoff


def hydrogen_bonds(structure_R, structure_L, frames_R=None, frames_L=None, d_thr=HBOND_DISTANCE):
    """Count donor/acceptor (N/O) pairs within d_thr between subunits.

    Without frames: uses the structures' own coordinates; with frames
    [T, n, 3]: per-frame counts. Returns (counts, pair index array)."""
    m_R = np.isin(structure_R["element"], DONOR_ACCEPTOR_ELEMENTS)
    m_L = np.isin(structure_L["element"], DONOR_ACCEPTOR_ELEMENTS)
    ids_R = np.where(m_R)[0]
    ids_L = np.where(m_L)[0]
    xr = structure_R["xyz"][None] if frames_R is None else np.asarray(frames_R)
    xl = structure_L["xyz"][None] if frames_L is None else np.asarray(frames_L)
    # distances between polar atoms only
    D = np.sqrt(np.sum((xr[:, ids_R][:, :, None] - xl[:, ids_L][:, None]) ** 2, axis=-1))
    m = D < d_thr
    counts = m.sum(axis=(1, 2))
    t0, i0, j0 = np.where(m)
    pairs = np.stack([t0, ids_R[i0], ids_L[j0]], axis=1)
    return counts, pairs
