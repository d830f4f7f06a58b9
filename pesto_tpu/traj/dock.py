"""Docking-quality metrics: interface RMSD, fraction of native contacts,
per-frame contact maps (dockQ-style; reference trajectory_utils.py:267-425),
vectorized over frames.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import pairwise_distance_matrix, rmsd


def interface_atom_ids(xyz_R, xyz_L, resids_R, resids_L, r_thr=10.0):
    """Atom indices of all residues with any atom within r_thr of the
    other subunit, computed on the reference frame
    (reference interface_residues_within, trajectory_utils.py:267-297).

    Returns (ids_a, ids_b): indices into R and L respectively."""
    xyz_R = np.asarray(xyz_R, dtype=np.float32)
    xyz_L = np.asarray(xyz_L, dtype=np.float32)
    D = pairwise_distance_matrix(xyz_R[None], np.arange(len(xyz_R)), np.arange(len(xyz_L)))[0]
    m_pair = D < r_thr
    resids_R = np.asarray(resids_R)
    resids_L = np.asarray(resids_L)
    r_hit = np.unique(resids_R[np.any(m_pair, axis=1)])
    l_hit = np.unique(resids_L[np.any(m_pair, axis=0)])
    return (
        np.where(np.isin(resids_R, r_hit))[0],
        np.where(np.isin(resids_L, l_hit))[0],
    )


def irmsd(xyz_ref_R, xyz_ref_L, resids_R, resids_L, frames_R, frames_L, r_thr=10.0):
    """Interface RMSD per frame: superpose the interface atoms of each
    frame onto the reference interface, then RMSD over those atoms
    (reference irmsd, trajectory_utils.py:328-338)."""
    ids_a, ids_b = interface_atom_ids(xyz_ref_R, xyz_ref_L, resids_R, resids_L, r_thr)
    ref_int = np.concatenate([np.asarray(xyz_ref_R)[ids_a], np.asarray(xyz_ref_L)[ids_b]], axis=0)
    frames_R = np.asarray(frames_R, dtype=np.float32)
    frames_L = np.asarray(frames_L, dtype=np.float32)
    frames_int = np.concatenate([frames_R[:, ids_a], frames_L[:, ids_b]], axis=1)
    return rmsd(ref_int, frames_int)


def _residue_contact_map(D, mr_a, mr_b, r_thr):
    """[T, ra, rb] bool residue contact maps from [T, na, nb] distances."""
    C = (D < r_thr).astype(jnp.float32)
    rc = jnp.einsum("ar,tab,bs->trs", mr_a, C, mr_b)
    return rc > 0


def fnat(xyz_ref_R, xyz_ref_L, resids_R, resids_L, frames_R, frames_L, r_thr=5.0):
    """Fraction of native residue-residue contacts preserved per frame
    (reference fnat, trajectory_utils.py:341-390)."""
    ids_a, ids_b = interface_atom_ids(xyz_ref_R, xyz_ref_L, resids_R, resids_L, r_thr)
    ra = np.asarray(resids_R)[ids_a]
    rb = np.asarray(resids_L)[ids_b]
    mr_a = (ra[:, None] == np.unique(ra)[None, :]).astype(np.float32)
    mr_b = (rb[:, None] == np.unique(rb)[None, :]).astype(np.float32)

    # reference contact map
    xr = np.asarray(xyz_ref_R, dtype=np.float32)[None]
    xl = np.asarray(xyz_ref_L, dtype=np.float32)[None]
    d0 = np.sqrt(np.sum((xr[:, ids_a][:, :, None] - xl[:, ids_b][:, None]) ** 2, axis=-1))
    rc_ref = np.asarray(_residue_contact_map(jnp.asarray(d0), jnp.asarray(mr_a), jnp.asarray(mr_b), r_thr))[0]

    frames_R = np.asarray(frames_R, dtype=np.float32)
    frames_L = np.asarray(frames_L, dtype=np.float32)
    d = np.sqrt(
        np.sum((frames_R[:, ids_a][:, :, None] - frames_L[:, ids_b][:, None]) ** 2, axis=-1)
    )
    rc = np.asarray(_residue_contact_map(jnp.asarray(d), jnp.asarray(mr_a), jnp.asarray(mr_b), r_thr))
    denom = max(int(rc_ref.sum()), 1)
    return (rc & rc_ref[None]).sum(axis=(1, 2)) / denom


def interface_rigid_docking(
    xyz_ref_R, xyz_ref_L, resids_R, resids_L, frames_R, frames_L, r_thr=10.0
):
    """Rigid-docking offset of the ligand relative to the bound reference:
    superpose each frame's receptor interface onto the (interface-centered)
    reference, then find the residual rotation (as a rotation vector) and
    translation that would map the frame's ligand interface onto the
    reference's (reference interface_rigid_docking,
    trajectory_utils.py:474-499). Returns (t [T,3], rotvec [T,3])."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from .geometry import superpose_transform

    ids_R, ids_L = interface_atom_ids(xyz_ref_R, xyz_ref_L, resids_R, resids_L, r_thr)

    ref_R = np.asarray(xyz_ref_R, dtype=np.float32)
    ref_L = np.asarray(xyz_ref_L, dtype=np.float32)
    center = ref_R[ids_R].mean(axis=0, keepdims=True)
    ref_R_c = ref_R - center
    ref_L_c = ref_L - center

    frames_R = np.asarray(frames_R, dtype=np.float32)
    frames_L = np.asarray(frames_L, dtype=np.float32)
    # superpose frames on the receptor interface
    t, R, t_ref = superpose_transform(ref_R_c[None, ids_R], frames_R[:, ids_R])
    sup_L = np.asarray(jnp.matmul(jnp.asarray(frames_L) - t, R) + t_ref)
    # residual ligand-interface transform
    t_cm, R2, t_ref2 = superpose_transform(ref_L_c[None, ids_L], sup_L[:, ids_L])
    rotvec = Rotation.from_matrix(np.asarray(R2)).as_rotvec()
    t_out = (np.asarray(t_ref2) - np.asarray(t_cm)).squeeze(1)
    return t_out, rotvec


def contacts_per_frame(frames_R, frames_L, r_thr=5.0):
    """Per-frame inter-subunit atom contact counts and boolean any-contact
    per atom of R (reference contacts, trajectory_utils.py:393-425)."""
    frames_R = jnp.asarray(frames_R, jnp.float32)
    frames_L = jnp.asarray(frames_L, jnp.float32)

    @jax.jit
    def per_frame(xr, xl):
        d2 = jnp.sum((xr[:, None, :] - xl[None, :, :]) ** 2, axis=-1)
        m = d2 < (r_thr * r_thr)
        return jnp.sum(m), jnp.any(m, axis=1)

    counts, any_r = jax.lax.map(lambda ab: per_frame(*ab), (frames_R, frames_L))
    return np.asarray(counts), np.asarray(any_r)
