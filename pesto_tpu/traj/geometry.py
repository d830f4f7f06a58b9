"""Trajectory geometry: Kabsch superposition, RMSD, PBC unwrap.

mdtraj-free equivalents of the reference's trajectory toolkit
(md_analysis/mdtraj_utils/trajectory_utils.py:28,190-230,300-325), batched
over frames with vmap/XLA. A "trajectory" here is simply an
[T, N, 3] float32 coordinate array (Angstroms) plus a structure record for
the topology.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _kabsch(xyz_ref, xyz):
    """Optimal rigid transform per frame (SVD Kabsch with reflection fix;
    reference superpose_transform, trajectory_utils.py:190-207).

    xyz_ref, xyz: [T, N, 3]. Returns (t, R, t_ref) with
    aligned = (xyz - t) @ R + t_ref."""
    t = jnp.mean(xyz, axis=1, keepdims=True)
    t_ref = jnp.mean(xyz_ref, axis=1, keepdims=True)
    H = jnp.matmul(jnp.swapaxes(xyz_ref - t_ref, 1, 2), xyz - t)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    Z = jnp.broadcast_to(jnp.eye(3), U.shape).copy()
    Z = Z.at[:, -1, -1].set(det)
    R = jnp.matmul(jnp.swapaxes(Vt, 1, 2), jnp.matmul(Z, jnp.swapaxes(U, 1, 2)))
    return t, R, t_ref


def superpose_transform(xyz_ref, xyz):
    # promote [N,3] -> [1,N,3] BEFORE any rank munging: atleast_3d appends
    # a TRAILING axis ([N,3] -> [N,3,1]), which silently fed _kabsch N
    # frames of one-dimensional points
    xyz_ref = jnp.asarray(xyz_ref, jnp.float32)
    xyz = jnp.asarray(xyz, jnp.float32)
    if xyz_ref.ndim == 2:
        xyz_ref = xyz_ref[None]
    if xyz.ndim == 2:
        xyz = xyz[None]
    if xyz_ref.shape[0] == 1 and xyz.shape[0] > 1:
        xyz_ref = jnp.broadcast_to(xyz_ref, xyz.shape)
    return _kabsch(xyz_ref, xyz)


def superpose(xyz_ref, xyz_frames, sel_ref=None, sel=None):
    """Superpose all frames onto the reference using the selected atom
    pairs (defaults to all atoms; reference superpose,
    trajectory_utils.py:210-230). Returns the transformed [T, N, 3]."""
    xyz_frames = np.asarray(xyz_frames, dtype=np.float32)
    if xyz_frames.ndim == 2:
        xyz_frames = xyz_frames[None]
    xyz_ref = np.asarray(xyz_ref, dtype=np.float32)
    if xyz_ref.ndim == 3:
        xyz_ref = xyz_ref[0]
    a_ref = xyz_ref[sel_ref] if sel_ref is not None else xyz_ref
    a = xyz_frames[:, sel] if sel is not None else xyz_frames
    t, R, t_ref = superpose_transform(a_ref[None], a)
    return np.asarray(jnp.matmul(jnp.asarray(xyz_frames) - t, R) + t_ref)


def rmsd(xyz_ref, xyz_frames, sel_ref=None, sel=None, superpose_first=True):
    """Per-frame RMSD after (by default) CA-style superposition on the
    selection (reference rmsd, trajectory_utils.py:308-325). Angstroms."""
    xyz_frames = np.asarray(xyz_frames, dtype=np.float32)
    if xyz_frames.ndim == 2:
        xyz_frames = xyz_frames[None]
    xyz_ref = np.asarray(xyz_ref, dtype=np.float32)
    if xyz_ref.ndim == 3:
        xyz_ref = xyz_ref[0]
    a_ref = xyz_ref[sel_ref] if sel_ref is not None else xyz_ref
    a = xyz_frames[:, sel] if sel is not None else xyz_frames
    if superpose_first:
        t, R, t_ref = superpose_transform(a_ref[None], a)
        a = np.asarray(jnp.matmul(jnp.asarray(a) - t, R) + t_ref)
    return np.sqrt(np.mean(np.sum((a - a_ref[None]) ** 2, axis=2), axis=1))


def pairwise_distance_matrix(xyz_frames, ids_a, ids_b):
    """[T, |a|, |b|] distances (reference trajectory_utils.py:300-305)."""
    xyz = jnp.asarray(xyz_frames, jnp.float32)
    if xyz.ndim == 2:
        xyz = xyz[None]
    d = xyz[:, jnp.asarray(ids_a)][:, :, None, :] - xyz[:, jnp.asarray(ids_b)][:, None, :, :]
    return np.asarray(jnp.sqrt(jnp.sum(d * d, axis=-1)))


def center_frames(xyz_frames):
    xyz = np.asarray(xyz_frames, dtype=np.float32)
    return xyz - xyz.mean(axis=-2, keepdims=True)


def join_trajectories(frames_list):
    """Concatenate trajectories along the frame axis (reference
    join_trajectories, trajectory_utils.py:7-20; topology equality is the
    caller's responsibility)."""
    frames_list = [np.asarray(f, dtype=np.float32) for f in frames_list]
    n = frames_list[0].shape[1]
    assert all(f.shape[1] == n for f in frames_list), "mismatching atom counts"
    return np.concatenate(frames_list, axis=0)


def atoms_per_chain(structure):
    """Atom indices per chain (reference get_atoms_per_chain,
    trajectory_utils.py:23-25)."""
    chains = np.asarray(structure["chain_name"])
    return {str(c): np.where(chains == c)[0] for c in np.unique(chains)}


def remove_hydrogens(structure):
    """Drop H/D atoms (reference rm_h, trajectory_utils.py:180-181)."""
    from ..structure import atom_select

    m = ~np.isin(np.asarray(structure["element"]), ("H", "D"))
    return atom_select(structure, m)


def residue_atom_mask(structure):
    """[n_res, n_atoms] bool mask mapping residues to their atoms
    (reference residue_to_atom_index_mapping, trajectory_utils.py:184-187)."""
    resids = np.asarray(structure["resid"])
    return np.unique(resids).reshape(-1, 1) == resids.reshape(1, -1)


def atoms_to_residue_contacts(resids_a, resids_b, ids_a, ids_b, d_ab):
    """Aggregate atom-atom contacts to residue-residue contacts with the
    minimum distance per pair (reference atoms_to_residue_contacts,
    trajectory_utils.py:233-264). Returns (pairs [m,2], d_min [m])."""
    ra = np.asarray(resids_a)[np.asarray(ids_a)]
    rb = np.asarray(resids_b)[np.asarray(ids_b)]
    d_ab = np.asarray(d_ab)
    best = {}
    for r0, r1, d in zip(ra, rb, d_ab):
        key = (int(r0), int(r1))
        if key not in best or d < best[key]:
            best[key] = float(d)
    pairs = np.array(sorted(best), dtype=np.int64).reshape(-1, 2)
    dmin = np.array([best[tuple(p)] for p in pairs])
    return pairs, dmin


def unwrap_pbc(xyz_frames, box_lengths, anchors=None):
    """Remove periodic-boundary jumps between consecutive frames: any
    per-atom displacement larger than half a box length is shifted by a
    box period (reference unwrap_pbc, trajectory_utils.py:28-64).

    xyz_frames: [T, N, 3]; box_lengths: [3] or [T, 3]."""
    xyz = np.asarray(xyz_frames, dtype=np.float64).copy()
    box = np.asarray(box_lengths, dtype=np.float64)
    if box.ndim == 1:
        box = np.broadcast_to(box, (xyz.shape[0], 3))
    for k in range(1, xyz.shape[0]):
        delta = xyz[k] - xyz[k - 1]
        shift = np.round(delta / box[k])
        xyz[k] -= shift * box[k]
    return xyz.astype(np.float32)
