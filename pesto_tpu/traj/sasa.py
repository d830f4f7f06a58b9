"""Shrake-Rupley solvent-accessible surface area in JAX.

Replaces the reference's mdtraj.shrake_rupley dependency
(interfaceome/solvent_accessible_surface_area.py:27-31,
md_analysis/mdtraj_utils/trajectory_utils.py:428-438) with a TPU-friendly
implementation: a Fibonacci sphere of test points per atom, occlusion
tested against neighbors, vmapped over atoms and frames.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# van der Waals radii (Angstrom) for common elements; default 1.8
VDW_RADII = {
    "H": 1.2, "C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8, "P": 1.8,
    "F": 1.47, "Cl": 1.75, "Br": 1.85, "I": 1.98, "Se": 1.9,
    "Zn": 1.39, "Mg": 1.73, "Ca": 2.31, "Na": 2.27, "K": 2.75,
    "Fe": 1.56, "Mn": 1.61, "Cu": 1.4, "Ni": 1.63, "Co": 1.53,
}
PROBE_RADIUS = 1.4  # water probe, Angstrom


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], axis=1
    ).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_points",))
def _sasa_frame(X, radii, mask, n_points=128):
    """Per-atom SASA [N] for one frame; padding atoms (mask 0) are ignored
    and occlude nothing."""
    sphere = jnp.asarray(_fibonacci_sphere(n_points))
    R = radii + PROBE_RADIUS  # [N]

    def per_atom(i):
        pts = X[i] + R[i] * sphere  # [P, 3]
        d2 = jnp.sum((pts[:, None, :] - X[None, :, :]) ** 2, axis=-1)  # [P, N]
        thr2 = jnp.square(R)[None, :]
        occluded = (d2 < thr2) & (mask[None, :] > 0)
        occluded = occluded.at[:, i].set(False)
        frac = 1.0 - jnp.mean(jnp.any(occluded, axis=1).astype(jnp.float32))
        return 4.0 * jnp.pi * R[i] ** 2 * frac * mask[i]

    return jax.vmap(per_atom)(jnp.arange(X.shape[0]))


def shrake_rupley(structure_or_xyz, elements=None, n_points=128, frames=None):
    """Per-atom SASA in Angstrom^2.

    Either pass a structure record (dict with 'xyz' and 'element') or
    xyz [N,3] plus an elements array. With frames [T,N,3], returns [T,N].
    """
    if isinstance(structure_or_xyz, dict):
        xyz = structure_or_xyz["xyz"]
        elements = structure_or_xyz["element"]
    else:
        xyz = structure_or_xyz
    radii = np.array([VDW_RADII.get(str(e), 1.8) for e in elements], dtype=np.float32)
    mask = np.ones(len(radii), dtype=np.float32)
    if frames is not None:
        f = jnp.asarray(frames, jnp.float32)
        out = jax.lax.map(lambda x: _sasa_frame(x, jnp.asarray(radii), jnp.asarray(mask), n_points), f)
        return np.asarray(out)
    return np.asarray(_sasa_frame(jnp.asarray(xyz, jnp.float32), jnp.asarray(radii), jnp.asarray(mask), n_points))


def residue_sasa(structure, atom_sasa):
    """Aggregate per-atom SASA to per-residue sums."""
    resids = np.asarray(structure["resid"])
    ures = np.unique(resids)
    return np.array([atom_sasa[resids == r].sum() for r in ures]), ures
