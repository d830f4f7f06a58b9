"""JAX electrostatics: point-charge / dipole interaction energies and
nonbonded (Coulomb + Lennard-Jones) interface energies
(reference md_analysis/mdtraj_utils/interactions.py:20-270).

Units follow the reference: coordinates in nm, charges in elementary
charges, energies in kJ/mol.
"""

import jax
import jax.numpy as jnp

# Coulomb constant 1/(4 pi eps0) in kJ mol^-1 nm e^-2
COULOMB = 138.93545764438198


@jax.jit
def center_mass(X, m):
    return jnp.sum(X * m.reshape(-1, 1), axis=0) / jnp.sum(m)


@jax.jit
def dipole_moment(X, q, r0):
    return jnp.sum(q.reshape(-1, 1) * (X - r0.reshape(1, 3)), axis=0)


@jax.jit
def E_c(r, q):
    """Field of a point charge at displacement r."""
    r_norm = jnp.linalg.norm(r)
    r_hat = r / r_norm
    return COULOMB * (q / r_norm) * r_hat


@jax.jit
def E_d(r, p):
    """Field of a point dipole p at displacement r."""
    r_norm = jnp.linalg.norm(r)
    r_hat = r / r_norm
    return COULOMB * (3.0 * jnp.dot(p, r_hat) * r_hat - p) / (r_norm**3)


@jax.jit
def U_cc(r, q0, q1):
    r_hat = r / jnp.linalg.norm(r)
    return q0 * jnp.dot(r_hat, E_c(r, q1))


@jax.jit
def U_cd(r, q0, p1):
    r_hat = r / jnp.linalg.norm(r)
    return q0 * jnp.dot(r_hat, E_d(r, p1))


@jax.jit
def U_dc(r, p0, q1):
    return -jnp.dot(p0, E_c(r, q1))


@jax.jit
def U_dd(r, p0, p1):
    return -jnp.dot(p0, E_d(r, p1))


@jax.jit
def T_dc(r, p0, q1):
    return jnp.cross(p0, E_c(r, q1))


@jax.jit
def T_dd(r, p0, p1):
    return jnp.cross(p0, E_d(r, p1))


def multipole_interactions(xyz, charges, masses, ids0, ids1):
    """Charge-charge / charge-dipole / dipole-dipole energies between two
    atom groups treated as a monopole+dipole each (reference
    multipole_interactions, interactions.py:87-131).

    xyz [N,3] nm; returns dict of scalars (kJ/mol)."""
    xyz = jnp.asarray(xyz, jnp.float32)
    q = jnp.asarray(charges, jnp.float32)
    m = jnp.asarray(masses, jnp.float32)
    ids0 = jnp.asarray(ids0)
    ids1 = jnp.asarray(ids1)
    X0, X1 = xyz[ids0], xyz[ids1]
    q0, q1 = jnp.sum(q[ids0]), jnp.sum(q[ids1])
    r0 = center_mass(X0, m[ids0])
    r1 = center_mass(X1, m[ids1])
    p0 = dipole_moment(X0, q[ids0], r0)
    p1 = dipole_moment(X1, q[ids1], r1)
    r = r1 - r0
    return {
        "U_cc": U_cc(r, q0, q1),
        "U_cd": U_cd(r, q0, p1),
        "U_dc": U_dc(-r, p0, q1),
        "U_dd": U_dd(r, p0, p1),
        "T_dc": T_dc(-r, p0, q1),
        "T_dd": T_dd(r, p0, p1),
    }


@jax.jit
def _nonbonded(X0, X1, q0, q1, sig0, sig1, eps0, eps1):
    d = jnp.sqrt(jnp.sum((X0[:, None, :] - X1[None, :, :]) ** 2, axis=-1))
    d = jnp.maximum(d, 1e-6)
    U_c = COULOMB * (q0[:, None] * q1[None, :]) / d
    sig = 0.5 * (sig0[:, None] + sig1[None, :])
    eps = jnp.sqrt(eps0[:, None] * eps1[None, :])
    s6 = (sig / d) ** 6
    U_lj = 4.0 * eps * (s6 * s6 - s6)
    return jnp.sum(U_c), jnp.sum(U_lj)


def nonbonded_interactions(xyz, charges, sigmas, epsilons, ids0, ids1):
    """Pairwise Coulomb + LJ energy between two atom groups (reference
    nonbonded_interactions, interactions.py:134-216)."""
    xyz = jnp.asarray(xyz, jnp.float32)
    ids0 = jnp.asarray(ids0)
    ids1 = jnp.asarray(ids1)
    q = jnp.asarray(charges, jnp.float32)
    sg = jnp.asarray(sigmas, jnp.float32)
    ep = jnp.asarray(epsilons, jnp.float32)
    U_c, U_lj = _nonbonded(
        xyz[ids0], xyz[ids1], q[ids0], q[ids1], sg[ids0], sg[ids1], ep[ids0], ep[ids1]
    )
    return {"U_coulomb": U_c, "U_lj": U_lj}
