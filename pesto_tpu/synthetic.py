"""Synthetic padded structures for benchmarks, dry-runs and tests."""

import numpy as np

from .batching import PaddedStructure, compute_topology, pad_structure_arrays


def random_structure_arrays(
    n_atoms: int = 50,
    n_res: int = 12,
    n_features: int = 30,
    seed: int = 0,
):
    """Raw unpadded (X [n,3], q [n,F], M [n,r]) protein-like point cloud
    (~0.1 atoms/A^3), for exercising the full host encode pipeline."""
    rng = np.random.RandomState(seed)
    box = max((n_atoms / 0.1) ** (1.0 / 3.0), 10.0)
    X = (rng.rand(n_atoms, 3) * box).astype(np.float32)
    q = np.eye(n_features, dtype=np.float32)[rng.randint(0, n_features, n_atoms)]
    resid = np.sort(rng.randint(0, n_res, n_atoms))
    resid[0] = 0
    resid[-1] = n_res - 1
    M = (resid[:, None] == np.arange(n_res)[None, :]).astype(np.float32)
    return X, q, M


def random_padded_structure(
    n_atoms: int = 50,
    n_res: int = 12,
    n_classes: int = 5,
    n_features: int = 30,
    na: int = None,
    nr: int = None,
    seed: int = 0,
    with_labels: bool = False,
    with_topology: bool = True,
    with_gather_tables: bool = False,
) -> PaddedStructure:
    """A random protein-like point cloud (realistic ~0.1 atoms/A^3 density)
    padded into a bucket, with optional random labels."""
    rng = np.random.RandomState(seed)
    box = max((n_atoms / 0.1) ** (1.0 / 3.0), 10.0)
    X = (rng.rand(n_atoms, 3) * box).astype(np.float32)
    if with_gather_tables:
        from .spatial import morton_order

        X = X[morton_order(X)]
    q = np.eye(n_features, dtype=np.float32)[rng.randint(0, n_features, n_atoms)]
    resid = np.sort(rng.randint(0, n_res, n_atoms))
    resid[0] = 0
    resid[-1] = n_res - 1
    M = (resid[:, None] == np.arange(n_res)[None, :]).astype(np.float32)
    y = (rng.rand(n_res, n_classes) < 0.2).astype(np.float32) if with_labels else None
    ps = pad_structure_arrays(X, q, M, na=na, nr=nr, y=y)
    if with_topology:
        ps = compute_topology(ps)
        if with_gather_tables:
            from .batching import attach_gather_tables

            ps = attach_gather_tables(ps, u_fixed=1024)
    return ps


def random_structure_record(
    n_atoms: int = 50, n_res: int = 12, seed: int = 0
) -> dict:
    """A random protein-like raw structure RECORD (the dict the io readers
    produce), for driving the full host encode + predict pipeline."""
    from .encoding import std_elements

    rng = np.random.RandomState(seed)
    box = max((n_atoms / 0.1) ** (1.0 / 3.0), 10.0)
    resid = np.sort(rng.randint(1, n_res + 1, n_atoms)).astype(np.int32)
    resid[0], resid[-1] = 1, n_res
    return {
        "xyz": (rng.rand(n_atoms, 3) * box).astype(np.float32),
        "name": np.array(["CA"] * n_atoms),
        "element": np.array(std_elements[rng.randint(0, 5, n_atoms)]),
        "resname": np.array(["ALA"] * n_atoms),
        "resid": resid,
        "het_flag": np.array(["A"] * n_atoms),
        "chain_name": np.array(["A:0"] * n_atoms),
        "icode": np.array([""] * n_atoms),
    }
