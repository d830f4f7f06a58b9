"""Surface-vertex -> atom/residue mapping (the reference's only native
binding: vendored pyflann kNN in masif-site_benchmark, used to map surface
-mesh vertex labels onto residues). Here: exact nearest neighbors via the
framework's own device kNN."""

import numpy as np


def nearest_atoms(vertices: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    """Index of the nearest atom for every surface vertex.

    vertices [V,3], xyz [N,3] -> [V] int. Blocked host/numpy computation
    (V and N are small for meshes; exactness matters more than speed)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    xyz = np.asarray(xyz, dtype=np.float32)
    out = np.empty(vertices.shape[0], dtype=np.int64)
    block = 4096
    for i in range(0, vertices.shape[0], block):
        v = vertices[i : i + block]
        d2 = np.sum((v[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
        out[i : i + block] = np.argmin(d2, axis=1)
    return out


def vertex_labels_to_residues(vertices, vertex_labels, structure, reduce="max"):
    """Map per-vertex labels to per-residue labels via nearest atoms
    (reference masif_sppider_Intpred_comp.ipynb vertex->residue mapping)."""
    ids = nearest_atoms(vertices, structure["xyz"])
    resids = np.asarray(structure["resid"])[ids]
    ures = np.unique(structure["resid"])
    out = np.zeros(len(ures), dtype=np.float32)
    labels = np.asarray(vertex_labels, dtype=np.float32)
    for i, r in enumerate(ures):
        m = resids == r
        if m.any():
            out[i] = labels[m].max() if reduce == "max" else labels[m].mean()
    return out, ures
