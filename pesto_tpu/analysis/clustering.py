"""Interface clustering.

  - connected_components: union-find over an adjacency mask — the
    O(N alpha(N)) replacement for the reference's BFS "follow_rabbits"
    (interfaceome/cluster_interfaces.py:9-34);
  - cluster_interfaces: connected patches of predicted interface residues
    (pLDDT/afs > thr, p > thr, d < thr; reference :37-62);
  - DensityPeakClustering: density-peak clustering of interface patterns
    over MD frames, standing in for the vendored (and absent) CLoNe
    submodule used by md_analysis/apply_model_with_clustering.ipynb.
"""

from typing import List

import numpy as np


def connected_components(adj: np.ndarray) -> List[List[int]]:
    """Connected components of a boolean adjacency matrix (union-find).
    Returns lists of node indices, ordered like the reference's BFS
    (components in order of their smallest unvisited seed)."""
    n = adj.shape[0]
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ii, jj = np.where(np.triu(adj, k=1))
    for i, j in zip(ii, jj):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    roots = np.array([find(i) for i in range(n)])
    comps = {}
    for i, r in enumerate(roots):
        comps.setdefault(r, []).append(i)
    return [comps[r] for r in sorted(comps)]


def cluster_interfaces(entry: dict, afs_thr: float = 70.0, p_thr: float = 0.5, d_thr: float = 10.0):
    """Cluster predicted interface residues into spatial patches, per
    interface class (reference cluster_interfaces,
    interfaceome/cluster_interfaces.py:37-62).

    entry: {'x','y','z' [R], 'afs' [R] confidence, 'p0'..'p4' [R] probs}.
    Returns a list (per class) of lists of residue-index patches."""
    ids_interfaces = []
    xyz = np.stack([entry["x"], entry["y"], entry["z"]], axis=1)
    n_classes = len([k for k in entry if k.startswith("p") and k[1:].isdigit()])
    for i in range(n_classes):
        p = np.asarray(entry[f"p{i}"])
        m = (np.asarray(entry["afs"]) > afs_thr) & (p > p_thr)
        xyz_int = xyz[m]
        if xyz_int.shape[0] == 0:
            ids_interfaces.append([])
            continue
        D = np.sqrt(np.sum((xyz_int[None] - xyz_int[:, None]) ** 2, axis=2))
        comps = connected_components(D < d_thr)
        ids_p = np.where(m)[0]
        ids_interfaces.append([[int(v) for v in ids_p[c]] for c in comps])
    return ids_interfaces


def cluster_md_interface_patterns(probs, p_thr: float = 0.5, n_clusters: int = None):
    """Cluster MD frames by their predicted interface *pattern*
    (reference md_analysis/apply_model_with_clustering.ipynb + CLoNe):
    frames with similar sets of high-probability residues group together.

    probs: [T, R] per-frame per-residue probabilities (one class).
    Returns (labels [T], centers frame indices)."""
    X = (np.asarray(probs) > p_thr).astype(np.float64)
    dpc = DensityPeakClustering(n_clusters=n_clusters)
    labels = dpc.fit_predict(X)
    return labels, dpc.centers_


class DensityPeakClustering:
    """Density-peak clustering (Rodriguez-Laio style, as used by CLoNe):
    density rho_i = # points within d_c; delta_i = distance to the nearest
    higher-density point; cluster centers maximize rho*delta; remaining
    points join their nearest higher-density neighbor's cluster."""

    def __init__(self, n_clusters: int = None, dc: float = None, rho_delta_thr: float = None):
        self.n_clusters = n_clusters
        self.dc = dc
        self.rho_delta_thr = rho_delta_thr

    def fit_predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        D = np.sqrt(np.sum((X[None] - X[:, None]) ** 2, axis=2))
        dc = self.dc
        if dc is None:
            # ~2% quantile of pairwise distances, the usual heuristic
            tri = D[np.triu_indices(n, 1)]
            dc = np.quantile(tri, 0.02) if tri.size else 1.0
            dc = max(dc, 1e-9)
        rho = np.sum(np.exp(-np.square(D / dc)), axis=1) - 1.0

        order = np.argsort(-rho)
        delta = np.zeros(n)
        nearest_higher = np.full(n, -1)
        for rank, i in enumerate(order):
            if rank == 0:
                delta[i] = D[i].max() if n > 1 else 0.0
                continue
            higher = order[:rank]
            j = higher[np.argmin(D[i, higher])]
            delta[i] = D[i, j]
            nearest_higher[i] = j

        gamma = rho * delta
        if self.n_clusters is not None:
            centers = np.argsort(-gamma)[: self.n_clusters]
        else:
            thr = self.rho_delta_thr
            if thr is None:
                thr = gamma.mean() + 3.0 * gamma.std()
            centers = np.where(gamma > thr)[0]
            if centers.size == 0:
                centers = np.array([order[0]])

        labels = np.full(n, -1)
        for k, c in enumerate(centers):
            labels[c] = k
        for i in order:
            if labels[i] == -1:
                labels[i] = labels[nearest_higher[i]]
        self.centers_ = centers
        self.rho_ = rho
        self.delta_ = delta
        return labels
