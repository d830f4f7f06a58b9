from .geometry import (
    center_frames,
    pairwise_distance_matrix,
    rmsd,
    superpose,
    superpose_transform,
    unwrap_pbc,
)
from .dock import contacts_per_frame, fnat, interface_atom_ids, irmsd

__all__ = [
    "center_frames",
    "pairwise_distance_matrix",
    "rmsd",
    "superpose",
    "superpose_transform",
    "unwrap_pbc",
    "contacts_per_frame",
    "fnat",
    "interface_atom_ids",
    "irmsd",
]
