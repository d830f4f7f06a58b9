from .h5 import load_data, load_sparse_mask, save_data, sparse_onehot_indices
from .dataset import H5Dataset, load_interface_labels
from .selection import (
    select_by_interface_types,
    select_by_max_ba,
    select_by_sid,
    select_complete_assemblies,
)

__all__ = [
    "load_data",
    "load_sparse_mask",
    "save_data",
    "sparse_onehot_indices",
    "H5Dataset",
    "load_interface_labels",
    "select_by_sid",
    "select_by_max_ba",
    "select_by_interface_types",
    "select_complete_assemblies",
]
