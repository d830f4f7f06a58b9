"""HDF5 storage codec, schema-compatible with the reference dataset
(contacts_rr5A_64nn_8192.h5).

Layout (reference processing/build_dataset.py:143-173, src/dataset.py:50-88):
  data/structures/<key>/{X f32, ids_topk u16, qe u16 [n,2], qr, qn, M}
    with attrs {qe_shape, qr_shape, qn_shape, M_shape}
  data/contacts/<ckey>/{Y u16 [m,4]} with attrs {Y_shape, ctype}
  metadata/{keys, sizes, ckeys, ctypes, std_elements, std_resnames,
            std_names, mids}

One-hots/masks are stored as uint16 (row, col) index pairs of the nonzero
entries plus a dense-shape attribute; lzf compression.
"""

import numpy as np


def save_data(hgrp, attrs=None, **data):
    for key in data:
        hgrp.create_dataset(key, data=data[key], compression="lzf")
    for key in (attrs or {}):
        hgrp.attrs[key] = attrs[key]


def load_data(hgrp, keys=None):
    keys = list(hgrp.keys()) if keys is None else keys
    data = {k: np.array(hgrp[k]) for k in keys}
    attrs = {k: hgrp.attrs[k] for k in hgrp.attrs}
    return data, attrs


def sparse_onehot_indices(m: np.ndarray) -> np.ndarray:
    """Dense bool/0-1 matrix -> uint16 (row, col) nonzero index pairs
    (reference pack_structure_data, processing/build_dataset.py:63-74)."""
    if max(m.shape) >= 2 ** 16:
        raise ValueError(
            f"matrix shape {m.shape} exceeds the uint16 sparse-index range "
            "(the reference HDF5 schema, processing/build_dataset.py:63-74) "
            "— indices would silently wrap"
        )
    rows, cols = np.where(m > 0.5)
    return np.stack([rows, cols], axis=1).astype(np.uint16)


def load_sparse_mask(hgrp, k: str) -> np.ndarray:
    """Rebuild a dense float32 matrix from stored index pairs
    (reference src/dataset.py:50-59)."""
    shape = tuple(hgrp.attrs[k + "_shape"])
    M = np.zeros(shape, dtype=np.float32)
    ids = np.array(hgrp[k]).astype(np.int64)
    if ids.shape[0] > 0:
        M[ids[:, 0], ids[:, 1]] = 1.0
    return M


def sparse_4d_indices(Y: np.ndarray) -> np.ndarray:
    """4-D bool contact-type map -> uint16 [m, 4] nonzero indices."""
    if max(Y.shape) >= 2 ** 16:
        raise ValueError(
            f"contact map shape {Y.shape} exceeds the uint16 index range"
        )
    return np.stack(np.where(Y), axis=1).astype(np.uint16)
