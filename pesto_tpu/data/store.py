"""Raw structure store: HDF5 of structure records keyed by id, compatible
with the reference's AlphaFold-models store
(interfaceome/structures_store.py:10-63): string arrays stored as bytes,
keys listed under metadata/keys.
"""

from typing import Iterable, List, Tuple

import h5py
import numpy as np


def h5_store_structure(hgrp, structure: dict) -> None:
    for key, data in structure.items():
        data = np.asarray(data)
        if data.dtype.kind == "U":
            hgrp[key] = data.astype(np.bytes_)
        else:
            hgrp[key] = data


def h5_load_structure(hgrp) -> dict:
    structure = {}
    for key in hgrp.keys():
        data = np.array(hgrp[key])
        if data.dtype.kind == "S":
            structure[key] = data.astype("U")
        else:
            structure[key] = data
    return structure


class StructuresStore:
    """Read access to a structure store (reference PDBStore,
    structures_store.py:31-47)."""

    def __init__(self, h5_filepath: str):
        self.h5_filepath = h5_filepath
        with h5py.File(h5_filepath, "r") as hf:
            self.keys = np.array(hf["metadata/keys"]).astype(np.dtype("U"))
        self._hf = None

    def __iter__(self):
        return iter(self.keys)

    def __len__(self):
        return len(self.keys)

    def _file(self):
        # per-pid handle, like H5Dataset._file: h5py handles are not
        # fork-safe, so a worker process forked after the parent opened
        # the file must re-open its own
        import os

        pid = os.getpid()
        if self._hf is None or getattr(self, "_hf_pid", None) != pid:
            self._hf = h5py.File(self.h5_filepath, "r")
            self._hf_pid = pid
        return self._hf

    def reset_handles(self):
        """Drop the open HDF5 handle (call before forking workers)."""
        if self._hf is not None:
            try:
                self._hf.close()
            except Exception:
                pass
            self._hf = None

    def __getitem__(self, key: str) -> dict:
        return h5_load_structure(self._file()[key])


def store_pdbs(h5_filepath: str, pdb_key_filepaths: Iterable[Tuple[str, str]]) -> List[str]:
    """Pack (key, pdb_path) pairs into a store (reference store_pdbs,
    structures_store.py:50-63)."""
    from ..io import read_pdb

    keys = []
    with h5py.File(h5_filepath, "w") as hf:
        for key, pdb_filepath in pdb_key_filepaths:
            try:
                structure = read_pdb(pdb_filepath)
            except Exception as e:
                print(f"ReadError: {pdb_filepath}: {e}")
                continue
            h5_store_structure(hf.create_group(key), structure)
            keys.append(key)
        hf["metadata/keys"] = np.array(keys).astype(np.bytes_)
    return keys
