"""Training dataset over the reference-schema HDF5 store.

Mirrors model/data_handler.py:36-126: metadata preload, selection masks,
key -> contact-keys mapping, per-item load of coordinates / topology /
sparse one-hot features, and interface labels OR-combined over all contact
partners of the subunit.

Divergence (bug-fix): the reference's label loader crashes when a stored
contact-type row matches no runtime class (model/data_handler.py:22 relies
on every row matching exactly one class); here unmatched rows are ignored,
which is identical behavior wherever the reference doesn't crash.
"""

from typing import Sequence

import h5py
import numpy as np

from .h5 import load_sparse_mask


def load_interface_labels(hgrp, t0: np.ndarray, t1_l: Sequence[np.ndarray]) -> np.ndarray:
    """Map stored residue-residue contact types Y [m,4]=(r0,r1,type0,type1)
    onto runtime ligand/receptor class lists (model/data_handler.py:9-23).

    Returns bool [n_res0, len(t1_l)]."""
    shape = tuple(hgrp.attrs["Y_shape"])
    ids = np.array(hgrp["Y"]).astype(np.int64)
    y = np.zeros((shape[0], len(t1_l)), dtype=bool)
    if ids.shape[0] == 0:
        return y
    m_r = np.isin(ids[:, 2], t0)
    for j, t1 in enumerate(t1_l):
        m = m_r & np.isin(ids[:, 3], t1)
        y[ids[m, 0], j] = True
    return y


class H5Dataset:
    """Reference-schema HDF5 training dataset (model/data_handler.py:36)."""

    def __init__(self, dataset_filepath: str, features_flags=(True, False, False)):
        self.dataset_filepath = dataset_filepath
        self.ftrs = [fn for fn, ff in zip(["qe", "qr", "qn"], features_flags) if ff]

        with h5py.File(dataset_filepath, "r") as hf:
            self.keys = np.array(hf["metadata/keys"]).astype(np.dtype("U"))
            self.sizes = np.array(hf["metadata/sizes"])
            self.ckeys = np.array(hf["metadata/ckeys"]).astype(np.dtype("U"))
            self.ctypes = np.array(hf["metadata/ctypes"])
            self.std_elements = np.array(hf["metadata/std_elements"]).astype(np.dtype("U"))
            self.std_resnames = np.array(hf["metadata/std_resnames"]).astype(np.dtype("U"))
            self.std_names = np.array(hf["metadata/std_names"]).astype(np.dtype("U"))
            self.mids = np.array(hf["metadata/mids"]).astype(np.dtype("U"))

        # assembly root keys ("{hash}/{pdbid}/{bid}"), used by
        # select_complete_assemblies (reference src/dataset.py:28-33)
        self.rkeys = np.array(["/".join(k.split("/")[:3]) for k in self.keys])
        self.m = np.ones(len(self.keys), dtype=bool)
        self._update_selection()
        self.t0 = np.arange(self.mids.shape[0])
        self.t1_l = [np.arange(self.mids.shape[0])]
        self._hf = None  # lazily opened per process/worker
        self._hf_pid = None

    def _update_selection(self):
        self.ckeys_map = {}
        for key, ckey in zip(self.keys[self.m], self.ckeys[self.m]):
            self.ckeys_map.setdefault(key, []).append(ckey)
        self.ukeys = list(self.ckeys_map)

    def update_mask(self, m):
        self.m &= m
        self._update_selection()

    def set_types(self, l_types, r_types_l):
        self.t0 = np.where(np.isin(self.mids, l_types))[0]
        self.t1_l = [np.where(np.isin(self.mids, rt))[0] for rt in r_types_l]

    def get_largest(self):
        if not self.m.any():
            raise ValueError(
                "dataset selection is empty (check the selection file "
                "format and filter thresholds)"
            )
        i = int(np.argmax(self.sizes[:, 0] * self.m.astype(int)))
        k = self.ukeys.index(self.keys[i])
        return self[k]

    def sizes_selected(self) -> np.ndarray:
        """(n_atoms, n_res) per unique selected key, aligned with ukeys."""
        first_idx = {}
        for i, (key, sel) in enumerate(zip(self.keys, self.m)):
            if sel and key not in first_idx:
                first_idx[key] = i
        return np.array([self.sizes[first_idx[k]] for k in self.ukeys])

    def __len__(self):
        return len(self.ukeys)

    def _file(self):
        # per-pid handle: h5py file objects are not fork-safe, so a loader
        # worker process forked after the parent opened the file must
        # re-open its own handle
        import os

        pid = os.getpid()
        if self._hf is None or self._hf_pid != pid:
            self._hf = h5py.File(self.dataset_filepath, "r")
            self._hf_pid = pid
        return self._hf

    def reset_handles(self):
        """Drop the open HDF5 handle (called before forking workers)."""
        if self._hf is not None:
            try:
                self._hf.close()
            except Exception:
                pass
        self._hf = None

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_hf"] = None  # handles never cross process boundaries
        return d

    def __getitem__(self, k: int):
        """Returns unpadded (X [n,3], ids_topk [n,64], q [n,F], M [n,r],
        y [r,C] float32)."""
        key = self.ukeys[k]
        ckeys = self.ckeys_map[key]
        hf = self._file()
        hgrp = hf["data/structures/" + key]

        X = np.array(hgrp["X"]).astype(np.float32)
        M = load_sparse_mask(hgrp, "M")
        ids_topk = np.array(hgrp["ids_topk"]).astype(np.int64)
        q = np.concatenate([load_sparse_mask(hgrp, fn) for fn in self.ftrs], axis=1)

        y = np.zeros((M.shape[1], len(self.t1_l)), dtype=bool)
        for ckey in ckeys:
            y |= load_interface_labels(hf["data/contacts/" + ckey], self.t0, self.t1_l)

        return X, ids_topk, q, M, y.astype(np.float32)
