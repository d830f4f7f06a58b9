"""Dataset construction: PDB biounits -> reference-schema HDF5.

Re-implements processing/build_dataset.py:16-254 on the TPU-native stack:
parsing/cleaning on host (pure Python/numpy), contacts + kNN topology on
device via jitted bucketed kernels.
"""

import os
import re
from typing import List, Optional

import h5py
import numpy as np

from ..encoding import (
    config_encoding,
    encode_features,
    encode_structure,
)
from ..structure import (
    clean_structure,
    filter_non_atomic_subunits,
    remove_duplicate_tagged_subunits,
    split_by_chain,
    tag_hetatm_chains,
)
from ..topology import extract_all_contacts, extract_topology
from .h5 import save_data, sparse_4d_indices, sparse_onehot_indices

# contact-type vocabulary: the 79 molecule ids
# (processing/build_dataset.py:21-29 == the interface category resnames)
MOLECULE_IDS = np.array(
    ["GLU", "LEU", "ALA", "ASP", "SER", "VAL", "GLY", "THR", "ARG", "PHE",
     "TYR", "ILE", "PRO", "ASN", "LYS", "GLN", "HIS", "TRP", "MET", "CYS",
     "A", "U", "G", "C", "DA", "DT", "DG", "DC", "MG", "ZN", "CL", "CA",
     "NA", "MN", "K", "IOD", "CD", "CU", "FE", "NI", "SR", "BR", "CO",
     "HG", "SO4", "NAG", "PO4", "EDO", "ACT", "MAN", "HEM", "FMT", "BMA",
     "ADP", "FAD", "NAD", "NO3", "GLC", "ATP", "NAP", "BGC", "GDP", "FUC",
     "FES", "FMN", "GAL", "GTP", "PLP", "MLI", "ANP", "H4B", "AMP", "NDP",
     "SAH", "OXY", "PLM", "CLR", "CDL", "RET"]
)

DEFAULT_CONFIG = {
    "r_thr": 5.0,
    "max_num_atoms": 1024 * 8,
    "max_num_nn": 64,
    "molecule_ids": MOLECULE_IDS,
}


def contacts_types(s0, M0, s1, M1, ids, molecule_ids):
    """Residue-residue contact-type map Y [nr0, nr1, T, T] and assembly
    fingerprint T (processing/build_dataset.py:41-60), memory-light: Y is
    built sparsely from the deduplicated residue pairs instead of a dense
    4-D tensor."""
    c0 = s0["resname"].reshape(-1, 1) == molecule_ids.reshape(1, -1)
    c1 = s1["resname"].reshape(-1, 1) == molecule_ids.reshape(1, -1)

    rids0 = np.where(M0[ids[:, 0]])[1]
    rids1 = np.where(M1[ids[:, 1]])[1]

    # type index per atom contact (or -1 when resname outside the vocab,
    # matching the reference where such pairs never enter Y)
    t0 = np.where(c0[ids[:, 0]].any(axis=1), c0[ids[:, 0]].argmax(axis=1), -1)
    t1 = np.where(c1[ids[:, 1]].any(axis=1), c1[ids[:, 1]].argmax(axis=1), -1)

    ok = (t0 >= 0) & (t1 >= 0)
    quad = np.stack([rids0[ok], rids1[ok], t0[ok], t1[ok]], axis=1)
    quad = np.unique(quad, axis=0)

    T = np.zeros((molecule_ids.shape[0], molecule_ids.shape[0]), dtype=bool)
    if quad.shape[0] > 0:
        T[quad[:, 2], quad[:, 3]] = True

    shape = (M0.shape[1], M1.shape[1], molecule_ids.shape[0], molecule_ids.shape[0])
    return quad.astype(np.uint16), shape, T


def pack_structure_data(X, qe, qr, qn, M, ids_topk):
    return (
        {
            "X": np.asarray(X, dtype=np.float32),
            "ids_topk": np.asarray(ids_topk, dtype=np.uint16),
            "qe": sparse_onehot_indices(qe),
            "qr": sparse_onehot_indices(qr),
            "qn": sparse_onehot_indices(qn),
            "M": sparse_onehot_indices(M),
        },
        {
            "qe_shape": qe.shape, "qr_shape": qr.shape,
            "qn_shape": qn.shape, "M_shape": M.shape,
        },
    )


def _swap_quad(quad):
    return quad[:, [1, 0, 3, 2]]


def pack_dataset_items(subunits, contacts, molecule_ids, max_num_nn):
    """Per-subunit features/topology + per-pair contact maps
    (processing/build_dataset.py:85-140)."""
    structures_data = {}
    contacts_data = {}
    for cid0 in contacts:
        s0 = subunits[cid0]
        qe0, qr0, qn0 = encode_features(s0)
        X0, M0 = encode_structure(s0)
        ids0_topk, _, _ = extract_topology(X0, max_num_nn)
        structures_data[cid0] = pack_structure_data(X0, qe0, qr0, qn0, M0, ids0_topk)
        contacts_data.setdefault(cid0, {})

        for cid1 in contacts[cid0]:
            contacts_data.setdefault(cid1, {})
            if cid1 in contacts_data[cid0]:
                continue
            s1 = subunits[cid1]
            _, M1 = encode_structure(s1)
            quad, shape, T = contacts_types(
                s0, M0, s1, M1, contacts[cid0][cid1]["ids"], molecule_ids
            )
            if quad.shape[0] > 0:
                contacts_data[cid0][cid1] = (
                    {"Y": quad},
                    {"Y_shape": shape, "ctype": T},
                )
                shape_sw = (shape[1], shape[0], shape[3], shape[2])
                contacts_data[cid1][cid0] = (
                    {"Y": _swap_quad(quad)},
                    {"Y_shape": shape_sw, "ctype": T.T},
                )
    return structures_data, contacts_data


def store_dataset_items(hf, pdbid, bid, structures_data, contacts_data):
    """Write groups + collect metadata (processing/build_dataset.py:143-173)."""
    metadata_l = []
    for cid0 in contacts_data:
        key = f"{pdbid.upper()[1:3]}/{pdbid.upper()}/{bid}/{cid0}"
        hgrp = hf.create_group(f"data/structures/{key}")
        save_data(hgrp, attrs=structures_data[cid0][1], **structures_data[cid0][0])
        for cid1 in contacts_data[cid0]:
            ckey = f"{key}/{cid1}"
            hgrp = hf.create_group(f"data/contacts/{ckey}")
            save_data(hgrp, attrs=contacts_data[cid0][cid1][1], **contacts_data[cid0][cid1][0])
            metadata_l.append(
                {
                    "key": key,
                    "size": (np.max(structures_data[cid0][0]["M"], axis=0) + 1).astype(int),
                    "ckey": ckey,
                    "ctype": contacts_data[cid0][cid1][1]["ctype"],
                }
            )
    return metadata_l


def preprocess_for_build(structure):
    """clean -> tag -> split -> filter (keeps duplicates check) with the
    build pipeline's monomer rejection (processing/build_dataset.py:210-227)."""
    structure = clean_structure(structure)
    structure = tag_hetatm_chains(structure)
    subunits = split_by_chain(structure)
    subunits = filter_non_atomic_subunits(subunits)
    if len(subunits) < 2:
        return None
    return remove_duplicate_tagged_subunits(subunits)


def _process_pdb_for_build(pdb_filepath: str, cfg: dict):
    """Parse + encode one biounit: the parallelizable part of the build.

    Returns (pdbid, bid, structures_data, contacts_data) or None when the
    file is skipped (parse error, too large, no inter-subunit contacts)."""
    from ..io import read_pdb

    # match on the BASENAME: a slash-anchored pattern lost the biounit id
    # for bare relative paths ('1abc.pdb2'), colliding HDF5 keys mid-build
    base = os.path.basename(str(pdb_filepath))
    m = re.match(r"([a-zA-Z0-9]*)\.pdb([0-9]*)(\.gz)?$", base)
    if m:
        pdbid, bid = m[1], (m[2] or "1")
    else:
        pdbid, bid = base.split(".")[0], "1"

    try:
        structure = read_pdb(pdb_filepath)
    except Exception as e:
        print(f"ReadError: {pdb_filepath}: {e}")
        return None
    if structure["xyz"].shape[0] >= cfg["max_num_atoms"]:
        return None
    subunits = preprocess_for_build(structure)
    if subunits is None:
        return None
    contacts = extract_all_contacts(subunits, cfg["r_thr"])
    if len(contacts) == 0:
        return None
    structures_data, contacts_data = pack_dataset_items(
        subunits, contacts, cfg["molecule_ids"], cfg["max_num_nn"]
    )
    return pdbid, bid, structures_data, contacts_data


def _build_worker_init():
    # encode/contact math may use jax; pin workers to the CPU backend so
    # they never open their own device client. The env var alone is NOT
    # sufficient on hosts whose sitecustomize force-registers a TPU PJRT
    # plugin (measured: with the device tunnel wedged, a child honoring
    # only JAX_PLATFORMS=cpu hangs forever at backend init, while the
    # runtime config pin succeeds) — set both.
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _build_worker(task):
    pdb_filepath, cfg = task
    return _process_pdb_for_build(pdb_filepath, cfg)


def build_dataset_h5(
    pdb_filepaths: List[str],
    dataset_filepath: str,
    config: Optional[dict] = None,
    progress: bool = False,
    num_workers: int = 0,
):
    """Build a reference-schema dataset file from biounit PDBs.

    num_workers > 0 parses/encodes in that many spawned worker processes
    (the reference builds with 16 DataLoader workers,
    processing/build_dataset.py:179); the single HDF5 writer stays in this
    process, so item order — and the output file — is identical either way.
    """
    cfg = dict(DEFAULT_CONFIG)
    cfg.update(config or {})

    if num_workers > 0:
        import multiprocessing as mp
        import os

        # spawned children re-run the interpreter (and any sitecustomize
        # TPU-plugin registration) from THIS environment; scrub the device
        # plugin triggers so workers come up CPU-only even when the
        # device/tunnel is unhealthy — the initializer's in-process pin
        # runs too late if plugin registration itself blocks startup
        saved = {
            k: os.environ.get(k)
            for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
        }
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        # the scrub stays active for the POOL'S LIFETIME (restored in the
        # teardown below, not right after Pool()): multiprocessing respawns
        # any worker that dies later, and a replacement spawned with the
        # restored env would hang at plugin registration — exactly the
        # failure the scrub prevents
        env_saved = saved
        pool = mp.get_context("spawn").Pool(
            num_workers, initializer=_build_worker_init
        )
        results = pool.imap(_build_worker, [(p, cfg) for p in pdb_filepaths], chunksize=4)
    else:
        pool = None
        env_saved = {}
        results = (_process_pdb_for_build(p, cfg) for p in pdb_filepaths)

    it = results
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(results, total=len(pdb_filepaths))
        except ImportError:
            pass

    try:
        with h5py.File(dataset_filepath, "w", libver="latest") as hf:
            for key in config_encoding:
                hf[f"metadata/{key}"] = config_encoding[key].astype(np.bytes_)
            hf["metadata/mids"] = cfg["molecule_ids"].astype(np.bytes_)

            metadata_l = []
            for res in it:
                if res is None:
                    continue
                pdbid, bid, structures_data, contacts_data = res
                metadata_l.extend(
                    store_dataset_items(hf, pdbid, bid, structures_data, contacts_data)
                )

            hf["metadata/keys"] = np.array([m["key"] for m in metadata_l]).astype(np.bytes_)
            hf["metadata/sizes"] = np.array([m["size"] for m in metadata_l])
            hf["metadata/ckeys"] = np.array([m["ckey"] for m in metadata_l]).astype(np.bytes_)
            hf["metadata/ctypes"] = np.stack(
                np.where(np.array([m["ctype"] for m in metadata_l])), axis=1
            ).astype(np.uint32)
    finally:
        if pool is not None:
            pool.terminate()
            for k, v in env_saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return len(metadata_l)
