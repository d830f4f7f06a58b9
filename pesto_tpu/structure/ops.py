"""Host-side structure-record operations (pure numpy).

These define the semantics of "residue" and "subunit" used everywhere
downstream; behavior is matched to the reference's src/structure.py so that
datasets, labels and predictions are interchangeable:

  - clean_structure     (reference src/structure.py:14-56)
  - tag_hetatm_chains   (:96-110)
  - split_by_chain      (:63-80) / concatenate_chains (:83-93)
  - filter_non_atomic_subunits (:138-146)
  - remove_duplicate_tagged_subunits (:113-135)
  - data_to_structure   (:149-182) / encode_bfactor (:185-223)
"""

import numpy as np

res3to1 = {
    "CYS": "C", "ASP": "D", "SER": "S", "GLN": "Q", "LYS": "K",
    "ILE": "I", "PRO": "P", "THR": "T", "PHE": "F", "ASN": "N",
    "GLY": "G", "HIS": "H", "LEU": "L", "ARG": "R", "TRP": "W",
    "ALA": "A", "VAL": "V", "GLU": "E", "TYR": "Y", "MET": "M",
}
res1to3 = {v: k for k, v in res3to1.items()}


def _change_points(arr) -> np.ndarray:
    """Boolean array: True where arr[i] != arr[i-1] (arr[0] -> False)."""
    a = np.asarray(arr)
    d = np.zeros(a.shape[0], dtype=bool)
    if a.shape[0] > 1:
        d[1:] = a[1:] != a[:-1]
    return d


def clean_structure(structure: dict, rm_wat: bool = True) -> dict:
    """Drop water (HOH/DOD) and hydrogen/deuterium atoms, then renumber
    residues globally: a new residue starts wherever the chain name, the
    insertion code or the author resid changes between consecutive atoms.
    The icode field is consumed. Matches reference src/structure.py:14-56.
    """
    m_wat = structure["resname"] == "HOH"
    m_h = structure["element"] == "H"
    m_d = structure["element"] == "D"
    m_hwat = structure["resname"] == "DOD"

    if rm_wat:
        mask = (~m_wat) & (~m_h) & (~m_d) & (~m_hwat)
    else:
        mask = (~m_h) & (~m_d) & (~m_hwat)
        structure["resid"][m_wat] = -999

    structure = {key: structure[key][mask] for key in structure}

    changed = (
        _change_points(structure["chain_name"])
        | _change_points(structure["icode"])
        | _change_points(structure["resid"])
    )
    structure["resid"] = np.cumsum(changed.astype(np.int64)) + 1
    structure.pop("icode")
    return structure


def atom_select(structure: dict, sel) -> dict:
    return {key: structure[key][sel] for key in structure}


def split_by_chain(structure: dict) -> dict:
    """Split into per-chain subunits keyed by chain name (sorted unique
    order, matching np.unique in the reference)."""
    chains = {}
    cnames = structure["chain_name"]
    for cname in np.unique(cnames):
        chain = atom_select(structure, cnames == cname)
        chain.pop("chain_name")
        chains[str(cname)] = chain
    return chains


def concatenate_chains(chains: dict) -> dict:
    keys = set.intersection(*[set(chains[cid]) for cid in chains])
    structure = {key: np.concatenate([chains[cid][key] for cid in chains]) for key in keys}
    structure["chain_name"] = np.concatenate(
        [np.full(chains[cid]["xyz"].shape[0], cid, dtype="U32") for cid in chains]
    )
    return structure


def tag_hetatm_chains(structure: dict) -> dict:
    """Give each contiguous HETATM residue its own pseudo-chain name
    "{chain}:{k}" (reference src/structure.py:96-110)."""
    m_hetatm = structure["het_flag"] == "H"
    resids_hetatm = structure["resid"][m_hetatm]

    if resids_hetatm.shape[0] > 0:
        delta = np.cumsum(_change_points(resids_hetatm).astype(np.int64))
    else:
        delta = np.zeros(0, dtype=np.int64)

    cids = structure["chain_name"].astype("U32").copy()
    tagged = np.array(
        [f"{cid}:{hid}" for cid, hid in zip(cids[m_hetatm], delta)], dtype="U32"
    )
    if tagged.shape[0] > 0:
        cids[m_hetatm] = tagged
    structure["chain_name"] = cids
    return structure


def remove_duplicate_tagged_subunits(subunits: dict) -> dict:
    """Drop tagged (hetero) subunits that duplicate another tagged subunit
    of identical size within 0.2 Å (reference src/structure.py:113-135)."""
    tagged_cids = [cid for cid in subunits if len(cid.split(":")) == 3]
    for i in range(len(tagged_cids)):
        cid_i = tagged_cids[i]
        for j in range(i + 1, len(tagged_cids)):
            cid_j = tagged_cids[j]
            if (cid_i in subunits) and (cid_j in subunits):
                xyz0 = subunits[cid_i]["xyz"]
                xyz1 = subunits[cid_j]["xyz"]
                if xyz0.shape[0] == xyz1.shape[0]:
                    d_min = np.min(np.linalg.norm(xyz0 - xyz1, axis=1))
                    if d_min < 0.2:
                        subunits.pop(cid_j)
    return subunits


def filter_non_atomic_subunits(subunits: dict) -> dict:
    """Remove subunits where every residue is a single atom (e.g. grouped
    ions), keeping true single-atom subunits (reference :138-146)."""
    for sname in list(subunits):
        n_res = np.unique(subunits[sname]["resid"]).shape[0]
        n_atm = subunits[sname]["xyz"].shape[0]
        if (n_atm == n_res) and (n_atm > 1):
            subunits.pop(sname)
    return subunits


def preprocess_structure(structure: dict) -> dict:
    """The full reference preprocessing chain (src/dataset.py:138-152):
    clean -> tag hetatm -> split -> filter non-atomic -> dedup tagged."""
    structure = clean_structure(structure)
    structure = tag_hetatm_chains(structure)
    subunits = split_by_chain(structure)
    subunits = filter_non_atomic_subunits(subunits)
    subunits = remove_duplicate_tagged_subunits(subunits)
    return subunits


def data_to_structure(X, q, M, std_elements, std_resnames, std_names) -> dict:
    """Invert one-hot features back into a structure record
    (reference src/structure.py:149-182)."""
    ne, nr = len(std_elements), len(std_resnames)

    resnames_enum = np.concatenate([std_resnames, ["UNX"]])
    q_resnames = q[:, ne + 1 : ne + nr + 2]
    resnames = resnames_enum[np.where(q_resnames)[1]]

    ids0, ids1 = np.where(M > 0.5)
    resids = np.zeros(M.shape[0], dtype=np.int64)
    resids[ids0] = ids1 + 1

    q_names = q[:, ne + nr + 2 :]
    names_enum = np.concatenate([std_names, ["UNK"]])
    names = names_enum[np.where(q_names)[1]]

    q_elements = q[:, : ne + 1]
    elements_enum = np.concatenate([std_elements, ["X"]])
    elements = elements_enum[np.where(q_elements)[1]]

    het_flags = np.full(len(resnames), "A")
    het_flags[resnames == "ZZZ"] = "H"

    return {
        "xyz": X,
        "name": names,
        "element": elements,
        "resname": resnames,
        "resid": resids,
        "het_flag": het_flags,
    }


def encode_bfactor(structure: dict, p) -> dict:
    """Write prediction p into structure['bfactor'], broadcasting per-residue
    or per-C-alpha values to all atoms of the residue via the residue max
    (reference src/structure.py:185-223)."""
    p = np.asarray(p)
    names = structure["name"]
    elements = structure["element"]
    het_flags = structure["het_flag"]
    m_ca = (names == "CA") & (elements == "C") & (het_flags == "A")
    resids = structure["resid"]

    # vectorized residue broadcast (the per-residue Python loops were
    # O(n_res * n_atoms) — minutes of host time at the 131k-atom buckets)
    uresids, inv = np.unique(resids, return_inverse=True)
    if p.shape[0] == m_ca.shape[0]:
        structure["bfactor"] = p.astype(np.float32)
    elif p.shape[0] == int(np.sum(m_ca)):
        # residue-wise max over that residue's CA values; residues with
        # no CA stay 0 (same as the loop form)
        bf_res = np.full(len(uresids), -np.inf, dtype=np.float32)
        np.maximum.at(bf_res, inv[m_ca], p.astype(np.float32))
        bf_res[~np.isfinite(bf_res)] = 0.0
        structure["bfactor"] = bf_res[inv]
    elif p.shape[0] == uresids.shape[0]:
        structure["bfactor"] = p.astype(np.float32)[inv]
    else:
        print("WARNING: bfactor not saved")
    return structure
