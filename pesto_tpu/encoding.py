"""Vocabularies and feature/structure encoding (host-side numpy).

The vocab tables are part of the model input specification and must match
the reference bit-for-bit (reference src/data_encoding.py:6-45); they define
the one-hot layout of the 30/29/64-dim element/resname/atom-name features
and the 5 interface categories.
"""

import numpy as np

# standard elements, sorted by abundance (29 + "other" -> 30-dim one-hot)
std_elements = np.array([
    "C", "O", "N", "S", "P", "Se", "Mg", "Cl", "Zn", "Fe", "Ca", "Na",
    "F", "Mn", "I", "K", "Br", "Cu", "Cd", "Ni", "Co", "Sr", "Hg", "W",
    "As", "B", "Mo", "Ba", "Pt",
])

# standard residue names: amino acids / RNA / DNA (28 + "other" -> 29-dim)
std_resnames = np.array([
    "LEU", "GLU", "ARG", "LYS", "VAL", "ILE", "PHE", "ASP", "TYR",
    "ALA", "THR", "SER", "GLN", "ASN", "PRO", "GLY", "HIS", "TRP",
    "MET", "CYS", "G", "A", "C", "U", "DG", "DA", "DT", "DC",
])

# standard atom names of standard residues (63 + "other" -> 64-dim)
std_names = np.array([
    "CA", "N", "C", "O", "CB", "CG", "CD2", "CD1", "CG1", "CG2", "CD",
    "OE1", "OE2", "OG", "OG1", "OD1", "OD2", "CE", "NZ", "NE", "CZ",
    "NH2", "NH1", "ND2", "CE2", "CE1", "NE2", "OH", "ND1", "SD", "SG",
    "NE1", "CE3", "CZ3", "CZ2", "CH2", "P", "C3'", "C4'", "O3'", "C5'",
    "O5'", "O4'", "C1'", "C2'", "O2'", "OP1", "OP2", "N9", "N2", "O6",
    "N7", "C8", "N1", "N3", "C2", "C4", "C6", "C5", "N6", "N4", "O2",
    "O4",
])

# interface categories: residue-name groups for the 5 prediction heads
categ_to_resnames = {
    "protein": ["GLU", "LEU", "ALA", "ASP", "SER", "VAL", "GLY", "THR", "ARG",
                "PHE", "TYR", "ILE", "PRO", "ASN", "LYS", "GLN", "HIS", "TRP",
                "MET", "CYS"],
    "rna": ["A", "U", "G", "C"],
    "dna": ["DA", "DT", "DG", "DC"],
    "ion": ["MG", "ZN", "CL", "CA", "NA", "MN", "K", "IOD", "CD", "CU", "FE",
            "NI", "SR", "BR", "CO", "HG"],
    "ligand": ["SO4", "NAG", "PO4", "EDO", "ACT", "MAN", "HEM", "FMT", "BMA",
               "ADP", "FAD", "NAD", "NO3", "GLC", "ATP", "NAP", "BGC", "GDP",
               "FUC", "FES", "FMN", "GAL", "GTP", "PLP", "MLI", "ANP", "H4B",
               "AMP", "NDP", "SAH", "OXY"],
    "lipid": ["PLM", "CLR", "CDL", "RET"],
}
resname_to_categ = {rn: c for c in categ_to_resnames for rn in categ_to_resnames[c]}

elements_enum = np.concatenate([std_elements, ["X"]])
names_enum = np.concatenate([std_names, ["UNK"]])
resnames_enum = np.concatenate([std_resnames, ["UNX"]])

config_encoding = {
    "std_elements": std_elements,
    "std_resnames": std_resnames,
    "std_names": std_names,
}


def onehot(x, v) -> np.ndarray:
    """One-hot against vocab v with a trailing "other" column
    (reference src/data_encoding.py:56-58)."""
    m = np.asarray(x).reshape(-1, 1) == np.asarray(v).reshape(1, -1)
    return np.concatenate([m, ~np.any(m, axis=1).reshape(-1, 1)], axis=1)


def vocab_codes(values, vocab) -> np.ndarray:
    """Vectorized vocabulary lookup: values -> int32 codes with unknowns
    mapped to len(vocab) (the trailing "other" column of `onehot`).
    Replaces the per-atom dict-lookup loop on the serving hot path
    (measured 5 ms -> 0.08 ms per 8k-atom structure)."""
    vocab = np.asarray(vocab)
    values = np.asarray(values)
    order = np.argsort(vocab)
    sv = vocab[order]
    pos = np.clip(np.searchsorted(sv, values), 0, len(sv) - 1)
    return np.where(sv[pos] == values, order[pos], len(vocab)).astype(np.int32)


def encode_structure(structure: dict):
    """Return (X [N,3] float32, M [N, n_res] bool residue-membership mask)
    (reference src/data_encoding.py:61-75, numpy instead of torch)."""
    X = np.asarray(structure["xyz"], dtype=np.float32)
    resids = np.asarray(structure["resid"])
    M = resids.reshape(-1, 1) == np.unique(resids).reshape(1, -1)
    return X, M.astype(np.float32)


def encode_features(structure: dict):
    """Return (qe [N,30], qr [N,29], qn [N,64]) float32 one-hots
    (reference src/data_encoding.py:78-84)."""
    qe = onehot(structure["element"], std_elements).astype(np.float32)
    qr = onehot(structure["resname"], std_resnames).astype(np.float32)
    qn = onehot(structure["name"], std_names).astype(np.float32)
    return qe, qr, qn
