import numpy as np

from pesto_tpu.encoding import (
    categ_to_resnames,
    encode_features,
    encode_structure,
    onehot,
    std_elements,
    std_names,
    std_resnames,
)
from pesto_tpu.io import read_pdb
from pesto_tpu.structure import clean_structure


def test_vocab_sizes():
    assert std_elements.shape[0] == 29
    assert std_resnames.shape[0] == 28
    assert std_names.shape[0] == 63
    assert len(categ_to_resnames) == 6


def test_onehot_other_column():
    q = onehot(np.array(["C", "Xx", "O"]), std_elements)
    assert q.shape == (3, 30)
    assert q[0, 0] and not q[0, -1]
    assert q[1, -1]  # unknown -> other
    assert q[2, 1]
    assert np.all(q.sum(axis=1) == 1)


def test_encode_structure_and_features(example_pdb):
    s = clean_structure(read_pdb(example_pdb))
    X, M = encode_structure(s)
    qe, qr, qn = encode_features(s)
    n = s["xyz"].shape[0]
    assert X.shape == (n, 3)
    assert M.shape == (n, np.unique(s["resid"]).shape[0])
    assert np.all(M.sum(axis=1) == 1)  # each atom in exactly one residue
    assert qe.shape == (n, 30) and qr.shape == (n, 29) and qn.shape == (n, 64)
    assert np.all(qe.sum(axis=1) == 1)
