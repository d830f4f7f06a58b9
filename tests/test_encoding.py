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


def test_vocab_codes_matches_onehot_argmax():
    """vocab_codes (vectorized searchsorted lookup) must agree with the
    reference-semantics onehot for every vocab, including unknowns."""
    from pesto_tpu.encoding import (
        onehot,
        std_elements,
        std_names,
        std_resnames,
        vocab_codes,
    )

    rng = np.random.RandomState(0)
    for vocab in (std_elements, std_resnames, std_names):
        pool = list(vocab) + ["ZZ9", "", "X!"]
        vals = np.array([pool[i] for i in rng.randint(0, len(pool), 500)])
        codes = vocab_codes(vals, vocab)
        want = np.argmax(onehot(vals, vocab), axis=1)
        np.testing.assert_array_equal(codes, want)
