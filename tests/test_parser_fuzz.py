"""Bounded mutation fuzz of the structure readers.

Contract under fuzz: for ANY byte-level corruption of a valid input the
readers either (a) return a well-formed structure record (consistent
array lengths, finite or parseable-NaN coordinates never crash
downstream length invariants) or (b) raise ValueError/OSError — never
IndexError/KeyError/TypeError/UnboundLocalError or a segfault from the
native parser. Both the Python and native C++ PDB paths are fuzzed with
the same corpus seed, and mmCIF with its own."""

import gzip
import os
import random
import tempfile

import numpy as np
import pytest

from pesto_tpu.io import read_pdb
from pesto_tpu.io.mmcif import read_mmcif

PDB = "/root/reference/examples/dna_rna/1H9D.pdb"
N_TRIALS = 60

_ALLOWED = (ValueError, OSError, EOFError)


def _mutate(data: bytes, rng: random.Random) -> bytes:
    b = bytearray(data)
    op = rng.randrange(6)
    if op == 0 and b:  # flip random bytes
        for _ in range(rng.randint(1, 40)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    elif op == 1 and b:  # truncate
        del b[rng.randrange(len(b)) :]
    elif op == 2 and b:  # delete a span
        i = rng.randrange(len(b))
        del b[i : i + rng.randint(1, 400)]
    elif op == 3:  # duplicate a span
        i = rng.randrange(max(len(b), 1))
        b[i:i] = b[i : i + rng.randint(1, 400)]
    elif op == 4:  # shuffle lines
        lines = bytes(b).split(b"\n")
        rng.shuffle(lines)
        b = bytearray(b"\n".join(lines))
    else:  # inject garbage lines
        junk = bytes(rng.randrange(32, 127) for _ in range(rng.randint(1, 120)))
        lines = bytes(b).split(b"\n")
        for _ in range(rng.randint(1, 10)):
            lines.insert(rng.randrange(len(lines) + 1), junk)
        b = bytearray(b"\n".join(lines))
    return bytes(b)


def _check_record(s):
    """Whatever parses must be internally consistent."""
    n = s["xyz"].shape[0]
    assert s["xyz"].shape == (n, 3)
    for key in ("name", "element", "resname", "resid", "het_flag", "chain_name"):
        assert len(s[key]) == n, key
    assert np.isfinite(s["xyz"]).all() or n == 0


def _fuzz_reader(reader, seed_bytes, suffix, env=None):
    rng = random.Random(20260818)
    old = {}
    if env:
        for k, v in env.items():
            old[k] = os.environ.get(k)
            os.environ[k] = v
    try:
        crashes = []
        for trial in range(N_TRIALS):
            data = _mutate(seed_bytes, rng)
            if trial % 7 == 0:  # also exercise the gzip path
                data = gzip.compress(data)
                path_suffix = suffix + ".gz"
            else:
                path_suffix = suffix
            fd, path = tempfile.mkstemp(suffix=path_suffix)
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            try:
                s = reader(path)
                _check_record(s)
            except _ALLOWED:
                pass
            except Exception as e:  # noqa: BLE001 — the fuzz contract
                crashes.append((trial, type(e).__name__, str(e)[:120]))
            finally:
                os.unlink(path)
        assert not crashes, crashes
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_fuzz_pdb_python_reader():
    _fuzz_reader(read_pdb, open(PDB, "rb").read(), ".pdb",
                 env={"PESTO_NO_NATIVE": "1"})


def test_fuzz_pdb_native_reader():
    from pesto_tpu.native import native_available

    if not native_available():
        pytest.skip("native parser not built")
    _fuzz_reader(read_pdb, open(PDB, "rb").read(), ".pdb")


def test_fuzz_mmcif_reader():
    # synthesize a small valid mmCIF from the repo's writer-less corpus:
    # use a minimal hand-rolled atom_site loop as the seed
    seed = b"""data_test
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.auth_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.pdbx_PDB_model_num
ATOM 1 N N . ALA A 1 ? 1.000 2.000 3.000 1.00 10.0 1
ATOM 2 C CA . ALA A 1 ? 2.000 3.000 4.000 1.00 10.0 1
ATOM 3 C C . ALA A 1 ? 3.000 4.000 5.000 1.00 10.0 1
ATOM 4 O O . ALA A 1 ? 4.000 5.000 6.000 1.00 10.0 1
HETATM 5 ZN ZN . ZN B 2 ? 5.000 6.000 7.000 1.00 20.0 1
"""
    _fuzz_reader(read_mmcif, seed, ".cif")
