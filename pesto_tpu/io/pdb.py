"""Pure-Python PDB reader/writer.

Produces the same structure record as the reference's GEMMI-based reader
(reference: src/structure_io.py:6-55) without a native dependency:

    {'xyz': float32 [N,3], 'name': str [N], 'element': str [N],
     'resname': str [N], 'resid': int32 [N], 'het_flag': str [N],
     'chain_name': str [N], 'icode': str [N]}

Behavioral contract matched against the reference reader:
  - fixed-column PDB parsing of ATOM/HETATM records,
  - multi-model files: every model is read and chains are renamed
    "{chain}:{model_index}" with a 0-based model index,
  - altloc handling keeps the *first* encountered conformer, keyed by
    (model, chain, resid, icode, atom name). Deliberate divergence from
    the reference: src/structure_io.py:26-31 keeps one GLOBAL altloc
    list, which silently drops every altloc-flagged atom of models >= 2
    in multi-model (NMR ensemble) files; keying per model keeps each
    model complete. Identical on single-model files (all fixtures),
  - het_flag is 'A' for ATOM records and 'H' for HETATM records,
  - the element symbol comes from columns 77-78, falling back to a guess
    from the atom name when the column is blank,
  - gzip-compressed files are read transparently (".gz" suffix).

The writer reproduces the reference's fixed-width line layout
(src/structure_io.py:96-123): per-subunit 1-based atom serials, the
prediction written into both occupancy and B-factor columns, a TER line per
subunit and a final END.
"""

import gzip
import os

import numpy as np

# Two-letter element symbols that can appear in PDB atom names; used only
# when the element column (77-78) is blank.
_TWO_LETTER_ELEMENTS = {
    "BR", "CL", "ZN", "MG", "FE", "CA", "NA", "MN", "CU", "NI", "CO", "SE",
    "CD", "HG", "PT", "PB", "AU", "AG", "SR", "BA", "RB", "CS", "LI", "AL",
    "SI", "AS", "MO", "RU", "RH", "PD", "SN", "SB", "TE", "XE", "GD", "IR",
    "OS", "RE", "TL", "BI",
}


# standard biopolymer + water residues contain only C/H/N/O/S/P — an
# atom named HG there is a serine gamma-hydrogen, never mercury
_STD_BIO_RESNAMES = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "MSE", "SEC", "PYL",
    "DA", "DC", "DG", "DT", "DI", "A", "C", "G", "U", "I",
    "HOH", "DOD",
}

# atom-name prefixes that are overwhelmingly organic positions, not
# metals, unless the residue IS the ion (resname == symbol)
_AMBIGUOUS_TWO_LETTER = {"CA", "CD", "NE", "CE", "NA", "NB", "ND", "HG",
                         "HE", "HD", "CS"}


def _guess_element(name: str, resname: str) -> str:
    """Guess the element from an atom name when columns 77-78 are empty
    (typical of MD outputs). Standard residues use single-letter elements
    only; elsewhere a two-letter metal is accepted when unambiguous or
    when the residue is the ion itself."""
    s = "".join(c for c in name if c.isalpha()).upper()
    if not s:
        return "X"
    res = resname.strip().upper()
    if res in _STD_BIO_RESNAMES:
        return s[0]
    if len(s) >= 2 and s[:2] in _TWO_LETTER_ELEMENTS:
        if res == s[:2] or s[:2] not in _AMBIGUOUS_TWO_LETTER:
            return s[0] + s[1].lower()
    return s[0]


def _normalize_element(raw: str) -> str:
    e = raw.strip()
    if not e:
        return ""
    e = "".join(c for c in e if c.isalpha())
    if not e:
        return ""
    if len(e) == 1:
        return e.upper()
    return e[0].upper() + e[1:].lower()


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def read_pdb(pdb_filepath: str) -> dict:
    """Parse a PDB file into a dict-of-arrays structure record.

    Matches the record produced by the reference reader
    (src/structure_io.py:6-55). Raises ValueError on files with no atoms.
    Uses the native C++ parser (pesto_tpu.native) when available; set
    PESTO_NO_NATIVE=1 to force the pure-Python path.
    """
    if not os.environ.get("PESTO_NO_NATIVE"):
        try:
            from ..native import native_available, read_pdb_native

            if native_available():
                return read_pdb_native(pdb_filepath)
        except ValueError:
            raise
        except Exception:
            pass  # fall through to the Python parser

    return _read_pdb_python(pdb_filepath)


def _read_pdb_python(pdb_filepath: str) -> dict:
    atom_element, atom_name, atom_xyz = [], [], []
    residue_name, seq_id, het_flag, chain_name, icodes = [], [], [], [], []
    bfactors = []

    altloc_seen = set()
    mid = 0
    saw_model_record = False

    with _open_text(pdb_filepath) as fs:
        for line in fs:
            rec = line[0:6]
            if rec == "MODEL ":
                if saw_model_record:
                    mid += 1
                saw_model_record = True
                continue
            if rec not in ("ATOM  ", "HETATM"):
                continue
            if len(line) < 54:
                continue

            name = line[12:16].strip()
            altloc = line[16:17]
            resname = line[17:20].strip()
            chain = line[21:22].strip()
            try:
                resid = int(line[22:26])
            except ValueError:
                continue
            icode = line[26:27].strip()

            if altloc not in (" ", ""):
                # model id is part of the key: each MODEL in an NMR
                # ensemble carries its own copy of every atom, so a
                # model-less key would drop all altloc atoms of models >= 2
                key = f"{mid}_{chain}_{resid}_{icode}_{name}"
                if key in altloc_seen:
                    continue
                altloc_seen.add(key)

            try:
                x = float(line[30:38])
                y = float(line[38:46])
                z = float(line[46:54])
            except ValueError:
                continue
            try:
                bfac = float(line[60:66]) if len(line) >= 66 else 0.0
            except ValueError:
                bfac = 0.0

            element = _normalize_element(line[76:78] if len(line) >= 78 else "")
            if not element:
                element = _guess_element(name, resname)

            atom_name.append(name)
            atom_xyz.append((x, y, z))
            residue_name.append(resname)
            seq_id.append(resid)
            het_flag.append("A" if rec == "ATOM  " else "H")
            chain_name.append(f"{chain}:{mid}")
            icodes.append(icode)
            atom_element.append(element)
            bfactors.append(bfac)

    if not atom_xyz:
        raise ValueError(f"no atoms parsed from {pdb_filepath}")

    return {
        "xyz": np.array(atom_xyz, dtype=np.float32),
        "name": np.array(atom_name),
        "element": np.array(atom_element),
        "resname": np.array(residue_name),
        "resid": np.array(seq_id, dtype=np.int32),
        "het_flag": np.array(het_flag),
        "chain_name": np.array(chain_name),
        "icode": np.array(icodes),
        "bfactor": np.array(bfactors, dtype=np.float32),
    }


def read_traj_pdb(pdb_filepath: str):
    """Parse a multi-model PDB as a trajectory: the first MODEL defines the
    topology (a structure record with chain names "{chain}:0"); returns
    (structure, xyz_frames [T, N, 3]). All models must have equal atom
    counts. Single-model files yield T=1."""
    frames = []
    current = []
    meta = None  # (name, element, resname, resid, het, chain, icode) lists
    cur_meta = [[], [], [], [], [], [], []]
    in_model = False

    altloc_seen = set()

    def flush():
        nonlocal meta, current
        altloc_seen.clear()  # altloc keys are per model
        if current:
            frames.append(np.array(current, dtype=np.float32))
            if meta is None:
                meta = [list(m) for m in cur_meta]
            current = []

    with _open_text(pdb_filepath) as fs:
        for line in fs:
            rec = line[0:6]
            if rec in ("MODEL ",):
                flush()
                in_model = True
                continue
            if rec in ("ENDMDL",):
                flush()
                continue
            if rec not in ("ATOM  ", "HETATM") or len(line) < 54:
                continue
            # altloc dedup like read_pdb (keep the FIRST conformer seen,
            # keyed per model): otherwise topology built from read_pdb of
            # the same file would misalign with the trajectory frames
            if line[16:17] not in (" ", ""):
                akey = (line[21:22], line[22:26], line[12:16])
                if akey in altloc_seen:
                    continue
                altloc_seen.add(akey)
            try:
                x, y, z = float(line[30:38]), float(line[38:46]), float(line[46:54])
                resid = int(line[22:26])
            except ValueError:
                continue
            current.append((x, y, z))
            if meta is None:
                name = line[12:16].strip()
                resname = line[17:20].strip()
                element = _normalize_element(line[76:78] if len(line) >= 78 else "")
                if not element:
                    element = _guess_element(name, resname)
                cur_meta[0].append(name)
                cur_meta[1].append(element)
                cur_meta[2].append(resname)
                cur_meta[3].append(resid)
                cur_meta[4].append("A" if rec == "ATOM  " else "H")
                cur_meta[5].append(f"{line[21:22].strip()}:0")
                cur_meta[6].append(line[26:27].strip())
    flush()

    if not frames:
        raise ValueError(f"no frames parsed from {pdb_filepath}")
    n = frames[0].shape[0]
    bad = [i for i, f in enumerate(frames) if f.shape[0] != n]
    if bad:
        # the docstring's contract — silently dropping mismatched frames
        # let partial/corrupt trajectories pass as shorter ones
        raise ValueError(
            f"{pdb_filepath}: frame(s) {bad[:5]} have atom counts "
            f"{[frames[i].shape[0] for i in bad[:5]]} != frame 0's {n}"
        )
    structure = {
        "xyz": frames[0],
        "name": np.array(meta[0]),
        "element": np.array(meta[1]),
        "resname": np.array(meta[2]),
        "resid": np.array(meta[3], dtype=np.int32),
        "het_flag": np.array(meta[4]),
        "chain_name": np.array(meta[5]),
        "icode": np.array(meta[6]),
    }
    return structure, np.stack(frames)


def _chain_char(cn) -> str:
    """First character of the subunit's chain id for the 1-char PDB chain
    column; blank source chains ("" or ":0" tagged names) map to "A"."""
    c = str(cn).split(":")[0]
    return c[0] if c else "A"


def _format_atom_line(h, serial, name, resname, chain_char, resid, xyz, bf, element):
    # resname is truncated to the fixed 3-char PDB column: 4/5-char CCD
    # codes (mmCIF lipids/glycans) would shift every downstream column
    return "{:<6s}{:>5d} {:<4s} {:>3s} {:1s}{:>4d}    {:8.3f}{:8.3f}{:8.3f}{:6.2f}{:6.2f}          {:<2s}  ".format(
        h, serial, name, str(resname)[:3], chain_char, int(resid),
        float(xyz[0]), float(xyz[1]), float(xyz[2]), float(bf), float(bf), element,
    )


def save_pdb(subunits: dict, filepath: str) -> None:
    """Write subunits to a PDB file (reference layout: src/structure_io.py:96-123).

    The per-atom 'bfactor' field (when present) is written into both the
    occupancy and B-factor columns; atom serials restart at 1 per subunit.
    """
    with open(filepath, "w") as fs:
        for cn in subunits:
            su = subunits[cn]
            n = su["xyz"].shape[0]
            bfs = su.get("bfactor")
            if bfs is not None and len(bfs) != len(su["name"]):
                bfs = None  # stale/mismatched (e.g. hand-edited record)
            for i in range(n):
                h = "ATOM" if su["het_flag"][i] == "A" else "HETATM"
                bf = float(bfs[i]) if bfs is not None else 0.0
                chain_char = _chain_char(cn)
                fs.write(
                    _format_atom_line(
                        h, i + 1, str(su["name"][i]), str(su["resname"][i]),
                        chain_char, su["resid"][i], su["xyz"][i], bf,
                        str(su["element"][i]),
                    )
                    + "\n"
                )
            fs.write("TER\n")
        fs.write("END")


def save_traj_pdb(subunits: dict, filepath: str) -> None:
    """Write a multi-frame trajectory as MODEL/ENDMDL blocks
    (reference layout: src/structure_io.py:126-159)."""
    num_frames = None
    for cn in subunits:
        assert len(subunits[cn]["xyz"].shape) == 3, "no time dimension"
        num_frames = subunits[cn]["xyz"].shape[0]

    with open(filepath, "w") as fs:
        for k in range(num_frames):
            fs.write("MODEL    {:>4d}\n".format(k))
            for cn in subunits:
                su = subunits[cn]
                assert num_frames == su["xyz"].shape[0], "mismatching number of frames"
                n = su["xyz"][k].shape[0]
                bfs = su.get("bfactor")
                if bfs is not None and len(bfs) != n:
                    bfs = None  # stale/mismatched
                for i in range(n):
                    h = "ATOM" if su["het_flag"][i] == "A" else "HETATM"
                    bf = float(bfs[i]) if bfs is not None else 0.0
                    line = "{:<6s}{:>5d} {:<4s} {:>3s} {:1s}{:>4d}    {:8.3f}{:8.3f}{:8.3f}{:6.2f}{:6.2f}          {:<2s}  ".format(
                        h, i + 1, str(su["name"][i]), str(su["resname"][i])[:3],
                        _chain_char(cn), int(su["resid"][i]),
                        float(su["xyz"][k][i][0]), float(su["xyz"][k][i][1]),
                        float(su["xyz"][k][i][2]), 0.0, bf, str(su["element"][i]),
                    )
                    fs.write(line + "\n")
                fs.write("TER\n")
            fs.write("ENDMDL\n")
        fs.write("END")
