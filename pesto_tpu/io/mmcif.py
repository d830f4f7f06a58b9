"""mmCIF structure reader: `_atom_site` loop -> structure record.

The reference reads only legacy PDB files plus chemical-component CIFs
(src/structure_io.py); large assemblies distributed solely as mmCIF are
out of its reach. This reader produces the exact record `read_pdb`
produces (xyz/name/element/resname/resid/het_flag/chain_name/icode, with
the same `chain:model` naming and first-altloc-kept convention), so the
whole downstream chain (clean/tag/split/encode/predict) works unchanged.

Streaming line parser — only the `_atom_site` loop is tokenized, so
multi-hundred-thousand-atom assemblies parse in one pass.
"""

import gzip
from typing import Dict

import numpy as np


from .pdb import _open_text  # shared gzip-aware opener


_UNSET = (".", "?", "")


def _pick(row, cols, *tags, default=""):
    for t in tags:
        j = cols.get(t)
        if j is not None and j < len(row) and row[j] not in _UNSET:
            return row[j]
    return default


def _tokenize(s: str):
    """Split one mmCIF data row into values, honoring single/double quotes
    (a quoted value may contain spaces; per the CIF spec the closing quote
    must be followed by whitespace or end-of-line)."""
    if "'" not in s and '"' not in s:
        return s.split()
    toks = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t":
            i += 1
        if i >= n:
            break
        if s[i] in "'\"":
            qc = s[i]
            j = i + 1
            while j < n and not (s[j] == qc and (j + 1 == n or s[j + 1] in " \t")):
                j += 1
            toks.append(s[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in " \t":
                j += 1
            toks.append(s[i:j])
            i = j
    return toks


def read_mmcif(path: str) -> Dict[str, np.ndarray]:
    """Parse an mmCIF (optionally gzipped) into a structure record.

    Uses author fields (auth_asym_id / auth_seq_id / auth_comp_id /
    auth_atom_id) when present — matching what legacy PDB files carry —
    and falls back to label_* otherwise. Multiple models are kept with
    chain names "{chain}:{model_index}" like read_pdb's MODEL handling.
    """
    atom_xyz, atom_name, atom_element = [], [], []
    residue_name, seq_id, het_flag, chain_name, icodes, bfactors = [], [], [], [], [], []
    altloc_seen = set()
    model_ids: Dict[str, int] = {}

    with _open_text(path) as f:
        in_atom_site = False
        tags = []
        cols: Dict[str, int] = {}
        for line in f:
            s = line.strip()
            if not in_atom_site:
                if s.startswith("_atom_site."):
                    tags.append(s.split()[0].split(".", 1)[1])
                elif tags:
                    if not s or s.startswith("#"):
                        # blank/comment between the tag block and the first
                        # data row: not a loop terminator
                        continue
                    if s.startswith("_") or s.lower().startswith(("loop_", "data_")):
                        break  # header ended with no data rows
                    # first non-tag line after the header: the data begins
                    cols = {t: j for j, t in enumerate(tags)}
                    in_atom_site = True
                else:
                    continue
            if in_atom_site:
                if (not s or s.startswith("#") or s.startswith("_")
                        or s.lower().startswith(("loop_", "data_"))):
                    break  # atom_site loop ended
                row = _tokenize(s)
                if len(row) < len(tags):
                    continue

                group = _pick(row, cols, "group_PDB", default="ATOM")
                name = _pick(row, cols, "auth_atom_id", "label_atom_id").strip('"')
                alt = _pick(row, cols, "label_alt_id")
                resname = _pick(row, cols, "auth_comp_id", "label_comp_id")
                chain = _pick(row, cols, "auth_asym_id", "label_asym_id")
                rid = _pick(row, cols, "auth_seq_id", "label_seq_id", default="0")
                icode = _pick(row, cols, "pdbx_PDB_ins_code")
                model = _pick(row, cols, "pdbx_PDB_model_num", default="1")
                try:
                    resid = int(rid)
                    x = float(_pick(row, cols, "Cartn_x", default="nan"))
                    y = float(_pick(row, cols, "Cartn_y", default="nan"))
                    z = float(_pick(row, cols, "Cartn_z", default="nan"))
                except ValueError:
                    continue
                if x != x or y != y or z != z:  # NaN coordinates
                    continue

                if model not in model_ids:
                    model_ids[model] = len(model_ids)
                mid = model_ids[model]

                if alt:
                    # model id in the key: NMR ensembles repeat every atom
                    # per model, so a model-less key would silently drop
                    # all altloc atoms of models >= 2
                    key = (mid, chain, resid, icode, name)
                    if key in altloc_seen:
                        continue
                    altloc_seen.add(key)

                try:
                    bfac = float(_pick(row, cols, "B_iso_or_equiv", default="0"))
                except ValueError:
                    bfac = 0.0

                element = _pick(row, cols, "type_symbol").capitalize()
                bfactors.append(bfac)
                atom_name.append(name)
                atom_xyz.append((x, y, z))
                residue_name.append(resname)
                seq_id.append(resid)
                het_flag.append("A" if group == "ATOM" else "H")
                chain_name.append(f"{chain}:{mid}")
                icodes.append(icode)
                atom_element.append(element)

    if not atom_xyz:
        raise ValueError(f"no atoms parsed from {path}")

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


def read_structure(path: str) -> Dict[str, np.ndarray]:
    """Format-dispatching reader: .cif/.mmcif (opt. .gz) -> read_mmcif,
    everything else -> read_pdb."""
    p = str(path)
    base = p[:-3] if p.endswith(".gz") else p
    if base.endswith((".cif", ".mmcif")):
        return read_mmcif(path)
    from .pdb import read_pdb

    return read_pdb(path)
