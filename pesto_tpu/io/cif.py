"""Minimal chemical-component mmCIF reader (gemmi-free).

Covers the subset the reference uses (src/structure_io.py:58-93): the
`_chem_comp.id` value and `_chem_comp_atom` coordinate/type loops, with a
fallback to ideal coordinates when model coordinates are missing and a
single-atom fallback when no coordinate loop exists.
"""

import shlex

import numpy as np


def _parse_cif_block(text: str):
    """Very small CIF parser: returns (values, loops).

    values: dict tag -> scalar string
    loops:  list of (tags, rows) where rows is a list of token lists.
    """
    values = {}
    loops = []
    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.lower().startswith("loop_"):
            i += 1
            tags = []
            while i < n and lines[i].strip().startswith("_"):
                tags.append(lines[i].strip().split()[0])
                i += 1
            rows = []
            while i < n:
                s = lines[i].strip()
                if not s or s.startswith("#") or s.startswith("_") or s.lower().startswith(("loop_", "data_")):
                    break
                try:
                    toks = shlex.split(s)
                except ValueError:
                    toks = s.split()
                rows.append(toks)
                i += 1
            loops.append((tags, rows))
            continue
        if line.startswith("_"):
            parts = line.split(None, 1)
            tag = parts[0]
            if len(parts) == 2:
                val = parts[1].strip()
                if val.startswith(("'", '"')) and val.endswith(val[0]) and len(val) >= 2:
                    val = val[1:-1]
                values[tag] = val
            elif i + 1 < n and lines[i + 1].strip().startswith(";"):
                # multiline value; take first line after ';'
                j = i + 1
                buf = [lines[j].strip()[1:]]
                j += 1
                while j < n and not lines[j].strip().startswith(";"):
                    buf.append(lines[j])
                    j += 1
                values[tag] = "\n".join(buf).strip()
                i = j
            i += 1
            continue
        i += 1
    return values, loops


def _find_loop_columns(loops, wanted_tags):
    for tags, rows in loops:
        if all(t in tags for t in wanted_tags):
            idx = [tags.index(t) for t in wanted_tags]
            cols = [[r[j] if j < len(r) else "?" for j in idx] for r in rows]
            return [list(c) for c in zip(*cols)] if cols else [[] for _ in wanted_tags]
    return None


def read_molecule_cif(filepath: str):
    """Read a chemical-component CIF; returns (mol, molid) like the
    reference (src/structure_io.py:58-93): mol = {'xyz', 'element'}."""
    with open(filepath) as f:
        text = f.read()
    values, loops = _parse_cif_block(text)

    molid = values.get("_chem_comp.id")
    if molid is None:
        cc = _find_loop_columns(loops, ["_chem_comp.id"])
        if cc and cc[0]:
            molid = cc[0][0]

    coords = _find_loop_columns(
        loops,
        ["_chem_comp_atom.model_Cartn_x", "_chem_comp_atom.model_Cartn_y",
         "_chem_comp_atom.model_Cartn_z"],
    )

    def _floats_ok(cols):
        try:
            np.array(cols, dtype=float)
            return True
        except ValueError:
            return False

    if coords is not None and not _floats_ok(coords):
        ideal = _find_loop_columns(
            loops,
            ["_chem_comp_atom.pdbx_model_Cartn_x_ideal",
             "_chem_comp_atom.pdbx_model_Cartn_y_ideal",
             "_chem_comp_atom.pdbx_model_Cartn_z_ideal"],
        )
        if ideal is not None and _floats_ok(ideal):
            coords = ideal
        else:
            # no usable coordinates anywhere ('?' model values, no ideal
            # loop): take the documented single-atom fallback instead of
            # crashing in np.array(coords, dtype=float) below
            coords = None

    elements = _find_loop_columns(loops, ["_chem_comp_atom.type_symbol"])

    if coords is None or not coords[0]:
        # single-atom case
        sym = values.get("_chem_comp_atom.type_symbol", "X")
        mol = {
            "xyz": np.zeros((1, 3)),
            "element": np.array([sym.lower().title()]),
        }
    else:
        xyz = np.array(coords, dtype=float).T
        mol = {
            "xyz": xyz,
            "element": np.array(elements[0] if elements else ["X"] * xyz.shape[0]),
        }
    return mol, molid
