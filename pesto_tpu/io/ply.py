"""ASCII PLY surface-mesh reader (MaSIF-site benchmark meshes).

The reference consumes these via the heavyweight pymesh dependency
(masif_sppider_Intpred_comp.ipynb cell 1); here a small self-contained
parser covers the subset the benchmark uses: ascii format, one vertex
element with named float properties (x/y/z/charge/hbond/hphob/iface/
nx/ny/nz in the MaSIF ground-truth files) and one face element with a
vertex_indices list property.
"""

from typing import Dict

import numpy as np


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Parse an ascii PLY file.

    Returns {"vertices": [V,3] float32, "faces": [F,3] int32, and one
    [V] float32 array per named vertex property (charge, iface, ...)}."""
    with open(path, "r") as f:
        line = f.readline().strip()
        if line != "ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [prop names]) in file order
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            parts = line.strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if not elements:
                    raise ValueError(f"{path}: property before element")
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[-1]))
                else:
                    elements[-1][2].append((parts[1], parts[-1]))
            elif parts[0] == "end_header":
                break
        if fmt != "ascii":
            raise ValueError(f"{path}: only ascii PLY is supported (got {fmt})")

        out: Dict[str, np.ndarray] = {}
        for name, count, props in elements:
            if name == "vertex":
                rows = np.loadtxt(f, dtype=np.float32, max_rows=count, ndmin=2)
                if rows.shape != (count, len(props)):
                    raise ValueError(
                        f"{path}: vertex block is {rows.shape}, "
                        f"expected ({count}, {len(props)})"
                    )
                cols = {p[1]: rows[:, i] for i, p in enumerate(props)}
                out["vertices"] = np.stack(
                    [cols.pop("x"), cols.pop("y"), cols.pop("z")], axis=1
                )
                out.update(cols)
            elif name == "face":
                faces = []
                for _ in range(count):
                    vals = f.readline().split()
                    n = int(vals[0])
                    faces.append([int(v) for v in vals[1 : 1 + n]])
                if faces and all(len(x) == 3 for x in faces):
                    out["faces"] = np.asarray(faces, dtype=np.int32)
                else:  # ragged polygon soup: keep as object array
                    out["faces"] = np.asarray(faces, dtype=object)
            else:  # skip unknown elements line by line
                for _ in range(count):
                    f.readline()
    return out


def vertex_areas(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Per-vertex surface area: 1/3 of each adjacent triangle's area
    (the standard barycentric lumping the reference notebook uses for the
    SPPIDER interface-area criterion)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    a = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    b = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    tri = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    out = np.zeros(vertices.shape[0])
    for c in range(3):
        np.add.at(out, faces[:, c], tri / 3.0)
    return out.astype(np.float32)
