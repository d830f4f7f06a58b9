"""Filesystem "database" for simulation data: path-template lookup plus
JSON info / .npy data records per entry
(reference md_analysis/data_manager/{data_manager.py,iomanip.py})."""

import glob
import json
import os
import re
from typing import Dict, List, Optional

import numpy as np


class DataManager:
    """Locate dataset entries via a path template with {name} fields,
    e.g. "database/{sid}/{setup}/run_{rep}". Each match becomes a keyed
    entry; per-entry metadata lives in info.json and arrays in .npy files."""

    def __init__(self, root: str, template: str):
        self.root = root
        self.template = template
        self.fields = re.findall(r"{(\w+)}", template)
        self._pattern = re.compile(
            "^" + re.sub(r"{(\w+)}", r"(?P<\1>[^/]+)", re.escape(template).replace(r"\{", "{").replace(r"\}", "}")) + "$"
        )
        self.entries = self._scan()

    def _scan(self) -> Dict[tuple, str]:
        glob_pat = re.sub(r"{\w+}", "*", self.template)
        entries = {}
        for path in sorted(glob.glob(os.path.join(self.root, glob_pat))):
            rel = os.path.relpath(path, self.root)
            m = self._pattern.match(rel)
            if m:
                key = tuple(m.group(f) for f in self.fields)
                entries[key] = path
        return entries

    def keys(self) -> List[tuple]:
        return list(self.entries)

    def path(self, *key) -> str:
        return self.entries[tuple(key)]

    def load_info(self, *key) -> Optional[dict]:
        p = os.path.join(self.path(*key), "info.json")
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return None

    def save_info(self, info: dict, *key) -> None:
        with open(os.path.join(self.path(*key), "info.json"), "w") as f:
            json.dump(info, f, indent=2)

    def load_data(self, name: str, *key) -> Optional[np.ndarray]:
        p = os.path.join(self.path(*key), f"{name}.npy")
        return np.load(p) if os.path.isfile(p) else None

    def save_data(self, name: str, arr: np.ndarray, *key) -> None:
        np.save(os.path.join(self.path(*key), f"{name}.npy"), np.asarray(arr))

    def has_data(self, name: str, *key) -> bool:
        return os.path.isfile(os.path.join(self.path(*key), f"{name}.npy"))
