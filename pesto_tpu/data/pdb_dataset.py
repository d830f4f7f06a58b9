"""Indexable dataset over PDB file paths (reference StructuresDataset,
src/dataset.py:115-156): parse + optionally run the full preprocessing
chain; parse errors yield (None, path) so batch pipelines can skip them.
Framework-free (no torch DataLoader); combine with any prefetcher."""

from typing import List, Optional, Tuple


class PDBFolderDataset:
    def __init__(self, pdb_filepaths: List[str], with_preprocessing: bool = True):
        self.pdb_filepaths = list(pdb_filepaths)
        self.with_preprocessing = with_preprocessing

    def __len__(self):
        return len(self.pdb_filepaths)

    def __getitem__(self, i: int) -> Tuple[Optional[dict], str]:
        from ..io import read_pdb
        from ..structure import preprocess_structure

        path = self.pdb_filepaths[i]
        try:
            structure = read_pdb(path)
        except Exception as e:
            print(f"ReadError: {path}: {e}")
            return None, path
        if self.with_preprocessing:
            return preprocess_structure(structure), path
        return structure, path
