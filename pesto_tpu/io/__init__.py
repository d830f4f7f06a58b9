from .pdb import read_pdb, read_traj_pdb, save_pdb, save_traj_pdb
from .cif import read_molecule_cif
from .mmcif import read_mmcif, read_structure

__all__ = [
    "read_pdb", "read_traj_pdb", "save_pdb", "save_traj_pdb",
    "read_molecule_cif", "read_mmcif", "read_structure",
]
