from .pdb import read_pdb, read_traj_pdb, save_pdb, save_traj_pdb
from .cif import read_molecule_cif

__all__ = ["read_pdb", "read_traj_pdb", "save_pdb", "save_traj_pdb", "read_molecule_cif"]
