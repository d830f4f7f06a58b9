"""Native (C++) host runtime components, loaded via ctypes.

`read_pdb_native(path)` is a drop-in replacement for io.pdb.read_pdb with
identical semantics, compiled on first use (g++ -O2, linked against zlib
for .gz support). Falls back cleanly when no compiler is available.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pdbparse.cpp")
_LIB_PATH = os.path.join(_HERE, "_pdbparse.so")
_lock = threading.Lock()
_lib = None
_build_error = None


def _build() -> str:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-lz", "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library():
    """Compile (once) and load the native parser; returns None when the
    toolchain is unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pdb_parse.restype = ctypes.c_void_p
            lib.pdb_parse.argtypes = [ctypes.c_char_p]
            lib.pdb_natoms.restype = ctypes.c_int
            lib.pdb_natoms.argtypes = [ctypes.c_void_p]
            lib.pdb_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 9
            lib.pdb_free.argtypes = [ctypes.c_void_p]
            lib.pdb_error.restype = ctypes.c_char_p
            _lib = lib
        except Exception as e:  # no compiler / build failure -> fallback
            _build_error = e
            _lib = None
    return _lib


def native_available() -> bool:
    return load_library() is not None


def read_pdb_native(pdb_filepath: str) -> dict:
    """Parse a PDB file with the native parser; raises ValueError on
    failure (same contract as io.pdb.read_pdb)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_error}")

    handle = lib.pdb_parse(str(pdb_filepath).encode())
    if not handle:
        raise ValueError(lib.pdb_error().decode())
    try:
        n = lib.pdb_natoms(handle)
        xyz = np.empty((n, 3), dtype=np.float32)
        resid = np.empty(n, dtype=np.int32)
        name = np.zeros((n, 16), dtype=np.uint8)
        element = np.zeros((n, 4), dtype=np.uint8)
        resname = np.zeros((n, 8), dtype=np.uint8)
        het = np.zeros(n, dtype=np.uint8)
        chain = np.zeros((n, 16), dtype=np.uint8)
        icode = np.zeros((n, 4), dtype=np.uint8)
        bfactor = np.empty(n, dtype=np.float32)
        lib.pdb_fill(
            handle,
            xyz.ctypes.data_as(ctypes.c_void_p),
            resid.ctypes.data_as(ctypes.c_void_p),
            name.ctypes.data_as(ctypes.c_void_p),
            element.ctypes.data_as(ctypes.c_void_p),
            resname.ctypes.data_as(ctypes.c_void_p),
            het.ctypes.data_as(ctypes.c_void_p),
            chain.ctypes.data_as(ctypes.c_void_p),
            icode.ctypes.data_as(ctypes.c_void_p),
            bfactor.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.pdb_free(handle)

    def as_str(buf):
        return buf.view(f"S{buf.shape[1]}")[:, 0].astype("U")

    return {
        "xyz": xyz,
        "name": as_str(name),
        "element": as_str(element),
        "resname": as_str(resname),
        "resid": resid,
        "het_flag": het.view("S1").astype("U"),
        "chain_name": as_str(chain),
        "icode": as_str(icode),
        "bfactor": bfactor,
    }
