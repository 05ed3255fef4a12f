"""Native (C++) runtime support with transparent Python fallback.

Builds liblidp_native.so on first import if a compiler is available (the
reference's runtime is C++; these cover the host-side paths that are hot at
100k+ atoms: data parsing, special-list BFS, sequential RNG streams).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lidp_native.cpp")
_SO = os.path.join(_DIR, "liblidp_native.so")

_lib = None


def _build() -> bool:
    for cc in ("c++", "g++", "cc"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _lib = False
                return None
        lib = ctypes.CDLL(_SO)
        lib.build_special_lists.restype = ctypes.c_int
        lib.parse_atoms_full.restype = ctypes.c_int
        lib.velocity_stream.restype = None
        lib.format_dump_rows.restype = ctypes.c_long
        _lib = lib
        return lib
    except OSError:
        _lib = False
        return None


def special_lists(natoms: int, bonds: np.ndarray, pad_to_multiple: int = 8):
    """Native special-list builder; returns (idx, lvl) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    bonds = np.ascontiguousarray(bonds, np.int64)
    scap = 16
    while True:
        idx = np.full((natoms, scap), natoms, np.int32)
        lvl = np.zeros((natoms, scap), np.int8)
        maxs = lib.build_special_lists(
            natoms, len(bonds), bonds.ctypes.data_as(ctypes.c_void_p),
            scap, idx.ctypes.data_as(ctypes.c_void_p),
            lvl.ctypes.data_as(ctypes.c_void_p))
        if maxs < 0:
            return None
        if maxs <= scap:
            S = -(-max(maxs, 1) // pad_to_multiple) * pad_to_multiple
            return idx[:, :S].copy(), lvl[:, :S].copy()
        scap = -(-maxs // pad_to_multiple) * pad_to_multiple


def parse_atoms_full(section_text: str, natoms: int):
    """Native Atoms-section parser (atom_style full). Returns dict or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = section_text.encode()
    x = np.zeros((natoms, 3))
    q = np.zeros(natoms)
    typ = np.zeros(natoms, np.int32)
    mol = np.zeros(natoms, np.int32)
    image = np.zeros((natoms, 3), np.int32)
    cnt = lib.parse_atoms_full(
        buf, ctypes.c_int64(len(buf)), natoms,
        x.ctypes.data_as(ctypes.c_void_p), q.ctypes.data_as(ctypes.c_void_p),
        typ.ctypes.data_as(ctypes.c_void_p), mol.ctypes.data_as(ctypes.c_void_p),
        image.ctypes.data_as(ctypes.c_void_p))
    if cnt != natoms:
        return None
    return dict(x=x, q=q, type=typ, mol=mol, image=image)


def velocity_stream(seed: int, natoms: int, dist: str):
    """Native sequential RanPark stream (velocity create loop all)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((natoms, 3))
    lib.velocity_stream(int(seed), natoms, 0 if dist == "uniform" else 1,
                        out.ctypes.data_as(ctypes.c_void_p))
    return out


def format_dump_rows(vals: np.ndarray, is_int) -> bytes | None:
    """Native text formatting of an (nrows, ncols) dump block; None on
    fallback.  Matches the Python writer's %d/%g per-column formats."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    flags = np.ascontiguousarray(is_int, np.uint8)
    nrows, ncols = vals.shape
    cap = nrows * ncols * 28 + 16
    out = ctypes.create_string_buffer(cap)
    w = lib.format_dump_rows(
        ctypes.c_long(nrows), ctypes.c_int(ncols),
        vals.ctypes.data_as(ctypes.c_void_p),
        flags.ctypes.data_as(ctypes.c_void_p), out, ctypes.c_long(cap))
    if w < 0:
        return None
    return out.raw[:w]
