"""Lattices and atom creation (`lattice` + `create_atoms` commands).

Reproduces the reference semantics needed by bench/in.lj: ``lattice fcc RHO``
in lj units sets the spacing from the reduced density
(a = (nbasis/rho)^(1/3), lattice.cpp) and ``create_atoms ... box`` fills the
region with basis atoms.
"""

from __future__ import annotations

import numpy as np

_BASES = {
    "fcc": np.array(
        [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]
    ),
    "bcc": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    "sc": np.array([[0.0, 0.0, 0.0]]),
    # 2d styles (lattice.cpp: sq, sq2)
    "sq": np.array([[0.0, 0.0, 0.0]]),
    "sq2": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]]),
}


def lattice_spacing(style: str, scale: float, units: str = "lj",
                    dim: int = 3) -> float:
    basis = _BASES[style]
    if units == "lj":
        # scale = reduced density rho*; a^dim * rho = nbasis (lattice.cpp)
        return (len(basis) / scale) ** (1.0 / dim)
    # non-lj units: scale IS the lattice constant
    return float(scale)


def create_atoms_box(style: str, spacing: float, nx: int, ny: int, nz: int):
    """Fill an (nx, ny, nz)-cell orthogonal box with lattice-basis atoms.

    Returns (positions (N,3) float64, box_hi (3,)). Box lo is the origin.
    Iteration order is (k, j, i, basis) like create_atoms, though downstream
    consumers here do not depend on atom order (velocities are geometry-seeded).
    For 2d lattices pass nz=1; basis z components are all 0.
    """
    basis = _BASES[style]
    k, j, i = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    cells = np.stack([i, j, k], axis=-1).reshape(-1, 1, 3).astype(np.float64)
    pts = (cells + basis[None, None, :, :].reshape(1, len(basis), 3)).reshape(-1, 3)
    pts = pts * spacing
    hi = np.array([nx, ny, nz], np.float64) * spacing
    return pts, hi
