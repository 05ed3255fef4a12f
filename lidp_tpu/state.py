"""System state: a fixed-capacity structure-of-arrays pytree.

The TPU analog of the reference's AoS per-atom arrays on class Atom
(atom.cpp:189-325, MOLECULE/atom_vec_full.cpp): static shapes (padding instead
of realloc) so every step jit-compiles once; all per-atom data lives in device
arrays that shard cleanly over an atom axis.

Per-atom polarization attributes (``alpha`` = static_polarizability,
``mu`` = induced dipoles) are first-class fields — fixing reference defect §0.1
(SURVEY.md): the fork declares them (atom.h:161-162) but never allocates them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import Box


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class System:
    """All per-atom dynamic state plus the box. Everything is a jax array.

    Shapes use capacity ``N`` (== natoms for now; padded atoms have
    ``mask == False`` and zero mass weight in every reduction).
    """

    x: jax.Array       # (N,3) wrapped positions
    v: jax.Array       # (N,3) velocities
    q: jax.Array       # (N,)  charges
    type: jax.Array    # (N,)  int32, 1-based like LAMMPS (0 = padding)
    mol: jax.Array     # (N,)  int32 molecule ids (0 = no molecule)
    alpha: jax.Array   # (N,)  static polarizability (A^3)
    mu: jax.Array      # (N,3) induced dipoles, sqrt(energy*length^3) units
    image: jax.Array   # (N,3) int32 image flags
    mask: jax.Array    # (N,)  bool, True for real atoms
    box: Box
    step: jax.Array    # () int32

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def replace(self, **kw) -> "System":
        return dataclasses.replace(self, **kw)


def make_system(
    x,
    *,
    box: Box,
    v=None,
    q=None,
    type=None,
    mol=None,
    alpha=None,
    image=None,
    mask=None,
    dtype=None,
) -> System:
    x = jnp.asarray(x, dtype=dtype)
    n = x.shape[0]
    dtype = x.dtype

    def arr(a, shape, d=dtype):
        if a is None:
            return jnp.zeros(shape, d)
        return jnp.asarray(a, d).reshape(shape)

    return System(
        x=x,
        v=arr(v, (n, 3)),
        q=arr(q, (n,)),
        type=arr(type if type is not None else np.ones(n), (n,), jnp.int32),
        mol=arr(mol, (n,), jnp.int32),
        alpha=arr(alpha, (n,)),
        mu=jnp.zeros((n, 3), dtype),
        image=arr(image, (n, 3), jnp.int32),
        mask=(jnp.ones((n,), bool) if mask is None
              else jnp.asarray(mask, bool).reshape((n,))),
        box=Box.create(box.lo, box.hi, dtype=dtype, periodic=box.periodic,
                       tilt=box.tilt, force_triclinic=box.triclinic),
        step=jnp.zeros((), jnp.int32),
    )


@dataclasses.dataclass(frozen=True)
class Topology:
    """Static (host-side) per-system metadata that never changes during a run.

    ``special`` encodes the 1-2/1-3/1-4 exclusion lists built from bonds
    (the reference's Special::build, special.cpp:55) as a padded (N, S) int32
    array of 0-based neighbor indices with parallel (N, S) int8 level codes
    (1/2/3); unused slots hold -1.
    """

    natoms: int
    ntypes: int
    mass: np.ndarray                 # (ntypes+1,) per-type mass, index 0 unused
    special_idx: Optional[np.ndarray] = None   # (N, S) int32
    special_level: Optional[np.ndarray] = None  # (N, S) int8
    tags: Optional[np.ndarray] = None           # (N,) original LAMMPS atom ids
