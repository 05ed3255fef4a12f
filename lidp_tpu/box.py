"""Periodic orthogonal simulation box.

TPU-native replacements for the reference's branchy geometry helpers:
``Domain::closest_image`` (domain.cpp:1220) becomes the vectorized
``delta - L * round(delta / L)`` minimum image, ``Domain::pbc`` (domain.cpp:502)
becomes a floor-based wrap that also updates integer image flags.

Only orthogonal boxes are supported (all bundled reference examples and
benchmarks are orthogonal).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Box:
    lo: jax.Array  # (3,)
    hi: jax.Array  # (3,)

    @property
    def lengths(self) -> jax.Array:
        return self.hi - self.lo

    @property
    def volume(self) -> jax.Array:
        L = self.lengths
        return L[0] * L[1] * L[2]

    @staticmethod
    def create(lo, hi, dtype=None) -> "Box":
        lo = jnp.asarray(lo, dtype=dtype)
        hi = jnp.asarray(hi, dtype=dtype)
        return Box(lo=lo, hi=hi)


def minimum_image(delta: jax.Array, lengths: jax.Array) -> jax.Array:
    """Minimum-image displacement: delta - L*round(delta/L).

    Matches Domain::closest_image (domain.cpp:1220) for orthogonal periodic
    boxes when |delta| < 1.5 L (always true for wrapped coordinates).
    """
    return delta - lengths * jnp.round(delta / lengths)


def wrap(x: jax.Array, box: Box, image: jax.Array):
    """Remap positions into the primary box, accumulating image flags.

    Equivalent to Domain::pbc (domain.cpp:502) for fully periodic orthogonal
    boxes. `image` is an int32 (N,3) array of box-crossing counts.
    """
    L = box.lengths
    shift = jnp.floor((x - box.lo) / L).astype(jnp.int32)
    return x - shift.astype(x.dtype) * L, image + shift


def unwrap(x: jax.Array, box: Box, image: jax.Array) -> jax.Array:
    """Unwrapped (true) coordinates from wrapped positions + image flags.

    Equivalent to Domain::unmap (used by FixRigid, fix_rigid.cpp:824).
    """
    return x + image.astype(x.dtype) * box.lengths
