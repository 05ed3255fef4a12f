"""Orthogonal simulation box with per-dimension boundary styles.

TPU-native replacements for the reference's branchy geometry helpers:
``Domain::closest_image`` (domain.cpp:1220) becomes the vectorized
``delta - L * round(delta / L)`` minimum image, ``Domain::pbc`` (domain.cpp:502)
becomes a floor-based wrap that also updates integer image flags, and
shrink-wrapped boundaries (``Domain::reset_box``, domain.cpp:358) become a
masked min/max reduction over atom coordinates.

Non-periodic dimensions are encoded as an *effective image length* of 1e30
(``img_lengths``): ``round(delta/1e30) == 0`` so the minimum image is the
identity there, and roll-stencil cell pairs that wrap across an open boundary
self-reject through the cutoff test (their raw separation is ~L >= 3 cutoffs).
Finite 1e30 rather than inf: inf * 0 would produce NaNs in masked lanes.

Triclinic boxes carry tilt factors (xy, xz, yz); minimum image and wrap then
work in lamda space via the upper-triangular cell matrix h (Domain::lamda2x /
x2lamda).  The bundled reference examples are all orthogonal; triclinic runs
use the dense pair path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_BIG = 1.0e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Box:
    lo: jax.Array  # (3,)
    hi: jax.Array  # (3,)
    # static per-dim periodicity ('p' boundaries); non-periodic dims skip
    # minimum-image folding and position wrapping
    periodic: tuple = dataclasses.field(
        metadata=dict(static=True), default=(True, True, True))
    # triclinic tilt factors (xy, xz, yz); the cell matrix is the
    # upper-triangular  h = [[lx,xy,xz],[0,ly,yz],[0,0,lz]]  with
    # x = lo + h @ lamda (Domain::lamda2x, domain.cpp)
    tilt: jax.Array = None
    triclinic: bool = dataclasses.field(
        metadata=dict(static=True), default=False)

    @property
    def lengths(self) -> jax.Array:
        return self.hi - self.lo

    @property
    def img_lengths(self) -> jax.Array:
        """Effective lengths for minimum-image math: L on periodic dims,
        1e30 (=> identity fold) on non-periodic dims."""
        if all(self.periodic):
            return self.lengths
        pm = jnp.asarray(self.periodic)
        return jnp.where(pm, self.hi - self.lo, _BIG)

    @property
    def volume(self) -> jax.Array:
        L = self.lengths
        return L[0] * L[1] * L[2]

    @property
    def h(self) -> jax.Array:
        """(3,3) upper-triangular cell matrix."""
        L = self.lengths
        z = jnp.zeros((), L.dtype)
        t = (self.tilt if self.tilt is not None
             else jnp.zeros(3, L.dtype))
        return jnp.stack([
            jnp.stack([L[0], t[0], t[1]]),
            jnp.stack([z, L[1], t[2]]),
            jnp.stack([z, z, L[2]])])

    @property
    def h_inv(self) -> jax.Array:
        L = self.lengths
        t = (self.tilt if self.tilt is not None
             else jnp.zeros(3, L.dtype))
        z = jnp.zeros((), L.dtype)
        # closed-form inverse of the upper-triangular h (domain.cpp h_inv)
        return jnp.stack([
            jnp.stack([1.0 / L[0], -t[0] / (L[0] * L[1]),
                       (t[0] * t[2] - L[1] * t[1])
                       / (L[0] * L[1] * L[2])]),
            jnp.stack([z, 1.0 / L[1], -t[2] / (L[1] * L[2])]),
            jnp.stack([z, z, 1.0 / L[2]])])

    @staticmethod
    def create(lo, hi, dtype=None, periodic=(True, True, True),
               tilt=None, force_triclinic=False) -> "Box":
        lo = jnp.asarray(lo, dtype=dtype)
        hi = jnp.asarray(hi, dtype=dtype)
        tri = force_triclinic or (
            tilt is not None and any(float(v) != 0.0 for v in tilt))
        t = (jnp.asarray(tilt, lo.dtype) if tilt is not None
             else jnp.zeros(3, lo.dtype)) if tri else None
        return Box(lo=lo, hi=hi,
                   periodic=tuple(bool(p) for p in periodic),
                   tilt=t, triclinic=tri)


def min_image_box(delta: jax.Array, box: Box) -> jax.Array:
    """Box-aware minimum image: per-dim fold for orthogonal boxes,
    lamda-space fold  delta - h @ round(h_inv @ delta)  for triclinic
    (Domain::minimum_image for triclinic, domain.cpp:1183).  Non-periodic
    dims are left unfolded either way."""
    if not box.triclinic:
        return minimum_image(delta, box.img_lengths)
    lam = delta @ box.h_inv.T
    if not all(box.periodic):
        pm = jnp.asarray(box.periodic)
        lam_r = jnp.where(pm, jnp.round(lam), 0.0)
    else:
        lam_r = jnp.round(lam)
    return delta - lam_r @ box.h.T


def minimum_image(delta: jax.Array, lengths: jax.Array) -> jax.Array:
    """Minimum-image displacement: delta - L*round(delta/L).

    Matches Domain::closest_image (domain.cpp:1220) for orthogonal periodic
    boxes when |delta| < 1.5 L (always true for wrapped coordinates).
    Pass ``box.img_lengths`` so non-periodic dims are left unfolded.
    """
    return delta - lengths * jnp.round(delta / lengths)


def wrap(x: jax.Array, box: Box, image: jax.Array):
    """Remap positions into the primary box, accumulating image flags.

    Equivalent to Domain::pbc (domain.cpp:502); only periodic dimensions
    are remapped.  Triclinic boxes wrap in lamda space (x2lamda -> floor
    -> lamda2x). `image` is int32 (N,3) box-crossing counts.
    """
    if box.triclinic:
        lam = (x - box.lo) @ box.h_inv.T
        shift = jnp.floor(lam).astype(jnp.int32)
        if not all(box.periodic):
            shift = shift * jnp.asarray(box.periodic, jnp.int32)
        return x - shift.astype(x.dtype) @ box.h.T, image + shift
    L = box.lengths
    shift = jnp.floor((x - box.lo) / L).astype(jnp.int32)
    if not all(box.periodic):
        shift = shift * jnp.asarray(box.periodic, jnp.int32)
    return x - shift.astype(x.dtype) * L, image + shift


def unwrap(x: jax.Array, box: Box, image: jax.Array) -> jax.Array:
    """Unwrapped (true) coordinates from wrapped positions + image flags.

    Equivalent to Domain::unmap (used by FixRigid, fix_rigid.cpp:824).
    """
    if box.triclinic:
        return x + image.astype(x.dtype) @ box.h.T
    return x + image.astype(x.dtype) * box.lengths


@dataclasses.dataclass(frozen=True)
class ShrinkSpec:
    """Static shrink-wrap configuration (Domain::reset_box, domain.cpp:358).

    Per face: 0 = fixed/periodic (leave), 2 = 's' (extent +- small),
    3 = 'm' (like 's' but never tighter than the created box face).
    `small` is frozen at SMALL * created box length (set_initial_box,
    domain.cpp:204)."""

    lo_style: tuple   # (3,) int face codes
    hi_style: tuple
    small: tuple      # (3,) float
    min_lo: tuple     # (3,) created box faces, for 'm'
    min_hi: tuple

    @property
    def active(self) -> bool:
        return any(s in (2, 3) for s in self.lo_style + self.hi_style)


def reset_box(x, mask, box: Box, spec: ShrinkSpec) -> Box:
    """Shrink-wrap the box faces to the atom extent (reset_box semantics)."""
    big = jnp.asarray(_BIG, x.dtype)
    xm_lo = jnp.where(mask[:, None], x, big)
    xm_hi = jnp.where(mask[:, None], x, -big)
    ext_lo = jnp.min(xm_lo, axis=0)
    ext_hi = jnp.max(xm_hi, axis=0)
    los, his = [], []
    for d in range(3):
        lo_d, hi_d = box.lo[d], box.hi[d]
        if spec.lo_style[d] == 2:
            lo_d = ext_lo[d] - spec.small[d]
        elif spec.lo_style[d] == 3:
            lo_d = jnp.minimum(ext_lo[d] - spec.small[d], spec.min_lo[d])
        if spec.hi_style[d] == 2:
            hi_d = ext_hi[d] + spec.small[d]
        elif spec.hi_style[d] == 3:
            hi_d = jnp.maximum(ext_hi[d] + spec.small[d], spec.min_hi[d])
        los.append(lo_d)
        his.append(hi_d)
    return Box(lo=jnp.stack(los), hi=jnp.stack(his), periodic=box.periodic,
               tilt=box.tilt, triclinic=box.triclinic)
