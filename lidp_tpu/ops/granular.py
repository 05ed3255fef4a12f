"""Granular Hookean contact forces — pair gran/hooke[/history] + the
sphere-atom integration pieces (GRANULAR package slice for bench/in.chute).

Reference: pair_gran_hooke_history.cpp::compute (:100-315) — Hookean
normal contact with velocity damping, tangential shear-history friction
with Coulomb rescaling, per-pair persistent shear state; settings (:343):
kn, kt=NULL -> 2/7 kn, gamman, gammat=NULL -> gamman/2 (zeroed when
dampflag=0), xmu.  fix nve/sphere (fix_nve_sphere.cpp:110-140) integrates
omega with I = 0.4 m r^2; compute erotate/sphere (:48) is
0.5*0.4*mvv2e * sum m r^2 w^2; fix gravity chute A (fix_gravity.cpp:313):
theta = 180-A, g = (sin A, 0, -cos A)*magnitude.

TPU-native shear history: the reference stores per-(i, jj) shear vectors
inside neighbor-list pages remapped by FixNeighHistory on rebuilds.  Here
shear lives in the SAME regular candidate structure as the cell kernel —
one (noff, cells, cap, cap, 3) array updated elementwise each step
(nothing gathered).  On a rebuild the structure re-sorts; shear is kept
for candidate pairs whose BOTH (cell, slot) endpoints still hold the same
atoms (an equality mask + the stencil rolls) and reset to zero otherwise.
An atom that changes cell or rank between rebuilds therefore loses its
contacts' tangential memory — a documented approximation (contacts whose
endpoints both stay binned identically, the vast majority between
rebuilds, keep exact history).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import Box, minimum_image
from lidp_tpu.ops.cells import Cells, half_offsets


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GranParams:
    kn: jax.Array
    kt: jax.Array
    gamman: jax.Array
    gammat: jax.Array
    xmu: jax.Array
    radius: jax.Array        # (N,)
    rmass: jax.Array         # (N,)
    frozen: jax.Array        # (N,) bool — fix freeze group (meff rule)
    excl: jax.Array = None   # (N,) bool — neigh_modify exclude group pairs
    dt: jax.Array = 1.0
    # hooke/history (default), hooke (no shear state, velocity-damped
    # friction only, pair_gran_hooke.cpp), hertz/history (forces scaled
    # by polyhertz = sqrt(delta ri rj / radsum),
    # pair_gran_hertz_history.cpp)
    kind: str = dataclasses.field(metadata=dict(static=True),
                                  default="hooke/history")


def make_gran_params(args, radius, rmass, frozen, excl=None, dt=1.0,
                     dtype=jnp.float64, kind="hooke/history") -> GranParams:
    """args: the 6 pair_style tokens (kn kt gamman gammat xmu dampflag).
    For hertz/history the file-units convention matches the reference
    (pair_gran_hertz_history.cpp::coeff divides kn/kt the same way)."""
    kn = float(args[0])
    kt = kn * 2.0 / 7.0 if args[1] == "NULL" else float(args[1])
    gamman = float(args[2])
    gammat = 0.5 * gamman if args[3] == "NULL" else float(args[3])
    xmu = float(args[4])
    if int(args[5]) == 0:
        gammat = 0.0
    return GranParams(
        kn=jnp.asarray(kn, dtype), kt=jnp.asarray(kt, dtype),
        gamman=jnp.asarray(gamman, dtype), gammat=jnp.asarray(gammat, dtype),
        xmu=jnp.asarray(xmu, dtype),
        radius=jnp.asarray(radius, dtype), rmass=jnp.asarray(rmass, dtype),
        frozen=jnp.asarray(frozen, bool),
        excl=None if excl is None else jnp.asarray(excl, bool),
        dt=jnp.asarray(dt, dtype), kind=kind)


def gran_offsets(nbins):
    return [(0, 0, 0)] + half_offsets(nbins)


def shear_shape(cells: Cells):
    aos = cells.atom_of_slot
    noff = len(gran_offsets(aos.shape[:3]))
    return (noff,) + aos.shape + (aos.shape[-1], 3)


def migrate_shear(shear, old_cells: Cells, new_cells: Cells):
    """Keep shear for candidate pairs whose (cell, slot) endpoints still
    hold the same atoms after the rebuild; zero the rest."""
    same = new_cells.atom_of_slot == old_cells.atom_of_slot  # (bx,by,bz,cap)
    offs = gran_offsets(same.shape[:3])
    keeps = []
    for off in offs:
        s = same
        for ax, sh in enumerate(off):
            if sh:
                s = jnp.roll(s, -sh, axis=ax)
        # pair (i slot, j slot): i side = same, j side = rolled same
        keeps.append(same[..., :, None] & s[..., None, :])
    keep = jnp.stack(keeps)                                  # (noff,...,cap,cap)
    return jnp.where(keep[..., None], shear, 0.0)


def gran_cell_forces(x, v, omega, mask, cells: Cells, box: Box,
                    p: GranParams, shear, shear_update: bool = True,
                    need_ev: bool = False):
    """Hooke/history contact forces over the rolled cell grid (Newton half
    stencil, both sides tallied like the reference's newton/j<nlocal arm).

    shear: (noff, bx, by, bz, cap, cap, 3) persistent tangential history.
    Returns (f (N,3), torque (N,3), shear', virial6).
    """
    n = x.shape[0]
    dtype = x.dtype
    aos = cells.atom_of_slot
    cap = aos.shape[-1]
    L = box.img_lengths
    amax = jnp.minimum(aos, n - 1)
    valid = aos < n

    def slotify(a, fill=0.0):
        return jnp.where(valid, a[amax], fill)

    xs = [slotify(x[:, d]) for d in range(3)]
    vs = [slotify(v[:, d]) for d in range(3)]
    ws = [slotify(omega[:, d]) for d in range(3)]
    rad = slotify(p.radius)
    ms = slotify(p.rmass, 1.0)
    frz = jnp.where(valid, p.frozen[amax], False)
    if p.excl is not None:
        exc = jnp.where(valid, p.excl[amax], False)

    def ctr(a):
        return a[..., :, None]

    def _roll(a, off, sign=-1):
        for ax, sh in enumerate(off):
            if sh:
                a = jnp.roll(a, sign * sh, axis=ax)
        return a

    def nbr(a, off):
        return _roll(a, off, -1)[..., None, :]

    offs = gran_offsets(aos.shape[:3])
    tri = jnp.arange(cap)[:, None] < jnp.arange(cap)[None, :]

    fx = jnp.zeros(aos.shape, dtype)
    fy = jnp.zeros_like(fx)
    fz = jnp.zeros_like(fx)
    tx = jnp.zeros_like(fx)
    ty = jnp.zeros_like(fx)
    tz = jnp.zeros_like(fx)
    vir = [jnp.zeros((), dtype) for _ in range(6)]
    shear_new = []

    for g, off in enumerate(offs):
        dx = minimum_image(ctr(xs[0]) - nbr(xs[0], off), L[0])
        dy = minimum_image(ctr(xs[1]) - nbr(xs[1], off), L[1])
        dz = minimum_image(ctr(xs[2]) - nbr(xs[2], off), L[2])
        rsq = dx * dx + dy * dy + dz * dz
        ok = ctr(valid) & nbr(valid, off)
        if off == (0, 0, 0):
            ok = ok & tri
        if p.excl is not None:
            # neigh_modify exclude group A A: drop pairs with both ends in
            # the excluded group (neighbor.cpp exclusion tests)
            ok = ok & ~(ctr(exc) & nbr(exc, off))
        radi, radj = ctr(rad), nbr(rad, off)
        radsum = radi + radj
        touch = ok & (rsq < radsum * radsum)
        rsq = jnp.where(touch, rsq, 1.0)
        r = jnp.sqrt(rsq)
        rinv = 1.0 / r
        rsqinv = 1.0 / rsq

        vr1 = ctr(vs[0]) - nbr(vs[0], off)
        vr2 = ctr(vs[1]) - nbr(vs[1], off)
        vr3 = ctr(vs[2]) - nbr(vs[2], off)
        vnnr = vr1 * dx + vr2 * dy + vr3 * dz
        vn1 = dx * vnnr * rsqinv
        vn2 = dy * vnnr * rsqinv
        vn3 = dz * vnnr * rsqinv
        vt1 = vr1 - vn1
        vt2 = vr2 - vn2
        vt3 = vr3 - vn3

        wr1 = (radi * ctr(ws[0]) + radj * nbr(ws[0], off)) * rinv
        wr2 = (radi * ctr(ws[1]) + radj * nbr(ws[1], off)) * rinv
        wr3 = (radi * ctr(ws[2]) + radj * nbr(ws[2], off)) * rinv

        mi = ctr(ms)
        mj = nbr(ms, off)
        meff = mi * mj / (mi + mj)
        meff = jnp.where(ctr(frz), mj, meff)
        meff = jnp.where(nbr(frz, off), mi, meff)

        damp = meff * p.gamman * vnnr * rsqinv
        ccel = jnp.where(touch, p.kn * (radsum - r) * rinv - damp, 0.0)
        if p.kind == "hertz/history":
            # pair_gran_hertz_history.cpp: normal and tangential forces
            # scale with sqrt(overlap * reduced radius)
            polyhertz = jnp.sqrt(jnp.maximum(
                (radsum - r) * radi * radj / radsum, 0.0))
            polyhertz = jnp.where(touch, polyhertz, 0.0)
            ccel = ccel * polyhertz
        else:
            polyhertz = 1.0

        vtr1 = vt1 - (dz * wr2 - dy * wr3)
        vtr2 = vt2 - (dx * wr3 - dz * wr1)
        vtr3 = vt3 - (dy * wr1 - dx * wr2)

        if p.kind == "hooke":
            # pair_gran_hooke.cpp: no shear history; tangential damping
            # force capped at the Coulomb limit
            vrel = jnp.sqrt(vtr1 * vtr1 + vtr2 * vtr2 + vtr3 * vtr3)
            fn = p.xmu * jnp.abs(ccel * r)
            fsd = meff * p.gammat * vrel
            ft = jnp.where(vrel != 0.0,
                           jnp.minimum(fn, fsd)
                           / jnp.where(vrel > 0, vrel, 1.0), 0.0)
            fs1 = jnp.where(touch, -ft * vtr1, 0.0)
            fs2 = jnp.where(touch, -ft * vtr2, 0.0)
            fs3 = jnp.where(touch, -ft * vtr3, 0.0)
            shear_new.append(shear[g])
            fxp = dx * ccel + fs1
            fyp = dy * ccel + fs2
            fzp = dz * ccel + fs3
            fx += jnp.sum(fxp, axis=-1).reshape(aos.shape)
            fy += jnp.sum(fyp, axis=-1).reshape(aos.shape)
            fz += jnp.sum(fzp, axis=-1).reshape(aos.shape)
            fx -= _roll(jnp.sum(fxp, axis=-2), off, +1)
            fy -= _roll(jnp.sum(fyp, axis=-2), off, +1)
            fz -= _roll(jnp.sum(fzp, axis=-2), off, +1)
            tor1 = rinv * (dy * fs3 - dz * fs2)
            tor2 = rinv * (dz * fs1 - dx * fs3)
            tor3 = rinv * (dx * fs2 - dy * fs1)
            tx -= jnp.sum(radi * tor1, axis=-1).reshape(aos.shape)
            ty -= jnp.sum(radi * tor2, axis=-1).reshape(aos.shape)
            tz -= jnp.sum(radi * tor3, axis=-1).reshape(aos.shape)
            tx -= _roll(jnp.sum(radj * tor1, axis=-2), off, +1)
            ty -= _roll(jnp.sum(radj * tor2, axis=-2), off, +1)
            tz -= _roll(jnp.sum(radj * tor3, axis=-2), off, +1)
            if need_ev:
                vir[0] += jnp.sum(fxp * dx)
                vir[1] += jnp.sum(fyp * dy)
                vir[2] += jnp.sum(fzp * dz)
                vir[3] += jnp.sum(fyp * dx)
                vir[4] += jnp.sum(fzp * dx)
                vir[5] += jnp.sum(fzp * dy)
            continue

        sh = shear[g]                                      # (...,cap,cap,3)
        s1, s2, s3 = sh[..., 0], sh[..., 1], sh[..., 2]
        if shear_update:
            s1 = s1 + vtr1 * p.dt
            s2 = s2 + vtr2 * p.dt
            s3 = s3 + vtr3 * p.dt
        shrmag = jnp.sqrt(s1 * s1 + s2 * s2 + s3 * s3)
        # rotate shear displacements into the tangent plane
        rsht = (s1 * dx + s2 * dy + s3 * dz) * rsqinv
        if shear_update:
            s1 = s1 - rsht * dx
            s2 = s2 - rsht * dy
            s3 = s3 - rsht * dz

        fs1 = -polyhertz * (p.kt * s1 + meff * p.gammat * vtr1)
        fs2 = -polyhertz * (p.kt * s2 + meff * p.gammat * vtr2)
        fs3 = -polyhertz * (p.kt * s3 + meff * p.gammat * vtr3)
        fs = jnp.sqrt(fs1 * fs1 + fs2 * fs2 + fs3 * fs3)
        fn = p.xmu * jnp.abs(ccel * r)
        over = touch & (fs > fn)
        scale = jnp.where(over & (shrmag != 0.0),
                          fn / jnp.where(fs > 0, fs, 1.0), 1.0)
        gt_kt = meff * p.gammat / p.kt
        if shear_update:
            s1 = jnp.where(over,
                           jnp.where(shrmag != 0.0,
                                     scale * (s1 + gt_kt * vtr1)
                                     - gt_kt * vtr1, s1), s1)
            s2 = jnp.where(over,
                           jnp.where(shrmag != 0.0,
                                     scale * (s2 + gt_kt * vtr2)
                                     - gt_kt * vtr2, s2), s2)
            s3 = jnp.where(over,
                           jnp.where(shrmag != 0.0,
                                     scale * (s3 + gt_kt * vtr3)
                                     - gt_kt * vtr3, s3), s3)
        zero_fs = over & (shrmag == 0.0)
        fs1 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs1 * scale), 0.0)
        fs2 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs2 * scale), 0.0)
        fs3 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs3 * scale), 0.0)

        # non-touching candidates carry zero shear (reference :168-175)
        s1 = jnp.where(touch, s1, 0.0)
        s2 = jnp.where(touch, s2, 0.0)
        s3 = jnp.where(touch, s3, 0.0)
        shear_new.append(jnp.stack([s1, s2, s3], axis=-1))

        fxp = dx * ccel + fs1
        fyp = dy * ccel + fs2
        fzp = dz * ccel + fs3
        fx += jnp.sum(fxp, axis=-1).reshape(aos.shape)
        fy += jnp.sum(fyp, axis=-1).reshape(aos.shape)
        fz += jnp.sum(fzp, axis=-1).reshape(aos.shape)
        fx -= _roll(jnp.sum(fxp, axis=-2), off, +1)
        fy -= _roll(jnp.sum(fyp, axis=-2), off, +1)
        fz -= _roll(jnp.sum(fzp, axis=-2), off, +1)

        tor1 = rinv * (dy * fs3 - dz * fs2)
        tor2 = rinv * (dz * fs1 - dx * fs3)
        tor3 = rinv * (dx * fs2 - dy * fs1)
        tx -= jnp.sum(radi * tor1, axis=-1).reshape(aos.shape)
        ty -= jnp.sum(radi * tor2, axis=-1).reshape(aos.shape)
        tz -= jnp.sum(radi * tor3, axis=-1).reshape(aos.shape)
        # j side: torque[j] -= radj * tor (same tor vector, both sides)
        tx -= _roll(jnp.sum(radj * tor1, axis=-2), off, +1)
        ty -= _roll(jnp.sum(radj * tor2, axis=-2), off, +1)
        tz -= _roll(jnp.sum(radj * tor3, axis=-2), off, +1)

        if need_ev:
            vir[0] += jnp.sum(fxp * dx)
            vir[1] += jnp.sum(fyp * dy)
            vir[2] += jnp.sum(fzp * dz)
            vir[3] += jnp.sum(fyp * dx)
            vir[4] += jnp.sum(fzp * dx)
            vir[5] += jnp.sum(fzp * dy)

    def to_atoms(a):
        return a.reshape(-1)[cells.slot_of_atom]

    f = jnp.stack([to_atoms(fx), to_atoms(fy), to_atoms(fz)], axis=-1)
    tq = jnp.stack([to_atoms(tx), to_atoms(ty), to_atoms(tz)], axis=-1)
    f = jnp.where(mask[:, None], f, 0.0)
    tq = jnp.where(mask[:, None], tq, 0.0)
    return f, tq, jnp.stack(shear_new), jnp.stack(vir)


def erotate_sphere(omega, radius, rmass, mask, mvv2e=1.0):
    """compute erotate/sphere: 0.5*INERTIA*mvv2e * sum m r^2 |w|^2."""
    w2 = jnp.sum(omega * omega, axis=1)
    e = jnp.where(mask & (radius > 0.0),
                  rmass * radius * radius * w2, 0.0)
    return 0.5 * 0.4 * mvv2e * jnp.sum(e)


def wall_contact_force(d, v, omega, radius, meff, shear, vwall, active,
                       kn, kt, gamman, gammat, xmu, dt, kind,
                       rwall=None, shear_update=True):
    """One wall-contact source, vectorized over atoms — the sphere/wall
    kernels of fix_wall_gran.cpp (hooke :459-535, hooke_history :539-654,
    hertz_history :658-780).  d (N,3) = signed vector from the wall contact
    point to the atom; active (N,) gates group + in-range; rwall (N,) = the
    curved-wall term of hertz_history (0 for planes, +-2*cylradius for
    zcylinder, region contact radius for wall/gran/region).

    Returns (f_add (N,3), tq_add (N,3), shear' (N,3)).  fix wall/gran
    tallies no virial in the reference (no v_tally in post_force) —
    preserved."""
    dtype = d.dtype
    rsq = jnp.sum(d * d, axis=1)
    touch = active & (rsq <= radius * radius) & (rsq > 0.0)
    rsq_s = jnp.where(touch, rsq, 1.0)
    r = jnp.sqrt(rsq_s)
    rinv = 1.0 / r
    rsqinv = 1.0 / rsq_s

    vr = v - vwall
    vnnr = jnp.sum(vr * d, axis=1)
    vn = d * (vnnr * rsqinv)[:, None]
    vt = vr - vn
    wr = radius[:, None] * omega * rinv[:, None]

    damp = meff * gamman * vnnr * rsqinv
    ccel = jnp.where(touch, kn * (radius - r) * rinv - damp, 0.0)
    if kind == "hertz/history":
        rw = jnp.zeros_like(r) if rwall is None else rwall
        red = jnp.where(rw == 0.0, radius,
                        radius * rw / jnp.where(rw + radius != 0.0,
                                                rw + radius, 1.0))
        polyhertz = jnp.sqrt(jnp.maximum((radius - r) * red, 0.0))
        polyhertz = jnp.where(touch, polyhertz, 0.0)
        ccel = ccel * polyhertz
    else:
        polyhertz = jnp.ones_like(r)

    # vtr = vt - d x wr (component form of :499-501)
    vtr1 = vt[:, 0] - (d[:, 2] * wr[:, 1] - d[:, 1] * wr[:, 2])
    vtr2 = vt[:, 1] - (d[:, 0] * wr[:, 2] - d[:, 2] * wr[:, 0])
    vtr3 = vt[:, 2] - (d[:, 1] * wr[:, 0] - d[:, 0] * wr[:, 1])

    if kind == "hooke":
        vrel = jnp.sqrt(vtr1 * vtr1 + vtr2 * vtr2 + vtr3 * vtr3)
        fn = xmu * jnp.abs(ccel * r)
        fsd = meff * gammat * vrel
        ft = jnp.where(vrel != 0.0,
                       jnp.minimum(fn, fsd) / jnp.where(vrel > 0.0,
                                                        vrel, 1.0), 0.0)
        fs1 = jnp.where(touch, -ft * vtr1, 0.0)
        fs2 = jnp.where(touch, -ft * vtr2, 0.0)
        fs3 = jnp.where(touch, -ft * vtr3, 0.0)
        shear_out = shear
    else:
        s1, s2, s3 = shear[:, 0], shear[:, 1], shear[:, 2]
        if shear_update:
            s1 = s1 + vtr1 * dt
            s2 = s2 + vtr2 * dt
            s3 = s3 + vtr3 * dt
        shrmag = jnp.sqrt(s1 * s1 + s2 * s2 + s3 * s3)
        rsht = (s1 * d[:, 0] + s2 * d[:, 1] + s3 * d[:, 2]) * rsqinv
        if shear_update:
            s1 = s1 - rsht * d[:, 0]
            s2 = s2 - rsht * d[:, 1]
            s3 = s3 - rsht * d[:, 2]
        fs1 = -polyhertz * (kt * s1 + meff * gammat * vtr1)
        fs2 = -polyhertz * (kt * s2 + meff * gammat * vtr2)
        fs3 = -polyhertz * (kt * s3 + meff * gammat * vtr3)
        fs = jnp.sqrt(fs1 * fs1 + fs2 * fs2 + fs3 * fs3)
        fn = xmu * jnp.abs(ccel * r)
        over = touch & (fs > fn)
        scale = jnp.where(over & (shrmag != 0.0),
                          fn / jnp.where(fs > 0.0, fs, 1.0), 1.0)
        gt_kt = meff * gammat / jnp.where(kt != 0.0, kt, 1.0)
        if shear_update:
            def resc(s, vtr):
                return jnp.where(over & (shrmag != 0.0),
                                 scale * (s + gt_kt * vtr) - gt_kt * vtr,
                                 s)
            s1, s2, s3 = resc(s1, vtr1), resc(s2, vtr2), resc(s3, vtr3)
        zero_fs = over & (shrmag == 0.0)
        fs1 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs1 * scale), 0.0)
        fs2 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs2 * scale), 0.0)
        fs3 = jnp.where(touch, jnp.where(zero_fs, 0.0, fs3 * scale), 0.0)
        # non-touching atoms lose their wall history (:353-356)
        s1 = jnp.where(touch, s1, 0.0)
        s2 = jnp.where(touch, s2, 0.0)
        s3 = jnp.where(touch, s3, 0.0)
        shear_out = jnp.stack([s1, s2, s3], axis=-1).astype(dtype)

    fsv = jnp.stack([fs1, fs2, fs3], axis=-1)
    f_add = d * ccel[:, None] + fsv
    # torque -= radius * rinv * (d x fs)  (:529-534)
    tor = jnp.cross(d, fsv) * rinv[:, None]
    tq_add = -radius[:, None] * tor
    return f_add, tq_add, shear_out
