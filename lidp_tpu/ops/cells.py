"""Roll-based cell-pair force kernel — the TPU-native neighbor strategy.

The reference's binned neighbor lists (npair_half_bin_newton.cpp:36) are a
sparse, gather-heavy structure; on TPU, per-pair gathers cost ~100x the
arithmetic.  This kernel replaces lists entirely with a *regular stencil*
computation:

  * atoms are bucketed into a dense (nbx, nby, nbz, cap) slot grid once per
    rebuild (one argsort + small scatters);
  * each step, per-slot coordinates are gathered once (O(slots), not
    O(pairs)), and the neighbor-cell interactions are computed by
    jnp.roll-ing the whole grid — periodic wrap included — as
    (cells, cap, cap) elementwise blocks: no gathers in the pair loop at all;
  * forces return in slot space and map back with one O(N) gather.

Newton's third law is exploited exactly like the reference's half lists
(npair_half_bin_newton.cpp): only 13 of the 27 stencil offsets are evaluated
plus the upper triangle of the self cell, and each pair tallies +f to the
center atom and -f to the neighbor (the neighbor-side sum rolls back to its
home cell).  Energies/virials carry full weight (each pair seen once).

Energy/virial work is gated by `need_ev`: inside a lax.scan run chunk nothing
consumes per-step energies (thermo samples between chunks), so the quiet path
skips the evdwl/ecoul/virial math entirely (LAMMPS' eflag/vflag analog,
ev_setup pair.cpp:752).

Requires >= 3 bins per dimension (otherwise the dense path applies).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import Box, minimum_image
from lidp_tpu.ops.pair import (EWALD_F, EWALD_P, A1, A2, A3, A4, A5,
                               _vdw_terms)


def perp_widths(lengths, tilt=None):
    """Perpendicular distance between opposite cell faces per dimension.

    For a triclinic cell h = [[lx,xy,xz],[0,ly,yz],[0,0,lz]] the thickness
    of the slab between the lamda_d = 0 and 1 planes is 1/||h_inv[d,:]||;
    binning on these widths guarantees the 1-ring lamda-space stencil covers
    the real-space cutoff (the nbin_standard.cpp bininv-via-lamda analog of
    npair_half_bin_newton_tri.cpp's extended stencil)."""
    L = np.asarray(lengths, float)
    if tilt is None or not np.any(np.asarray(tilt, float) != 0.0):
        return L
    xy, xz, yz = (float(v) for v in np.asarray(tilt, float))
    h = np.array([[L[0], xy, xz], [0.0, L[1], yz], [0.0, 0.0, L[2]]])
    hinv = np.linalg.inv(h)
    return 1.0 / np.linalg.norm(hinv, axis=1)


@dataclasses.dataclass(frozen=True)
class CellConfig:
    nbins: tuple[int, int, int]
    cap: int
    cutneigh: float

    @staticmethod
    def for_box(box_lengths, cutneigh: float, density: float,
                cap_slack: float = 2.0, perp=None) -> "CellConfig":
        """`perp` (triclinic): perpendicular face widths from perp_widths();
        bin counts come from the perpendicular extent while the per-bin
        volume (capacity estimate) uses the true cell volume."""
        L = np.asarray(box_lengths, float)
        W = L if perp is None else np.asarray(perp, float)
        nb = []
        for w in W:
            n = int(max(1, np.floor(w / cutneigh)))
            # a dim thinner than ~3 cutoffs collapses to a single bin (all
            # pairs in-cell, minimum image handles the wrap); 2 bins would
            # alias the +1/-1 rolls onto the same neighbor
            nb.append(n if n >= 3 else 1)
        nb = tuple(nb)
        if max(nb) < 3:
            raise ValueError("cell kernel needs >= 3 bins in some dim")
        vol_bin = float(np.prod(L)) / float(np.prod(nb))
        cap = int(np.ceil(density * vol_bin * cap_slack / 8.0) * 8)
        return CellConfig(nbins=nb, cap=max(cap, 8), cutneigh=float(cutneigh))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cells:
    atom_of_slot: jax.Array   # (nbx,nby,nbz,cap) int32, == n for empty
    slot_of_atom: jax.Array   # (N,) int32 linear slot index
    overflow: jax.Array       # () bool


def build_cells(x, mask, box: Box, cfg: CellConfig) -> Cells:
    n = x.shape[0]
    nbx, nby, nbz = cfg.nbins
    nbins = nbx * nby * nbz
    dims = jnp.array(cfg.nbins, jnp.int32)
    L = box.lengths

    if box.triclinic:
        # bin in lamda space (x2lamda, domain.cpp): the unit cube maps to
        # the tilted cell; the 1-ring stencil stays valid because nbins came
        # from the perpendicular widths (see CellConfig.for_box `perp`)
        frac = (x - box.lo) @ box.h_inv.T
        perp = 1.0 / jnp.linalg.norm(box.h_inv, axis=1)
    else:
        frac = (x - box.lo) / L
        perp = L
    # wrap only periodic dims; non-periodic strays clamp to edge bins below
    if all(box.periodic):
        frac = frac - jnp.floor(frac)
    else:
        pm = jnp.asarray(box.periodic)
        frac = jnp.where(pm, frac - jnp.floor(frac), frac)
    b3 = jnp.clip((frac * dims).astype(jnp.int32), 0, dims - 1)
    bin_id = (b3[:, 0] * nby + b3[:, 1]) * nbz + b3[:, 2]
    bin_id = jnp.where(mask, bin_id, nbins)

    # shrink-wrapped boxes change L at run time with static nbins: flag it
    # (sticky through the scan, like capacity overflow) if a bin drops below
    # the neighbor cutoff so missed pairs can't pass silently
    binsize_bad = jnp.zeros((), bool)
    for d in range(3):
        if cfg.nbins[d] > 1:
            binsize_bad |= (perp[d] / cfg.nbins[d]) < cfg.cutneigh

    order = jnp.argsort(bin_id)
    sb = bin_id[order]
    pos = jnp.arange(n)
    first = jnp.searchsorted(sb, sb, side="left")
    rank = (pos - first).astype(jnp.int32)
    overflow = jnp.any((rank >= cfg.cap) & (sb < nbins)) | binsize_bad
    rank_c = jnp.minimum(rank, cfg.cap - 1)

    slot_sorted = jnp.where(sb < nbins, sb * cfg.cap + rank_c, nbins * cfg.cap)
    slot_of_atom = jnp.zeros((n,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32))
    atom_of_slot = jnp.full((nbins * cfg.cap + 1,), n, jnp.int32).at[
        slot_sorted].set(order.astype(jnp.int32), mode="drop")
    atom_of_slot = atom_of_slot[:-1].reshape(nbx, nby, nbz, cfg.cap)
    return Cells(atom_of_slot=atom_of_slot, slot_of_atom=slot_of_atom,
                 overflow=overflow)


_OFFSETS = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
# Newton half stencil: the 13 lexicographically-positive offsets; the self
# cell (0,0,0) is handled with an upper-triangular slot mask.
_HALF_OFFSETS = [o for o in _OFFSETS
                 if o > (0, 0, 0)]


def half_offsets(nbins) -> list:
    """Newton half stencil restricted to dims with more than one bin.

    Dims collapsed to a single bin (thin 2d slabs) contribute no roll:
    their pairs are all in-cell and minimum image covers the wrap."""
    ranges = [(-1, 0, 1) if nb > 1 else (0,) for nb in nbins]
    offs = [(i, j, k) for i in ranges[0] for j in ranges[1]
            for k in ranges[2]]
    return [o for o in offs if o > (0, 0, 0)]


def _roll(a, off, sign=-1):
    for ax, sh in enumerate(off):
        if sh:
            a = jnp.roll(a, sign * sh, axis=ax)
    return a


def cell_pair_forces(x, q, type_, mask, cells: Cells, box: Box, p,
                     coul: bool | None = None, need_ev: bool = True,
                     mol=None):
    """LJ (+ real-space Ewald coulomb) forces via the rolled cell grid.

    `p` is a PairParams.  Multi-type tables are applied per-slot (one gather
    per slot pair table row).  Special bonds are not supported on this path.
    When need_ev is False, the returned energies/virial are zeros and their
    computation is skipped (the scan-internal fast path).
    Returns (f (N,3), evdwl, ecoul, virial6) in atom order.
    """
    n = x.shape[0]
    dtype = x.dtype
    if coul is None:
        coul = p.coul
    aos = cells.atom_of_slot                        # (bx,by,bz,cap)
    L = box.img_lengths
    cap = aos.shape[-1]

    amax = jnp.minimum(aos, n - 1)
    valid = aos < n

    def slotify(a, pad):
        return jnp.where(valid, a[amax], pad)

    if box.triclinic:
        # per-slot lamda coordinates; deltas fold per-dim in lamda space
        # (period 1) and map to Cartesian through the upper-triangular h —
        # identical to min_image_box's lamda-round fold (domain.cpp:1183)
        lam = (x - box.lo) @ box.h_inv.T
        xs = [slotify(lam[:, d], jnp.zeros((), dtype)) for d in range(3)]
        lam_periods = [1.0 if box.periodic[d] else 1.0e30 for d in range(3)]
    else:
        xs = [slotify(x[:, d], jnp.zeros((), dtype)) for d in range(3)]
    qs = slotify(q, jnp.zeros((), dtype)) if coul else None
    ntypes = p.lj1.shape[0] - 1
    multi_type = ntypes > 1 or p.excl is not None
    if multi_type:
        ts = slotify(type_, jnp.zeros((), jnp.int32))
        # Per-pair type tables via MXU one-hot contraction instead of
        # (cells,cap,K)-shaped 2D gathers: W[ti,tj] == sum_t W[ti][t] *
        # onehot(tj)[t], EXACT (one 1.0 per row — no rounding), and a
        # batched matmul instead of ~8 giant gathers.  The gather lowering
        # was the entire cost of the 32k CHARMM (rhodo-class) step on TPU:
        # ~20 s/step vs ~50 ms for the same arithmetic through the MXU.
        T1 = p.lj1.shape[0]
        tabs = [p.lj1, p.lj2, p.lj3, p.lj4]
        if p.lj5 is not None:
            tabs.append(p.lj5)
        tabs += [p.offset, p.cut_ljsq, p.cutsq]
        if p.excl is not None:
            tabs.append(p.excl.astype(dtype))
        Wstack = jnp.stack([t.astype(dtype) for t in tabs], axis=-1)
        Rall = Wstack[ts]                       # (...,cap,T1,NT) slot rows
        ohs = jax.nn.one_hot(ts, T1, dtype=dtype)   # (...,cap,T1)
    excl_mol = p.excl_mol and mol is not None
    if excl_mol:
        ms = slotify(mol, jnp.full((), -1, jnp.int32))

    # center-atom views: (..., cap, 1); neighbor views via roll: (..., 1, cap)
    def ctr(a):
        return a[..., :, None]

    def nbr(a, off):
        return _roll(a, off, -1)[..., None, :]

    fx = jnp.zeros(aos.shape, dtype)
    fy = jnp.zeros_like(fx)
    fz = jnp.zeros_like(fx)
    evdwl = jnp.zeros((), dtype)
    ecoul = jnp.zeros((), dtype)
    vir = [jnp.zeros((), dtype) for _ in range(6)]

    if multi_type:
        lj5 = None
    else:
        lj1 = p.lj1[1, 1]; lj2 = p.lj2[1, 1]
        lj3 = p.lj3[1, 1]; lj4 = p.lj4[1, 1]
        lj5 = p.lj5[1, 1] if p.lj5 is not None else None
        off11 = p.offset[1, 1]
        cut_ljsq = p.cut_ljsq[1, 1]; cutsq = p.cutsq[1, 1]

    # upper triangle (i<j) for the self-cell block
    tri = jnp.arange(cap)[:, None] < jnp.arange(cap)[None, :]

    # Process stencil offsets in groups: concatenating G rolled neighbor
    # grids along the j axis makes the lane dimension G*cap wide (~512),
    # cutting the 128-lane tile padding.  Group 0 carries the self cell.
    group_size = max(1, min(14, 512 // cap))
    all_offs = [(0, 0, 0)] + half_offsets(aos.shape[:3])
    groups = [all_offs[i:i + group_size]
              for i in range(0, len(all_offs), group_size)]

    def nbr_group(a, offs):
        return jnp.concatenate([nbr(a, o) for o in offs], axis=-1)

    for offs in groups:
        G = len(offs)
        if box.triclinic:
            h = box.h
            dl0 = minimum_image(ctr(xs[0]) - nbr_group(xs[0], offs),
                                lam_periods[0])
            dl1 = minimum_image(ctr(xs[1]) - nbr_group(xs[1], offs),
                                lam_periods[1])
            dl2 = minimum_image(ctr(xs[2]) - nbr_group(xs[2], offs),
                                lam_periods[2])
            dx = h[0, 0] * dl0 + h[0, 1] * dl1 + h[0, 2] * dl2
            dy = h[1, 1] * dl1 + h[1, 2] * dl2
            dz = h[2, 2] * dl2
        else:
            dx = minimum_image(ctr(xs[0]) - nbr_group(xs[0], offs), L[0])
            dy = minimum_image(ctr(xs[1]) - nbr_group(xs[1], offs), L[1])
            dz = minimum_image(ctr(xs[2]) - nbr_group(xs[2], offs), L[2])
        rsq = dx * dx + dy * dy + dz * dz
        pair_ok = ctr(valid) & nbr_group(valid, offs)
        if (0, 0, 0) in offs:
            gi = offs.index((0, 0, 0))
            tri_blk = jnp.pad(
                tri, ((0, 0), (gi * cap, (G - gi - 1) * cap)),
                constant_values=True)
            pair_ok = pair_ok & tri_blk
        if excl_mol:
            pair_ok = pair_ok & (ctr(ms) != nbr_group(ms, offs))
        rsq = jnp.where(pair_ok, rsq, 1.0e12)
        r2inv = 1.0 / rsq

        if multi_type:
            ohj = jnp.concatenate([_roll(ohs, o, -1) for o in offs],
                                  axis=-2)          # (...,G*cap,T1)
            # HIGHEST: the default TPU contraction rounds operands to bf16,
            # truncating lj1-lj4/offset/cutsq to an 8-bit mantissa (~0.4%
            # coefficient error + cutoff-boundary misclassification)
            val = jnp.einsum("...itn,...jt->...ijn", Rall, ohj,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=Rall.dtype)
            k = 0
            lj1 = val[..., 0]; lj2 = val[..., 1]
            lj3 = val[..., 2]; lj4 = val[..., 3]
            k = 4
            lj5 = None
            if p.lj5 is not None:
                lj5 = val[..., k]; k += 1
            off11 = val[..., k]
            cut_ljsq = val[..., k + 1]; cutsq = val[..., k + 2]
            excl_pair = (val[..., k + 3] > 0.5) if p.excl is not None \
                else None

        in_rng = rsq < cutsq
        if p.excl is not None:
            in_rng &= ~excl_pair
        lj_m = in_rng & (rsq < cut_ljsq)
        if p.kind == "lj":
            r6inv = r2inv * r2inv * r2inv
            forcelj = r6inv * (lj1 * r6inv - lj2)
            need_philj = need_ev or p.charmm
            if need_philj:
                philj = r6inv * (lj3 * r6inv - lj4)
        else:
            forcelj, philj = _vdw_terms(
                p.kind, rsq, r2inv, lj1, lj2, lj3, lj4, lj5,
                jnp.sqrt(cut_ljsq) if p.kind == "soft" else None)
        if p.charmm_fsw:
            from lidp_tpu.ops.pair import _charmm_fsw_terms

            forcelj, philj = _charmm_fsw_terms(
                p, lj3, lj4, cut_ljsq, rsq, r2inv, forcelj)
        elif p.charmm:
            # CHARMM inner/outer energy switching, same branch as
            # _pair_terms (pair_lj_charmm_coul_long.cpp:110-125)
            switch1 = ((cut_ljsq - rsq) ** 2
                       * (cut_ljsq + 2.0 * rsq - 3.0 * p.cut_lj_innersq)
                       / p.denom_lj)
            switch2 = (12.0 * rsq * (cut_ljsq - rsq)
                       * (rsq - p.cut_lj_innersq) / p.denom_lj)
            outer = rsq > p.cut_lj_innersq
            forcelj = jnp.where(outer, forcelj * switch1 + philj * switch2,
                                forcelj)
            philj = jnp.where(outer, philj * switch1, philj)
        forcelj = jnp.where(lj_m, forcelj, 0.0)
        if need_ev:
            evdwl += jnp.sum(jnp.where(lj_m, philj - off11, 0.0))

        if coul:
            qi = ctr(qs); qj = nbr_group(qs, offs)
            cm = in_rng & (rsq < p.cut_coulsq)
            r = jnp.sqrt(rsq)
            prefactor = p.qqrd2e * qi * qj / r
            if p.coul_kind == "debye":
                screening = jnp.exp(-p.g_ewald * r)
                forcecoul = jnp.where(
                    cm, prefactor * screening * (p.g_ewald * r + 1.0), 0.0)
                if need_ev:
                    ecoul += jnp.sum(
                        jnp.where(cm, prefactor * screening, 0.0))
            elif p.coul_kind == "msm":
                from lidp_tpu.ops.pair import _msm_coul_terms

                ec_m, fc_m = _msm_coul_terms(prefactor, r, rsq,
                                             p.cut_coulsq, p.msm_order)
                forcecoul = jnp.where(cm, fc_m, 0.0)
                if need_ev:
                    ecoul += jnp.sum(jnp.where(cm, ec_m, 0.0))
            elif p.coul_kind in ("dsf", "wolf"):
                from lidp_tpu.ops.pair import _dsf_wolf_pair_terms

                ec_d, fc_d = _dsf_wolf_pair_terms(p, prefactor, r, rsq)
                forcecoul = jnp.where(cm, fc_d, 0.0)
                if need_ev:
                    ecoul += jnp.sum(jnp.where(cm, ec_d, 0.0))
            elif p.coul_kind in ("charmm", "charmm/implicit", "gromacs",
                                 "charmmfsh"):
                from lidp_tpu.ops.pair import _charmm_gromacs_coul_terms

                ec_c, fc_c = _charmm_gromacs_coul_terms(
                    p, prefactor, r, rsq, 1.0)
                forcecoul = jnp.where(cm, fc_c, 0.0)
                if need_ev:
                    ecoul += jnp.sum(jnp.where(cm, ec_c, 0.0))
            else:
                grij = p.g_ewald * r
                expm2 = jnp.exp(-grij * grij)
                t = 1.0 / (1.0 + EWALD_P * grij)
                erfc = (t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5))))
                        * expm2)
                erfc = jnp.where(p.g_ewald > 0, erfc, 1.0)  # exact coul/cut
                forcecoul = jnp.where(
                    cm, prefactor * (erfc + EWALD_F * grij * expm2), 0.0)
                if need_ev:
                    ecoul += jnp.sum(jnp.where(cm, prefactor * erfc, 0.0))
        else:
            forcecoul = 0.0

        fpair = (forcelj + forcecoul) * r2inv
        px = fpair * dx; py = fpair * dy; pz = fpair * dz
        # Newton: +f on the center atom, -f rolled back onto the neighbor
        fx += jnp.sum(px, axis=-1).reshape(aos.shape)
        fy += jnp.sum(py, axis=-1).reshape(aos.shape)
        fz += jnp.sum(pz, axis=-1).reshape(aos.shape)
        sx = jnp.sum(px, axis=-2)    # (bx,by,bz,G*cap)
        sy = jnp.sum(py, axis=-2)
        sz = jnp.sum(pz, axis=-2)
        for g, o in enumerate(offs):
            sl = slice(g * cap, (g + 1) * cap)
            fx -= _roll(sx[..., sl], o, +1)
            fy -= _roll(sy[..., sl], o, +1)
            fz -= _roll(sz[..., sl], o, +1)
        if need_ev:
            vir[0] += jnp.sum(fpair * dx * dx)
            vir[1] += jnp.sum(fpair * dy * dy)
            vir[2] += jnp.sum(fpair * dz * dz)
            vir[3] += jnp.sum(fpair * dx * dy)
            vir[4] += jnp.sum(fpair * dx * dz)
            vir[5] += jnp.sum(fpair * dy * dz)

    # slot-space -> atom-space (one O(N) gather)
    fxf = fx.reshape(-1)[cells.slot_of_atom]
    fyf = fy.reshape(-1)[cells.slot_of_atom]
    fzf = fz.reshape(-1)[cells.slot_of_atom]
    f = jnp.stack([fxf, fyf, fzf], axis=-1)
    f = jnp.where(mask[:, None], f, 0.0)
    return f, evdwl, ecoul, jnp.stack(vir)
