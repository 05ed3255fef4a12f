"""Tiled Pallas LJ cell-pair kernel — the speed-of-light path for bench/in.lj.

Why the XLA roll kernel (ops/cells.py) is memory-bound: the broadcasted
(cells, cap, G*cap) candidate blocks are consumed by several reductions
(i-side force, j-side force, energy, virial), and XLA materializes them in
HBM between fusions (~150 MB per intermediate at 32k atoms).  This kernel
keeps each (cap, K) candidate block in VMEM for its whole lifetime:

  * precompute (cheap, O(slots)): slotified coordinates with *unique
    far-away sentinels* for empty slots (no validity masks in the kernel),
    and the 13 half-stencil neighbor grids pre-rolled with the periodic
    image shift folded into the coordinates (no minimum-image in the
    kernel);
  * kernel: grid over cell rows; per program a (BC, cap, K) block computes
    rsq -> LJ force once per pair (Newton), reduces the i-side over K and
    the j-side over cap, optionally tallies evdwl + virial;
  * post (cheap): roll the 13 j-side partial grids back home, one O(N)
    gather from slot space to atom order.

Reference hot loop analog: npair_half_bin_newton.cpp:36 + pair_lj_cut.cpp
compute.  Single LJ type, no coulomb (the polar/coulomb systems use the
dense/sharded paths); falls back to ops/cells.py otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidp_tpu.box import Box
from lidp_tpu.ops.cells import _HALF_OFFSETS, Cells


def _wrap_shift_np(nbins, off):
    """Per-cell coordinate shift (in box lengths) the periodic roll implies."""
    idx = np.indices(nbins)  # (3, nbx, nby, nbz)
    out = []
    for ax, o in enumerate(off):
        n = nbins[ax]
        s = np.zeros(nbins, np.float32)
        if o:
            s[...] = ((idx[ax] + o) >= n).astype(np.float32) - \
                     ((idx[ax] + o) < 0).astype(np.float32)
        out.append(s)
    return np.stack(out)  # (3, nbx, nby, nbz): -1/0/+1 per dim


@functools.lru_cache(maxsize=None)
def _shift_table(nbins):
    """(13, 3, cells) static wrap shifts for the half stencil.

    Cached as numpy (a jnp constant would leak tracers across jit traces)."""
    t = np.stack([_wrap_shift_np(nbins, o) for o in _HALF_OFFSETS])
    return t.reshape(len(_HALF_OFFSETS), 3, -1)


def _lj_kernel(par_ref, cx_ref, cy_ref, cz_ref, nx_ref, ny_ref, nz_ref,
               fix_ref, fiy_ref, fiz_ref, fjx_ref, fjy_ref, fjz_ref, ev_ref,
               *, cap, need_ev):
    lj1 = par_ref[0]
    lj2 = par_ref[1]
    cutsq = par_ref[5]
    dx = cx_ref[...][:, :, None] - nx_ref[...][:, None, :]   # (BC, cap, K)
    dy = cy_ref[...][:, :, None] - ny_ref[...][:, None, :]
    dz = cz_ref[...][:, :, None] - nz_ref[...][:, None, :]
    rsq = dx * dx + dy * dy + dz * dz
    ok = rsq < cutsq
    # self cell occupies the first `cap` columns: strict upper triangle
    rows = jax.lax.broadcasted_iota(jnp.int32, rsq.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, rsq.shape, 2)
    ok &= (cols >= cap) | (cols > rows)
    rsq = jnp.where(ok, rsq, 1.0)
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    fpair = jnp.where(ok, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
    px = fpair * dx
    py = fpair * dy
    pz = fpair * dz
    fix_ref[...] = jnp.sum(px, axis=2)
    fiy_ref[...] = jnp.sum(py, axis=2)
    fiz_ref[...] = jnp.sum(pz, axis=2)
    fjx_ref[...] = -jnp.sum(px, axis=1)
    fjy_ref[...] = -jnp.sum(py, axis=1)
    fjz_ref[...] = -jnp.sum(pz, axis=1)
    # ev accumulator block is shared across the (sequential) grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        ev_ref[...] = jnp.zeros_like(ev_ref)

    if need_ev:
        lj3 = par_ref[2]
        lj4 = par_ref[3]
        off = par_ref[4]
        philj = jnp.where(ok, r6inv * (lj3 * r6inv - lj4) - off, 0.0)
        acc = jnp.stack([
            jnp.sum(philj), jnp.sum(px * dx), jnp.sum(py * dy),
            jnp.sum(pz * dz), jnp.sum(px * dy), jnp.sum(px * dz),
            jnp.sum(py * dz)])
        ev_ref[0, :] = ev_ref[0, :] + jnp.pad(acc, (0, 121))


def supported(p, ntypes_gt_one: bool, coul: bool) -> bool:
    return (not ntypes_gt_one) and (not coul) and (not p.charmm)


def cell_pair_forces_pallas(x, mask, cells: Cells, box: Box, p,
                            need_ev: bool = True):
    """Drop-in LJ replacement for cell_pair_forces (single type, no coul)."""
    n = x.shape[0]
    aos = cells.atom_of_slot
    nbins = aos.shape[:3]
    cap = aos.shape[-1]
    C = int(np.prod(nbins))
    noff = len(_HALF_OFFSETS)
    K = (1 + noff) * cap
    K_pad = ((K + 127) // 128) * 128
    L = box.lengths.astype(jnp.float32)

    amax = jnp.minimum(aos, n - 1)
    valid = (aos < n).reshape(C, cap)
    # Empty-slot sentinels live on ONE arithmetic x-axis progression
    # base + spacing*k with distinct k per slot.  spacing > 2*cut + max(L)
    # guarantees (a) sentinel-sentinel distance >= spacing - max(L) > cut
    # even when a periodic roll adds +-L to one of them, and (b) with
    # base > |box| + cut, sentinel-atom distance > cut.  All traced — no
    # fixed 10.0 spacing that a large real/metal-units cutoff could defeat.
    cutf = jnp.sqrt(p.cut_ljsq[1, 1]).astype(jnp.float32)
    spacing = 2.0 * cutf + jnp.max(L) + 1.0
    corner = jnp.maximum(jnp.max(jnp.abs(box.lo.astype(jnp.float32))),
                         jnp.max(jnp.abs(box.lo.astype(jnp.float32) + L)))
    base = corner + 2.0 * cutf + spacing
    lin = jnp.arange(C * cap, dtype=jnp.float32).reshape(C, cap)
    sent = base + spacing * lin
    k_next = C * cap   # next free sentinel index

    def slotgrid(vals, d):
        g = vals.astype(jnp.float32)[amax].reshape(C, cap)
        pad = sent if d == 0 else jnp.zeros_like(g)
        return jnp.where(valid, g, pad)

    ctr = [slotgrid(x[:, d], d) for d in range(3)]

    # neighbor grids: self + 13 pre-rolled/pre-shifted copies, concatenated
    # along the lane axis; padded lanes get their own distant sentinels
    shifts = _shift_table(nbins)  # (13, 3, C)
    nbr = []
    for d in range(3):
        g4 = ctr[d].reshape(*nbins, cap)
        blocks = [ctr[d]]
        for i, off in enumerate(_HALF_OFFSETS):
            r = g4
            for ax, sh in enumerate(off):
                if sh:
                    r = jnp.roll(r, -sh, axis=ax)
            blocks.append(r.reshape(C, cap)
                          + jnp.asarray(shifts[i, d])[:, None] * L[d])
        col = jnp.concatenate(blocks, axis=1)
        if K_pad > K:
            if d == 0:
                padlane = jnp.broadcast_to(
                    base + spacing * (
                        k_next
                        + jnp.arange(K_pad - K, dtype=jnp.float32)),
                    (C, K_pad - K))
            else:
                padlane = jnp.zeros((C, K_pad - K), jnp.float32)
            col = jnp.concatenate([col, padlane], axis=1)
        nbr.append(col)
    k_next += K_pad - K

    # pad the cell axis so the block leading dim divides by 8 (Mosaic
    # requires last-two block dims to be (8k, 128k) or full); padded cells
    # hold only sentinel slots and contribute nothing
    BC = 8
    C_pad = ((C + BC - 1) // BC) * BC
    if C_pad > C:
        rpad = C_pad - C
        csent = (base + spacing * (
            k_next + jnp.arange(rpad * cap, dtype=jnp.float32))
                 ).reshape(rpad, cap)
        k_next += rpad * cap
        ctr[0] = jnp.concatenate([ctr[0], csent], axis=0)
        nsent = jnp.broadcast_to(
            base + spacing * (
                k_next + jnp.arange(K_pad, dtype=jnp.float32)),
            (rpad, K_pad))
        nbr[0] = jnp.concatenate([nbr[0], nsent], axis=0)
        for d in (1, 2):
            ctr[d] = jnp.pad(ctr[d], ((0, rpad), (0, 0)))
            nbr[d] = jnp.pad(nbr[d], ((0, rpad), (0, 0)))
    grid = (C_pad // BC,)
    par = jnp.array([p.lj1[1, 1], p.lj2[1, 1], p.lj3[1, 1], p.lj4[1, 1],
                     p.offset[1, 1], p.cut_ljsq[1, 1]], jnp.float32)
    kernel = functools.partial(_lj_kernel, cap=cap, need_ev=need_ev)
    spec_c = pl.BlockSpec((BC, cap), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((BC, K_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    fix, fiy, fiz, fjx, fjy, fjz, ev = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec_c, spec_c, spec_c, spec_n, spec_n, spec_n],
        out_specs=[spec_c, spec_c, spec_c, spec_n, spec_n, spec_n,
                   pl.BlockSpec((8, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((C_pad, cap), jnp.float32)] * 3 +
                  [jax.ShapeDtypeStruct((C_pad, K_pad), jnp.float32)] * 3 +
                  [jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=C_pad * cap * K_pad * 25,
            bytes_accessed=(C_pad * cap * 4 + C_pad * K_pad * 4) * 8,
            transcendentals=0,
        ),
    )(par, ctr[0], ctr[1], ctr[2], nbr[0], nbr[1], nbr[2])

    # j-side partials roll back home
    fs = []
    for d, (fi, fj) in enumerate(zip((fix, fiy, fiz), (fjx, fjy, fjz))):
        fi, fj = fi[:C], fj[:C]
        tot = fi + fj[:, :cap]
        fj4 = fj[:, cap:K].reshape(*nbins, noff, cap)
        for i, off in enumerate(_HALF_OFFSETS):
            r = fj4[..., i, :]
            for ax, sh in enumerate(off):
                if sh:
                    r = jnp.roll(r, sh, axis=ax)
            tot = tot + r.reshape(C, cap)
        fs.append(tot.reshape(C * cap))

    f = jnp.stack([fs[0][cells.slot_of_atom],
                   fs[1][cells.slot_of_atom],
                   fs[2][cells.slot_of_atom]], axis=-1)
    f = jnp.where(mask[:, None], f, 0.0).astype(x.dtype)
    evs = ev[0]
    dtype = x.dtype
    evdwl = evs[0].astype(dtype)
    vir = evs[1:7].astype(dtype)
    return f, evdwl, jnp.zeros((), dtype), vir
