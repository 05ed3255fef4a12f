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


def _interpret() -> bool:
    """Run the kernels in interpret mode off-TPU so CPU tests cover them."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


# ------------------------- slot-space fused kernel --------------------------
#
# The v1 path above pays three per-step HBM taxes outside its kernel,
# measured at 32k atoms on one v5e: the slotify gather x[atom_of_slot]
# (~1.7 ms — TPU gathers run at ~1 element/cycle), 13 rolled neighbor-grid
# copies (3 coords x (C, 14*cap) ~ 12 MB), and 39 j-side roll-back copies
# whose (nbz, cap) tails tile-pad 4.65x (~0.9 ms).  The slot-space kernel
# removes all three:
#
#   * the STATE lives in cell-slot order between rebuilds (the LAMMPS
#     Atom::sort idea taken to its TPU conclusion — integration is
#     order-agnostic elementwise math; see integrate/slot_runner.py);
#   * the grid is (nbx, nby) programs; each input is one of SIX views of
#     the same (nbx,nby,nbz,cap) slot grid selected by a modular BlockSpec
#     index map ((ix+ox)%nbx, ...), and the 13 half-stencil neighbor
#     blocks are assembled in VMEM from those views with static z-rolls.
#     Periodic wrap shifts become scalar +-L adds predicated on program_id
#     (x/y) and a static first/last-row mask (z);
#   * j-side Newton partials are z-rolled in VMEM and written home through
#     ROLLED output index maps (block (ix+ox, iy+oy) per xy-view), so the
#     XLA epilogue is a single fused 6-term elementwise add.

# xy view columns of the Newton half stencil, and the z offsets each serves
_VIEWS = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
_VIEW_OZ = {(0, 0): (1,), (0, 1): (-1, 0, 1), (1, -1): (-1, 0, 1),
            (1, 0): (-1, 0, 1), (1, 1): (-1, 0, 1)}
# offset order = self, then per view in _VIEWS order (defines the fj layout)
_V2_OFFSETS = [(ox, oy, oz) for (ox, oy) in _VIEWS
               for oz in _VIEW_OZ[(ox, oy)]]


def _lj_kernel_v3(par_ref, *refs, cap, nbz, nbx, nby, K_pad, need_ev):
    # Assemble ONE concatenated (nbz, cap, 14*cap[+pad]) candidate block so
    # the lane dim is 128-aligned (per-offset (cap,cap)=(40,40) blocks
    # tile-pad 3.2x on lanes); j-side partials are then sliced per view,
    # z-rolled in VMEM and written home through rolled output index maps.
    nviews = len(_VIEWS)
    ctr = [refs[d][...].reshape(nbz, cap) for d in range(3)]
    views = [[refs[3 + 3 * v + d][...].reshape(nbz, cap) for d in range(3)]
             for v in range(nviews)]
    outs = refs[3 + 3 * nviews:]
    fi_refs = outs[0:3]
    fjv_refs = [outs[3 + 3 * v:6 + 3 * v] for v in range(nviews)]
    ev_ref = outs[3 + 3 * nviews]

    lj1, lj2 = par_ref[0], par_ref[1]
    cutsq = par_ref[5]
    L0, L1, L2 = par_ref[6], par_ref[7], par_ref[8]
    base, spacing, k0pad = par_ref[9], par_ref[10], par_ref[11]
    ix = pl.program_id(0)
    iy = pl.program_id(1)
    f32 = jnp.float32
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nbz, cap), 0)

    noff = len(_V2_OFFSETS)
    K = (1 + noff) * cap

    def assemble(d):
        blocks = [ctr[d]]
        for v, (ox, oy) in enumerate(_VIEWS):
            b0 = views[v][d]
            if d == 0 and ox == 1:
                b0 = b0 + jnp.where(ix == nbx - 1, L0, f32(0.0))
            if d == 1 and oy == 1:
                b0 = b0 + jnp.where(iy == nby - 1, L1, f32(0.0))
            if d == 1 and oy == -1:
                b0 = b0 - jnp.where(iy == 0, L1, f32(0.0))
            for oz in _VIEW_OZ[(ox, oy)]:
                b = b0 if oz == 0 else jnp.roll(b0, -oz, axis=0)
                if d == 2 and oz == 1:
                    b = b + jnp.where(zrow == nbz - 1, L2, f32(0.0))
                if d == 2 and oz == -1:
                    b = b - jnp.where(zrow == 0, L2, f32(0.0))
                blocks.append(b)
        col = jnp.concatenate(blocks, axis=1)          # (nbz, 14*cap)
        if K_pad > K:
            if d == 0:
                lanepad = base + spacing * (
                    k0pad + jax.lax.broadcasted_iota(
                        jnp.int32, (nbz, K_pad - K), 1).astype(f32))
            else:
                lanepad = jnp.zeros((nbz, K_pad - K), f32)
            col = jnp.concatenate([col, lanepad], axis=1)
        return col

    nx = assemble(0)
    ny = assemble(1)
    nz = assemble(2)

    dx = ctr[0][:, :, None] - nx[:, None, :]           # (nbz, cap, K_pad)
    dy = ctr[1][:, :, None] - ny[:, None, :]
    dz = ctr[2][:, :, None] - nz[:, None, :]
    rsq = dx * dx + dy * dy + dz * dz
    ok = rsq < cutsq
    rows = jax.lax.broadcasted_iota(jnp.int32, rsq.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, rsq.shape, 2)
    ok &= (cols >= cap) | (cols > rows)                # self-cell triangle
    rsq = jnp.where(ok, rsq, 1.0)
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    fpair = jnp.where(ok, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
    px = fpair * dx
    py = fpair * dy
    pz = fpair * dz
    for d, pv in enumerate((px, py, pz)):
        fi_refs[d][...] = jnp.sum(pv, axis=2).reshape(fi_refs[d].shape)
    fj = [-jnp.sum(pv, axis=1) for pv in (px, py, pz)]  # (nbz, K_pad)

    # j-side: self block stays home (add to fi), views roll home
    for d in range(3):
        fi_refs[d][...] = fi_refs[d][...] + \
            fj[d][:, 0:cap].reshape(fi_refs[d].shape)
    k = 1
    for v, (ox, oy) in enumerate(_VIEWS):
        for d in range(3):
            acc = jnp.zeros((nbz, cap), f32)
            kk = k
            for oz in _VIEW_OZ[(ox, oy)]:
                sl = fj[d][:, kk * cap:(kk + 1) * cap]
                acc = acc + (sl if oz == 0 else jnp.roll(sl, oz, axis=0))
                kk += 1
            fjv_refs[v][d][...] = acc.reshape(fjv_refs[v][d].shape)
        k += len(_VIEW_OZ[(ox, oy)])

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ev_ref[...] = jnp.zeros_like(ev_ref)

    if need_ev:
        lj3, lj4, off = par_ref[2], par_ref[3], par_ref[4]
        philj = jnp.where(ok, r6inv * (lj3 * r6inv - lj4) - off, 0.0)
        acc = jnp.stack([
            jnp.sum(philj), jnp.sum(px * dx), jnp.sum(py * dy),
            jnp.sum(pz * dz), jnp.sum(px * dy), jnp.sum(px * dz),
            jnp.sum(py * dz)])
        ev_ref[0, :] = ev_ref[0, :] + jnp.pad(acc, (0, 121))


def slot_lj_forces(grids, box: Box, p, need_ev: bool = True):
    """LJ forces PURELY in slot space: grids = [(nbx,nby,nbz,cap) f32 x3]
    slot coordinates (empty slots carry far-apart sentinels, see
    make_slot_state).  Returns (fgrids x3, evdwl, virial6) in slot order —
    no gathers anywhere."""
    gx = grids[0]
    nbx, nby, nbz, cap = gx.shape
    C = nbx * nby * nbz
    L = box.lengths.astype(jnp.float32)
    nviews = len(_VIEWS)
    noff = len(_V2_OFFSETS)
    K = (1 + noff) * cap
    K_pad = ((K + 127) // 128) * 128

    # pad-lane sentinels continue the slot-sentinel progression (see
    # make_slot_state / _slotify: empty slots carry base + spacing*k)
    cutf = jnp.sqrt(p.cut_ljsq[1, 1]).astype(jnp.float32)
    spacing = 2.0 * cutf + jnp.max(L) + 1.0
    corner = jnp.maximum(jnp.max(jnp.abs(box.lo.astype(jnp.float32))),
                         jnp.max(jnp.abs(box.lo.astype(jnp.float32) + L)))
    base = corner + 2.0 * cutf + spacing
    par = jnp.concatenate([
        jnp.array([p.lj1[1, 1], p.lj2[1, 1], p.lj3[1, 1], p.lj4[1, 1],
                   p.offset[1, 1], p.cut_ljsq[1, 1]], jnp.float32),
        L.reshape(3),
        jnp.stack([base, spacing, jnp.asarray(C * cap, jnp.float32)]),
    ])

    def vspec(ox, oy):
        return pl.BlockSpec(
            (1, 1, nbz, cap),
            lambda ix, iy, _ox=ox, _oy=oy: ((ix + _ox) % nbx,
                                            (iy + _oy) % nby, 0, 0),
            memory_space=pltpu.VMEM)

    spec_c = vspec(0, 0)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec_c] * 3
    operands = [par] + list(grids)
    for (ox, oy) in _VIEWS:
        sp = vspec(ox, oy)
        for d in range(3):
            in_specs.append(sp)
            operands.append(grids[d])

    gshape = jax.ShapeDtypeStruct((nbx, nby, nbz, cap), jnp.float32)
    out_specs = [spec_c] * 3
    out_shape = [gshape] * 3
    for (ox, oy) in _VIEWS:
        sp = vspec(ox, oy)          # j-forces write to the NEIGHBOR block
        out_specs += [sp] * 3
        out_shape += [gshape] * 3
    out_specs.append(pl.BlockSpec((8, 128), lambda ix, iy: (0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))

    kernel = functools.partial(_lj_kernel_v3, cap=cap, nbz=nbz, nbx=nbx,
                               nby=nby, K_pad=K_pad, need_ev=need_ev)
    outs = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=nbx * nby * nbz * cap * cap * 14 * 25,
            bytes_accessed=nbx * nby * nbz * cap * 4 * 24,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)

    fi = outs[0:3]
    ev = outs[3 + 3 * nviews]
    fgrids = []
    for d in range(3):
        tot = fi[d]
        for v in range(nviews):
            tot = tot + outs[3 + 3 * v + d]
        fgrids.append(tot)
    evs = ev[0]
    return fgrids, evs[0], evs[1:7]


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
        interpret=_interpret(),
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
