"""Pallas O(N^2) panel kernels for the polarizable force field.

The polarization feature's hot loops are genuinely all-pairs — the
reference builds a full 3Nx3N dipole field matrix with NO cutoff on the
dipole-dipole terms (pair_lj_cut_coul_long_polarization.cpp:86,335,435) —
so the TPU path tiles the (N x N) pair panel rather than using neighbor
lists.  The XLA column-chunk scan (parallel/shard.py _scan_cols) keeps
(nloc, csz) = e.g. (12288, 2048) f32 intermediates (~100 MB each) whose
multiple reduction consumers force HBM round-trips; these kernels keep
every per-pair intermediate in VMEM for its whole lifetime:

  grid = (npad/BR, npad/BC); per program a (BR, BC) pair block computes
  minimum-image geometry -> Thole-damped tensor terms -> row-reductions,
  accumulating into (BR, 8)-packed row outputs (the column grid dimension
  revisits the same output block; TPU grid execution is sequential).

Operand packing: row-side (npad, 8) = [x y z alpha_eff q mol . .] and
column-side (8, npad) transposed likewise (+ a (8, npad) muT for dipoles)
so each kernel has 2-3 tensor operands; scalars ride an SMEM params row.
alpha_eff is alpha*mask so padding/masked atoms drop out of the polar
terms without a separate mask operand; q_eff likewise for wolf/dipole.

Kernels:
  * eind_panel    — E_ind = -T.mu, one pass per CG/Jacobi iteration
                    (...polarization.cpp:1158-1168 DipoleFieldMatrix.mu)
  * wolf_panel    — damped-shifted static field E_0
                    (...polarization.cpp:327-380)
  * dipole_panel  — charge-dipole + dipole-dipole forces, u_ef/u_dd
                    energies, pairwise virial rows
                    (...polarization.cpp:425-631)

Numerics match parallel/shard.py's _tensor_apply_chunk/_wolf_chunk/
_dipole_chunk to f32 reduction-order differences; parity is asserted in
tests/test_pallas_panel.py on the interpreter (CPU) and the sharded
suite's goldens cover the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# damping_type codes (ops/polarization.py)
_DAMP_NONE = 0
_DAMP_EXP = 1

def _blocks(npad: int, kind: str = ""):
    """Row/column block sizes: npad is always a multiple of 256
    (parallel/shard.py _pad_and_chunk); prefer 512-wide columns
    (~0.5 MB per (BR, BC) f32 intermediate) when they divide npad.
    LIDP_PANEL_BR/BC override for tuning sweeps; per-kernel variants
    (e.g. LIDP_PANEL_BC_EIND) win over the global ones — the kernels'
    VMEM footprints differ a lot (the dipole kernel holds ~30 (BR,BC)
    intermediates and OOMs scoped vmem above 256x512; eind holds ~12)."""
    import os
    suf = f"_{kind.upper()}" if kind else ""
    br = int(os.environ.get(f"LIDP_PANEL_BR{suf}",
                            os.environ.get("LIDP_PANEL_BR", "256")))
    bc = int(os.environ.get(f"LIDP_PANEL_BC{suf}",
                            os.environ.get("LIDP_PANEL_BC", "512")))
    while npad % br:
        br //= 2
    while npad % bc:
        bc //= 2
    return br, bc


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return True


def _mi(d, L, Linv):
    """Minimum image: d - L*round(d/L) with a precomputed 1/L."""
    return d - L * jnp.round(d * Linv)


def _geom_block(xr, xc, par_ref):
    """(BR,1)x(1,BC) -> minimum-image dx,dy,dz,rsq for one pair block.
    par_ref lives in SMEM: scalars must be read individually."""
    Lx, Ly, Lz = par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]
    Lix, Liy, Liz = par_ref[0, 3], par_ref[0, 4], par_ref[0, 5]
    dx = _mi(xr[:, 0:1] - xc[0:1, :], Lx, Lix)
    dy = _mi(xr[:, 1:2] - xc[1:2, :], Ly, Liy)
    dz = _mi(xr[:, 2:3] - xc[2:3, :], Lz, Liz)
    return dx, dy, dz, dx * dx + dy * dy + dz * dz


def _self_mask(br, bc, row0=None):
    """not_self over GLOBAL indices for the current (BR, BC) block.

    row0 (traced f32 scalar, usually par_ref[0, 15]): global index of the
    kernel's first ROW — nonzero when the row operand is one device's
    strip of the atom axis while columns span the full (gathered) axis
    (the multi-chip sharded panel path, parallel/shard.py).  Exact in f32
    up to 2^24 atoms."""
    gi = pl.program_id(0) * br + jax.lax.broadcasted_iota(
        jnp.int32, (br, bc), 0)
    gj = pl.program_id(1) * bc + jax.lax.broadcasted_iota(
        jnp.int32, (br, bc), 1)
    if row0 is None:
        return gi != gj
    return gi.astype(jnp.float32) + row0 != gj.astype(jnp.float32)


def _excl_mask(spr, br, bc):
    """Special-pair exclusion over GLOBAL column indices.

    spr: (BR, S) f32 — each row atom's special-neighbor global indices
    (exact in f32 up to 2^24 atoms; invalid slots hold an index of a
    masked padded atom, whose pairs contribute nothing anyway).  The LJ
    term must exclude these pairs IN-PASS: the factor-1.0-then-correct
    scheme is a catastrophic cancellation when bonded sites sit at
    sub-sigma separations (intramolecular r ~ 0.37 A gives ~1e11 kcal/mol
    pair terms; eps_f32 * 1e11 swamps the real answer)."""
    gj = (pl.program_id(1) * bc + jax.lax.broadcasted_iota(
        jnp.int32, (br, bc), 1)).astype(jnp.float32)
    excl = jnp.zeros((br, bc), jnp.bool_)
    for s in range(spr.shape[1]):
        excl |= spr[:, s:s + 1] == gj
    return excl


def _damping(r, rsq, pd, damping_type):
    """Thole damping l1, l2 (ops/polarization.py _damping_terms)."""
    if damping_type == _DAMP_EXP:
        t1 = jnp.exp(-pd * r)
        t2 = 1.0 + pd * r + 0.5 * pd * pd * rsq
        l1 = 1.0 - t1 * t2
        l2 = 1.0 - t1 * (t2 + (pd * pd * pd / 6.0) * rsq * r)
        return l1, l2
    one = jnp.ones_like(r)
    return one, one


# ------------------------------- eind ---------------------------------

def _eind_kernel(par_ref, xr_ref, xc_ref, out_ref, *, br, bc, damping_type):
    pd = par_ref[0, 6]
    xr = xr_ref[...]                     # (BR, 8)
    xc = xc_ref[...]                     # (8, BC)
    dx, dy, dz, rsq = _geom_block(xr, xc, par_ref)
    ai = xr[:, 3:4]
    aj = xc[3:4, :]
    mjx, mjy, mjz = xc[4:5, :], xc[5:6, :], xc[6:7, :]
    pm = _self_mask(br, bc, par_ref[0, 15]) & (aj != 0.0) & (ai != 0.0)
    rsq = jnp.where(pm, rsq, 1.0)
    rinv = jax.lax.rsqrt(rsq)
    r = rsq * rinv
    r2inv = rinv * rinv
    r3inv = r2inv * rinv
    r5inv = r3inv * r2inv
    l1, l2 = _damping(r, rsq, pd, damping_type)
    mdotd = mjx * dx + mjy * dy + mjz * dz
    a1 = jnp.where(pm, -3.0 * (l2 * r5inv) * mdotd, 0.0)
    a2 = jnp.where(pm, l1 * r3inv, 0.0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[:, 0] -= jnp.sum(a1 * dx + a2 * mjx, axis=1)
    out_ref[:, 1] -= jnp.sum(a1 * dy + a2 * mjy, axis=1)
    out_ref[:, 2] -= jnp.sum(a1 * dz + a2 * mjz, axis=1)


def _pack_rows(x, extra):
    """(npad, 8) row operand: [x y z] + extra columns (padded to 8)."""
    cols = [x[:, 0], x[:, 1], x[:, 2]] + list(extra)
    while len(cols) < 8:
        cols.append(jnp.zeros_like(x[:, 0]))
    return jnp.stack(cols, axis=1)


def _params_row(L, pd, *extra, row0=0):
    """Slot 15 always carries row0, the global index of the first row
    (0 for full-square panels; the device strip offset when sharded)."""
    vals = [L[0], L[1], L[2], 1.0 / L[0], 1.0 / L[1], 1.0 / L[2], pd]
    vals += list(extra)
    assert len(vals) <= 15
    while len(vals) < 15:
        vals.append(0.0)
    vals.append(jnp.asarray(row0, jnp.float32))
    return jnp.asarray(vals, jnp.float32).reshape(1, 16)


@functools.partial(jax.jit, static_argnames=("damping_type",))
def eind_panel(x, alpha_eff, mu, L, pd, *, damping_type=_DAMP_EXP,
               cols=None, row0=0):
    """E_ind = -T.mu; (nrows, 3) out.

    alpha_eff must already fold the atom mask (alpha * mask).

    Single-device: x/alpha_eff/mu span the full padded axis and the panel
    is the full square.  Sharded (parallel/shard.py): x/alpha_eff are one
    device's row strip, cols=(x_full, alpha_full, mu_full) the gathered
    column arrays, row0 the strip's global offset; mu for the ROWS is
    never read (the contraction consumes column dipoles only)."""
    nrows = x.shape[0]
    if cols is None:
        xc_, ac_, muc_ = x, alpha_eff, mu
    else:
        xc_, ac_, muc_ = cols
    npad = xc_.shape[0]
    _br, _ = _blocks(nrows, "eind")
    _, _bc = _blocks(npad, "eind")
    row = _pack_rows(x, [alpha_eff])
    col = _pack_rows(xc_, [ac_, muc_[:, 0], muc_[:, 1], muc_[:, 2]]).T
    par = _params_row(L, pd, row0=row0)
    grid = (nrows // _br, npad // _bc)
    # under jax_enable_x64 the index-map/iota scalars trace as i64, which
    # Mosaic refuses to legalize; the kernels are pure f32, so lower them
    # with x64 disabled (the mixed-precision host CG calls these from an
    # f64 build)
    with jax.enable_x64(False):
        out = _eind_call(nrows, npad, _br, _bc, damping_type,
                         grid)(par, row, col)
    return out[:, :3]


def _eind_call(nrows, npad, _br, _bc, damping_type, grid):
    return pl.pallas_call(
        functools.partial(_eind_kernel, br=_br, bc=_bc,
                          damping_type=damping_type),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nrows * npad * 45,
            bytes_accessed=npad * 8 * 4 * (2 + len(range(grid[1]))),
            transcendentals=nrows * npad,
        ),
        interpret=_interpret(),
    )


# --------------------------- df32 (f64-grade) --------------------------
#
# Mosaic has no f64; XLA's f64 emulation of these panels runs HBM-bound
# column-chunk scans (measured at 100k atoms: pair 78 s, dipole 51 s,
# eind 15 s PER PASS).  These kernels redo the same math in double-f32
# arithmetic (ops/df32.py, ~1e-13 relative) entirely in VMEM.
#
# Cross-lane reductions need df32 accuracy too: a plain f32 lane-sum of
# 512 terms costs ~1e-6 relative, far above the 1e-11 SCF regime.  The
# recursive-halving roll tree below keeps a compensation limb through
# every level (the limb's own f32 accumulation error is second-order,
# ~2^-48 of the total).

def _lane_dfsum(h, l, bc):
    """df32 sum across the lane axis: every lane ends holding the total."""
    s = bc // 2
    while s >= 1:
        hr = jnp.roll(h, s, axis=1)
        lr = jnp.roll(l, s, axis=1)
        sh, e = _d_two_sum(h, hr)
        h = sh
        l = l + lr + e
        s //= 2
    return h, l


def _d_two_sum(a, b):
    # optimization barriers: the HLO simplifier rewrites EFT patterns
    # (see ops/df32.py); Mosaic doesn't, but interpret/CPU runs do
    from lidp_tpu.ops.df32 import _B as _b
    s = _b(a + b)
    bb = _b(s - a)
    return s, (a - _b(s - bb)) + (b - bb)


def _df_const_pair(ref, i):
    """Read a df32 scalar (hi, lo) from adjacent SMEM params cells."""
    return ref[0, i], ref[0, i + 1]


def _eind_df_kernel(par_ref, xr_ref, xc_ref, out_ref, *, br, bc,
                    damping_type):
    """E_ind = -T.mu in df32 (f64-grade).  Row operand (BR, 8):
    [xh yh zh xl yl zl gate .]; column operand (16, BC):
    [xh yh zh xl yl zl gate muxh muyh muzh muxl muyl muzl . . .];
    out (BR, 8): [Exh Eyh Ezh Exl Eyl Ezl . .]."""
    from lidp_tpu.ops import df32 as dd

    xr = xr_ref[...]
    xc = xc_ref[...]
    Ld = [_df_const_pair(par_ref, 2 * k) for k in range(3)]
    Linv = [par_ref[0, 6 + k] for k in range(3)]
    pdd = _df_const_pair(par_ref, 9)

    gate_i = xr[:, 6:7]
    gate_j = xc[6:7, :]
    pm = _self_mask(br, bc) & (gate_i != 0.0) & (gate_j != 0.0)

    d = []
    for k in range(3):
        dk = dd.add((xr[:, k:k + 1], xr[:, 3 + k:4 + k]),
                    (-xc[k:k + 1, :], -xc[3 + k:4 + k, :]))
        n = jnp.round(dk[0] * Linv[k])
        dk = dd.sub(dk, dd.mul_f32(Ld[k], n))
        d.append(dk)
    rsq = dd.add(dd.add(dd.sq(d[0]), dd.sq(d[1])), dd.sq(d[2]))
    rsq = (jnp.where(pm, rsq[0], 1.0), jnp.where(pm, rsq[1], 0.0))
    rinv = dd.rsqrt(rsq)
    r2inv = dd.sq(rinv)
    r3inv = dd.mul(r2inv, rinv)
    r5inv = dd.mul(r3inv, r2inv)
    if damping_type == _DAMP_EXP:
        r = dd.mul(rsq, rinv)
        pr = dd.mul(pdd, r)
        pr2 = dd.sq(pr)
        pr3 = dd.mul(pr2, pr)
        t1 = dd.exp(dd.neg(pr))
        t2 = dd.add(dd.add(dd.const(1.0), pr),
                    dd.mul(dd.const(0.5), pr2))
        t3 = dd.add(t2, dd.mul(dd.const(1.0 / 6.0), pr3))
        l1 = dd.sub(dd.const(1.0), dd.mul(t1, t2))
        l2 = dd.sub(dd.const(1.0), dd.mul(t1, t3))
    else:
        l1 = l2 = dd.const(1.0)
    mu = [(xc[7 + k:8 + k, :], xc[10 + k:11 + k, :]) for k in range(3)]
    mdotd = dd.add(dd.add(dd.mul(mu[0], d[0]), dd.mul(mu[1], d[1])),
                   dd.mul(mu[2], d[2]))
    a1 = dd.mul(dd.mul(dd.mul(dd.const(-3.0), l2), r5inv), mdotd)
    a2 = dd.mul(l1, r3inv)
    a1 = (jnp.where(pm, a1[0], 0.0), jnp.where(pm, a1[1], 0.0))
    a2 = (jnp.where(pm, a2[0], 0.0), jnp.where(pm, a2[1], 0.0))

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for k in range(3):
        tk = dd.add(dd.mul(a1, d[k]), dd.mul(a2, mu[k]))
        sh, sl = _lane_dfsum(tk[0], tk[1], bc)
        # df32 accumulate into the output row block (E -= sum)
        cur = (out_ref[:, k], out_ref[:, 3 + k])
        s0, e0 = _d_two_sum(cur[0], -sh[:, 0])
        out_ref[:, k] = s0
        out_ref[:, 3 + k] = cur[1] + e0 - sl[:, 0]


@functools.partial(jax.jit, static_argnames=("damping_type",))
def eind_panel_df(x, alpha_eff, mu, L, pd, *, damping_type=_DAMP_EXP):
    """f64-grade E_ind = -T.mu (df32 Pallas).  x/mu/L f64 in, f64 out.

    Matches the XLA-f64 scan path (_tensor_apply_chunk) to ~1e-13 rel —
    the outer-residual accuracy the 1e-11 SCF refinement needs."""
    npad = x.shape[0]
    import os as _os
    _br = int(_os.environ.get("LIDP_PANEL_BR_EINDDF", "256"))
    _bc = int(_os.environ.get("LIDP_PANEL_BC_EINDDF", "256"))
    # df32 live set ~2x the f32 kernels'
    while npad % _br:
        _br //= 2
    while npad % _bc:
        _bc //= 2
    f64 = x.dtype

    def split(a):
        hi = a.astype(jnp.float32)
        lo = (a - hi.astype(f64)).astype(jnp.float32)
        return hi, lo

    xh, xl = split(x)
    muh, mul_ = split(mu)
    gate = (alpha_eff != 0).astype(jnp.float32)
    row = jnp.concatenate([xh, xl, gate[:, None],
                           jnp.zeros((npad, 1), jnp.float32)], axis=1)
    col = jnp.concatenate([xh, xl, gate[:, None], muh, mul_,
                           jnp.zeros((npad, 3), jnp.float32)], axis=1).T
    Lh, Ll = split(L.astype(f64))
    vals = []
    for k in range(3):
        vals += [Lh[k], Ll[k]]
    vals += list((1.0 / L.astype(f64)).astype(jnp.float32))
    pd64 = jnp.asarray(pd, f64)
    pdh = pd64.astype(jnp.float32)
    vals += [pdh, (pd64 - pdh.astype(f64)).astype(jnp.float32)]
    par = jnp.zeros((1, 16), jnp.float32)
    for i, v in enumerate(vals):
        par = par.at[0, i].set(v)
    grid = (npad // _br, npad // _bc)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_eind_df_kernel, br=_br, bc=_bc,
                              damping_type=damping_type),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, _bc), lambda r, c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=npad * npad * 1000,
                bytes_accessed=npad * 24 * 4 * 3,
                transcendentals=npad * npad,
            ),
            interpret=_interpret(),
        )(par, row, col)
    return out[:, :3].astype(f64) + out[:, 3:6].astype(f64)


def _sublane_dfsum(h, l, br):
    """df32 sum across the sublane axis (axis 0)."""
    s = br // 2
    while s >= 1:
        hr = jnp.roll(h, s, axis=0)
        lr = jnp.roll(l, s, axis=0)
        sh, e = _d_two_sum(h, hr)
        h = sh
        l = l + lr + e
        s //= 2
    return h, l


def _df_le(a, c):
    """a <= c lexicographically (== not (c < a))."""
    return ~_df_lt(c, a)


def _df_lt(a, c):
    """df32 a < c (c a df32 pair of scalars or arrays)."""
    return (a[0] < c[0]) | ((a[0] == c[0]) & (a[1] < c[1]))


def _df_where(m, a, z=0.0):
    return jnp.where(m, a[0], z), jnp.where(m, a[1], 0.0)


def _df_geometry(xr, xc, Ld, Linv):
    """Minimum-image d[3] and rsq in df32 from hi/lo packed operands
    (rows [0:3]=hi, [3:6]=lo; columns likewise)."""
    from lidp_tpu.ops import df32 as dd

    d = []
    for k in range(3):
        dk = dd.add((xr[:, k:k + 1], xr[:, 3 + k:4 + k]),
                    (-xc[k:k + 1, :], -xc[3 + k:4 + k, :]))
        n = jnp.round(dk[0] * Linv[k])
        dk = dd.sub(dk, dd.mul_f32(Ld[k], n))
        d.append(dk)
    rsq = dd.add(dd.add(dd.sq(d[0]), dd.sq(d[1])), dd.sq(d[2]))
    return d, rsq


def _df_out_accum(out_ref, col, hval, lval, bc):
    """Lane-dfsum (BR,BC) df32 terms and df-accumulate into out_ref
    columns (col: hi index, col+3: lo index)."""
    sh, sl = _lane_dfsum(hval, lval, bc)
    cur_h, cur_l = out_ref[:, col], out_ref[:, col + 3]
    s0, e0 = _d_two_sum(cur_h, sh[:, 0])
    out_ref[:, col] = s0
    out_ref[:, col + 3] = cur_l + e0 + sl[:, 0]


def _df_scalar_accum(acc_ref, idx, hval, lval, br, bc):
    """Full-block df32 reduction of (BR,BC) terms into acc_ref lanes
    (idx: hi lane, idx+8: lo lane).  (1,1) slices throughout — Mosaic
    cannot store 0-d scalars to VMEM."""
    sh, sl = _lane_dfsum(hval, lval, bc)
    th, tl = _sublane_dfsum(sh[:, 0:1], sl[:, 0:1], br)
    cur_h = acc_ref[0:1, idx:idx + 1]
    cur_l = acc_ref[0:1, idx + 8:idx + 9]
    s0, e0 = _d_two_sum(cur_h, th[0:1, 0:1])
    acc_ref[0:1, idx:idx + 1] = s0
    acc_ref[0:1, idx + 8:idx + 9] = cur_l + e0 + tl[0:1, 0:1]


def _pair_df_kernel(par_ref, rowt_ref, *refs, br, bc, t1, has_sp=False,
                    has_wolf=False):
    """f64-grade LJ + coul/long pair panel in df32 (mirrors
    _pair_terms_chunk / _pair_chunk, parallel/shard.py).

    Row/col operands (BR,16)/(16,BC): [xh(3) xl(3) type mask qh ql mol];
    rowt (BR, 8, T1): [lj3 lj4 off cut_ljsq] x (hi, lo) per ROW type;
    out (BR, 8): [fx fy fz]h + [fx fy fz]l; acc lanes: [evdwl ecoul
    vir6]h at 0..7, lo at 8..15.  has_sp: see _pair_kernel.

    has_wolf: fuse the damped-shifted Wolf static field into the same
    geometry pass (the f32 twin is _pair_wolf_kernel; the separate
    XLA-emulated-f64 wolf pass was ~30 s at 100k atoms).  mol rides row
    slot 10 / col row 10; out widens to (BR, 16) with the UNSCALED df32
    field at [e0x e0y e0z]h = cols 6..8, lo at 9..11."""
    from lidp_tpu.ops import df32 as dd
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

    if has_sp:
        spr_ref, xr_ref, xc_ref, out_ref, acc_ref = refs
    else:
        xr_ref, xc_ref, out_ref, acc_ref = refs
    xr = xr_ref[...]
    xc = xc_ref[...]
    rt = rowt_ref[...]
    Ld = [_df_const_pair(par_ref, 2 * k) for k in range(3)]
    Linv = [par_ref[0, 6 + k] for k in range(3)]
    ccsq = _df_const_pair(par_ref, 9)      # cut_coulsq
    qq = _df_const_pair(par_ref, 11)       # qqrd2e
    gew = _df_const_pair(par_ref, 13)      # g_ewald
    # cutsq_u rides par[0,15] hi-only? need pair: use lanes 15 + ... the
    # params row is (1, 32) for the df kernels
    cutsq_u = (par_ref[0, 15], par_ref[0, 16])

    tj = xc[6:7, :]
    mask_j = xc[7:8, :]
    qi = (xr[:, 8:9], xr[:, 9:10])
    qj = (xc[8:9, :], xc[9:10, :])
    pm = _self_mask(br, bc) & (mask_j != 0.0)

    hp = jax.lax.Precision.HIGHEST
    ohc = (tj == jax.lax.broadcasted_iota(
        jnp.int32, (t1, bc), 0).astype(jnp.float32)).astype(jnp.float32)

    def tab(k):
        """One-hot column select is EXACT per limb."""
        return (jnp.dot(rt[:, 2 * k, :], ohc, precision=hp,
                        preferred_element_type=jnp.float32),
                jnp.dot(rt[:, 2 * k + 1, :], ohc, precision=hp,
                        preferred_element_type=jnp.float32))

    lj3p, lj4p, offp, clj_p = tab(0), tab(1), tab(2), tab(3)

    d, rsq = _df_geometry(xr, xc, Ld, Linv)
    rsq = (jnp.where(pm, rsq[0], 1.0), jnp.where(pm, rsq[1], 0.0))
    in_range = _df_lt(rsq, cutsq_u) & pm
    lj_mask = in_range & _df_lt(rsq, clj_p)
    if has_sp:
        lj_mask &= ~_excl_mask(spr_ref[...], br, bc)
    coul_mask = in_range & _df_lt(rsq, ccsq)

    r2inv = dd.recip(rsq)
    r6inv = dd.mul(dd.mul(r2inv, r2inv), r2inv)
    forcelj = dd.mul(r6inv, dd.sub(
        dd.mul(dd.mul(dd.const(12.0), lj3p), r6inv),
        dd.mul(dd.const(6.0), lj4p)))
    evdwl = dd.sub(dd.mul(r6inv, dd.sub(dd.mul(lj3p, r6inv), lj4p)), offp)
    forcelj = _df_where(lj_mask, forcelj)
    evdwl = _df_where(lj_mask, evdwl)

    rinv = dd.rsqrt(rsq)
    r = dd.mul(rsq, rinv)
    grij = dd.mul(gew, r)
    expm2 = dd.exp(dd.neg(dd.sq(grij)))
    t = dd.recip(dd.add(dd.const(1.0), dd.mul(dd.const(EWALD_P), grij)))
    poly = dd.const(A5)
    for c in (A4, A3, A2, A1):
        poly = dd.add(dd.mul(poly, t), dd.const(c))
    erfc = dd.mul(dd.mul(t, poly), expm2)
    pref = dd.mul(dd.mul(dd.mul(qq, qi), qj), rinv)
    forcecoul = dd.mul(pref, dd.add(
        erfc, dd.mul(dd.mul(dd.const(EWALD_F), grij), expm2)))
    forcecoul = _df_where(coul_mask, forcecoul)
    ecoul = _df_where(coul_mask, dd.mul(pref, erfc))

    fpair = dd.mul(dd.add(forcecoul, forcelj), r2inv)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p3 = []
    for k in range(3):
        pk = dd.mul(fpair, d[k])
        p3.append(pk)
        _df_out_accum(out_ref, k, pk[0], pk[1], bc)

    if has_wolf:
        mi_ = xr[:, 10:11]
        mj = xc[10:11, :]
        winc = pm & _df_le(rsq, ccsq) & ((mi_ != mj) | (mi_ == 0.0))
        f_shift = dd.neg(dd.recip(ccsq))
        efq = dd.mul(dd.mul(dd.add(r2inv, f_shift), rinv), qj)
        efq = _df_where(winc, efq)
        for k in range(3):
            ek = dd.mul(efq, d[k])
            _df_out_accum(out_ref, 6 + k, ek[0], ek[1], bc)

    half = dd.const(0.5)
    _df_scalar_accum(acc_ref, 0, *dd.mul(half, evdwl), br, bc)
    _df_scalar_accum(acc_ref, 1, *dd.mul(half, ecoul), br, bc)
    w = dd.mul(half, fpair)
    vpairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    for i, (ka, kb) in enumerate(vpairs):
        vt = dd.mul(dd.mul(w, d[ka]), d[kb])
        _df_scalar_accum(acc_ref, 2 + i, vt[0], vt[1], br, bc)


def _df_params(L, f64, *extras):
    """(1, 32) SMEM params: L as hi/lo pairs (0..5), 1/L f32 (6..8),
    then extras as hi/lo pairs from index 9."""
    Lf = L.astype(f64)
    Lh = Lf.astype(jnp.float32)
    Ll = (Lf - Lh.astype(f64)).astype(jnp.float32)
    vals = []
    for k in range(3):
        vals += [Lh[k], Ll[k]]
    vals += list((1.0 / Lf).astype(jnp.float32))
    for e in extras:
        e = jnp.asarray(e, f64)
        eh = e.astype(jnp.float32)
        vals += [eh, (e - eh.astype(f64)).astype(jnp.float32)]
    par = jnp.zeros((1, 32), jnp.float32)
    for i, v in enumerate(vals):
        par = par.at[0, i].set(v)
    return par


def _df_split(a, f64):
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(f64)).astype(jnp.float32)
    return hi, lo


@jax.jit
def pair_panel_df(x, q, typef, maskf, tabs64, L, cut_coulsq, qqrd2e,
                  g_ewald, sp=None, mol=None):
    """f64-grade dense LJ+coul/long panel (df32 Pallas).  x/q/tabs f64.

    Returns (f (npad,3) f64, evdwl, ecoul, vir6) matching the XLA-f64
    scan path to ~1e-13.  tabs64: (5, T1, T1) f64 [lj3 lj4 offset
    cut_ljsq cutsq]; cutsq must be uniform over live pairs.

    mol (npad,) enables the fused Wolf static field (intermolecular
    damped-shifted sum, same geometry pass): the return gains a 5th
    element e0 (npad, 3) f64, UNSCALED (caller multiplies by
    sqrt(qqrd2e))."""
    npad = x.shape[0]
    import os as _os
    _br = int(_os.environ.get("LIDP_PANEL_BR_PAIRDF", "128"))
    _bc = int(_os.environ.get("LIDP_PANEL_BC_PAIRDF", "256"))
    while npad % _br:
        _br //= 2
    while npad % _bc:
        _bc //= 2
    f64 = x.dtype
    t1 = tabs64.shape[1]
    has_wolf = mol is not None
    xh, xl = _df_split(x, f64)
    qh, ql = _df_split(q, f64)
    tf = typef.astype(jnp.float32)
    mf = maskf.astype(jnp.float32)
    zero = jnp.zeros((npad, 1), jnp.float32)
    molf = (mol.astype(jnp.float32)[:, None] if has_wolf else zero)
    row = jnp.concatenate(
        [xh, xl, tf[:, None], mf[:, None], qh[:, None], ql[:, None],
         molf, zero, zero, zero, zero, zero], axis=1)
    col = row.T
    ti = typef.astype(jnp.int32)
    th_, tl_ = _df_split(tabs64[:4], f64)
    rowt = jnp.stack([th_[0], tl_[0], th_[1], tl_[1], th_[2], tl_[2],
                      th_[3], tl_[3]])                      # (8, T1, T1)
    rowt = jnp.transpose(jnp.take(rowt, ti, axis=1), (1, 0, 2))
    cutsq_u = jnp.max(tabs64[4])
    par = _df_params(L, f64, cut_coulsq, qqrd2e, g_ewald, cutsq_u)
    grid = (npad // _br, npad // _bc)
    has_sp = sp is not None
    sp_ops = []
    sp_specs = []
    if has_sp:
        S_ = sp.shape[1]
        sp_ops = [sp.astype(jnp.float32)]
        sp_specs = [pl.BlockSpec((_br, S_), lambda r, c: (r, 0),
                                 memory_space=pltpu.VMEM)]
    owid = 16 if has_wolf else 8
    with jax.enable_x64(False):
        out, acc = pl.pallas_call(
            functools.partial(_pair_df_kernel, br=_br, bc=_bc, t1=t1,
                              has_sp=has_sp, has_wolf=has_wolf),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 32), lambda r, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_br, 8, t1), lambda r, c: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + sp_specs + [
                pl.BlockSpec((_br, 16), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, _bc), lambda r, c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_br, owid), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda r, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((npad, owid), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=npad * npad * (1900 if has_wolf else 1600),
                bytes_accessed=npad * 48 * 4 * 3,
                transcendentals=npad * npad,
            ),
            interpret=_interpret(),
        )(par, rowt, *sp_ops, row, col)
    f = out[:, :3].astype(f64) + out[:, 3:6].astype(f64)
    a = acc[0, :8].astype(f64) + acc[0, 8:16].astype(f64)
    if has_wolf:
        e0 = out[:, 6:9].astype(f64) + out[:, 9:12].astype(f64)
        return f, a[0], a[1], a[2:8], e0
    return f, a[0], a[1], a[2:8]


def _dipole_df_kernel(par_ref, xr_ref, mur_ref, xc_ref, muc_ref,
                      out_ref, acc_ref, *, br, bc, damping_type):
    """f64-grade charge-dipole + dipole-dipole force panel in df32
    (mirrors _dipole_chunk, parallel/shard.py).

    Row/col (BR,16)/(16,BC): [xh(3) xl(3) alpha q_h mol q_l mask ...];
    mur/muc (BR,8)/(8,BC): [muh(3) mul(3) . .]; out (BR,8) f hi/lo;
    acc lanes [u_ef u_dd vir6]h 0..7, lo 8..15."""
    from lidp_tpu.ops import df32 as dd

    xr = xr_ref[...]
    xc = xc_ref[...]
    mur = mur_ref[...]
    muc = muc_ref[...]
    Ld = [_df_const_pair(par_ref, 2 * k) for k in range(3)]
    Linv = [par_ref[0, 6 + k] for k in range(3)]
    ccsq = _df_const_pair(par_ref, 9)
    sqrt_q = _df_const_pair(par_ref, 11)   # sqrt(qqrd2e) as df32
    pdd = _df_const_pair(par_ref, 13)
    f_shift = _df_const_pair(par_ref, 15)  # -1/cut_coulsq

    ai = xr[:, 6:7]
    aj = xc[6:7, :]
    qi = (xr[:, 7:8], xr[:, 9:10])
    qj = (xc[7:8, :], xc[9:10, :])
    mi_ = xr[:, 8:9]
    mj = xc[8:9, :]
    mask_j = xc[10:11, :]
    pm = _self_mask(br, bc) & (mask_j != 0.0)

    d, rsq = _df_geometry(xr, xc, Ld, Linv)
    rsq = (jnp.where(pm, rsq[0], 1.0), jnp.where(pm, rsq[1], 0.0))
    r2inv = dd.recip(rsq)
    rinv = dd.rsqrt(rsq)
    r = dd.mul(rsq, rinv)
    r3inv = dd.mul(r2inv, rinv)

    cd_mask = pm & _df_lt(rsq, ccsq) & ((mi_ != mj) | (mi_ == 0.0))
    xsq = [dd.sq(d[k]) for k in range(3)]

    def mdiag(k):
        o1, o2 = [(1, 2), (0, 2), (0, 1)][k]
        s = dd.add(xsq[o1], xsq[o2])
        return dd.add(dd.mul(dd.sub(s, dd.mul(dd.const(2.0), xsq[k])),
                             r2inv), dd.mul(f_shift, s))

    mxx, myy, mzz = mdiag(0), mdiag(1), mdiag(2)

    def moff(ka, kb):
        p = dd.mul(d[ka], d[kb])
        return dd.sub(dd.mul(dd.mul(dd.const(-3.0), p), r2inv),
                      dd.mul(f_shift, p))

    mxy, mxz, myz = moff(0, 1), moff(0, 2), moff(1, 2)
    M = [[mxx, mxy, mxz], [mxy, myy, myz], [mxz, myz, mzz]]

    ml = [(mur[:, k:k + 1], mur[:, 3 + k:4 + k]) for k in range(3)]
    mc = [(muc[k:k + 1, :], muc[3 + k:4 + k, :]) for k in range(3)]
    cf_j = _df_where(cd_mask, dd.mul(dd.mul(qj, sqrt_q), r3inv))
    cf_i = _df_where(cd_mask, dd.mul(dd.mul(qi, sqrt_q), r3inv))
    fcd = []
    for k in range(3):
        Mml = dd.add(dd.add(dd.mul(M[k][0], ml[0]),
                            dd.mul(M[k][1], ml[1])),
                     dd.mul(M[k][2], ml[2]))
        Mmc = dd.add(dd.add(dd.mul(M[k][0], mc[0]),
                            dd.mul(M[k][1], mc[1])),
                     dd.mul(M[k][2], mc[2]))
        fcd.append(dd.sub(dd.mul(cf_j, Mml), dd.mul(cf_i, Mmc)))

    ef_t = dd.mul(_df_where(
        cd_mask, dd.mul(dd.mul(dd.add(r2inv, f_shift), rinv), sqrt_q)), qj)
    u_ef_pair = dd.neg(dd.add(dd.add(
        dd.mul(dd.mul(ml[0], ef_t), d[0]),
        dd.mul(dd.mul(ml[1], ef_t), d[1])),
        dd.mul(dd.mul(ml[2], ef_t), d[2])))

    dd_mask = pm & (ai != 0.0) & (aj != 0.0)
    r5inv = dd.mul(r3inv, r2inv)
    r7inv = dd.mul(r5inv, r2inv)
    pdotp = dd.add(dd.add(dd.mul(ml[0], mc[0]), dd.mul(ml[1], mc[1])),
                   dd.mul(ml[2], mc[2]))
    pidotr = dd.add(dd.add(dd.mul(ml[0], d[0]), dd.mul(ml[1], d[1])),
                    dd.mul(ml[2], d[2]))
    pjdotr = dd.add(dd.add(dd.mul(mc[0], d[0]), dd.mul(mc[1], d[1])),
                    dd.mul(mc[2], d[2]))
    if damping_type == _DAMP_EXP:
        pr = dd.mul(pdd, r)
        pr2 = dd.sq(pr)
        t1 = dd.exp(dd.neg(pr))
        t2 = dd.add(dd.add(dd.const(1.0), pr),
                    dd.mul(dd.const(0.5), pr2))
        t3 = dd.add(t2, dd.mul(dd.const(1.0 / 6.0), dd.mul(pr2, pr)))
        om_t2 = dd.sub(dd.const(1.0), dd.mul(t1, t2))   # 1 - t1*t2
        om_t3 = dd.sub(dd.const(1.0), dd.mul(t1, t3))
        pre1 = dd.sub(
            dd.mul(dd.mul(dd.mul(dd.const(3.0), r5inv), pdotp), om_t2),
            dd.mul(dd.mul(dd.mul(dd.mul(dd.const(15.0), r7inv), pidotr),
                          pjdotr), om_t3))
        pre2 = dd.mul(dd.mul(dd.mul(dd.const(3.0), r5inv), pjdotr), om_t3)
        pre3 = dd.mul(dd.mul(dd.mul(dd.const(3.0), r5inv), pidotr), om_t3)
        # pre4 = -pdotp*r3inv*(-t1*(pd*rinv + pd^2) + t1*pd*t2*rinv)
        pdrinv = dd.mul(pdd, rinv)
        inner4 = dd.add(dd.neg(dd.mul(t1, dd.add(pdrinv, dd.sq(pdd)))),
                        dd.mul(dd.mul(dd.mul(t1, pdd), t2), rinv))
        pre4 = dd.neg(dd.mul(dd.mul(pdotp, r3inv), inner4))
        # pre5 = 3*pidotr*pjdotr*r5inv*(-t1*(pd*rinv+pd^2+0.5*r*pd^3)
        #                               + t1*pd*t3*rinv)
        inner5 = dd.add(
            dd.neg(dd.mul(t1, dd.add(dd.add(pdrinv, dd.sq(pdd)),
                                     dd.mul(dd.mul(dd.const(0.5), r),
                                            dd.mul(dd.sq(pdd), pdd))))),
            dd.mul(dd.mul(dd.mul(t1, pdd), t3), rinv))
        pre5 = dd.mul(dd.mul(dd.mul(dd.mul(dd.const(3.0), pidotr),
                                    pjdotr), r5inv), inner5)
        u_dd_pair = dd.sub(
            dd.mul(dd.mul(r3inv, pdotp), om_t2),
            dd.mul(dd.mul(dd.mul(dd.mul(dd.const(3.0), r5inv), pidotr),
                          pjdotr), om_t3))
        extra = dd.add(pre4, pre5)
    else:
        pre1 = dd.sub(
            dd.mul(dd.mul(dd.const(3.0), r5inv), pdotp),
            dd.mul(dd.mul(dd.mul(dd.const(15.0), r7inv), pidotr), pjdotr))
        pre2 = dd.mul(dd.mul(dd.const(3.0), r5inv), pjdotr)
        pre3 = dd.mul(dd.mul(dd.const(3.0), r5inv), pidotr)
        u_dd_pair = dd.sub(
            dd.mul(r3inv, pdotp),
            dd.mul(dd.mul(dd.mul(dd.const(3.0), r5inv), pidotr), pjdotr))
        extra = dd.const(0.0)
    pre1 = _df_where(dd_mask, dd.add(pre1, extra))
    pre2 = _df_where(dd_mask, pre2)
    pre3 = _df_where(dd_mask, pre3)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    fp = []
    for k in range(3):
        fk = dd.add(fcd[k],
                    dd.add(dd.add(dd.mul(pre1, d[k]), dd.mul(pre2, ml[k])),
                           dd.mul(pre3, mc[k])))
        fp.append(fk)
        _df_out_accum(out_ref, k, fk[0], fk[1], bc)

    half = dd.const(0.5)
    _df_scalar_accum(acc_ref, 0, *u_ef_pair, br, bc)
    _df_scalar_accum(acc_ref, 1,
                     *dd.mul(half, _df_where(dd_mask, u_dd_pair)), br, bc)
    vpairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    for i, (ka, kb) in enumerate(vpairs):
        vt = dd.mul(half, dd.mul(d[ka], fp[kb]))
        _df_scalar_accum(acc_ref, 2 + i, vt[0], vt[1], br, bc)


@functools.partial(jax.jit, static_argnames=("damping_type",))
def dipole_panel_df(x, q, mol, alpha_eff, mu, maskf, L, pd, cut_coulsq,
                    qqrd2e, *, damping_type=_DAMP_EXP):
    """f64-grade charge-dipole + dipole-dipole force panel (df32).

    Returns (fpol (npad,3) f64, u_ef, u_dd, vir6) matching the XLA-f64
    _dipole_chunk path to ~1e-13."""
    npad = x.shape[0]
    import os as _os
    _br = int(_os.environ.get("LIDP_PANEL_BR_DIPDF", "128"))
    _bc = int(_os.environ.get("LIDP_PANEL_BC_DIPDF", "256"))
    while npad % _br:
        _br //= 2
    while npad % _bc:
        _bc //= 2
    f64 = x.dtype
    xh, xl = _df_split(x, f64)
    qh, ql = _df_split(q, f64)
    muh, mul_ = _df_split(mu, f64)
    gate = (alpha_eff != 0).astype(jnp.float32)
    mf = maskf.astype(jnp.float32)
    molf = mol.astype(jnp.float32)
    zero = jnp.zeros((npad, 1), jnp.float32)
    row = jnp.concatenate(
        [xh, xl, gate[:, None], qh[:, None], molf[:, None], ql[:, None],
         mf[:, None], zero, zero, zero, zero, zero], axis=1)
    col = row.T
    murow = jnp.concatenate([muh, mul_, zero, zero], axis=1)
    mucol = murow.T
    cc64 = jnp.asarray(cut_coulsq, f64)
    par = _df_params(L, f64, cc64, jnp.sqrt(jnp.asarray(qqrd2e, f64)),
                     jnp.asarray(pd, f64), -1.0 / cc64)
    grid = (npad // _br, npad // _bc)
    with jax.enable_x64(False):
        out, acc = pl.pallas_call(
            functools.partial(_dipole_df_kernel, br=_br, bc=_bc,
                              damping_type=damping_type),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 32), lambda r, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((_br, 16), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, _bc), lambda r, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda r, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((npad, 8), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=npad * npad * 3000,
                bytes_accessed=npad * 48 * 4 * 4,
                transcendentals=npad * npad,
            ),
            interpret=_interpret(),
        )(par, row, murow, col, mucol)
    f = out[:, :3].astype(f64) + out[:, 3:6].astype(f64)
    a = acc[0, :8].astype(f64) + acc[0, 8:16].astype(f64)
    return f, a[0], a[1], a[2:8]


# ------------------------------- wolf ---------------------------------

def _wolf_kernel(par_ref, xr_ref, xc_ref, out_ref, *, br, bc):
    cut_coulsq = par_ref[0, 7]
    xr = xr_ref[...]
    xc = xc_ref[...]
    dx, dy, dz, rsq = _geom_block(xr, xc, par_ref)
    mi_ = xr[:, 5:6]
    mj = xc[5:6, :]
    qj = xc[4:5, :]
    mask_j = xc[3:4, :]                  # 1.0 live, 0.0 padded/masked
    include = (_self_mask(br, bc, par_ref[0, 15]) & (mask_j != 0.0)
               & (rsq <= cut_coulsq)
               & ((mi_ != mj) | (mi_ == 0.0)))
    rsq = jnp.where(include, rsq, 1.0)
    rinv = jax.lax.rsqrt(rsq)
    r2inv = rinv * rinv
    f_shift = -1.0 / cut_coulsq
    efq = jnp.where(include, (r2inv + f_shift) * rinv, 0.0) * qj

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[:, 0] += jnp.sum(efq * dx, axis=1)
    out_ref[:, 1] += jnp.sum(efq * dy, axis=1)
    out_ref[:, 2] += jnp.sum(efq * dz, axis=1)


@jax.jit
def wolf_panel(x, q, mol, maskf, L, cut_coulsq, cols=None, row0=0):
    """Damped-shifted static field E_0 (wolf sum); (nrows, 3) out.

    maskf: 1.0 for live atoms, 0.0 for padding (column gating).
    cols=(x, q, mol, maskf) full arrays + row0 for the sharded strip
    variant (see eind_panel)."""
    nrows = x.shape[0]
    if cols is None:
        xc_, qc_, molc_, mc_ = x, q, mol, maskf
    else:
        xc_, qc_, molc_, mc_ = cols
    npad = xc_.shape[0]
    _br, _ = _blocks(nrows)
    _, _bc = _blocks(npad)
    row = _pack_rows(x, [maskf, q, mol])
    col = _pack_rows(xc_, [mc_, qc_, molc_]).T
    par = _params_row(L, 0.0, cut_coulsq, row0=row0)
    grid = (nrows // _br, npad // _bc)
    out = pl.pallas_call(
        functools.partial(_wolf_kernel, br=_br, bc=_bc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nrows * npad * 30,
            bytes_accessed=npad * 8 * 4 * 3,
            transcendentals=nrows * npad // 4,
        ),
        interpret=_interpret(),
    )(par, row, col)
    return out[:, :3]


# ------------------------------ dipole --------------------------------

def _dipole_kernel(par_ref, xr_ref, mur_ref, xc_ref, muc_ref,
                   out_ref, acc_ref, *, br, bc, damping_type):
    pd = par_ref[0, 6]
    cut_coulsq = par_ref[0, 7]
    sqrt_q = par_ref[0, 8]
    xr = xr_ref[...]                     # (BR, 8): x y z alpha q mol
    xc = xc_ref[...]                     # (8, BC)
    mur = mur_ref[...]                   # (BR, 8): mux muy muz
    muc = muc_ref[...]                   # (8, BC)
    dx, dy, dz, rsq = _geom_block(xr, xc, par_ref)
    ai, qi, mi_ = xr[:, 3:4], xr[:, 4:5], xr[:, 5:6]
    aj, qj, mj = xc[3:4, :], xc[4:5, :], xc[5:6, :]
    mask_j = xc[6:7, :]
    pm = _self_mask(br, bc, par_ref[0, 15]) & (mask_j != 0.0)
    rsq = jnp.where(pm, rsq, 1.0)
    rinv = jax.lax.rsqrt(rsq)
    r = rsq * rinv
    r2inv = rinv * rinv
    r3inv = r2inv * rinv
    f_shift = -1.0 / cut_coulsq
    xsq, ysq, zsq = dx * dx, dy * dy, dz * dz

    cd_mask = pm & (rsq < cut_coulsq) & ((mi_ != mj) | (mi_ == 0.0))
    mxx = (-2.0 * xsq + ysq + zsq) * r2inv + f_shift * (ysq + zsq)
    myy = (-2.0 * ysq + xsq + zsq) * r2inv + f_shift * (xsq + zsq)
    mzz = (-2.0 * zsq + xsq + ysq) * r2inv + f_shift * (xsq + ysq)
    mxy = -3.0 * dx * dy * r2inv - f_shift * dx * dy
    mxz = -3.0 * dx * dz * r2inv - f_shift * dx * dz
    myz = -3.0 * dy * dz * r2inv - f_shift * dy * dz

    mlx, mly, mlz = mur[:, 0:1], mur[:, 1:2], mur[:, 2:3]
    mcx, mcy, mcz = muc[0:1, :], muc[1:2, :], muc[2:3, :]
    cf_j = jnp.where(cd_mask, qj * sqrt_q * r3inv, 0.0)
    cf_i = jnp.where(cd_mask, qi * sqrt_q * r3inv, 0.0)
    fcdx = cf_j * (mxx * mlx + mxy * mly + mxz * mlz) \
        - cf_i * (mxx * mcx + mxy * mcy + mxz * mcz)
    fcdy = cf_j * (mxy * mlx + myy * mly + myz * mlz) \
        - cf_i * (mxy * mcx + myy * mcy + myz * mcz)
    fcdz = cf_j * (mxz * mlx + myz * mly + mzz * mlz) \
        - cf_i * (mxz * mcx + myz * mcy + mzz * mcz)

    ef_t = jnp.where(cd_mask, (r2inv + f_shift) * rinv * sqrt_q, 0.0) * qj
    u_ef = -jnp.sum(mlx * ef_t * dx + mly * ef_t * dy + mlz * ef_t * dz)

    dd_mask = pm & (ai != 0.0) & (aj != 0.0)
    r5inv = r3inv * r2inv
    r7inv = r5inv * r2inv
    pdotp = mlx * mcx + mly * mcy + mlz * mcz
    pidotr = mlx * dx + mly * dy + mlz * dz
    pjdotr = mcx * dx + mcy * dy + mcz * dz
    if damping_type == _DAMP_EXP:
        t1 = jnp.exp(-pd * r)
        t2 = 1.0 + pd * r + 0.5 * pd * pd * rsq
        t3 = t2 + (pd * pd * pd / 6.0) * rsq * r
        pre1 = 3.0 * r5inv * pdotp * (1.0 - t1 * t2) \
            - 15.0 * r7inv * pidotr * pjdotr * (1.0 - t1 * t3)
        pre2 = 3.0 * r5inv * pjdotr * (1.0 - t1 * t3)
        pre3 = 3.0 * r5inv * pidotr * (1.0 - t1 * t3)
        pre4 = -pdotp * r3inv * (-t1 * (pd * rinv + pd * pd)
                                 + t1 * pd * t2 * rinv)
        pre5 = 3.0 * pidotr * pjdotr * r5inv * (
            -t1 * (pd * rinv + pd * pd + 0.5 * r * pd * pd * pd)
            + t1 * pd * t3 * rinv)
        u_dd_pair = r3inv * pdotp * (1.0 - t1 * t2) \
            - 3.0 * r5inv * pidotr * pjdotr * (1.0 - t1 * t3)
        extra = pre4 + pre5
    else:
        pre1 = 3.0 * r5inv * pdotp - 15.0 * r7inv * pidotr * pjdotr
        pre2 = 3.0 * r5inv * pjdotr
        pre3 = 3.0 * r5inv * pidotr
        u_dd_pair = r3inv * pdotp - 3.0 * r5inv * pidotr * pjdotr
        extra = jnp.zeros_like(pre1)
    pre1 = jnp.where(dd_mask, pre1 + extra, 0.0)
    pre2 = jnp.where(dd_mask, pre2, 0.0)
    pre3 = jnp.where(dd_mask, pre3, 0.0)
    fpx = fcdx + pre1 * dx + pre2 * mlx + pre3 * mcx
    fpy = fcdy + pre1 * dy + pre2 * mly + pre3 * mcy
    fpz = fcdz + pre1 * dz + pre2 * mlz + pre3 * mcz
    u_dd = 0.5 * jnp.sum(jnp.where(dd_mask, u_dd_pair, 0.0))

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[:, 0] += jnp.sum(fpx, axis=1)
    out_ref[:, 1] += jnp.sum(fpy, axis=1)
    out_ref[:, 2] += jnp.sum(fpz, axis=1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # pairwise virial rows (0.5 d (x) f_pair); the fdotr recombination
    # happens in the caller (shard.py computes it from fpol directly)
    acc = jnp.stack([
        u_ef, u_dd,
        0.5 * jnp.sum(dx * fpx), 0.5 * jnp.sum(dy * fpy),
        0.5 * jnp.sum(dz * fpz), 0.5 * jnp.sum(dx * fpy),
        0.5 * jnp.sum(dx * fpz), 0.5 * jnp.sum(dy * fpz)])
    acc_ref[0, :] += jnp.pad(acc, (0, 120))


@functools.partial(jax.jit, static_argnames=("damping_type",))
def dipole_panel(x, q, mol, alpha_eff, mu, maskf, L, pd, cut_coulsq,
                 qqrd2e, *, damping_type=_DAMP_EXP, cols=None, row0=0):
    """Charge-dipole + dipole-dipole forces.

    Returns (fpol (nrows,3), u_ef, u_dd, vir6_pairwise).
    cols=(x, q, mol, alpha_eff, mu, maskf) full arrays + row0 for the
    sharded strip variant (see eind_panel)."""
    nrows = x.shape[0]
    if cols is None:
        xc_, qc_, molc_, ac_, muc_, mc_ = x, q, mol, alpha_eff, mu, maskf
    else:
        xc_, qc_, molc_, ac_, muc_, mc_ = cols
    npad = xc_.shape[0]
    _br, _ = _blocks(nrows)
    _, _bc = _blocks(npad)
    row = _pack_rows(x, [alpha_eff, q, mol, maskf])
    col = _pack_rows(xc_, [ac_, qc_, molc_, mc_]).T
    murow = _pack_rows(mu, [])
    mucol = _pack_rows(muc_, []).T
    par = _params_row(L, pd, cut_coulsq, jnp.sqrt(qqrd2e), row0=row0)
    grid = (nrows // _br, npad // _bc)
    out, acc = pl.pallas_call(
        functools.partial(_dipole_kernel, br=_br, bc=_bc,
                          damping_type=damping_type),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nrows * npad * 140,
            bytes_accessed=npad * 8 * 4 * 5,
            transcendentals=nrows * npad,
        ),
        interpret=_interpret(),
    )(par, row, murow, col, mucol)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8]


# ------------------------------- pair ---------------------------------

def _pair_kernel(par_ref, rowt_ref, *refs, br, bc, t1, coul,
                 has_sp=False):
    """Dense LJ(+coul/long) pair panel (parallel/shard.py _pair_chunk).

    rowt: (npad, 4, T1) per-ROW-atom table slices [lj3, lj4, offset,
    cut_ljsq][ti] gathered OUTSIDE the kernel; per-pair values then need
    only ONE (BR,T1)@(T1,BC) one-hot matmul each (scalar gathers are
    ~1e9/step at 10k atoms; see shard.py _type_tables_mm).  cutsq is
    uniform across live type pairs for this force field (coulomb cutoff
    dominates) and rides the params row.

    has_sp: a (BR, S) special-neighbor-index operand follows rowt; those
    pairs are excluded from the LJ term in-pass (see _excl_mask) and the
    sparse host-side pass adds back factor*E exactly."""
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

    if has_sp:
        spr_ref, xr_ref, xc_ref, out_ref, acc_ref = refs
    else:
        xr_ref, xc_ref, out_ref, acc_ref = refs
    cut_coulsq = par_ref[0, 7]
    qqrd2e = par_ref[0, 8]
    g_ewald = par_ref[0, 9]
    cutsq_u = par_ref[0, 10]
    xr = xr_ref[...]                     # (BR, 8): x y z type q mask
    xc = xc_ref[...]                     # (8, BC)
    rt = rowt_ref[...]                   # (BR, 4, T1)
    dx, dy, dz, rsq = _geom_block(xr, xc, par_ref)
    tj = xc[3:4, :]
    qi = xr[:, 4:5]
    qj = xc[4:5, :]
    mask_j = xc[5:6, :]
    pm = _self_mask(br, bc, par_ref[0, 15]) & (mask_j != 0.0)

    hp = jax.lax.Precision.HIGHEST
    # Mosaic requires integer iota; cast to f32 for the comparison
    ohc = (tj == jax.lax.broadcasted_iota(
        jnp.int32, (t1, bc), 0).astype(jnp.float32)
           ).astype(jnp.float32)                             # (T1, BC)

    def tab(k):
        return jnp.dot(rt[:, k, :], ohc, precision=hp,
                       preferred_element_type=jnp.float32)    # (BR, BC)

    lj3p, lj4p, offp, cut_ljsq_p = tab(0), tab(1), tab(2), tab(3)
    rsq = jnp.where(pm, rsq, 1.0)
    in_range = (rsq < cutsq_u) & pm
    lj_mask = in_range & (rsq < cut_ljsq_p)
    if has_sp:
        lj_mask &= ~_excl_mask(spr_ref[...], br, bc)
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    forcelj = jnp.where(lj_mask,
                        r6inv * (12.0 * lj3p * r6inv - 6.0 * lj4p), 0.0)
    evdwl = jnp.where(lj_mask, r6inv * (lj3p * r6inv - lj4p) - offp, 0.0)
    if coul:
        coul_mask = in_range & (rsq < cut_coulsq)
        rinv = jax.lax.rsqrt(rsq)
        r = rsq * rinv
        grij = g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        prefactor = qqrd2e * qi * qj * rinv
        forcecoul = jnp.where(
            coul_mask, prefactor * (erfc + EWALD_F * grij * expm2), 0.0)
        ecoul = jnp.where(coul_mask, prefactor * erfc, 0.0)
    else:
        forcecoul = jnp.zeros_like(forcelj)
        ecoul = jnp.zeros_like(evdwl)
    fpair = (forcecoul + forcelj) * r2inv
    px, py, pz = fpair * dx, fpair * dy, fpair * dz

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[:, 0] += jnp.sum(px, axis=1)
    out_ref[:, 1] += jnp.sum(py, axis=1)
    out_ref[:, 2] += jnp.sum(pz, axis=1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc = jnp.stack([
        0.5 * jnp.sum(evdwl), 0.5 * jnp.sum(ecoul),
        0.5 * jnp.sum(px * dx), 0.5 * jnp.sum(py * dy),
        0.5 * jnp.sum(pz * dz), 0.5 * jnp.sum(px * dy),
        0.5 * jnp.sum(px * dz), 0.5 * jnp.sum(py * dz)])
    acc_ref[0, :] += jnp.pad(acc, (0, 120))


def _pair_wolf_kernel(par_ref, rowt_ref, *refs, br, bc, t1,
                      has_sp=False):
    """Fused LJ+coul/long pair panel + Wolf static field: ONE geometry
    pass serves both pre-SCF O(N^2) phases (the separate wolf_panel
    repeats minimum-image + rsqrt over the full panel).  Row layout
    [x y z type q mask mol]; out rows pack [fx fy fz e0x e0y e0z].
    has_sp: see _pair_kernel."""
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

    if has_sp:
        spr_ref, xr_ref, xc_ref, out_ref, acc_ref = refs
    else:
        xr_ref, xc_ref, out_ref, acc_ref = refs
    cut_coulsq = par_ref[0, 7]
    qqrd2e = par_ref[0, 8]
    g_ewald = par_ref[0, 9]
    cutsq_u = par_ref[0, 10]
    xr = xr_ref[...]
    xc = xc_ref[...]
    rt = rowt_ref[...]
    dx, dy, dz, rsq = _geom_block(xr, xc, par_ref)
    tj = xc[3:4, :]
    qi = xr[:, 4:5]
    qj = xc[4:5, :]
    mask_j = xc[5:6, :]
    mi_ = xr[:, 6:7]
    mj = xc[6:7, :]
    pm = _self_mask(br, bc, par_ref[0, 15]) & (mask_j != 0.0)

    hp = jax.lax.Precision.HIGHEST
    ohc = (tj == jax.lax.broadcasted_iota(
        jnp.int32, (t1, bc), 0).astype(jnp.float32)
           ).astype(jnp.float32)

    def tab(k):
        return jnp.dot(rt[:, k, :], ohc, precision=hp,
                       preferred_element_type=jnp.float32)

    lj3p, lj4p, offp, cut_ljsq_p = tab(0), tab(1), tab(2), tab(3)
    rsq = jnp.where(pm, rsq, 1.0)
    in_range = (rsq < cutsq_u) & pm
    lj_mask = in_range & (rsq < cut_ljsq_p)
    if has_sp:
        lj_mask &= ~_excl_mask(spr_ref[...], br, bc)
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    forcelj = jnp.where(lj_mask,
                        r6inv * (12.0 * lj3p * r6inv - 6.0 * lj4p), 0.0)
    evdwl = jnp.where(lj_mask, r6inv * (lj3p * r6inv - lj4p) - offp, 0.0)
    coul_mask = in_range & (rsq < cut_coulsq)
    rinv = jax.lax.rsqrt(rsq)
    r = rsq * rinv
    grij = g_ewald * r
    expm2 = jnp.exp(-grij * grij)
    t = 1.0 / (1.0 + EWALD_P * grij)
    erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
    prefactor = qqrd2e * qi * qj * rinv
    forcecoul = jnp.where(
        coul_mask, prefactor * (erfc + EWALD_F * grij * expm2), 0.0)
    ecoul = jnp.where(coul_mask, prefactor * erfc, 0.0)
    fpair = (forcecoul + forcelj) * r2inv
    px, py, pz = fpair * dx, fpair * dy, fpair * dz

    # Wolf damped-shifted static field (wolf_panel math, same geometry):
    # intermolecular only, <= cutoff (...polarization.cpp:327-380)
    f_shift = -1.0 / cut_coulsq
    winc = pm & (rsq <= cut_coulsq) & ((mi_ != mj) | (mi_ == 0.0))
    efq = jnp.where(winc, (r2inv + f_shift) * rinv, 0.0) * qj

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[:, 0] += jnp.sum(px, axis=1)
    out_ref[:, 1] += jnp.sum(py, axis=1)
    out_ref[:, 2] += jnp.sum(pz, axis=1)
    out_ref[:, 3] += jnp.sum(efq * dx, axis=1)
    out_ref[:, 4] += jnp.sum(efq * dy, axis=1)
    out_ref[:, 5] += jnp.sum(efq * dz, axis=1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc = jnp.stack([
        0.5 * jnp.sum(evdwl), 0.5 * jnp.sum(ecoul),
        0.5 * jnp.sum(px * dx), 0.5 * jnp.sum(py * dy),
        0.5 * jnp.sum(pz * dz), 0.5 * jnp.sum(px * dy),
        0.5 * jnp.sum(px * dz), 0.5 * jnp.sum(py * dz)])
    acc_ref[0, :] += jnp.pad(acc, (0, 120))


@jax.jit
def pair_wolf_panel(x, q, typef, mol, maskf, tabs, L, cut_coulsq, qqrd2e,
                    g_ewald, sp=None, cols=None, row0=0):
    """Fused dense LJ+coul/long pair panel + Wolf static field.

    Returns (f (nrows,3), evdwl, ecoul, vir6, e0 (nrows,3) UNSCALED — the
    caller multiplies by sqrt(qqrd2e)).  Same table contract as
    pair_panel (uniform outer cutoff).  sp (nrows, S) f32: special
    neighbor global indices to exclude from the LJ term in-pass.
    cols=(x, q, typef, mol, maskf) full arrays + row0 for the sharded
    strip variant (see eind_panel)."""
    nrows = x.shape[0]
    if cols is None:
        xc_, qc_, tc_, molc_, mc_ = x, q, typef, mol, maskf
    else:
        xc_, qc_, tc_, molc_, mc_ = cols
    npad = xc_.shape[0]
    _br, _ = _blocks(nrows)
    _, _bc = _blocks(npad)
    t1 = tabs.shape[1]
    row = _pack_rows(x, [typef, q, maskf, mol])
    col = _pack_rows(xc_, [tc_, qc_, mc_, molc_]).T
    ti = typef.astype(jnp.int32)
    rowt = jnp.transpose(jnp.take(tabs[:4], ti, axis=1), (1, 0, 2))
    cutsq_u = jnp.max(tabs[4])
    par = _params_row(L, 0.0, cut_coulsq, qqrd2e, g_ewald, cutsq_u,
                      row0=row0)
    grid = (nrows // _br, npad // _bc)
    has_sp = sp is not None
    sp_ops = []
    sp_specs = []
    if has_sp:
        S_ = sp.shape[1]
        sp_ops = [sp.astype(jnp.float32)]
        sp_specs = [pl.BlockSpec((_br, S_), lambda r, c: (r, 0),
                                 memory_space=pltpu.VMEM)]
    out, acc = pl.pallas_call(
        functools.partial(_pair_wolf_kernel, br=_br, bc=_bc, t1=t1,
                          has_sp=has_sp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 4, t1), lambda r, c: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + sp_specs + [
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nrows * npad * 100,
            bytes_accessed=npad * 8 * 4 * 4,
            transcendentals=nrows * npad,
        ),
        interpret=_interpret(),
    )(par, rowt, *sp_ops, row, col)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8], out[:, 3:6]


@functools.partial(jax.jit, static_argnames=("coul",))
def pair_panel(x, q, typef, maskf, tabs, L, cut_coulsq, qqrd2e, g_ewald,
               sp=None, cols=None, row0=0, *, coul=True):
    """Dense LJ(+coul/long) panel.  Returns (f (nrows,3), evdwl, ecoul,
    vir6) with LAMMPS half-weight tallies (factor 0.5 both sides).

    typef: atom types as f32; tabs: (5, T1, T1) f32 [lj3 lj4 offset
    cut_ljsq cutsq].  cutsq must be uniform over live pairs (asserted at
    the shard.py build site); the other four tables are gathered per ROW
    atom here so the kernel needs one one-hot matmul per table instead of
    two.  cols=(x, q, typef, maskf) full arrays + row0 for the sharded
    strip variant (see eind_panel)."""
    nrows = x.shape[0]
    if cols is None:
        xc_, qc_, tc_, mc_ = x, q, typef, maskf
    else:
        xc_, qc_, tc_, mc_ = cols
    npad = xc_.shape[0]
    _br, _ = _blocks(nrows)
    _, _bc = _blocks(npad)
    t1 = tabs.shape[1]
    row = _pack_rows(x, [typef, q, maskf])
    col = _pack_rows(xc_, [tc_, qc_, mc_]).T
    ti = typef.astype(jnp.int32)
    rowt = jnp.transpose(jnp.take(tabs[:4], ti, axis=1),
                         (1, 0, 2))                         # (nrows, 4, T1)
    cutsq_u = jnp.max(tabs[4])
    par = _params_row(L, 0.0, cut_coulsq, qqrd2e, g_ewald, cutsq_u,
                      row0=row0)
    grid = (nrows // _br, npad // _bc)
    has_sp = sp is not None
    sp_ops = []
    sp_specs = []
    if has_sp:
        S_ = sp.shape[1]
        sp_ops = [sp.astype(jnp.float32)]
        sp_specs = [pl.BlockSpec((_br, S_), lambda r, c: (r, 0),
                                 memory_space=pltpu.VMEM)]
    out, acc = pl.pallas_call(
        functools.partial(_pair_kernel, br=_br, bc=_bc, t1=t1, coul=coul,
                          has_sp=has_sp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 4, t1), lambda r, c: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + sp_specs + [
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _bc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_br, 8), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nrows * npad * 70,
            bytes_accessed=npad * 8 * 4 * 3,
            transcendentals=nrows * npad,
        ),
        interpret=_interpret(),
    )(par, rowt, *sp_ops, row, col)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8]
