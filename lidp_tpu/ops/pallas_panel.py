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

def _blocks(npad: int):
    """Row/column block sizes: npad is always a multiple of 256
    (parallel/shard.py _pad_and_chunk); prefer 512-wide columns
    (~0.5 MB per (BR, BC) f32 intermediate) when they divide npad.
    LIDP_PANEL_BR/BC override for tuning sweeps."""
    import os
    br = int(os.environ.get("LIDP_PANEL_BR", "256"))
    bc = int(os.environ.get("LIDP_PANEL_BC", "512"))
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


def _self_mask(br, bc):
    """not_self over GLOBAL indices for the current (BR, BC) block."""
    gi = pl.program_id(0) * br + jax.lax.broadcasted_iota(
        jnp.int32, (br, bc), 0)
    gj = pl.program_id(1) * bc + jax.lax.broadcasted_iota(
        jnp.int32, (br, bc), 1)
    return gi != gj


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
    pm = _self_mask(br, bc) & (aj != 0.0) & (ai != 0.0)
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


def _params_row(L, pd, *extra):
    vals = [L[0], L[1], L[2], 1.0 / L[0], 1.0 / L[1], 1.0 / L[2], pd]
    vals += list(extra)
    while len(vals) < 16:
        vals.append(0.0)
    return jnp.asarray(vals, jnp.float32).reshape(1, 16)


@functools.partial(jax.jit, static_argnames=("damping_type",))
def eind_panel(x, alpha_eff, mu, L, pd, *, damping_type=_DAMP_EXP):
    """E_ind = -T.mu over the full (npad, npad) panel; (npad, 3) out.

    alpha_eff must already fold the atom mask (alpha * mask)."""
    npad = x.shape[0]
    _br, _bc = _blocks(npad)
    row = _pack_rows(x, [alpha_eff])
    col = _pack_rows(x, [alpha_eff, mu[:, 0], mu[:, 1], mu[:, 2]]).T
    par = _params_row(L, pd)
    grid = (npad // _br, npad // _bc)
    # under jax_enable_x64 the index-map/iota scalars trace as i64, which
    # Mosaic refuses to legalize; the kernels are pure f32, so lower them
    # with x64 disabled (the mixed-precision host CG calls these from an
    # f64 build)
    with jax.enable_x64(False):
        out = _eind_call(npad, _br, _bc, damping_type, grid)(par, row, col)
    return out[:, :3]


def _eind_call(npad, _br, _bc, damping_type, grid):
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
        out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=npad * npad * 45,
            bytes_accessed=npad * 8 * 4 * (2 + len(range(grid[1]))),
            transcendentals=npad * npad,
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
    _br, _bc = 256, 256          # df32 live set ~2x the f32 kernels'
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
    include = (_self_mask(br, bc) & (mask_j != 0.0)
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
def wolf_panel(x, q, mol, maskf, L, cut_coulsq):
    """Damped-shifted static field E_0 (wolf sum); (npad, 3) out.

    maskf: 1.0 for live atoms, 0.0 for padding (column gating)."""
    npad = x.shape[0]
    _br, _bc = _blocks(npad)
    row = _pack_rows(x, [maskf, q, mol])
    col = _pack_rows(x, [maskf, q, mol]).T
    par = _params_row(L, 0.0, cut_coulsq)
    grid = (npad // _br, npad // _bc)
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
        out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=npad * npad * 30,
            bytes_accessed=npad * 8 * 4 * 3,
            transcendentals=npad * npad // 4,
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
    pm = _self_mask(br, bc) & (mask_j != 0.0)
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
                 qqrd2e, *, damping_type=_DAMP_EXP):
    """Charge-dipole + dipole-dipole forces.

    Returns (fpol (npad,3), u_ef, u_dd, vir6_pairwise)."""
    npad = x.shape[0]
    _br, _bc = _blocks(npad)
    row = _pack_rows(x, [alpha_eff, q, mol, maskf])
    col = row.T
    murow = _pack_rows(mu, [])
    mucol = murow.T
    par = _params_row(L, pd, cut_coulsq, jnp.sqrt(qqrd2e))
    grid = (npad // _br, npad // _bc)
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
            jax.ShapeDtypeStruct((npad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=npad * npad * 140,
            bytes_accessed=npad * 8 * 4 * 5,
            transcendentals=npad * npad,
        ),
        interpret=_interpret(),
    )(par, row, murow, col, mucol)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8]


# ------------------------------- pair ---------------------------------

def _pair_kernel(par_ref, rowt_ref, xr_ref, xc_ref, out_ref, acc_ref,
                 *, br, bc, t1, coul):
    """Dense LJ(+coul/long) pair panel (parallel/shard.py _pair_chunk).

    rowt: (npad, 4, T1) per-ROW-atom table slices [lj3, lj4, offset,
    cut_ljsq][ti] gathered OUTSIDE the kernel; per-pair values then need
    only ONE (BR,T1)@(T1,BC) one-hot matmul each (scalar gathers are
    ~1e9/step at 10k atoms; see shard.py _type_tables_mm).  cutsq is
    uniform across live type pairs for this force field (coulomb cutoff
    dominates) and rides the params row."""
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

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
    pm = _self_mask(br, bc) & (mask_j != 0.0)

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


def _pair_wolf_kernel(par_ref, rowt_ref, xr_ref, xc_ref, out_ref, acc_ref,
                      *, br, bc, t1):
    """Fused LJ+coul/long pair panel + Wolf static field: ONE geometry
    pass serves both pre-SCF O(N^2) phases (the separate wolf_panel
    repeats minimum-image + rsqrt over the full panel).  Row layout
    [x y z type q mask mol]; out rows pack [fx fy fz e0x e0y e0z]."""
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

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
    pm = _self_mask(br, bc) & (mask_j != 0.0)

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
                    g_ewald):
    """Fused dense LJ+coul/long pair panel + Wolf static field.

    Returns (f (npad,3), evdwl, ecoul, vir6, e0 (npad,3) UNSCALED — the
    caller multiplies by sqrt(qqrd2e)).  Same table contract as
    pair_panel (uniform outer cutoff)."""
    npad = x.shape[0]
    _br, _bc = _blocks(npad)
    t1 = tabs.shape[1]
    row = _pack_rows(x, [typef, q, maskf, mol])
    col = row.T
    ti = typef.astype(jnp.int32)
    rowt = jnp.transpose(jnp.take(tabs[:4], ti, axis=1), (1, 0, 2))
    cutsq_u = jnp.max(tabs[4])
    par = _params_row(L, 0.0, cut_coulsq, qqrd2e, g_ewald, cutsq_u)
    grid = (npad // _br, npad // _bc)
    out, acc = pl.pallas_call(
        functools.partial(_pair_wolf_kernel, br=_br, bc=_bc, t1=t1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 4, t1), lambda r, c: (r, 0, 0),
                         memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((npad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=npad * npad * 100,
            bytes_accessed=npad * 8 * 4 * 4,
            transcendentals=npad * npad,
        ),
        interpret=_interpret(),
    )(par, rowt, row, col)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8], out[:, 3:6]


@functools.partial(jax.jit, static_argnames=("coul",))
def pair_panel(x, q, typef, maskf, tabs, L, cut_coulsq, qqrd2e, g_ewald,
               *, coul=True):
    """Dense LJ(+coul/long) panel.  Returns (f (npad,3), evdwl, ecoul,
    vir6) with LAMMPS half-weight tallies (factor 0.5 both sides).

    typef: atom types as f32; tabs: (5, T1, T1) f32 [lj3 lj4 offset
    cut_ljsq cutsq].  cutsq must be uniform over live pairs (asserted at
    the shard.py build site); the other four tables are gathered per ROW
    atom here so the kernel needs one one-hot matmul per table instead of
    two."""
    npad = x.shape[0]
    _br, _bc = _blocks(npad)
    t1 = tabs.shape[1]
    row = _pack_rows(x, [typef, q, maskf])
    col = row.T
    ti = typef.astype(jnp.int32)
    rowt = jnp.transpose(jnp.take(tabs[:4], ti, axis=1),
                         (1, 0, 2))                         # (npad, 4, T1)
    cutsq_u = jnp.max(tabs[4])
    par = _params_row(L, 0.0, cut_coulsq, qqrd2e, g_ewald, cutsq_u)
    grid = (npad // _br, npad // _bc)
    out, acc = pl.pallas_call(
        functools.partial(_pair_kernel, br=_br, bc=_bc, t1=t1, coul=coul),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_br, 4, t1), lambda r, c: (r, 0, 0),
                         memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((npad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=npad * npad * 70,
            bytes_accessed=npad * 8 * 4 * 3,
            transcendentals=npad * npad,
        ),
        interpret=_interpret(),
    )(par, rowt, row, col)
    a = acc[0]
    return out[:, :3], a[0], a[1], a[2:8]
