"""fix cmap — CHARMM CMAP crossterm corrections (fix_cmap.cpp).

Host setup transcribes the reference exactly: the 6 hard-coded 24x24 maps
read in file order (read_grid_map :636-783), periodic-expansion cubic
splines for the d/dphi, d/dpsi and cross derivative grids
(set_map_derivatives :839-936 with the natural-spline tridiagonal solve
:787-812), and the per-crossterm bicubic coefficient scheme (bc_coeff
:963-1006 weight matrix, bc_interpol :1009-1045).

The kernel is one vectorized pass over the (M,5) crossterm atom rows:
phi/psi from the atan2 convention in DEGREES (dihedral_angle_atan2
:939-960), modulo grid lookups, the 16x16 bicubic weight matmul, and the
explicit dE/dphi,dE/dpsi chain-rule forces of post_force :307-603
(including its asymmetric f3/f4 sign structure and the vcmap virial)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

CMAPDIM = 24
CMAPXMIN = -360.0
CMAPXMIN2 = -180.0
CMAPDX = 15.0

# bicubic interpolation weight matrix (Numerical Recipes bcucof, the
# reference's wt table, fix_cmap.cpp:966-983)
_WT = np.array([
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
    [-3, 0, 0, 3, 0, 0, 0, 0, -2, 0, 0, -1, 0, 0, 0, 0],
    [2, 0, 0, -2, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
    [0, 0, 0, 0, -3, 0, 0, 3, 0, 0, 0, 0, -2, 0, 0, -1],
    [0, 0, 0, 0, 2, 0, 0, -2, 0, 0, 0, 0, 1, 0, 0, 1],
    [-3, 3, 0, 0, -2, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, -3, 3, 0, 0, -2, -1, 0, 0],
    [9, -9, 9, -9, 6, 3, -3, -6, 6, -6, -3, 3, 4, 2, 1, 2],
    [-6, 6, -6, 6, -4, -2, 2, 4, -3, 3, 3, -3, -2, -1, -1, -2],
    [2, -2, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 2, -2, 0, 0, 1, 1, 0, 0],
    [-6, 6, -6, 6, -3, -3, 3, 3, -4, 4, 2, -2, -2, -2, -1, -1],
    [4, -4, 4, -4, 2, 2, -2, -2, 2, -2, -2, 2, 1, 1, 1, 1],
], float)


def read_grid_map(path):
    """The 6 maps in hard-coded file order (:683-689): ala, ala-pro, pro,
    pro-pro, gly, gly-pro.  Returns (6,24,24)."""
    vals = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            for tok in s.split():
                try:
                    vals.append(float(tok))
                except ValueError:
                    break
    need = 6 * CMAPDIM * CMAPDIM
    if len(vals) < need:
        raise ValueError(f"cmap file too short: {len(vals)} < {need}")
    return np.asarray(vals[:need]).reshape(6, CMAPDIM, CMAPDIM)


def _spline(y):
    """Natural cubic spline 2nd derivatives (FixCMAP::spline :787-812)."""
    n = len(y)
    ddy = np.zeros(n)
    u = np.zeros(n - 1)
    for i in range(1, n - 1):
        p = 1.0 / (ddy[i - 1] + 4.0)
        ddy[i] = -p
        u[i] = ((6.0 * y[i + 1] - 12.0 * y[i] + 6.0 * y[i - 1])
                / (CMAPDX * CMAPDX) - u[i - 1]) * p
    ddy[n - 1] = 0.0
    for j in range(n - 2, -1, -1):
        ddy[j] = ddy[j] * ddy[j + 1] + u[j]
    return ddy


def set_map_derivatives(m):
    """Periodic-expansion spline derivative grids (:839-936); m (24,24) ->
    (d1, d2, d12) each (24,24)."""
    xm = CMAPDIM // 2
    p = CMAPDIM
    two = CMAPDIM * 2
    tmap = np.zeros((two, two))
    for i in range(two):
        ii = (i + CMAPDIM - xm) % CMAPDIM
        for j in range(two):
            jj = (j + CMAPDIM - xm) % CMAPDIM
            tmap[i, j] = m[ii, jj]
    tddmap = np.stack([_spline(tmap[i]) for i in range(two)])
    d1o = np.zeros((p, p))
    d2o = np.zeros((p, p))
    d12o = np.zeros((p, p))
    tmp_y = np.zeros(two)
    tmp_dy = np.zeros(two)
    for i in range(xm, CMAPDIM + xm):
        phi = (i - xm) * CMAPDX - 180.0
        for j in range(xm, CMAPDIM + xm):
            psi = (j - xm) * CMAPDX - 180.0
            ix = int((psi - CMAPXMIN) / CMAPDX)
            a = (CMAPXMIN + (ix + 1) * CMAPDX - psi) / CMAPDX
            b = (psi - CMAPXMIN - ix * CMAPDX) / CMAPDX
            a1, b1 = a ** 3 - a, b ** 3 - b
            a2, b2 = 3.0 * a * a - 1.0, 3.0 * b * b - 1.0
            for k in range(two):
                tmp_y[k] = (a * tmap[k, ix] + b * tmap[k, ix + 1]
                            + (a1 * tddmap[k, ix] + b1 * tddmap[k, ix + 1])
                            * (CMAPDX * CMAPDX) / 6.0)
                tmp_dy[k] = ((tmap[k, ix + 1] - tmap[k, ix]) / CMAPDX
                             - a2 / 6.0 * CMAPDX * tddmap[k, ix]
                             + b2 / 6.0 * CMAPDX * tddmap[k, ix + 1])
            tmp_ddy = _spline(tmp_y)
            ix = int((phi - CMAPXMIN) / CMAPDX)
            a2 = 3.0 * ((CMAPXMIN + (ix + 1) * CMAPDX - phi)
                        / CMAPDX) ** 2 - 1.0
            b2 = 3.0 * ((phi - CMAPXMIN - ix * CMAPDX) / CMAPDX) ** 2 - 1.0
            d1y = ((tmp_y[ix + 1] - tmp_y[ix]) / CMAPDX
                   - a2 / 6.0 * CMAPDX * tmp_ddy[ix]
                   + b2 / 6.0 * CMAPDX * tmp_ddy[ix + 1])
            tmp_ddy = _spline(tmp_dy)
            a = (CMAPXMIN + (ix + 1) * CMAPDX - phi) / CMAPDX
            b = (phi - CMAPXMIN - ix * CMAPDX) / CMAPDX
            a1, b1 = a ** 3 - a, b ** 3 - b
            a2, b2 = 3.0 * a * a - 1.0, 3.0 * b * b - 1.0
            d2y = (a * tmp_dy[ix] + b * tmp_dy[ix + 1]
                   + (a1 * tmp_ddy[ix] + b1 * tmp_ddy[ix + 1])
                   * (CMAPDX * CMAPDX) / 6.0)
            d12y = ((tmp_dy[ix + 1] - tmp_dy[ix]) / CMAPDX
                    - a2 / 6.0 * CMAPDX * tmp_ddy[ix]
                    + b2 / 6.0 * CMAPDX * tmp_ddy[ix + 1])
            d1o[i % p, j % p] = d1y
            d2o[i % p, j % p] = d2y
            d12o[i % p, j % p] = d12y
    return d1o, d2o, d12o


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CMAPParams:
    atoms: jax.Array       # (M,5) int32 0-based atom indices
    ctype: jax.Array       # (M,) int32 1..6 (0 rows are skipped)
    grid: jax.Array        # (6,24,24)
    d1grid: jax.Array
    d2grid: jax.Array
    d12grid: jax.Array
    # fix_modify ID energy yes: fold ecmap into thermo PE
    energy: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)


def make_cmap_params(cmapfile, crossterms, dtype=jnp.float64,
                     energy=False) -> CMAPParams:
    """crossterms: (M,6) [type a1..a5] with 1-based atom ids."""
    grid = read_grid_map(cmapfile)
    d1 = np.zeros_like(grid)
    d2 = np.zeros_like(grid)
    d12 = np.zeros_like(grid)
    for t in range(6):
        d1[t], d2[t], d12[t] = set_map_derivatives(grid[t])
    ct = np.asarray(crossterms, int)
    if ct.size == 0:
        ct = np.zeros((1, 6), int)
    return CMAPParams(
        atoms=jnp.asarray(ct[:, 1:6] - 1, jnp.int32),
        ctype=jnp.asarray(ct[:, 0], jnp.int32),
        grid=jnp.asarray(grid, dtype), d1grid=jnp.asarray(d1, dtype),
        d2grid=jnp.asarray(d2, dtype), d12grid=jnp.asarray(d12, dtype),
        energy=energy)


def cmap_forces(x, p: CMAPParams, need_ev=True):
    """Returns (f (N,3), ecmap, virial6) — post_force :307-603 vectorized
    over crossterms.  Coordinates are used raw (bonded terms assume whole
    molecules, like the reference's unwrapped ghosts)."""
    dtype = x.dtype
    ai = p.atoms
    x1, x2, x3, x4, x5 = (x[ai[:, k]] for k in range(5))
    valid = p.ctype > 0
    t1i = jnp.clip(p.ctype - 1, 0, 5)

    vb21 = x2 - x1
    vb32 = x3 - x2
    vb34 = x3 - x4
    vb45 = x4 - x5
    vb12 = -vb21
    vb23 = -vb32
    vb43 = -vb34
    vb54 = -vb45

    a1 = jnp.cross(vb12, vb23)
    b1 = jnp.cross(vb43, vb23)
    a2 = jnp.cross(vb23, vb34)
    b2 = jnp.cross(vb45, vb43)

    r32 = jnp.sqrt(jnp.sum(vb32 * vb32, 1))
    r43 = jnp.sqrt(jnp.sum(vb43 * vb43, 1))
    a1sq = jnp.sum(a1 * a1, 1)
    b1sq = jnp.sum(b1 * b1, 1)
    a2sq = jnp.sum(a2 * a2, 1)
    b2sq = jnp.sum(b2 * b2, 1)
    valid = valid & (a1sq >= 1e-4) & (b1sq >= 1e-4) & (a2sq >= 1e-4) \
        & (b2sq >= 1e-4)
    a1sq = jnp.where(a1sq > 0, a1sq, 1.0)
    b1sq = jnp.where(b1sq > 0, b1sq, 1.0)
    a2sq = jnp.where(a2sq > 0, a2sq, 1.0)
    b2sq = jnp.where(b2sq > 0, b2sq, 1.0)
    r32 = jnp.where(r32 > 0, r32, 1.0)
    r43 = jnp.where(r43 > 0, r43, 1.0)

    dpr21r32 = jnp.sum(vb21 * vb32, 1)
    dpr34r32 = jnp.sum(vb34 * vb32, 1)
    dpr32r43 = jnp.sum(vb32 * vb43, 1)
    dpr45r43 = jnp.sum(vb45 * vb43, 1)

    rad2deg = 180.0 / jnp.pi

    def dihed(fv, av, bv, absg):
        arg1 = absg * jnp.sum(fv * bv, 1)
        arg2 = jnp.sum(av * bv, 1)
        return jnp.arctan2(arg1, arg2) * rad2deg

    phi = dihed(vb21, a1, b1, r32)
    psi = dihed(vb32, a2, b2, r43)
    phi = jnp.where(phi == 180.0, -180.0, phi)
    psi = jnp.where(psi == 180.0, -180.0, psi)
    phi1 = jnp.where(phi < 0.0, phi + 360.0, phi)
    psi1 = jnp.where(psi < 0.0, psi + 360.0, psi)

    li1 = ((phi1 + CMAPXMIN2) / CMAPDX + CMAPDIM / 2.0).astype(jnp.int32)
    li2 = ((psi1 + CMAPXMIN2) / CMAPDX + CMAPDIM / 2.0).astype(jnp.int32)
    li3 = jnp.floor((phi - CMAPXMIN2) / CMAPDX).astype(jnp.int32)
    li4 = jnp.floor((psi - CMAPXMIN2) / CMAPDX).astype(jnp.int32)
    mli3 = li3 % CMAPDIM
    mli4 = li4 % CMAPDIM
    mli31 = (li3 + 1) % CMAPDIM
    mli41 = (li4 + 1) % CMAPDIM
    mli1 = li1 % CMAPDIM
    mli2 = li2 % CMAPDIM
    mli11 = (li1 + 1) % CMAPDIM
    mli21 = (li2 + 1) % CMAPDIM

    def g4(gr, ia, ib, ia1, ib1):
        return jnp.stack([gr[t1i, ia, ib], gr[t1i, ia1, ib],
                          gr[t1i, ia1, ib1], gr[t1i, ia, ib1]], axis=-1)

    gs = g4(p.grid, mli3, mli4, mli31, mli41)
    d1gs = g4(p.d1grid, mli1, mli2, mli11, mli21)
    d2gs = g4(p.d2grid, mli1, mli2, mli11, mli21)
    d12gs = g4(p.d12grid, mli1, mli2, mli11, mli21)

    # bicubic coefficients: cij = WT @ [gs, d1*dx, d2*dx, d12*dx^2]
    xv = jnp.concatenate([gs, d1gs * CMAPDX, d2gs * CMAPDX,
                          d12gs * (CMAPDX * CMAPDX)], axis=-1)   # (M,16)
    cij = (xv @ jnp.asarray(_WT.T, dtype)).reshape(-1, 4, 4)

    # g_axis[low] = -180 + low*15 (init :168-179)
    t = (phi - (CMAPXMIN2 + li3.astype(dtype) * CMAPDX)) / CMAPDX
    uu = (psi - (CMAPXMIN2 + li4.astype(dtype) * CMAPDX)) / CMAPDX

    E = jnp.zeros_like(phi)
    dEdPhi = jnp.zeros_like(phi)
    dEdPsi = jnp.zeros_like(phi)
    for i in range(3, -1, -1):
        E = t * E + ((cij[:, i, 3] * uu + cij[:, i, 2]) * uu
                     + cij[:, i, 1]) * uu + cij[:, i, 0]
        dEdPhi = uu * dEdPhi + (3.0 * cij[:, 3, i] * t
                                + 2.0 * cij[:, 2, i]) * t + cij[:, 1, i]
        dEdPsi = t * dEdPsi + (3.0 * cij[:, i, 3] * uu
                               + 2.0 * cij[:, i, 2]) * uu + cij[:, i, 1]
    dEdPhi = dEdPhi * (rad2deg / CMAPDX)
    dEdPsi = dEdPsi * (rad2deg / CMAPDX)
    E = jnp.where(valid, E, 0.0)
    dEdPhi = jnp.where(valid, dEdPhi, 0.0)
    dEdPsi = jnp.where(valid, dEdPsi, 0.0)

    # dphi/dr and dpsi/dr (:497-530), then F = -(dE/dangle)(dangle/dr)
    c1 = (r32 / a1sq)[:, None]
    dphidr1 = c1 * a1
    dphidr2 = (-c1 * a1 - (dpr21r32 / a1sq / r32)[:, None] * a1
               + (dpr34r32 / b1sq / r32)[:, None] * b1)
    dphidr3 = ((dpr34r32 / b1sq / r32)[:, None] * b1
               - (dpr21r32 / a1sq / r32)[:, None] * a1
               - (r32 / b1sq)[:, None] * b1)
    dphidr4 = (r32 / b1sq)[:, None] * b1

    c2 = (r43 / a2sq)[:, None]
    dpsidr1 = c2 * a2
    dpsidr2 = (c2 * a2 + (dpr32r43 / a2sq / r43)[:, None] * a2
               - (dpr45r43 / b2sq / r43)[:, None] * b2)
    dpsidr3 = ((dpr45r43 / b2sq / r43)[:, None] * b2
               - (dpr32r43 / a2sq / r43)[:, None] * a2
               - (r43 / b2sq)[:, None] * b2)
    dpsidr4 = (r43 / b2sq)[:, None] * b2

    dP = dEdPhi[:, None]
    dS = dEdPsi[:, None]
    f1 = dP * dphidr1
    f2 = dP * dphidr2 + dS * dpsidr1
    f3 = -dP * dphidr3 - dS * dpsidr2
    f4 = -dP * dphidr4 - dS * dpsidr3
    f5 = -dS * dpsidr4

    f = jnp.zeros_like(x)
    f = f.at[ai[:, 0]].add(f1)
    f = f.at[ai[:, 1]].add(f2)
    f = f.at[ai[:, 2]].add(f3)
    f = f.at[ai[:, 3]].add(f4)
    f = f.at[ai[:, 4]].add(f5)

    ecmap = jnp.sum(E)
    if need_ev:
        w45 = vb54 + vb43 + vb32
        w4 = vb43 + vb32
        vir = jnp.stack([
            jnp.sum(vb12[:, 0] * f1[:, 0] + vb32[:, 0] * f3[:, 0]
                    + w4[:, 0] * f4[:, 0] + w45[:, 0] * f5[:, 0]),
            jnp.sum(vb12[:, 1] * f1[:, 1] + vb32[:, 1] * f3[:, 1]
                    + w4[:, 1] * f4[:, 1] + w45[:, 1] * f5[:, 1]),
            jnp.sum(vb12[:, 2] * f1[:, 2] + vb32[:, 2] * f3[:, 2]
                    + w4[:, 2] * f4[:, 2] + w45[:, 2] * f5[:, 2]),
            jnp.sum(vb12[:, 0] * f1[:, 1] + vb32[:, 0] * f3[:, 1]
                    + w4[:, 0] * f4[:, 1] + w45[:, 0] * f5[:, 1]),
            jnp.sum(vb12[:, 0] * f1[:, 2] + vb32[:, 0] * f3[:, 2]
                    + w4[:, 0] * f4[:, 2] + w45[:, 0] * f5[:, 2]),
            jnp.sum(vb12[:, 1] * f1[:, 2] + vb32[:, 1] * f3[:, 2]
                    + w4[:, 1] * f4[:, 2] + w45[:, 1] * f5[:, 2]),
        ])
    else:
        vir = jnp.zeros(6, dtype)
    return f, ecmap, vir
