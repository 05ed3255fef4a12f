"""Bonded interactions: bond styles harmonic and fene.

The reference's bonded layer (bond_harmonic.cpp, bond_fene.cpp from the
MOLECULE package) as gather/scatter tensor ops over the (NB,2) bond list —
NB ~ N, so sparse index ops are cheap here (unlike the pair loops).

fene: E = -0.5 K R0^2 ln(1-(r/R0)^2) + LJ(r<2^(1/6) sigma) + epsilon
harmonic: E = K (r - r0)^2   (LAMMPS convention: K includes the 1/2)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, min_image_box, minimum_image


def _mi(d, box):
    return min_image_box(d, box)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BondParams:
    idx: jax.Array       # (NB,2) int32 0-based atom indices
    btype: jax.Array     # (NB,) int32 1-based bond types
    # per-type coefficient tables, row 0 unused
    k: jax.Array         # (T+1,)
    r0: jax.Array        # (T+1,)  (fene: R0)
    eps: jax.Array       # (T+1,)  (fene only)
    sigma: jax.Array     # (T+1,)  (fene only)
    style: str = dataclasses.field(metadata=dict(static=True), default="harmonic")


def bond_forces(x, box: Box, p: BondParams):
    """Returns (f (N,3), ebond, virial6)."""
    n = x.shape[0]
    i = p.idx[:, 0]
    j = p.idx[:, 1]
    d = _mi(x[i] - x[j], box)      # (NB,3) — NB small
    rsq = jnp.sum(d * d, axis=1)
    k = p.k[p.btype]
    r0 = p.r0[p.btype]

    if p.style == "harmonic":
        r = jnp.sqrt(rsq)
        dr = r - r0
        rk = k * dr
        fbond = jnp.where(r > 0, -2.0 * rk / jnp.where(r > 0, r, 1.0), 0.0)
        ebond = jnp.sum(k * dr * dr)
    elif p.style == "fene":
        # bond_fene.cpp:60-95
        r0sq = r0 * r0
        rlogarg = 1.0 - rsq / r0sq
        rlogarg = jnp.maximum(rlogarg, 0.1)   # the reference warns & clamps at 0.1
        fbond = -k / rlogarg
        ebond = -0.5 * jnp.sum(k * r0sq * jnp.log(rlogarg))
        eps = p.eps[p.btype]
        sig = p.sigma[p.btype]
        sr2 = jnp.where(rsq > 0, sig * sig / jnp.where(rsq > 0, rsq, 1.0), 0.0)
        sr6 = sr2 * sr2 * sr2
        inside = rsq < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        fbond = fbond + jnp.where(inside, 48.0 * eps * sr6 * (sr6 - 0.5) / rsq, 0.0)
        ebond = ebond + jnp.sum(jnp.where(
            inside, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0))
    else:
        raise ValueError(p.style)

    fvec = fbond[:, None] * d
    f = jnp.zeros_like(x).at[i].add(fvec).at[j].add(-fvec)
    virial = jnp.stack([
        jnp.sum(fbond * d[:, 0] * d[:, 0]), jnp.sum(fbond * d[:, 1] * d[:, 1]),
        jnp.sum(fbond * d[:, 2] * d[:, 2]), jnp.sum(fbond * d[:, 0] * d[:, 1]),
        jnp.sum(fbond * d[:, 0] * d[:, 2]), jnp.sum(fbond * d[:, 1] * d[:, 2]),
    ])
    return f, ebond, virial


def special_correction_sparse(x, q, type_, sp_idx, sp_lvl, mask, box: Box, p):
    """Sparse special-bond correction for list-free pair paths (cells).

    The dense main pass treats every pair at factor 1.0; this subtracts the
    over-count for the O(N*S) special pairs.  Mirrors the shard-path
    correction; p is a PairParams.  Returns (f_corr, devdwl, decoul, dvir6).
    """
    from lidp_tpu.ops.pair import EWALD_F, EWALD_P, A1, A2, A3, A4, A5

    n = x.shape[0]
    L = box.lengths
    jvalid = sp_idx < n
    jc = jnp.minimum(sp_idx, n - 1)
    dx = minimum_image(x[:, 0:1] - x[:, 0][jc], L[0])
    dy = minimum_image(x[:, 1:2] - x[:, 1][jc], L[1])
    dz = minimum_image(x[:, 2:3] - x[:, 2][jc], L[2])
    rsq = dx * dx + dy * dy + dz * dz
    rsq = jnp.where(jvalid, rsq, 1.0)
    r2inv = 1.0 / rsq
    ti = type_[:, None]
    tj = type_[jc]
    flj = p.special_lj[sp_lvl]
    fcl = p.special_coul[sp_lvl]
    in_rng = jvalid & (rsq < p.cutsq[ti, tj]) & mask[:, None]
    lj_m = in_rng & (rsq < p.cut_ljsq[ti, tj])
    r6inv = r2inv * r2inv * r2inv
    forcelj = r6inv * (p.lj1[ti, tj] * r6inv - p.lj2[ti, tj])
    evdwl_full = (r6inv * (p.lj3[ti, tj] * r6inv - p.lj4[ti, tj])
                  - p.offset[ti, tj])
    dflj = jnp.where(lj_m, (flj - 1.0) * forcelj, 0.0)
    devd = jnp.where(lj_m, (flj - 1.0) * evdwl_full, 0.0)
    if p.coul:
        cm = in_rng & (rsq < p.cut_coulsq)
        rr = jnp.sqrt(rsq)
        prefac = p.qqrd2e * q[:, None] * q[jc] / rr
        dfc = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
        dec = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
    else:
        dfc = jnp.zeros_like(dflj)
        dec = jnp.zeros_like(devd)
    fpair_c = (dflj + dfc) * r2inv
    f = jnp.stack([jnp.sum(fpair_c * dx, axis=1),
                   jnp.sum(fpair_c * dy, axis=1),
                   jnp.sum(fpair_c * dz, axis=1)], axis=-1)
    w = 0.5 * fpair_c
    vir = jnp.stack([
        jnp.sum(w * dx * dx), jnp.sum(w * dy * dy), jnp.sum(w * dz * dz),
        jnp.sum(w * dx * dy), jnp.sum(w * dx * dz), jnp.sum(w * dy * dz)])
    return f, 0.5 * jnp.sum(devd), 0.5 * jnp.sum(dec), vir


# --------------------------- angles / dihedrals ----------------------------
#
# Multi-body bonded terms are expressed as pure energy functions of the
# min-imaged displacement vectors; forces come from jax.grad (exact, and the
# TPU-idiomatic way to avoid hand-derived force kernels), and the virial from
# the strain derivative dE/d(eps) of an affine deformation of the
# displacements (equals the standard per-term virial tally).

import dataclasses as _dc


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class AngleParams:
    idx: jax.Array      # (NA,3) int32: i-j-k with j the center
    atype: jax.Array    # (NA,) int32 1-based
    k: jax.Array        # (T+1,)
    theta0: jax.Array   # (T+1,) radians
    # charmm (angle_charmm.cpp): + Urey-Bradley K_ub (r_13 - r_ub)^2
    k_ub: jax.Array = None     # (T+1,)
    r_ub: jax.Array = None     # (T+1,)
    style: str = _dc.field(metadata=dict(static=True), default="harmonic")


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class DihedralParams:
    idx: jax.Array      # (ND,4) int32 i-j-k-l
    dtype_: jax.Array   # (ND,) int32 1-based
    # opls: k1..k4 tables; harmonic: k, d(+-1), n;
    # charmm: c1=K, c2=n, c3=d(rad), c4=weight (dihedral_charmm.cpp)
    c1: jax.Array
    c2: jax.Array
    c3: jax.Array
    c4: jax.Array
    # charmm 1-4 weighted pair term: q (N,), lj14 energy tables (T+1,T+1)
    # built from the pair style's eps14/sig14 (pair lj/charmm extract),
    # atom types (N,), and qqrd2e
    q: jax.Array = None
    lj14_3: jax.Array = None
    lj14_4: jax.Array = None
    type_: jax.Array = None
    qqrd2e: float = _dc.field(metadata=dict(static=True), default=0.0)
    style: str = _dc.field(metadata=dict(static=True), default="opls")


def _angle_energy(d1, d2, p: AngleParams):
    """d1 = x_i - x_j, d2 = x_k - x_j (angle_harmonic.cpp energy)."""
    r1 = jnp.linalg.norm(d1, axis=1)
    r2 = jnp.linalg.norm(d2, axis=1)
    c = jnp.sum(d1 * d2, axis=1) / (r1 * r2)
    c = jnp.clip(c, -1.0, 1.0)
    theta = jnp.arccos(c)
    k = p.k[p.atype]
    t0 = p.theta0[p.atype]
    e = jnp.sum(k * (theta - t0) ** 2)
    if p.style == "charmm":
        # Urey-Bradley 1-3 harmonic (angle_charmm.cpp:95-115); r13 = d2 - d1
        r13 = jnp.linalg.norm(d2 - d1, axis=1)
        kub = p.k_ub[p.atype]
        e = e + jnp.sum(kub * (r13 - p.r_ub[p.atype]) ** 2)
    return e


def _dihedral_energy(b1, b2, b3, p: DihedralParams):
    """b1 = x_j - x_i, b2 = x_k - x_j, b3 = x_l - x_k."""
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    n1n = jnp.linalg.norm(n1, axis=1)
    n2n = jnp.linalg.norm(n2, axis=1)
    cphi = jnp.sum(n1 * n2, axis=1) / jnp.maximum(n1n * n2n, 1e-30)
    cphi = jnp.clip(cphi, -1.0, 1.0)
    sphi = jnp.sum(jnp.cross(n1, n2) * b2, axis=1) / (
        jnp.maximum(n1n * n2n, 1e-30) * jnp.linalg.norm(b2, axis=1))
    phi = jnp.arctan2(sphi, cphi)
    t = p.dtype_
    if p.style == "opls":
        # E = 0.5[k1(1+cos p) + k2(1-cos 2p) + k3(1+cos 3p) + k4(1-cos 4p)]
        return 0.5 * jnp.sum(
            p.c1[t] * (1 + jnp.cos(phi)) + p.c2[t] * (1 - jnp.cos(2 * phi))
            + p.c3[t] * (1 + jnp.cos(3 * phi))
            + p.c4[t] * (1 - jnp.cos(4 * phi)))
    if p.style == "harmonic":
        # E = K[1 + d cos(n phi)]; c1=K, c2=d, c3=n
        return jnp.sum(p.c1[t] * (1 + p.c2[t] * jnp.cos(p.c3[t] * phi)))
    if p.style == "charmm":
        # E = K[1 + cos(n phi - d)] (dihedral_charmm.cpp)
        return jnp.sum(p.c1[t] * (1 + jnp.cos(p.c2[t] * phi - p.c3[t])))
    raise ValueError(p.style)


def _charmm_14_energies(d14, p: DihedralParams):
    """Weighted 1-4 LJ and Coulomb between dihedral end atoms
    (dihedral_charmm.cpp:231-268, weightflag branch; no cutoff).
    Returns (evdwl14, ecoul14) — the reference tallies these into the PAIR
    accumulators (ev_tally with evdwl/ecoul), NOT into E_dihed."""
    i1, i4 = p.idx[:, 0], p.idx[:, 3]
    w = p.c4[p.dtype_]
    rsq = jnp.sum(d14 * d14, axis=1)
    rinv = 1.0 / jnp.sqrt(rsq)
    r6inv = (rinv * rinv)**3
    t1, t4 = p.type_[i1], p.type_[i4]
    elj = r6inv * (p.lj14_3[t1, t4] * r6inv - p.lj14_4[t1, t4])
    ecoul = p.qqrd2e * p.q[i1] * p.q[i4] * rinv
    return jnp.sum(w * elj), jnp.sum(w * ecoul)


def charmm_14_forces(x, box: Box, p: DihedralParams):
    """Standalone weighted 1-4 pair term for dihedral charmm.
    Returns (f, evdwl14, ecoul14, virial6)."""
    i, l = p.idx[:, 0], p.idx[:, 3]

    def etot(xx):
        ev, ec = _charmm_14_energies(
            _mi(xx[i] - xx[l], box), p)
        return ev + ec

    def with_strain(eps_flat):
        eps = jnp.eye(3, dtype=x.dtype) + eps_flat.reshape(3, 3)
        ev, ec = _charmm_14_energies(
            _mi(x[i] - x[l], box) @ eps.T, p)
        return ev + ec

    ev, ec = _charmm_14_energies(_mi(x[i] - x[l], box), p)
    f = -jax.grad(etot)(x)
    dEdeps = jax.grad(with_strain)(jnp.zeros(9, x.dtype)).reshape(3, 3)
    w = -dEdeps
    virial = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]])
    return f, ev, ec, virial


def angle_forces(x, box: Box, p: AngleParams):
    """Returns (f, eangle, virial6) via autodiff + strain derivative."""
    i, j, k = p.idx[:, 0], p.idx[:, 1], p.idx[:, 2]

    def with_strain(eps_flat):
        eps = jnp.eye(3, dtype=x.dtype) + eps_flat.reshape(3, 3)
        d1 = _mi(x[i] - x[j], box) @ eps.T
        d2 = _mi(x[k] - x[j], box) @ eps.T
        return _angle_energy(d1, d2, p)

    e = with_strain(jnp.zeros(9, x.dtype))
    f = -jax.grad(lambda xx: _angle_energy(
        _mi(xx[i] - xx[j], box),
        _mi(xx[k] - xx[j], box), p))(x)
    dEdeps = jax.grad(with_strain)(jnp.zeros(9, x.dtype)).reshape(3, 3)
    w = -dEdeps
    virial = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]])
    return f, e, virial


def dihedral_forces(x, box: Box, p: DihedralParams):
    i, j, k, l = (p.idx[:, 0], p.idx[:, 1], p.idx[:, 2], p.idx[:, 3])

    def energy_of(xx):
        b1 = _mi(xx[j] - xx[i], box)
        b2 = _mi(xx[k] - xx[j], box)
        b3 = _mi(xx[l] - xx[k], box)
        return _dihedral_energy(b1, b2, b3, p)

    def with_strain(eps_flat):
        eps = jnp.eye(3, dtype=x.dtype) + eps_flat.reshape(3, 3)
        b1 = _mi(x[j] - x[i], box) @ eps.T
        b2 = _mi(x[k] - x[j], box) @ eps.T
        b3 = _mi(x[l] - x[k], box) @ eps.T
        return _dihedral_energy(b1, b2, b3, p)

    e = energy_of(x)
    f = -jax.grad(energy_of)(x)
    dEdeps = jax.grad(with_strain)(jnp.zeros(9, x.dtype)).reshape(3, 3)
    w = -dEdeps
    virial = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]])
    return f, e, virial


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class ImproperParams:
    idx: jax.Array      # (NI,4) int32 i-j-k-l
    itype: jax.Array    # (NI,) int32 1-based
    k: jax.Array        # (T+1,)
    chi0: jax.Array     # (T+1,) radians
    # improper_harmonic.cpp: E = K (chi - chi0)^2 with chi the i-j-k-l
    # out-of-plane angle (same geometric phi as a dihedral)


def improper_forces(x, box: Box, p: ImproperParams):
    i, j, k, l = (p.idx[:, 0], p.idx[:, 1], p.idx[:, 2], p.idx[:, 3])

    def chi_of(b1, b2, b3):
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        n1n = jnp.linalg.norm(n1, axis=1)
        n2n = jnp.linalg.norm(n2, axis=1)
        c = jnp.sum(n1 * n2, axis=1) / jnp.maximum(n1n * n2n, 1e-30)
        s = jnp.sum(jnp.cross(n1, n2) * b2, axis=1) / (
            jnp.maximum(n1n * n2n, 1e-30) * jnp.linalg.norm(b2, axis=1))
        return jnp.arctan2(s, jnp.clip(c, -1.0, 1.0))

    def energy_of(xx):
        b1 = _mi(xx[j] - xx[i], box)
        b2 = _mi(xx[k] - xx[j], box)
        b3 = _mi(xx[l] - xx[k], box)
        chi = chi_of(b1, b2, b3)
        dchi = chi - p.chi0[p.itype]
        # wrap into (-pi, pi] like the reference's acos-based branch logic
        dchi = dchi - 2 * jnp.pi * jnp.round(dchi / (2 * jnp.pi))
        return jnp.sum(p.k[p.itype] * dchi * dchi)

    def with_strain(eps_flat):
        eps = jnp.eye(3, dtype=x.dtype) + eps_flat.reshape(3, 3)
        b1 = _mi(x[j] - x[i], box) @ eps.T
        b2 = _mi(x[k] - x[j], box) @ eps.T
        b3 = _mi(x[l] - x[k], box) @ eps.T
        chi = chi_of(b1, b2, b3)
        dchi = chi - p.chi0[p.itype]
        dchi = dchi - 2 * jnp.pi * jnp.round(dchi / (2 * jnp.pi))
        return jnp.sum(p.k[p.itype] * dchi * dchi)

    e = energy_of(x)
    f = -jax.grad(energy_of)(x)
    w = -jax.grad(with_strain)(jnp.zeros(9, x.dtype)).reshape(3, 3)
    virial = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]])
    return f, e, virial
