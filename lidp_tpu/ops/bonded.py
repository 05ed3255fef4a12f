"""Bonded interactions: the MOLECULE-package bond/angle/dihedral/improper
style families as gather/scatter tensor ops over the term lists — counts
are ~N, so sparse index ops are cheap here (unlike the pair loops).

Bond styles (bond_*.cpp): harmonic, fene, fene/expand, morse, nonlinear,
gromos, quartic (with intact-mask breaking + pair-single subtraction),
table, zero.  Angle styles (angle_*.cpp): harmonic, charmm, cosine,
cosine/squared, cosine/delta, cosine/periodic, table, zero.  Dihedral
styles: opls, harmonic, charmm (+weighted 1-4), charmmfsw (fsw/fsh 1-4),
multi/harmonic, helix, zero.  Improper styles: harmonic, cvff, umbrella,
zero.  Hybrid variants are handled upstream by partitioning the term
lists per sub-style (each partition gets its own params pytree).

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
    # per-type coefficient tables, row 0 unused.  Meaning by style
    # (bond_coeff argument order of the matching bond_*.cpp::coeff):
    #   harmonic:    k=K         r0=r0
    #   fene:        k=K         r0=R0     eps=eps  sigma=sigma
    #   fene/expand: k=K         r0=R0     eps=eps  sigma=sigma  c5=delta
    #   morse:       k=D0        r0=alpha  eps=r0
    #   nonlinear:   k=epsilon   r0=r0     eps=lamda
    #   gromos:      k=K         r0=r0
    #   quartic:     k=K         r0=B1     eps=B2   sigma=Rc     c5=U0
    k: jax.Array         # (T+1,)
    r0: jax.Array        # (T+1,)
    eps: jax.Array       # (T+1,)
    sigma: jax.Array     # (T+1,)
    c5: jax.Array = None     # (T+1,) fifth coefficient where needed
    # bond_style table (bond_table.cpp): per-type uniformly resampled
    # energy/force tables on [tab_rlo, tab_rlo + (M-1) tab_dr]
    tab_e: jax.Array = None     # (T+1, M)
    tab_f: jax.Array = None     # (T+1, M)
    tab_rlo: jax.Array = None   # (T+1,)
    tab_dr: jax.Array = None    # (T+1,)
    # bond_style quartic subtracts the pair interaction of each intact
    # bonded pair (bond_quartic.cpp pair->single block; special 1 1 1):
    # lj/cut tables (T_atom+1)^2 + per-atom types
    plj1: jax.Array = None
    plj2: jax.Array = None
    plj3: jax.Array = None
    plj4: jax.Array = None
    pcutsq: jax.Array = None
    poffset: jax.Array = None
    ptype: jax.Array = None     # (N,) atom types
    style: str = dataclasses.field(metadata=dict(static=True), default="harmonic")


def bond_forces(x, box: Box, p: BondParams):
    """Returns (f (N,3), ebond, virial6).

    quartic additionally returns the pair-subtraction parts via
    bond_forces_quartic (forcefield routes that style separately since its
    correction tallies into the PAIR accumulators)."""
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
    elif p.style in ("fene", "fene/expand"):
        # bond_fene.cpp:60-95 / bond_fene_expand.cpp (r -> r - shift)
        r = jnp.sqrt(rsq)
        rs = r - (p.c5[p.btype] if p.style == "fene/expand"
                  else jnp.zeros_like(r))
        rssq = rs * rs
        r0sq = r0 * r0
        rlogarg = 1.0 - rssq / r0sq
        rlogarg = jnp.maximum(rlogarg, 0.1)   # the reference warns & clamps at 0.1
        rsafe = jnp.where(r > 0, r, 1.0)
        if p.style == "fene":
            fbond = -k / rlogarg             # force/d: -k r/rlogarg / r
        else:
            fbond = -k * rs / rlogarg / rsafe
        ebond = -0.5 * jnp.sum(k * r0sq * jnp.log(rlogarg))
        eps = p.eps[p.btype]
        sig = p.sigma[p.btype]
        rssq_safe = jnp.where(rssq > 0, rssq, 1.0)
        sr2 = sig * sig / rssq_safe
        sr6 = sr2 * sr2 * sr2
        inside = rssq < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        if p.style == "fene":
            fbond = fbond + jnp.where(
                inside, 48.0 * eps * sr6 * (sr6 - 0.5) / rssq_safe, 0.0)
        else:
            # bond_fene_expand.cpp:100 — LJ force along d is /rshift/r
            fbond = fbond + jnp.where(
                inside,
                48.0 * eps * sr6 * (sr6 - 0.5)
                / jnp.where(rs != 0, rs, 1.0) / rsafe, 0.0)
        ebond = ebond + jnp.sum(jnp.where(
            inside, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0))
    elif p.style == "morse":
        # bond_morse.cpp: E = D0 (1 - e^{-alpha (r-r0)})^2
        d0, alpha, rr0 = k, r0, p.eps[p.btype]
        r = jnp.sqrt(rsq)
        ralpha = jnp.exp(-alpha * (r - rr0))
        fbond = jnp.where(
            r > 0, -2.0 * d0 * alpha * (1 - ralpha) * ralpha
            / jnp.where(r > 0, r, 1.0), 0.0)
        ebond = jnp.sum(d0 * (1 - ralpha) ** 2)
    elif p.style == "nonlinear":
        # bond_nonlinear.cpp: E = eps dr^2 / (lamda^2 - dr^2)
        epsb, lam = k, p.eps[p.btype]
        r = jnp.sqrt(rsq)
        dr = r - r0
        lamsq = lam * lam
        denom = lamsq - dr * dr
        fbond = -epsb / jnp.where(r > 0, r, 1.0) * 2.0 * dr * lamsq / (
            denom * denom)
        ebond = jnp.sum(epsb * dr * dr / denom)
    elif p.style == "gromos":
        # bond_gromos.cpp: E = K (r^2 - r0^2)^2
        dr = rsq - r0 * r0
        fbond = -4.0 * k * dr
        ebond = jnp.sum(k * dr * dr)
    elif p.style == "table":
        # linear interpolation on the per-type resampled grid
        r = jnp.sqrt(rsq)
        rlo = p.tab_rlo[p.btype]
        dtr = p.tab_dr[p.btype]
        m = p.tab_e.shape[1]
        s = jnp.clip((r - rlo) / dtr, 0.0, m - 1 - 1e-7)
        i0 = s.astype(jnp.int32)
        frac = s - i0
        e0 = p.tab_e[p.btype, i0]
        e1 = p.tab_e[p.btype, i0 + 1]
        f0 = p.tab_f[p.btype, i0]
        f1 = p.tab_f[p.btype, i0 + 1]
        fmag = f0 + frac * (f1 - f0)          # force magnitude -dE/dr
        fbond = fmag / jnp.where(r > 0, r, 1.0)
        ebond = jnp.sum(e0 + frac * (e1 - e0))
    elif p.style == "zero":
        fbond = jnp.zeros_like(rsq)
        ebond = jnp.zeros((), x.dtype)
    elif p.style == "quartic":
        return _bond_quartic(x, d, rsq, p)[:3]
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


def _bond_quartic(x, d, rsq, p: BondParams):
    """bond_quartic.cpp: E = K dr^2 (dr-B1)(dr-B2) + U0 + LJ(1,1) inside
    2^(1/6), with dr = r - Rc; a bond stretched past Rc is broken (here:
    masked out — the reference's permanent type=0 flip differs only if a
    broken pair re-approaches within Rc, which the repulsive-only regime
    makes irrelevant).  The pairwise lj/cut interaction of each intact
    bonded pair is subtracted (special_bonds 1 1 1 convention), tallied
    into the pair accumulators by the caller.

    Returns (f, ebond, virial6, devdwl, dvirial6)."""
    i, j = p.idx[:, 0], p.idx[:, 1]
    k = p.k[p.btype]
    b1 = p.r0[p.btype]
    b2 = p.eps[p.btype]
    rc = p.sigma[p.btype]
    u0 = p.c5[p.btype]
    intact = rsq < rc * rc
    r = jnp.sqrt(rsq)
    dr = r - rc
    r2 = dr * dr
    ra = dr - b1
    rb = dr - b2
    rsafe = jnp.where(r > 0, r, 1.0)
    fbond = -k / rsafe * (r2 * (ra + rb) + 2.0 * dr * ra * rb)
    ebond = k * r2 * ra * rb + u0
    two13 = jnp.power(2.0, 1.0 / 3.0)
    sr2 = 1.0 / jnp.where(rsq > 0, rsq, 1.0)
    sr6 = sr2 * sr2 * sr2
    inside = rsq < two13
    fbond = fbond + jnp.where(inside, 48.0 * sr6 * (sr6 - 0.5) * sr2, 0.0)
    ebond = ebond + jnp.where(inside, 4.0 * sr6 * (sr6 - 1.0) + 1.0, 0.0)
    fbond = jnp.where(intact, fbond, 0.0)
    ebond = jnp.sum(jnp.where(intact, ebond, 0.0))

    # subtract the lj/cut pair single of intact bonds
    devd = jnp.zeros((), x.dtype)
    dfp = jnp.zeros_like(fbond)
    if p.plj1 is not None:
        ti, tj = p.ptype[i], p.ptype[j]
        in_cut = intact & (rsq < p.pcutsq[ti, tj])
        r6 = sr6
        fp = r6 * (p.plj1[ti, tj] * r6 - p.plj2[ti, tj]) * sr2
        ep = r6 * (p.plj3[ti, tj] * r6 - p.plj4[ti, tj]) - p.poffset[ti, tj]
        dfp = jnp.where(in_cut, -fp, 0.0)
        devd = jnp.sum(jnp.where(in_cut, -ep, 0.0))

    ftot = fbond + dfp
    fvec = ftot[:, None] * d
    f = jnp.zeros_like(x).at[i].add(fvec).at[j].add(-fvec)

    def vir6(w):
        return jnp.stack([
            jnp.sum(w * d[:, 0] * d[:, 0]), jnp.sum(w * d[:, 1] * d[:, 1]),
            jnp.sum(w * d[:, 2] * d[:, 2]), jnp.sum(w * d[:, 0] * d[:, 1]),
            jnp.sum(w * d[:, 0] * d[:, 2]), jnp.sum(w * d[:, 1] * d[:, 2])])

    return f, ebond, vir6(fbond), devd, vir6(dfp)


def bond_quartic_full(x, box: Box, p: BondParams):
    """quartic with the pair-subtraction split out for the caller's
    pair-accumulator tally: (f, ebond, vir_bond, devdwl, vir_pair)."""
    i, j = p.idx[:, 0], p.idx[:, 1]
    d = _mi(x[i] - x[j], box)
    rsq = jnp.sum(d * d, axis=1)
    return _bond_quartic(x, d, rsq, p)


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
    # charmm (angle_charmm.cpp): + Urey-Bradley K_ub (r_13 - r_ub)^2.
    # cosine/periodic (angle_cosine_periodic.cpp): k = C/n^2 stored in k,
    # B (+-1) in k_ub, multiplicity n in r_ub.
    k_ub: jax.Array = None     # (T+1,)
    r_ub: jax.Array = None     # (T+1,)
    # angle_style table: per-type tables over theta (radians), uniform grid
    tab_e: jax.Array = None    # (T+1, M)
    tab_f: jax.Array = None    # (T+1, M) -dE/dtheta
    tab_tlo: jax.Array = None  # (T+1,)
    tab_dt: jax.Array = None   # (T+1,)
    style: str = _dc.field(metadata=dict(static=True), default="harmonic")


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class DihedralParams:
    idx: jax.Array      # (ND,4) int32 i-j-k-l
    dtype_: jax.Array   # (ND,) int32 1-based
    # opls: k1..k4 tables; harmonic: k, d(+-1), n;
    # charmm/charmmfsw: c1=K, c2=n, c3=d(rad), c4=weight
    # (dihedral_charmm.cpp); multi/harmonic: A1..A5 in c1..c5; helix:
    # A,B,C in c1..c3 (dihedral_helix.cpp)
    c1: jax.Array
    c2: jax.Array
    c3: jax.Array
    c4: jax.Array
    c5: jax.Array = None
    # charmm 1-4 weighted pair term: q (N,), lj14 energy tables (T+1,T+1)
    # built from the pair style's eps14/sig14 (pair lj/charmm extract),
    # atom types (N,), and qqrd2e
    q: jax.Array = None
    lj14_3: jax.Array = None
    lj14_4: jax.Array = None
    type_: jax.Array = None
    qqrd2e: float = _dc.field(metadata=dict(static=True), default=0.0)
    # charmmfsw 1-4 constants (dihedral_charmmfsw.cpp init_style): the
    # paired pair style's cutoffs and its dihedflag (0 = charmmfsh pair →
    # shifted 1-4 coulomb; 1 = coul/long pair → plain 1/r)
    cut_lj_inner14: float = _dc.field(metadata=dict(static=True), default=0.0)
    cut_lj14: float = _dc.field(metadata=dict(static=True), default=0.0)
    cut_coul14: float = _dc.field(metadata=dict(static=True), default=0.0)
    dihedflag: int = _dc.field(metadata=dict(static=True), default=1)
    style: str = _dc.field(metadata=dict(static=True), default="opls")


def _angle_energy(d1, d2, p: AngleParams):
    """d1 = x_i - x_j, d2 = x_k - x_j (per-style angle_*.cpp energies)."""
    r1 = jnp.linalg.norm(d1, axis=1)
    r2 = jnp.linalg.norm(d2, axis=1)
    c = jnp.sum(d1 * d2, axis=1) / (r1 * r2)
    c = jnp.clip(c, -1.0, 1.0)
    k = p.k[p.atype]
    if p.style == "cosine":
        # angle_cosine.cpp: E = K (1 + cos theta)
        return jnp.sum(k * (1.0 + c))
    if p.style == "cosine/squared":
        # angle_cosine_squared.cpp: E = K (cos th - cos th0)^2
        dc = c - jnp.cos(p.theta0[p.atype])
        return jnp.sum(k * dc * dc)
    if p.style == "cosine/periodic":
        # angle_cosine_periodic.cpp: E = 2 (C/n^2) [1 - B (-1)^n cos(n th)]
        # cos(n th) = T_n(c) via the same Chebyshev recurrence the
        # reference uses — polynomial in c, so the autodiff force has no
        # 1/sin(theta) singularity at the theta=pi equilibrium
        b = p.k_ub[p.atype]
        m = p.r_ub[p.atype]
        tn_2, tn_1 = jnp.ones_like(c), c
        tm = jnp.where(m == 1, tn_1, 0.0)
        for n in range(2, 9):                   # multiplicities 1..8
            tn = 2.0 * c * tn_1 - tn_2
            tn_2, tn_1 = tn_1, tn
            tm = tm + jnp.where(m == n, tn, 0.0)
        sign = 1.0 - 2.0 * jnp.mod(m, 2.0)      # (-1)^n
        return jnp.sum(2.0 * k * (1.0 - b * sign * tm))
    if p.style == "zero":
        return jnp.zeros((), d1.dtype)
    theta = jnp.arccos(c)
    if p.style == "cosine/delta":
        # angle_cosine_delta.cpp: E = K (1 - cos(th - th0))
        return jnp.sum(k * (1.0 - jnp.cos(theta - p.theta0[p.atype])))
    if p.style == "table":
        t = p.atype
        tlo = p.tab_tlo[t]
        dt = p.tab_dt[t]
        m = p.tab_e.shape[1]
        s = jnp.clip((theta - tlo) / dt, 0.0, m - 1 - 1e-7)
        i0 = s.astype(jnp.int32)
        frac = s - i0
        return jnp.sum(p.tab_e[t, i0]
                       + frac * (p.tab_e[t, i0 + 1] - p.tab_e[t, i0]))
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
    if p.style in ("charmm", "charmmfsw"):
        # E = K[1 + cos(n phi - d)] (dihedral_charmm.cpp; fsw torsion term
        # is identical — only the 1-4 pair correction differs)
        return jnp.sum(p.c1[t] * (1 + jnp.cos(p.c2[t] * phi - p.c3[t])))
    if p.style == "multi/harmonic":
        # dihedral_multi_harmonic.cpp: E = sum_{i=1..5} A_i c^(i-1)
        return jnp.sum(p.c1[t] + cphi * (
            p.c2[t] + cphi * (p.c3[t] + cphi * (
                p.c4[t] + cphi * p.c5[t]))))
    if p.style == "helix":
        # dihedral_helix.cpp: E = A(1-cos p) + B(1+cos 3p) + C(1+cos(p+pi/4))
        return jnp.sum(p.c1[t] * (1.0 - cphi)
                       + p.c2[t] * (1.0 + jnp.cos(3.0 * phi))
                       + p.c3[t] * (1.0 + jnp.cos(phi + jnp.pi / 4.0)))
    if p.style == "zero":
        return jnp.zeros((), b1.dtype)
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
    qq = p.qqrd2e * p.q[i1] * p.q[i4]
    if p.style == "charmmfsw":
        # dihedral_charmmfsw.cpp: constant fsw offsets on the split LJ
        # energies; shifted (fsh) coulomb when paired with the charmmfsh
        # pair style (dihedflag=0), plain 1/r with coul/long (dihedflag=1)
        c3i = 1.0 / p.cut_lj14 ** 3
        ci3i = 1.0 / p.cut_lj_inner14 ** 3
        e12 = p.lj14_3[t1, t4] * (r6inv * r6inv - ci3i * ci3i * c3i * c3i)
        e6 = -p.lj14_4[t1, t4] * (r6inv - ci3i * c3i)
        elj = e12 + e6
        if p.dihedflag:
            ecoul = qq * rinv
        else:
            rcinv = 1.0 / p.cut_coul14
            r = rsq * rinv
            ecoul = qq * (rinv + r * rcinv * rcinv - 2.0 * rcinv)
    else:
        elj = r6inv * (p.lj14_3[t1, t4] * r6inv - p.lj14_4[t1, t4])
        ecoul = qq * rinv
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

    if p.style == "table":
        # angle_table.cpp linear lookup: e and f (= -dE/dtheta, rad) are
        # interpolated independently, so autodiff of the piecewise-linear
        # energy would give the wrong (staircase) force — compute the
        # analytic angle force from the interpolated f instead
        d1 = _mi(x[i] - x[j], box)
        d2 = _mi(x[k] - x[j], box)
        rsq1 = jnp.sum(d1 * d1, axis=1)
        rsq2 = jnp.sum(d2 * d2, axis=1)
        r1 = jnp.sqrt(rsq1)
        r2 = jnp.sqrt(rsq2)
        c = jnp.clip(jnp.sum(d1 * d2, axis=1) / (r1 * r2), -1.0, 1.0)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-16))
        theta = jnp.arccos(c)
        t = p.atype
        m = p.tab_e.shape[1]
        sidx = jnp.clip((theta - p.tab_tlo[t]) / p.tab_dt[t],
                        0.0, m - 1 - 1e-7)
        i0 = sidx.astype(jnp.int32)
        frac = sidx - i0
        e_term = p.tab_e[t, i0] + frac * (p.tab_e[t, i0 + 1]
                                          - p.tab_e[t, i0])
        fmag = p.tab_f[t, i0] + frac * (p.tab_f[t, i0 + 1]
                                        - p.tab_f[t, i0])
        a = fmag / s
        a11 = a * c / rsq1
        a12 = -a / (r1 * r2)
        a22 = a * c / rsq2
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        f = (jnp.zeros_like(x).at[i].add(f1).at[k].add(f3)
             .at[j].add(-(f1 + f3)))
        virial = jnp.stack([
            jnp.sum(d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0]),
            jnp.sum(d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1]),
            jnp.sum(d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2]),
            jnp.sum(d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1]),
            jnp.sum(d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2]),
            jnp.sum(d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2])])
        return f, jnp.sum(e_term), virial

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
    # out-of-plane angle (same geometric phi as a dihedral).
    # cvff (improper_cvff.cpp): E = K [1 + d cos(n chi)], d in c2, n in c3.
    # umbrella (improper_umbrella.cpp, DREIDING inversion): chi0 = w0,
    # c2 = C = K/sin^2(w0) precomputed at build.
    c2: jax.Array = None
    c3: jax.Array = None
    style: str = _dc.field(metadata=dict(static=True), default="harmonic")


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

    def energy_vecs(b1, b2, b3, vb1=None, vb2=None, vb3=None):
        if p.style == "umbrella":
            # improper_umbrella.cpp: vb1 = j-i, vb2 = k-i, vb3 = l-i;
            # cos(angle(n, vb3)) with n = vb1 x vb2 is sin(omega); the
            # energy needs cos(omega) = s with the projhfg sign fix
            n1 = jnp.cross(vb1, vb2)
            c = jnp.sum(n1 * vb3, axis=1) / jnp.maximum(
                jnp.linalg.norm(n1, axis=1)
                * jnp.linalg.norm(vb3, axis=1), 1e-30)
            c = jnp.clip(c, -1.0, 1.0)
            s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-16))
            projhfg = (jnp.sum(vb3 * vb1, axis=1)
                       / jnp.linalg.norm(vb1, axis=1)
                       + jnp.sum(vb3 * vb2, axis=1)
                       / jnp.linalg.norm(vb2, axis=1))
            s = jnp.where(projhfg > 0.0, -s, s)
            w0 = p.chi0[p.itype]
            kw = p.k[p.itype]
            cc = p.c2[p.itype]
            dom = s - jnp.cos(w0)
            return jnp.sum(jnp.where(w0 == 0.0, kw * (1.0 - s),
                                     0.5 * cc * dom * dom))
        chi = chi_of(b1, b2, b3)
        if p.style == "cvff":
            # E = K [1 + d cos(n chi)] — even in chi, so the dihedral-
            # style chi convention is safe
            return jnp.sum(p.k[p.itype] * (
                1.0 + p.c2[p.itype] * jnp.cos(p.c3[p.itype] * chi)))
        if p.style == "zero":
            return jnp.zeros((), x.dtype)
        dchi = chi - p.chi0[p.itype]
        # wrap into (-pi, pi] like the reference's acos-based branch logic
        dchi = dchi - 2 * jnp.pi * jnp.round(dchi / (2 * jnp.pi))
        return jnp.sum(p.k[p.itype] * dchi * dchi)

    def energy_of(xx):
        return energy_vecs(
            _mi(xx[j] - xx[i], box), _mi(xx[k] - xx[j], box),
            _mi(xx[l] - xx[k], box), _mi(xx[j] - xx[i], box),
            _mi(xx[k] - xx[i], box), _mi(xx[l] - xx[i], box))

    def with_strain(eps_flat):
        eps = jnp.eye(3, dtype=x.dtype) + eps_flat.reshape(3, 3)
        return energy_vecs(
            _mi(x[j] - x[i], box) @ eps.T, _mi(x[k] - x[j], box) @ eps.T,
            _mi(x[l] - x[k], box) @ eps.T, _mi(x[j] - x[i], box) @ eps.T,
            _mi(x[k] - x[i], box) @ eps.T, _mi(x[l] - x[i], box) @ eps.T)

    e = energy_of(x)
    f = -jax.grad(energy_of)(x)
    w = -jax.grad(with_strain)(jnp.zeros(9, x.dtype)).reshape(3, 3)
    virial = jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]])
    return f, e, virial
