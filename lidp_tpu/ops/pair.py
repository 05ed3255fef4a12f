"""Short-range pair interactions: LJ + real-space Ewald Coulomb.

Reproduces the neighbor-list kernel of the reference pair styles
``lj/cut`` (pair_lj_cut.cpp) and the LJ+coulomb part of
``lj/cut/coul/long/polarization`` (pair_lj_cut_coul_long_polarization.cpp:232-321)
as masked all-pairs tensor ops:

  * erfc via the same 5-term Abramowitz-Stegun polynomial
    (constants EWALD_F/P, A1..A5, ...polarization.cpp:43-49) so real-space
    Coulomb matches bit-close;
  * special-bond scaling: ``forcecoul -= (1-factor_coul)*prefactor``
    (...polarization.cpp:266) — the kspace-present convention where excluded
    pairs keep ``-q_i q_j erf(g r)/r`` to cancel the reciprocal sum;
  * energies/virial are half-sums over the full (i,j) matrix, numerically
    identical to the reference's Newton half-list ``ev_tally`` totals.

The dense (N,N) form is used for N up to a few thousand (the polarization
examples); larger systems use the roll-based cell kernel (ops/cells.py) or
the sharded row-block path (parallel/shard.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, min_image_box, minimum_image

# Abramowitz & Stegun 7.1.26 erfc approximation, constants identical to the
# reference (pair_lj_cut_coul_long_polarization.cpp:43-49).
EWALD_F = 1.12837917
EWALD_P = 0.3275911
A1 = 0.254829592
A2 = -0.284496736
A3 = 1.421413741
A4 = -1.453152027
A5 = 1.061405429


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairParams:
    """Type-pair tables, index [type_i, type_j], row/col 0 unused (LAMMPS 1-based).

    lj1 = 48 eps sigma^12, lj2 = 24 eps sigma^6 (force), lj3 = 4 eps sigma^12,
    lj4 = 4 eps sigma^6 (energy), offset = energy shift at cutoff
    (Pair::init_one convention).
    """

    lj1: jax.Array
    lj2: jax.Array
    lj3: jax.Array
    lj4: jax.Array
    offset: jax.Array
    cut_ljsq: jax.Array     # (T+1,T+1)
    cutsq: jax.Array        # (T+1,T+1) max(cut_lj, cut_coul)^2
    cut_coulsq: jax.Array   # () scalar
    special_lj: jax.Array   # (4,) [1.0, s12, s13, s14]
    special_coul: jax.Array
    qqrd2e: jax.Array       # () scalar
    g_ewald: jax.Array      # () scalar; 0 => no coulomb
    cut_lj_innersq: jax.Array  # () scalar; CHARMM switching inner cutoff^2
    denom_lj: jax.Array        # () (cut_ljsq - cut_lj_innersq)^3
    coul: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # CHARMM energy-switching between inner and outer LJ cutoffs
    # (pair_lj_charmm_coul_long.cpp:110-125)
    charmm: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # CHARMM FORCE-switching (lj/charmmfsw/*): switch1 applied to the
    # force, energy from the analytically integrated form
    # (pair_lj_charmmfsw_coul_long.cpp:194-242)
    charmm_fsw: bool = dataclasses.field(metadata=dict(static=True),
                                         default=False)
    # (T+1,T+1) bool: neigh_modify exclude type pairs (neighbor.cpp exclusion
    # lists) — excluded pairs contribute nothing; None (common case) skips
    # the per-pair table lookup entirely
    excl: object = None
    # neigh_modify exclude molecule all: drop same-molecule pairs from the
    # pair kernels entirely (incl. their erf-complement special correction —
    # the reference removes them from the neighbor list before any tally)
    excl_mol: bool = dataclasses.field(metadata=dict(static=True),
                                       default=False)
    # van-der-Waals functional form; the ljN tables are reinterpreted per
    # kind (see _vdw_terms): lj, morse, buck, yukawa, gauss, soft, born,
    # none (pure coulomb)
    kind: str = dataclasses.field(metadata=dict(static=True), default="lj")
    lj5: object = None      # 5th coefficient table (born D, lj/expand delta)
    # pair_style table (pair_table.cpp): per-type-pair tabulated energy and
    # force magnitude on a common linear-in-r grid [tab_rlo, cutoff]
    tab_e: object = None     # (T+1,T+1,NT)
    tab_f: object = None     # (T+1,T+1,NT)  force MAGNITUDE |F(r)|
    tab_rlo: object = None   # ()
    tab_dr: object = None    # ()
    # coulomb functional form: "long" (erfc-damped; g_ewald=0 gives the
    # plain 1/r of coul/cut), "debye" (exp(-kappa r)/r screening,
    # pair_coul_debye.cpp:87-89; kappa rides in g_ewald), or "msm"
    # (gamma-softened complement of the MSM grid sum,
    # pair_coul_msm.cpp:115-117)
    coul_kind: str = dataclasses.field(metadata=dict(static=True),
                                       default="long")
    msm_order: int = dataclasses.field(metadata=dict(static=True),
                                       default=10)
    # damped-shifted-force / Wolf shift constants (pair_coul_dsf.cpp
    # init_style:214-217, pair_coul_wolf.cpp:82-84); alpha rides in g_ewald
    coul_eshift: object = None   # ()
    coul_fshift: object = None   # ()
    # CHARMM coul switching (pair_lj_charmm_coul_charmm.cpp:124-130) and
    # GROMACS coul switch constants (pair_lj_gromacs_coul_gromacs.cpp:332)
    cut_coul_innersq: object = None   # ()
    denom_coul: object = None         # ()
    coulsw: object = None             # (6,) [sw1..sw5, cut_coul_inner]


def _msm_coul_terms(prefactor, r, rsq, cut_coulsq, order):
    """egamma/fgamma complement kernel (pair_coul_msm.cpp:115-117); the
    gamma polynomial unrolls at trace time (order is static).  Only called
    under the rsq < cut_coulsq mask, so the rho > 1 branch never applies."""
    from lidp_tpu.ops.msm import DGCONS, GCONS

    s = order // 2
    rc = jnp.sqrt(cut_coulsq)
    rho = r / rc
    rho2 = rho * rho
    g = GCONS[s][0]
    rn = rho2
    for nn in range(1, s + 1):
        g = g + GCONS[s][nn] * rn
        rn = rn * rho2
    dg = DGCONS[s][0] * rho
    rn = rho * rho2
    for nn in range(1, s):
        dg = dg + DGCONS[s][nn] * rn
        rn = rn * rho2
    egamma = 1.0 - rho * g
    fgamma = 1.0 + (rsq / cut_coulsq) * dg
    return prefactor * egamma, prefactor * fgamma


def _dsf_wolf_shifts(coul_kind, alpha, cut_coul, dtype):
    """(e_shift, f_shift) host scalars for the dsf/wolf coul kinds
    (pair_coul_dsf.cpp:214-217 / pair_coul_wolf.cpp:82-84)."""
    import math

    a_, rc = float(alpha), float(cut_coul)
    erfcc = math.erfc(a_ * rc)
    erfcd = math.exp(-a_ * a_ * rc * rc)
    rpis = 2.0 / math.sqrt(math.pi)
    if coul_kind == "dsf":
        fsh = -(erfcc / (rc * rc) + rpis * a_ * erfcd / rc)
        esh = erfcc / rc - fsh * rc
    else:   # wolf
        esh = erfcc / rc
        fsh = -(esh + rpis * a_ * erfcd) / rc
    return jnp.asarray(esh, dtype), jnp.asarray(fsh, dtype)


def _coul_switch_fields(coul_kind, cut_coul, cut_coul_inner, dtype):
    """Extra PairParams fields for the switched coul kinds."""
    out = {}
    if coul_kind in ("charmm", "charmm/implicit"):
        ccsq, cisq = float(cut_coul) ** 2, float(cut_coul_inner) ** 2
        out["cut_coul_innersq"] = jnp.asarray(cisq, dtype)
        out["denom_coul"] = jnp.asarray((ccsq - cisq) ** 3
                                        if ccsq > cisq else 1.0, dtype)
    elif coul_kind == "gromacs":
        rc, ri = float(cut_coul), float(cut_coul_inner)
        r3inv = 1.0 / rc ** 3
        t = rc - ri if rc > ri else 1.0
        a1 = (2.0 * ri - 5.0 * rc) * r3inv / (t * t)
        b1 = (4.0 * rc - 2.0 * ri) * r3inv / (t * t * t)
        sw5 = 1.0 / rc - t ** 3 * (a1 / 3.0 + b1 * t / 4.0)
        out["cut_coul_innersq"] = jnp.asarray(ri * ri, dtype)
        out["coulsw"] = jnp.asarray(
            [a1, b1, -a1 / 3.0, -b1 / 4.0, sw5, ri], dtype)
    return out


def _charmm_gromacs_coul_terms(p, prefactor, r, rsq, factor_coul):
    """(ecoul, forcecoul) for the switched coul kinds; the special factor
    is MULTIPLICATIVE here (the reference never subtracts the full-1/r
    complement for these short-range forms)."""
    if p.coul_kind in ("charmm", "charmm/implicit"):
        outer = rsq > p.cut_coul_innersq
        ccsq = p.cut_coulsq
        sw1 = ((ccsq - rsq) ** 2 * (ccsq + 2.0 * rsq
                                    - 3.0 * p.cut_coul_innersq)
               / p.denom_coul)
        if p.coul_kind == "charmm":
            # pair_lj_charmm_coul_charmm.cpp:123-130 (force and energy
            # both scaled by switch1 — the reference's own convention)
            fac = jnp.where(outer, sw1, 1.0)
            ec = prefactor * fac * factor_coul
            fc = prefactor * fac * factor_coul
        else:
            # implicit 1/r^2 dielectric
            # (pair_lj_charmm_coul_charmm_implicit.cpp:87-94,122-129)
            sw2 = (12.0 * rsq * (ccsq - rsq)
                   * (rsq - p.cut_coul_innersq) / p.denom_coul)
            base = prefactor / r                    # qqrd2e q q / r^2
            ec = base * jnp.where(outer, sw1, 1.0) * factor_coul
            fc = 2.0 * base * jnp.where(outer, sw1 + 0.5 * sw2, 1.0) \
                * factor_coul
        return ec, fc
    if p.coul_kind == "charmmfsh":
        # CHARMM force-shifted coulomb
        # (pair_lj_charmmfsw_coul_charmmfsh.cpp:154-184)
        rc2inv = 1.0 / p.cut_coulsq
        rcinv = jnp.sqrt(rc2inv)
        fc = prefactor * (1.0 - rsq * rc2inv)
        ec = prefactor * (1.0 + rsq * rc2inv - 2.0 * r * rcinv)
        return ec * factor_coul, fc * factor_coul
    # gromacs (pair_lj_gromacs_coul_gromacs.cpp:120-130,156-164)
    outer = rsq > p.cut_coul_innersq
    qq = prefactor * r                              # qqrd2e q_i q_j
    tc = r - p.coulsw[5]
    fc = prefactor + jnp.where(
        outer, qq * r * tc * tc * (p.coulsw[0] + p.coulsw[1] * tc), 0.0)
    ec = qq * (1.0 / r - p.coulsw[4]) + jnp.where(
        outer, qq * tc * tc * tc * (p.coulsw[2] + p.coulsw[3] * tc), 0.0)
    return ec * factor_coul, fc * factor_coul


def _charmm_fsw_terms(p, lj3_ij, lj4_ij, cut_ljsq_ij, rsq, r2inv, forcelj):
    """CHARMM FORCE switching: switch1 on the force, analytically
    integrated split 12/6 energies
    (pair_lj_charmmfsw_coul_long.cpp:194-242 + setup constants :785-803).
    Returns (forcelj, philj)."""
    r6inv = r2inv * r2inv * r2inv
    r3inv = jnp.sqrt(r6inv)
    outer = rsq > p.cut_lj_innersq
    switch1 = ((cut_ljsq_ij - rsq) ** 2
               * (cut_ljsq_ij + 2.0 * rsq - 3.0 * p.cut_lj_innersq)
               / p.denom_lj)
    f = jnp.where(outer, forcelj * switch1, forcelj)
    clj6 = cut_ljsq_ij ** 3
    clj3 = cut_ljsq_ij * jnp.sqrt(cut_ljsq_ij)
    ci6 = p.cut_lj_innersq ** 3
    ci3 = p.cut_lj_innersq * jnp.sqrt(p.cut_lj_innersq)
    e12o = lj3_ij * clj6 / (clj6 - ci6) * (r6inv - 1.0 / clj6) ** 2
    e6o = -lj4_ij * clj3 / (clj3 - ci3) * (r3inv - 1.0 / clj3) ** 2
    e12i = lj3_ij * (r6inv * r6inv - 1.0 / (ci6 * clj6))
    e6i = -lj4_ij * (r6inv - 1.0 / (ci3 * clj3))
    return f, jnp.where(outer, e12o + e6o, e12i + e6i)


def _dsf_wolf_pair_terms(p, prefactor, r, rsq):
    """Raw (factor_coul == 1) coulomb (ecoul, forcecoul) for the dsf/wolf
    kinds (pair_coul_dsf.cpp:115-137, pair_coul_wolf.cpp:117-141); callers
    subtract (1 - factor_coul) * prefactor for special bonds.  dsf uses the
    same A1..A5 erfc polynomial as the reference kernel; wolf calls the
    exact erfc, as the reference does."""
    if p.coul_kind == "dsf":
        grij = p.g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfcc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        fc = prefactor * (erfcc + EWALD_F * grij * expm2
                          + rsq * p.coul_fshift)
        ec = prefactor * (erfcc - r * p.coul_eshift - rsq * p.coul_fshift)
    else:   # wolf
        from jax.scipy.special import erfc as _erfc_exact

        ar = p.g_ewald * r
        erfcc = _erfc_exact(ar)
        erfcd = jnp.exp(-ar * ar)
        ec = (erfcc - p.coul_eshift * r) * prefactor
        fc = ((erfcc / rsq + EWALD_F * p.g_ewald * erfcd / r)
              + p.coul_fshift) * rsq * prefactor
    return ec, fc


def dsf_wolf_self_energy(p, q, mask):
    """Per-atom self energy both kinds tally into ecoul
    (pair_coul_dsf.cpp:99, pair_coul_wolf.cpp:102):
    e_self = -(e_shift/2 + alpha/sqrt(pi)) q_i^2 qqrd2e, summed."""
    pref = -(p.coul_eshift / 2.0 + p.g_ewald / jnp.sqrt(jnp.pi))
    return pref * p.qqrd2e * jnp.sum(jnp.where(mask, q * q, 0.0))


def make_pair_params(
    epsilon, sigma, cut_lj, *, cut_coul=0.0, special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0), qqrd2e=1.0, g_ewald=0.0, coul=False,
    shift=False, cut_lj_inner=0.0, charmm=False, excl_types=None,
    coul_kind="long", cut_coul_inner=0.0, charmm_fsw=False,
    dtype=jnp.float64,
):
    """Build PairParams from per-type-pair (T+1,T+1) epsilon/sigma/cut arrays."""
    epsilon = jnp.asarray(epsilon, dtype)
    sigma = jnp.asarray(sigma, dtype)
    cut_lj = jnp.asarray(cut_lj, dtype)
    s6 = sigma**6
    lj1 = 48.0 * epsilon * s6 * s6
    lj2 = 24.0 * epsilon * s6
    lj3 = 4.0 * epsilon * s6 * s6
    lj4 = 4.0 * epsilon * s6
    if shift:
        ratio6 = jnp.where(cut_lj > 0, (sigma / jnp.where(cut_lj > 0, cut_lj, 1.0)) ** 6, 0.0)
        offset = 4.0 * epsilon * (ratio6**2 - ratio6)
    else:
        offset = jnp.zeros_like(epsilon)
    cut_ljsq = cut_lj**2
    cutsq = jnp.maximum(cut_lj, cut_coul if coul else 0.0) ** 2
    esh = fsh = None
    if coul_kind in ("dsf", "wolf"):
        esh, fsh = _dsf_wolf_shifts(coul_kind, g_ewald, cut_coul, dtype)
    extra = (_coul_switch_fields(coul_kind, cut_coul, cut_coul_inner,
                                 dtype) if coul else {})
    return PairParams(
        lj1=lj1, lj2=lj2, lj3=lj3, lj4=lj4, offset=offset,
        cut_ljsq=cut_ljsq, cutsq=cutsq,
        cut_coulsq=jnp.asarray(cut_coul, dtype) ** 2,
        special_lj=jnp.asarray(special_lj, dtype),
        special_coul=jnp.asarray(special_coul, dtype),
        qqrd2e=jnp.asarray(qqrd2e, dtype),
        g_ewald=jnp.asarray(g_ewald, dtype),
        cut_lj_innersq=jnp.asarray(cut_lj_inner, dtype) ** 2,
        denom_lj=jnp.asarray(
            (float(jnp.max(cut_lj))**2 - cut_lj_inner**2) ** 3
            if charmm else 1.0, dtype),
        coul=coul, charmm=charmm, charmm_fsw=charmm_fsw,
        excl=(None if excl_types is None
              else jnp.asarray(excl_types, bool)),
        coul_kind=coul_kind, coul_eshift=esh, coul_fshift=fsh,
        **extra,
    )


def make_generic_pair_params(
    kind, t1, t2, t3=None, t4=None, t5=None, *, cut_lj, cut_coul=0.0,
    coul=False, qqrd2e=1.0, g_ewald=0.0, special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0), shift=False, excl_types=None,
    coul_kind="long", cut_coul_inner=0.0, dtype=jnp.float64,
):
    """PairParams for the non-LJ kinds (see _vdw_terms table mapping).

    t1..t5: (T+1,T+1) coefficient tables; cut_lj likewise.  `shift` applies
    the energy offset at the cutoff (pair_modify shift yes)."""
    zeros = jnp.zeros_like(jnp.asarray(t1, dtype))
    tabs = [jnp.asarray(t, dtype) if t is not None else zeros
            for t in (t1, t2, t3, t4)]
    t5j = jnp.asarray(t5, dtype) if t5 is not None else None
    cut_lj = jnp.asarray(cut_lj, dtype)
    if shift:
        rc = jnp.where(cut_lj > 0, cut_lj, 1.0)
        r2inv = 1.0 / (rc * rc)
        _, phirc = _vdw_terms(kind, rc * rc, r2inv,
                              tabs[0], tabs[1], tabs[2], tabs[3], t5j, rc)
        offset = jnp.where(cut_lj > 0, phirc, 0.0)
    else:
        offset = jnp.zeros_like(cut_lj)
    cut_ljsq = cut_lj**2
    cutsq = jnp.maximum(cut_lj, cut_coul if coul else 0.0) ** 2
    esh = fsh = None
    if coul_kind in ("dsf", "wolf"):
        esh, fsh = _dsf_wolf_shifts(coul_kind, g_ewald, cut_coul, dtype)
    extra = (_coul_switch_fields(coul_kind, cut_coul, cut_coul_inner,
                                 dtype) if coul else {})
    return PairParams(
        lj1=tabs[0], lj2=tabs[1], lj3=tabs[2], lj4=tabs[3], offset=offset,
        cut_ljsq=cut_ljsq, cutsq=cutsq,
        cut_coulsq=jnp.asarray(cut_coul, dtype) ** 2,
        special_lj=jnp.asarray(special_lj, dtype),
        special_coul=jnp.asarray(special_coul, dtype),
        qqrd2e=jnp.asarray(qqrd2e, dtype),
        g_ewald=jnp.asarray(g_ewald, dtype),
        cut_lj_innersq=jnp.asarray(0.0, dtype),
        denom_lj=jnp.asarray(1.0, dtype),
        coul=coul, charmm=False,
        excl=(None if excl_types is None
              else jnp.asarray(excl_types, bool)),
        kind=kind, lj5=t5j, coul_kind=coul_kind,
        coul_eshift=esh, coul_fshift=fsh,
        **extra,
    )


def _table_terms(p: PairParams, rsq, r2inv, ti, tj):
    """pair_style table linear (pair_table.cpp LINEAR branch): linear
    interpolation of tabulated E(r), F(r) on the resampled grid."""
    r = jnp.sqrt(rsq)
    nt = p.tab_e.shape[-1]
    u = (r - p.tab_rlo) / p.tab_dr
    i0 = jnp.clip(u.astype(jnp.int32), 0, nt - 2)
    frac = jnp.clip(u - i0, 0.0, 1.0)
    e0 = p.tab_e[ti, tj, i0]
    e1 = p.tab_e[ti, tj, i0 + 1]
    f0 = p.tab_f[ti, tj, i0]
    f1 = p.tab_f[ti, tj, i0 + 1]
    philj = e0 + frac * (e1 - e0)
    fmag = f0 + frac * (f1 - f0)
    return fmag * r, philj   # forcelj convention: fpair = forcelj * r2inv


def _vdw_terms(kind, rsq, r2inv, t1, t2, t3, t4, t5=None,
               cut_pair=None):
    """(forcelj, philj) for the pair kind, with forcelj in the LAMMPS
    convention fpair = forcelj * r2inv.  t1..t5 are the per-pair coefficient
    tables already gathered at [ti,tj]:

      lj:     t1=48*eps*sig^12  t2=24*eps*sig^6  t3=4*eps*sig^12 t4=4*eps*sig^6
      morse:  t1=D0  t2=alpha  t3=r0  t4=2*D0*alpha           (pair_morse.cpp:102)
      buck:   t1=A   t2=1/rho  t3=C                           (pair_buck.cpp:111)
      yukawa: t1=A   t2=kappa                                 (pair_yukawa.cpp:100)
      gauss:  t1=A   t2=B                                     (pair_gauss.cpp:113)
      soft:   t1=A   cut_pair=cutoff                          (pair_soft.cpp:100)
      born:   t1=A   t2=1/rho  t3=C  t4=sigma  t5=D           (pair_born.cpp:116)
      none:   zero (pure coulomb styles)
    """
    if kind == "lj":
        r6inv = r2inv * r2inv * r2inv
        return r6inv * (t1 * r6inv - t2), r6inv * (t3 * r6inv - t4)
    if kind == "none":
        z = jnp.zeros_like(rsq)
        return z, z
    r = jnp.sqrt(rsq)
    if kind == "morse":
        dexp = jnp.exp(-t2 * (r - t3))
        return t4 * (dexp * dexp - dexp) * r, t1 * (dexp * dexp - 2.0 * dexp)
    if kind == "buck":
        r6inv = r2inv * r2inv * r2inv
        rexp = jnp.exp(-r * t2)
        return (t1 * t2) * r * rexp - 6.0 * t3 * r6inv, t1 * rexp - t3 * r6inv
    if kind == "yukawa":
        rinv = 1.0 / r
        screening = jnp.exp(-t2 * r)
        return t1 * screening * (t2 + rinv) * 1.0, t1 * screening * rinv
    if kind == "gauss":
        e = jnp.exp(-t2 * rsq)
        return -2.0 * t1 * t2 * rsq * e, -t1 * e
    if kind == "soft":
        arg = jnp.pi * r / cut_pair
        return (t1 * jnp.pi / cut_pair * jnp.sin(arg) * r,
                t1 * (1.0 + jnp.cos(arg)))
    if kind == "born":
        r6inv = r2inv * r2inv * r2inv
        rexp = jnp.exp((t4 - r) * t2)
        return ((t1 * t2) * r * rexp - 6.0 * t3 * r6inv
                + 8.0 * t5 * r2inv * r6inv,
                t1 * rexp - t3 * r6inv + t5 * r2inv * r6inv)
    if kind == "lj/expand":
        # pair_lj_expand.cpp:109-114: LJ at the shifted distance r - delta,
        # fpair = forcelj/(rshift*r) -> forcelj_out = forcelj * r/rshift
        rs = r - t5
        rs = jnp.where(rs > 1e-6, rs, 1e-6)
        rs2inv = 1.0 / (rs * rs)
        r6 = rs2inv * rs2inv * rs2inv
        flj = r6 * (t1 * r6 - t2)
        return flj * r / rs, r6 * (t3 * r6 - t4)
    if kind == "mie":
        # pair_mie_cut.cpp:117-133: t1..t4 = mie1..mie4 (Cmie-scaled),
        # t5 = stacked [gamR, gamA] exponent tables
        rgamR = r2inv ** (t5[..., 0] / 2.0)
        rgamA = r2inv ** (t5[..., 1] / 2.0)
        return t1 * rgamR - t2 * rgamA, t3 * rgamR - t4 * rgamA
    if kind == "lj/long":
        # pair_lj_long_coul_long.cpp:520-533 (order6, series branch):
        # full r^-12 repulsion + g6-damped dispersion complement whose
        # k-space part lives in ewald6_forces.  t1..t4 = lj1..lj4
        # (geometric mixing, so lj4 = B_i B_j); t5 = the global g_ewald_6.
        rn = r2inv * r2inv * r2inv
        g2 = t5 * t5
        x2v = g2 * rsq
        a2 = 1.0 / x2v
        x2e = a2 * jnp.exp(-x2v) * t4
        g6c = g2 * g2 * g2
        g8c = g6c * g2
        force = (rn * rn * t1
                 - g8c * (((6.0 * a2 + 6.0) * a2 + 3.0) * a2 + 1.0)
                 * x2e * rsq)
        e = rn * rn * t3 - g6c * ((a2 + 1.0) * a2 + 0.5) * x2e
        return force, e
    if kind == "buck/long":
        # pair_buck_long_coul_long.cpp::compute (order6 series branch):
        # full A exp(-r/rho) repulsion + g6-damped C/r^6 dispersion
        # complement (k-space part in ewald6_forces).  t1 = A,
        # t2 = 1/rho, t3 = C (geometric mixing for the B_i B_j k-space
        # factorization); t5 = the global g_ewald_6.
        rexp = jnp.exp(-r * t2)
        g2 = t5 * t5
        x2v = g2 * rsq
        a2 = 1.0 / x2v
        x2e = a2 * jnp.exp(-x2v) * t3
        g6c = g2 * g2 * g2
        g8c = g6c * g2
        force = ((t1 * t2) * r * rexp
                 - g8c * (((6.0 * a2 + 6.0) * a2 + 3.0) * a2 + 1.0)
                 * x2e * rsq)
        e = t1 * rexp - g6c * ((a2 + 1.0) * a2 + 0.5) * x2e
        return force, e
    if kind == "lj96":
        # pair_lj96_cut.cpp:96-99: 9-6 LJ, lj1/3 = 36/4 eps sig^9,
        # lj2/4 = 24/4 eps sig^6
        r6inv = r2inv * r2inv * r2inv
        r3inv = jnp.sqrt(r6inv)
        return r6inv * (t1 * r3inv - t2), r6inv * (t3 * r3inv - t4)
    if kind == "lj/smooth/linear":
        # pair_lj_smooth_linear.cpp:88-124: force-and-energy shifted LJ
        # (F(rc) = E(rc) = 0).  t5 = stacked [ljcut, dljcut, cut].
        r6inv = r2inv * r2inv * r2inv
        flj = r6inv * (t1 * r6inv - t2)
        philj = (r6inv * (t3 * r6inv - t4) - t5[..., 0]
                 + (r - t5[..., 2]) * t5[..., 1])
        return flj - r * t5[..., 1], philj
    if kind == "lj/smooth":
        # pair_lj_smooth.cpp:82-120: plain LJ inside cut_inner, cubic
        # force-skin polynomial outside.  t5 = [ljsw0..ljsw4, cut_inner].
        r6inv = r2inv * r2inv * r2inv
        inner = t5[..., 5]
        tt = r - inner
        tsq = tt * tt
        fskin = (t5[..., 1] + t5[..., 2] * tt + t5[..., 3] * tsq
                 + t5[..., 4] * tsq * tt)
        phi_out = (t5[..., 0] - t5[..., 1] * tt - t5[..., 2] * tsq / 2.0
                   - t5[..., 3] * tsq * tt / 3.0
                   - t5[..., 4] * tsq * tsq / 4.0)
        use_in = rsq < inner * inner
        return (jnp.where(use_in, r6inv * (t1 * r6inv - t2), fskin * r),
                jnp.where(use_in, r6inv * (t3 * r6inv - t4), phi_out))
    if kind == "zbl":
        # pair_zbl.cpp e_zbl/dzbldr (:301-352) + switching (:118-145);
        # t5 = stacked [d1a,d2a,d3a,d4a,zze, sw1..sw5, cut_inner]
        c1_, c2_, c3_, c4_ = 0.02817, 0.28022, 0.50986, 0.18175
        rinv = 1.0 / r
        e1 = jnp.exp(-t5[..., 0] * r)
        e2 = jnp.exp(-t5[..., 1] * r)
        e3 = jnp.exp(-t5[..., 2] * r)
        e4 = jnp.exp(-t5[..., 3] * r)
        ssum = c1_ * e1 + c2_ * e2 + c3_ * e3 + c4_ * e4
        ssum_p = -(c1_ * t5[..., 0] * e1 + c2_ * t5[..., 1] * e2
                   + c3_ * t5[..., 2] * e3 + c4_ * t5[..., 3] * e4)
        zze = t5[..., 4]
        ezbl = zze * ssum * rinv
        dzbl = zze * (ssum_p - ssum * rinv) * rinv
        inner = t5[..., 10]
        tt = jnp.where(r > inner, r - inner, 0.0)
        fsw = tt * tt * (t5[..., 5] + t5[..., 6] * tt)
        esw = tt * tt * tt * (t5[..., 7] + t5[..., 8] * tt)
        # fpair = -(dzbl + fsw)/r  ->  forcelj(our r2inv convention) * r
        return -(dzbl + fsw) * r, ezbl + t5[..., 9] + esw
    if kind == "beck":
        # pair_beck.cpp:91-120: t1=AA t2=BB t3=aa t4=alpha t5=beta
        r5 = rsq * rsq * r
        term1 = t3 * t3 + rsq
        t1inv = 1.0 / term1
        term2 = t1inv ** 5
        term3 = 21.672 + 30.0 * t3 * t3 + 6.0 * rsq
        term4 = t4 + r5 * t5
        term5 = t4 + 6.0 * r5 * t5
        expb = jnp.exp(-r * term4)
        force_beck = t1 * expb * term5 - t2 * r * term2 * term3
        phi = (t1 * expb
               - t2 * (t1inv ** 3) * (1.0 + (2.709 + 3.0 * t3 * t3) * t1inv))
        return force_beck * r, phi
    if kind == "ufm":
        # pair_ufm.cpp:87-101: t1 = 2 eps/sig^2, t2 = 1/sig^2, t3 = eps
        expuf = jnp.exp(-rsq * t2)
        denom = 1.0 - expuf
        return t1 * expuf / denom * rsq, -t3 * jnp.log(denom)
    if kind == "lj/cubic":
        # pair_lj_cubic.cpp:66-98: plain LJ up to the inflection point
        # rmin*SS, then a cubic spline to zero at rmin*SM.
        # t5 = stacked [eps, sigma, cut_inner].
        RT6TWO, PHIS = 1.1224621, -0.7869823
        DPHIDS, A3C = 2.6899009, 27.93357
        eps_ = t5[..., 0]
        rmin = t5[..., 1] * RT6TWO
        inner = t5[..., 2]
        r6inv = r2inv * r2inv * r2inv
        tt = (r - inner) / jnp.where(rmin > 0, rmin, 1.0)
        f_out = eps_ * (-DPHIDS + A3C * tt * tt / 2.0) * r \
            / jnp.where(rmin > 0, rmin, 1.0)
        phi_out = eps_ * (PHIS + DPHIDS * tt - A3C * tt * tt * tt / 6.0)
        use_in = rsq <= inner * inner
        return (jnp.where(use_in, r6inv * (t1 * r6inv - t2), f_out),
                jnp.where(use_in, r6inv * (t3 * r6inv - t4), phi_out))
    if kind == "lj/gromacs":
        # pair_lj_gromacs.cpp:95-125: plain LJ force plus a smoothing
        # polynomial switched on beyond cut_inner; energy carries the
        # matching cubic/quartic terms and the ljsw5 continuity constant.
        # t5 = stacked [ljsw1, ljsw2, ljsw3, ljsw4, ljsw5, cut_inner]
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (t1 * r6inv - t2)
        philj = r6inv * (t3 * r6inv - t4) + t5[..., 4]
        inner = t5[..., 5]
        beyond = rsq > inner * inner
        tt = r - inner
        fswitch = r * tt * tt * (t5[..., 0] + t5[..., 1] * tt)
        eswitch = tt * tt * tt * (t5[..., 2] + t5[..., 3] * tt)
        forcelj = forcelj + jnp.where(beyond, fswitch, 0.0)
        philj = philj + jnp.where(beyond, eswitch, 0.0)
        return forcelj, philj
    raise ValueError(f"unknown pair kind {kind}")


def pair_single(rsq, itype, jtype, qi, qj, p: PairParams,
                factor_coul=1.0, factor_lj=1.0):
    """Pair::single analog — (eng, fforce) for one pair at distance^2 rsq.

    Mirrors PairLJCutCoulLongPolarization::single (:1035-1097): LJ + erfc
    real-space Coulomb, NO polarization contribution (same omission as the
    reference — affects pair_write / compute group/group only).  CHARMM
    variants apply the energy switching.  fforce is the force/r factor, as
    in the reference (callers multiply by r for |F|)."""
    rsq = jnp.asarray(rsq)
    r2inv = 1.0 / rsq
    forcecoul = phicoul = 0.0
    if p.coul:
        r = jnp.sqrt(rsq)
        prefactor = p.qqrd2e * qi * qj / r
        if p.coul_kind == "debye":
            screening = jnp.exp(-p.g_ewald * r)
            forcecoul = (prefactor * screening * (p.g_ewald * r + 1.0)
                         * factor_coul)
            phicoul = prefactor * screening * factor_coul
        elif p.coul_kind == "msm":
            ec, fc = _msm_coul_terms(prefactor, r, rsq, p.cut_coulsq,
                                     p.msm_order)
            forcecoul = fc - (1.0 - factor_coul) * prefactor
            phicoul = ec - (1.0 - factor_coul) * prefactor
        elif p.coul_kind in ("dsf", "wolf"):
            ec, fc = _dsf_wolf_pair_terms(p, prefactor, r, rsq)
            forcecoul = fc - (1.0 - factor_coul) * prefactor
            phicoul = ec - (1.0 - factor_coul) * prefactor
        elif p.coul_kind in ("charmm", "charmm/implicit", "gromacs",
                             "charmmfsh"):
            phicoul, forcecoul = _charmm_gromacs_coul_terms(
                p, prefactor, r, rsq, factor_coul)
        else:
            grij = p.g_ewald * r
            expm2 = jnp.exp(-grij * grij)
            t = 1.0 / (1.0 + EWALD_P * grij)
            erfc = (t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5))))
                    * expm2)
            # coul/cut styles ride this branch with g_ewald == 0: use the
            # exact 1/r there (the A&S polynomial is only ~1e-9 at x=0,
            # pair_lj_cut_coul_cut.cpp computes plain prefactor/r)
            erfc = jnp.where(p.g_ewald > 0, erfc, 1.0)
            forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
                - (1.0 - factor_coul) * prefactor
            phicoul = prefactor * erfc - (1.0 - factor_coul) * prefactor
        incoul = rsq < p.cut_coulsq
        forcecoul = jnp.where(incoul, forcecoul, 0.0)
        phicoul = jnp.where(incoul, phicoul, 0.0)
    r6inv = r2inv * r2inv * r2inv
    if p.kind == "table":
        itype = jnp.asarray(itype)
        jtype = jnp.asarray(jtype)
        forcelj, philj = _table_terms(p, rsq, r2inv, itype, jtype)
    else:
        forcelj, philj = _vdw_terms(
            p.kind, rsq, r2inv, p.lj1[itype, jtype], p.lj2[itype, jtype],
            p.lj3[itype, jtype], p.lj4[itype, jtype],
            p.lj5[itype, jtype] if p.lj5 is not None else None,
            jnp.sqrt(p.cut_ljsq[itype, jtype]) if p.kind == "soft"
            else None)
    philj = philj - p.offset[itype, jtype]
    if p.charmm_fsw:
        forcelj, philj = _charmm_fsw_terms(
            p, p.lj3[itype, jtype], p.lj4[itype, jtype],
            p.cut_ljsq[itype, jtype], rsq, r2inv, forcelj)
    elif p.charmm:
        cut_ljsq = p.cut_ljsq[itype, jtype]
        switch1 = ((cut_ljsq - rsq) ** 2
                   * (cut_ljsq + 2.0 * rsq - 3.0 * p.cut_lj_innersq)
                   / p.denom_lj)
        switch2 = (12.0 * rsq * (cut_ljsq - rsq)
                   * (rsq - p.cut_lj_innersq) / p.denom_lj)
        outer = rsq > p.cut_lj_innersq
        philj_raw = r6inv * (p.lj3[itype, jtype] * r6inv - p.lj4[itype, jtype])
        forcelj = jnp.where(outer, forcelj * switch1 + philj_raw * switch2,
                            forcelj)
        philj = jnp.where(outer, philj_raw * switch1, philj)
    inlj = rsq < p.cut_ljsq[itype, jtype]
    forcelj = jnp.where(inlj, forcelj, 0.0)
    philj = jnp.where(inlj, philj, 0.0)
    fforce = (forcecoul + factor_lj * forcelj) * r2inv
    eng = phicoul + factor_lj * philj
    return eng, fforce


def _pair_terms(rsq, qi, qj, ti, tj, sp_code, p: PairParams, pair_mask):
    """Per-pair LJ + Coulomb force magnitude (fpair / r == F.delta/r^2 factor)
    and energies. Shapes broadcast; rsq must be masked nonzero."""
    dtype = rsq.dtype
    r2inv = 1.0 / rsq
    factor_lj = p.special_lj[sp_code]
    cutsq_ij = p.cutsq[ti, tj]
    cut_ljsq_ij = p.cut_ljsq[ti, tj]

    in_range = (rsq < cutsq_ij) & pair_mask
    if p.excl is not None:
        in_range &= ~p.excl[ti, tj]
    lj_mask = in_range & (rsq < cut_ljsq_ij)

    if p.kind == "table":
        forcelj, philj = _table_terms(p, rsq, r2inv, ti, tj)
    else:
        forcelj, philj = _vdw_terms(
            p.kind, rsq, r2inv, p.lj1[ti, tj], p.lj2[ti, tj],
            p.lj3[ti, tj], p.lj4[ti, tj],
            p.lj5[ti, tj] if p.lj5 is not None else None,
            jnp.sqrt(cut_ljsq_ij) if p.kind == "soft" else None)
    if p.charmm_fsw:
        forcelj, philj = _charmm_fsw_terms(
            p, p.lj3[ti, tj], p.lj4[ti, tj], cut_ljsq_ij, rsq, r2inv,
            forcelj)
    elif p.charmm:
        # energy switching between inner/outer LJ cutoffs
        # (pair_lj_charmm_coul_long.cpp:110-125); cutoffs are global
        switch1 = ((cut_ljsq_ij - rsq) ** 2
                   * (cut_ljsq_ij + 2.0 * rsq - 3.0 * p.cut_lj_innersq)
                   / p.denom_lj)
        switch2 = (12.0 * rsq * (cut_ljsq_ij - rsq)
                   * (rsq - p.cut_lj_innersq) / p.denom_lj)
        outer = rsq > p.cut_lj_innersq
        forcelj = jnp.where(outer, forcelj * switch1 + philj * switch2,
                            forcelj)
        philj = jnp.where(outer, philj * switch1, philj)
    if p.kind in ("lj/long", "buck/long"):
        # long-dispersion kinds: the special factor scales ONLY the bare
        # potential — the k-space sum is over all pairs, so the special
        # case adds back t = rn*(1-f) of the r^-6 term
        # (pair_lj_long_coul_long.cpp:529-533 /
        #  pair_buck_long_coul_long.cpp order6 special branch).
        # Algebraically terms(f) = terms(1) - (1-f) * plain_terms.
        base_kind = "lj" if p.kind == "lj/long" else "buck"
        f0, e0 = _vdw_terms(base_kind, rsq, r2inv, p.lj1[ti, tj],
                            p.lj2[ti, tj], p.lj3[ti, tj], p.lj4[ti, tj])
        forcelj = forcelj - (1.0 - factor_lj) * f0
        philj = philj - (1.0 - factor_lj) * e0
        evdwl = philj - p.offset[ti, tj]
    else:
        evdwl = (philj - p.offset[ti, tj]) * factor_lj
        forcelj = forcelj * factor_lj
    forcelj = jnp.where(lj_mask, forcelj, 0.0)
    evdwl = jnp.where(lj_mask, evdwl, 0.0)

    if p.coul:
        factor_coul = p.special_coul[sp_code]
        coul_mask = in_range & (rsq < p.cut_coulsq)
        r = jnp.sqrt(rsq)
        prefactor = p.qqrd2e * qi * qj / r
        if p.coul_kind == "debye":
            # pair_coul_debye.cpp:87-89: kappa rides in g_ewald
            screening = jnp.exp(-p.g_ewald * r)
            forcecoul = prefactor * screening * (p.g_ewald * r + 1.0)
            forcecoul = forcecoul * factor_coul
            ecoul = prefactor * screening * factor_coul
        elif p.coul_kind == "msm":
            ec_m, fc_m = _msm_coul_terms(prefactor, r, rsq, p.cut_coulsq,
                                         p.msm_order)
            forcecoul = fc_m - (1.0 - factor_coul) * prefactor
            ecoul = ec_m - (1.0 - factor_coul) * prefactor
        elif p.coul_kind in ("dsf", "wolf"):
            ec_d, fc_d = _dsf_wolf_pair_terms(p, prefactor, r, rsq)
            forcecoul = fc_d - (1.0 - factor_coul) * prefactor
            ecoul = ec_d - (1.0 - factor_coul) * prefactor
        elif p.coul_kind in ("charmm", "charmm/implicit", "gromacs",
                             "charmmfsh"):
            ecoul, forcecoul = _charmm_gromacs_coul_terms(
                p, prefactor, r, rsq, factor_coul)
        else:
            grij = p.g_ewald * r
            expm2 = jnp.exp(-grij * grij)
            t = 1.0 / (1.0 + EWALD_P * grij)
            erfc = (t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5))))
                    * expm2)
            erfc = jnp.where(p.g_ewald > 0, erfc, 1.0)  # exact coul/cut
            forcecoul = prefactor * (erfc + EWALD_F * grij * expm2)
            forcecoul = forcecoul - (1.0 - factor_coul) * prefactor
            ecoul = prefactor * erfc - (1.0 - factor_coul) * prefactor
        forcecoul = jnp.where(coul_mask, forcecoul, 0.0)
        ecoul = jnp.where(coul_mask, ecoul, 0.0)
    else:
        forcecoul = jnp.zeros_like(forcelj)
        ecoul = jnp.zeros_like(evdwl)

    fpair = (forcecoul + forcelj) * r2inv
    return fpair.astype(dtype), evdwl, ecoul


def dense_pair_forces(x, q, type_, sp_code, mask, box: Box, p: PairParams,
                      mol=None):
    """All-pairs (N,N) evaluation. Returns (f, evdwl, ecoul, virial6).

    virial6 ordering: xx yy zz xy xz yz (LAMMPS convention, pair.cpp:854).
    """
    n = x.shape[0]
    delta = min_image_box(x[:, None, :] - x[None, :, :], box)  # (N,N,3)
    rsq = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    pair_mask = (~eye) & mask[:, None] & mask[None, :]
    if p.excl_mol and mol is not None:
        pair_mask &= mol[:, None] != mol[None, :]
    rsq = jnp.where(pair_mask, rsq, 1.0)

    fpair, evdwl, ecoul = _pair_terms(
        rsq, q[:, None], q[None, :], type_[:, None], type_[None, :],
        sp_code, p, pair_mask,
    )
    f = jnp.sum(fpair[:, :, None] * delta, axis=1)
    evdwl_tot = 0.5 * jnp.sum(evdwl)
    ecoul_tot = 0.5 * jnp.sum(ecoul)
    w = 0.5 * fpair
    virial = jnp.stack([
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 0]),
        jnp.sum(w * delta[:, :, 1] * delta[:, :, 1]),
        jnp.sum(w * delta[:, :, 2] * delta[:, :, 2]),
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 1]),
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 2]),
        jnp.sum(w * delta[:, :, 1] * delta[:, :, 2]),
    ])
    return f, evdwl_tot, ecoul_tot, virial
