"""Simulation assembly: interpreter state -> jitted runnable system.

The analog of LAMMPS init phase (Run::command -> LAMMPS::init, run.cpp:38):
builds the System pytree, force-field parameter tables (with Lorentz-Berthelot
mixing for unset type pairs, Pair::init_one pair.cpp:660,676), Ewald k-space
setup, integrator params (fix nve / fix rigid), temperature dof bookkeeping
(including FixRigid::dof removal, fix_rigid.cpp:1181), thermo columns and
dump writers.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from lidp_tpu import topology as topo_mod
from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField
from lidp_tpu.integrate import nve as nve_mod
from lidp_tpu.integrate import rigid as rigid_mod
from lidp_tpu.integrate.driver import (Runner, nve_integrator,
                                       rigid_nve_integrator)
from lidp_tpu.ops import polarization as pol_ops
from lidp_tpu.ops.ewald import EwaldParams, setup_ewald_disp
from lidp_tpu.ops.neighbor import NeighborConfig
from lidp_tpu.ops.pair import make_pair_params
from lidp_tpu.state import make_system
from lidp_tpu.thermo import ThermoParams, temperature

DENSE_PATH_MAX_ATOMS = 4096

# pair_style name -> (_vdw_terms kind, n coefficients)
_GENERIC_PAIR_KINDS = {
    "morse": ("morse", 3), "buck": ("buck", 3),
    "buck/coul/cut": ("buck", 3), "buck/coul/long": ("buck", 3),
    "yukawa": ("yukawa", 1), "gauss": ("gauss", 2), "soft": ("soft", 1),
    "born": ("born", 5), "coul/cut": ("none", 0), "coul/long": ("none", 0),
    "coul/msm": ("none", 0),
    "coul/debye": ("none", 0), "lj/expand": ("lj/expand", 3),
    "born/coul/long": ("born", 5), "mie/cut": ("mie", 4),
    "lj/gromacs": ("lj/gromacs", 2),
    "coul/dsf": ("none", 0), "coul/wolf": ("none", 0),
    "born/coul/dsf": ("born", 5), "born/coul/wolf": ("born", 5),
    "born/coul/msm": ("born", 5), "buck/coul/msm": ("buck", 3),
    "lj/gromacs/coul/gromacs": ("lj/gromacs", 2),
    "beck": ("beck", 5), "zero": ("none", 0),
    "lj96/cut": ("lj96", 2), "lj/smooth/linear": ("lj/smooth/linear", 2),
    "lj/smooth": ("lj/smooth", 2), "ufm": ("ufm", 2),
    "zbl": ("zbl", 2), "lj/cubic": ("lj/cubic", 2),
}


def _build_table_pair(script, excl_types, dtype):
    """pair_style table linear N: resample every pair's (r, E, F) rows
    onto a common linear-in-r grid up to the largest cutoff
    (pair_table.cpp compute_table)."""
    import jax.numpy as jnp

    from lidp_tpu.ops.pair import PairParams

    T = script.ntypes
    nt = getattr(script, "_table_n", 1000)
    cut = np.zeros((T + 1, T + 1))
    entries = {}
    rlo_all = np.inf
    for (i, j), co in script.pair_coeffs.items():
        tag, r_t, e_t, f_t = co[0]
        assert tag == "tablefile"
        cut[i, j] = cut[j, i] = co[2]
        entries[(i, j)] = (r_t, e_t, f_t)
        rlo_all = min(rlo_all, float(r_t[0]))
    for i in range(1, T + 1):
        for j in range(i, T + 1):
            if (i, j) not in entries:
                raise ValueError(
                    f"All pair coeffs are not set (table {i} {j})")
    rhi = float(np.max(cut))
    grid = np.linspace(rlo_all, rhi, nt)
    tab_e = np.zeros((T + 1, T + 1, nt))
    tab_f = np.zeros((T + 1, T + 1, nt))
    for (i, j), (r_t, e_t, f_t) in entries.items():
        ei = np.interp(grid, r_t, e_t, left=e_t[0], right=0.0)
        fi = np.interp(grid, r_t, f_t, left=f_t[0], right=0.0)
        tab_e[i, j] = tab_e[j, i] = ei
        tab_f[i, j] = tab_f[j, i] = fi
    z = jnp.zeros((T + 1, T + 1), dtype)
    pair = PairParams(
        lj1=z, lj2=z, lj3=z, lj4=z, offset=z,
        cut_ljsq=jnp.asarray(cut, dtype) ** 2,
        cutsq=jnp.asarray(cut, dtype) ** 2,
        cut_coulsq=jnp.asarray(0.0, dtype),
        special_lj=jnp.asarray(script.special_lj, dtype),
        special_coul=jnp.asarray(script.special_coul, dtype),
        qqrd2e=jnp.asarray(1.0, dtype), g_ewald=jnp.asarray(0.0, dtype),
        cut_lj_innersq=jnp.asarray(0.0, dtype),
        denom_lj=jnp.asarray(1.0, dtype),
        coul=False, charmm=False,
        excl=(None if excl_types is None
              else jnp.asarray(excl_types, bool)),
        kind="table",
        tab_e=jnp.asarray(tab_e, dtype), tab_f=jnp.asarray(tab_f, dtype),
        tab_rlo=jnp.asarray(grid[0], dtype),
        tab_dr=jnp.asarray(grid[1] - grid[0], dtype))
    return pair, cut


def _build_mixed_generic_pair(script, u, excl_types, dtype, kind, nc):
    """mie/cut and lj/gromacs: geometric mixing for unset pairs (the
    Pair::mix_flag GEOMETRIC default both styles inherit — pair_mie_cut.cpp
    init_one :530-540, pair_lj_gromacs.cpp init_one) and a stacked extra
    coefficient table in lj5 (exponents for mie, switch constants for
    gromacs)."""
    from lidp_tpu.ops.pair import make_generic_pair_params

    T = script.ntypes
    cut = np.full((T + 1, T + 1), script.pair.cut_lj_global)
    inner = np.full((T + 1, T + 1), script.pair.cut_lj_inner)
    # raw per-pair params: mie (eps sig gamR gamA), gromacs (eps sig)
    raw = np.zeros((T + 1, T + 1, nc))
    seen = np.zeros((T + 1, T + 1), bool)
    for (i, j), co in script.pair_coeffs.items():
        raw[i, j] = raw[j, i] = co[:nc]
        if kind in ("lj/gromacs", "lj/smooth") and len(co) >= nc + 2:
            inner[i, j] = inner[j, i] = co[nc]
            cut[i, j] = cut[j, i] = co[nc + 1]
        elif len(co) > nc:
            cut[i, j] = cut[j, i] = co[nc]
        seen[i, j] = seen[j, i] = True
    for i in range(1, T + 1):
        if not seen[i, i]:
            raise ValueError(f"All pair coeffs are not set ({i} {i})")
    for i in range(1, T + 1):
        for j in range(i + 1, T + 1):
            if not seen[i, j]:
                # mix GEOMETRIC: every scalar mixes as sqrt(a_ii a_jj)
                raw[i, j] = raw[j, i] = np.sqrt(raw[i, i] * raw[j, j])
                cut[i, j] = cut[j, i] = np.sqrt(cut[i, i] * cut[j, j])
                inner[i, j] = inner[j, i] = np.sqrt(inner[i, i]
                                                    * inner[j, j])

    tabs = [np.zeros((T + 1, T + 1)) for _ in range(4)]
    if kind == "mie":
        eps, sig, gamR, gamA = (raw[..., k] for k in range(4))
        with np.errstate(divide="ignore", invalid="ignore"):
            cmie = np.where(
                gamR != gamA,
                gamR / np.where(gamR != gamA, gamR - gamA, 1.0)
                * np.power(np.where(gamA > 0, gamR / np.where(
                    gamA > 0, gamA, 1.0), 1.0),
                    gamA / np.where(gamR != gamA, gamR - gamA, 1.0)),
                0.0)
        tabs[0] = cmie * gamR * eps * np.power(sig, gamR)
        tabs[1] = cmie * gamA * eps * np.power(sig, gamA)
        tabs[2] = cmie * eps * np.power(sig, gamR)
        tabs[3] = cmie * eps * np.power(sig, gamA)
        t5 = np.stack([gamR, gamA], axis=-1)
    elif kind == "lj96":
        # pair_lj96_cut.cpp init_one:529-532: 9-6 LJ coefficient tables
        eps, sig = raw[..., 0], raw[..., 1]
        s6 = sig ** 6
        s9 = s6 * sig ** 3
        tabs[0] = 36.0 * eps * s9
        tabs[1] = 24.0 * eps * s6
        tabs[2] = 4.0 * eps * s9
        tabs[3] = 4.0 * eps * s6
        t5 = None
    elif kind == "lj/smooth/linear":
        # pair_lj_smooth_linear.cpp init_one:239-240: ljcut/dljcut shifts
        eps, sig = raw[..., 0], raw[..., 1]
        s6 = sig ** 6
        tabs[0] = 48.0 * eps * s6 * s6
        tabs[1] = 24.0 * eps * s6
        tabs[2] = 4.0 * eps * s6 * s6
        tabs[3] = 4.0 * eps * s6
        rc = np.where(cut > 0, cut, 1.0)
        c6i = rc ** -6.0
        ljcut = c6i * (tabs[2] * c6i - tabs[3])
        dljcut = (1.0 / rc) * c6i * (tabs[0] * c6i - tabs[1])
        t5 = np.stack([ljcut, dljcut, cut], axis=-1)
    elif kind == "lj/smooth":
        # pair_lj_smooth.cpp init_one: cubic force-skin ljsw0..ljsw4
        eps, sig = raw[..., 0], raw[..., 1]
        s6 = sig ** 6
        tabs[0] = 48.0 * eps * s6 * s6
        tabs[1] = 24.0 * eps * s6
        tabs[2] = 4.0 * eps * s6 * s6
        tabs[3] = 4.0 * eps * s6
        ri = np.where(inner > 0, inner, 1.0)
        r6i = ri ** -6.0
        have_sw = cut > inner
        t = np.where(have_sw, cut - inner, 1.0)
        tsq = t * t
        ratio = sig / ri
        ljsw0 = 4.0 * eps * (ratio ** 12 - ratio ** 6)
        ljsw1 = r6i * (tabs[0] * r6i - tabs[1]) / ri
        ljsw2 = -r6i * (13.0 * tabs[0] * r6i - 7.0 * tabs[1]) / (ri * ri)
        ljsw3 = -(3.0 / tsq) * (ljsw1 + 2.0 / 3.0 * ljsw2 * t)
        ljsw4 = -1.0 / (3.0 * tsq) * (ljsw2 + 2.0 * ljsw3 * t)
        # inner == cut: no skin; ljsw0 alone carries the offset value
        for arr in (ljsw1, ljsw2, ljsw3, ljsw4):
            arr[~have_sw] = 0.0
        t5 = np.stack([ljsw0, ljsw1, ljsw2, ljsw3, ljsw4, inner], axis=-1)
    elif kind == "ufm":
        # pair_ufm.cpp init_one:237-245: Gaussian-core UFM tables
        eps, sig = raw[..., 0], raw[..., 1]
        sg = np.where(sig > 0, sig, 1.0)
        tabs[0] = 2.0 * eps / (sg * sg)
        tabs[1] = 1.0 / (sg * sg)
        tabs[2] = eps
        t5 = None
    elif kind == "lj/cubic":
        # pair_lj_cubic.cpp coeff/init_one: cutoffs are DERIVED from
        # sigma (rmin*SS inflection, rmin*SM cutoff), never parsed
        eps, sig = raw[..., 0], raw[..., 1]
        s6 = sig ** 6
        tabs[0] = 48.0 * eps * s6 * s6
        tabs[1] = 24.0 * eps * s6
        tabs[2] = 4.0 * eps * s6 * s6
        tabs[3] = 4.0 * eps * s6
        rmin = sig * 1.1224621
        inner = rmin * 1.1086834
        cut = rmin * 1.5475375
        t5 = np.stack([eps, sig, inner], axis=-1)
    else:   # lj/gromacs switch constants (pair_lj_gromacs.cpp init_one)
        eps, sig = raw[..., 0], raw[..., 1]
        s6 = sig ** 6
        tabs[0] = 48.0 * eps * s6 * s6
        tabs[1] = 24.0 * eps * s6
        tabs[2] = 4.0 * eps * s6 * s6
        tabs[3] = 4.0 * eps * s6
        rc = np.where(cut > 0, cut, 1.0)
        ri = inner
        r6inv = 1.0 / rc ** 6
        r8inv = 1.0 / rc ** 8
        t = np.where(rc > ri, rc - ri, 1.0)
        t2inv = 1.0 / (t * t)
        t3inv = t2inv / t
        t3 = 1.0 / t3inv
        a6 = (7.0 * ri - 10.0 * rc) * r8inv * t2inv
        b6 = (9.0 * rc - 7.0 * ri) * r8inv * t3inv
        a12 = (13.0 * ri - 16.0 * rc) * r6inv * r8inv * t2inv
        b12 = (15.0 * rc - 13.0 * ri) * r6inv * r8inv * t3inv
        c6 = r6inv - t3 * (6.0 * a6 / 3.0 + 6.0 * b6 * t / 4.0)
        c12 = r6inv * r6inv - t3 * (12.0 * a12 / 3.0 + 12.0 * b12 * t / 4.0)
        sw1 = tabs[0] * a12 - tabs[1] * a6
        sw2 = tabs[0] * b12 - tabs[1] * b6
        sw3 = -tabs[2] * 12.0 * a12 / 3.0 + tabs[3] * 6.0 * a6 / 3.0
        sw4 = -tabs[2] * 12.0 * b12 / 4.0 + tabs[3] * 6.0 * b6 / 4.0
        sw5 = -tabs[2] * c12 + tabs[3] * c6
        t5 = np.stack([sw1, sw2, sw3, sw4, sw5, inner], axis=-1)

    coul = "coul" in script.pair.name   # lj/gromacs/coul/gromacs
    pair = make_generic_pair_params(
        kind, tabs[0], tabs[1], tabs[2], tabs[3], t5,
        cut_lj=cut, cut_coul=script.pair.cut_coul if coul else 0.0,
        coul=coul, qqrd2e=u.qqr2e,
        special_lj=np.array(script.special_lj),
        special_coul=np.array(script.special_coul),
        shift=(getattr(script, "_pair_shift", False)
               and kind in ("mie", "lj96", "lj/smooth", "ufm")),
        excl_types=excl_types,
        coul_kind="gromacs" if coul else "long",
        cut_coul_inner=script.pair.cut_coul_inner if coul else 0.0,
        dtype=dtype)
    return pair, cut


def _build_zbl_pair(script, u, excl_types, dtype):
    """pair_style zbl inner outer (pair_zbl.cpp): the universal
    Ziegler-Biersack-Littmark screened nuclear repulsion.  Per-type-pair
    (Zi, Zj) coefficients become the d{1..4}a / zze exponential tables and
    the C2-continuous switching constants of set_coeff (:297-352), stacked
    into the lj5 channel table for the `zbl` _vdw_terms kind."""
    from lidp_tpu.ops.pair import make_generic_pair_params

    T = script.ntypes
    inner = script.pair.cut_lj_inner
    outer = script.pair.cut_lj_global
    cut = np.full((T + 1, T + 1), outer)
    cut[0, :] = cut[:, 0] = 0.0
    pzbl, a0 = 0.23, 0.46850
    cc = np.array([0.02817, 0.28022, 0.50986, 0.18175])
    dd = np.array([0.20162, 0.40290, 0.94229, 3.19980])
    t5 = np.zeros((T + 1, T + 1, 11))
    t5[..., 10] = inner
    seen = np.zeros((T + 1, T + 1), bool)
    qe = u.qelectron
    for (i, j), co in script.pair_coeffs.items():
        zi, zj = co[0], co[1]
        ainv = (zi ** pzbl + zj ** pzbl) / (a0 * u.angstrom)
        da = dd * ainv
        zze = zi * zj * u.qqr2e * qe * qe

        def e_zbl(r, da=da, zze=zze):
            return zze * np.sum(cc * np.exp(-da * r)) / r

        def dzbldr(r, da=da, zze=zze):
            e = np.exp(-da * r)
            return zze * (-np.sum(cc * da * e) - np.sum(cc * e) / r) / r

        def d2zbldr2(r, da=da, zze=zze):
            e = np.exp(-da * r)
            return zze * (np.sum(cc * da * da * e)
                          + 2.0 * np.sum(cc * da * e) / r
                          + 2.0 * np.sum(cc * e) / (r * r)) / r

        # C2 smooth truncation: e(rc) = e'(rc) = e''(rc) = 0 (set_coeff)
        tc = outer - inner
        fc = e_zbl(outer)
        fcp = dzbldr(outer)
        fcpp = d2zbldr2(outer)
        swa = (-3.0 * fcp + tc * fcpp) / (tc * tc)
        swb = (2.0 * fcp - tc * fcpp) / (tc * tc * tc)
        swc = -fc + (tc / 2.0) * fcp - (tc * tc / 12.0) * fcpp
        row = list(da) + [zze, swa, swb, swa / 3.0, swb / 4.0, swc, inner]
        t5[i, j] = t5[j, i] = row
        seen[i, j] = seen[j, i] = True
    for i in range(1, T + 1):
        for j in range(i, T + 1):
            if not seen[i, j]:
                raise ValueError(f"All pair coeffs are not set (zbl {i} {j})")
    z = np.zeros((T + 1, T + 1))
    pair = make_generic_pair_params(
        "zbl", z, z, z, z, t5, cut_lj=cut, cut_coul=0.0, coul=False,
        qqrd2e=u.qqr2e, special_lj=np.array(script.special_lj),
        special_coul=np.array(script.special_coul),
        excl_types=excl_types, dtype=dtype)
    return pair, cut


# hybrid sub-style families: which coeff-tuple zero-fills an UNASSIGNED
# type pair (parseable + zero interaction; the per-sub-style excl mask is
# the real guard), and which styles mix within the sub-style
_HYBRID_ZERO_ROW = {
    "lj/cut": (0.0, 1.0), "lj/cut/coul/cut": (0.0, 1.0),
    "lj/cut/coul/long": (0.0, 1.0), "lj/cut/coul/debye": (0.0, 1.0),
    "lj/cut/coul/msm": (0.0, 1.0), "lj/cut/coul/dsf": (0.0, 1.0),
    "lj/cut/coul/wolf": (0.0, 1.0),
    "mie/cut": (0.0, 1.0, 12.0, 6.0), "lj/gromacs": (0.0, 1.0),
    "lj96/cut": (0.0, 1.0), "lj/smooth": (0.0, 1.0),
    "lj/smooth/linear": (0.0, 1.0), "ufm": (0.0, 1.0),
    "morse": (0.0, 1.0, 1.0), "buck": (0.0, 1.0, 0.0),
    "buck/coul/cut": (0.0, 1.0, 0.0), "buck/coul/long": (0.0, 1.0, 0.0),
    "yukawa": (0.0,), "gauss": (0.0, 0.0), "soft": (0.0,),
    "born": (0.0, 1.0, 1.0, 0.0, 0.0),
    "born/coul/long": (0.0, 1.0, 1.0, 0.0, 0.0),
    "born/coul/dsf": (0.0, 1.0, 1.0, 0.0, 0.0),
    "born/coul/wolf": (0.0, 1.0, 1.0, 0.0, 0.0),
    "lj/expand": (0.0, 1.0, 0.0), "beck": (0.0, 0.0, 1.0, 1.0, 0.0),
    "zbl": (1.0, 1.0),
}
_HYBRID_MIX_STYLES = frozenset(
    n for n in _HYBRID_ZERO_ROW
    if n.startswith(("lj/cut", "lj96", "lj/smooth", "lj/gromacs",
                     "mie", "ufm")))


def _build_sub_pair(sc, u, excl, dtype):
    """(pair, cut) for one hybrid sub-style (a restricted clone of the
    from_script dispatch: generic kinds + the lj/cut mixing family)."""
    pname = sc.pair.name
    if pname in _GENERIC_PAIR_KINDS:
        return _build_generic_pair(sc, u, excl, dtype)
    if pname in _HYBRID_ZERO_ROW:    # lj/cut family
        eps, sig, cut = _mix_pair_tables(sc)
        coul = "coul" in pname
        is_debye = "debye" in pname
        is_msm = pname.endswith("/msm")
        is_dsf = pname.endswith("/dsf")
        is_wolf = pname.endswith("/wolf")
        pair = make_pair_params(
            eps, sig, cut,
            cut_coul=sc.pair.cut_coul if coul else 0.0,
            special_lj=np.array(sc.special_lj),
            special_coul=np.array(sc.special_coul),
            qqrd2e=u.qqr2e, coul=coul,
            g_ewald=(sc._debye_kappa if is_debye
                     else sc._dsf_alpha if (is_dsf or is_wolf) else 0.0),
            shift=getattr(sc, "_pair_shift", False),
            excl_types=excl,
            coul_kind=("debye" if is_debye else "msm" if is_msm
                       else "dsf" if is_dsf
                       else "wolf" if is_wolf else "long"),
            dtype=dtype)
        return pair, cut
    raise NotImplementedError(f"hybrid sub-style {pname}")


def _build_hybrid_pair(script, u, base_excl, dtype):
    """pair_style hybrid[/overlay] (pair_hybrid.cpp) re-designed for XLA:
    instead of the reference's per-pair map_style indirection, every
    sub-style becomes one fully-masked kernel pass over the same neighbor
    structure, statically unrolled and summed (compute_forces loops over
    ff.extra_pairs).  A type pair outside a sub-style's assignment is
    masked through that sub-style's excl table.

    Returns (first PairParams, extras tuple, coul_long flags, cut)."""
    import copy

    T = script.ntypes
    built = []
    flags = []
    cut_all = np.zeros((T + 1, T + 1))
    for k, (name, args) in enumerate(script.pair_hybrid):
        sc = copy.copy(script)
        sc._invalidate = lambda: None            # scratch copy: no rebuild
        sc.cmd_pair_style([name] + list(args))   # resets sc.pair_coeffs
        for (it, jt, toks) in script.hybrid_raw_coeffs[k]:
            if toks is None:
                # pair_coeff I J none: drop from every sub-style
                ii = (range(1, T + 1) if it == "*" else [int(it)])
                jj = (range(1, T + 1) if jt == "*" else [int(jt)])
                for i_ in ii:
                    for j_ in jj:
                        sc.pair_coeffs.pop((min(i_, j_), max(i_, j_)),
                                           None)
                continue
            sc.cmd_pair_coeff([it, jt] + list(toks))
        explicit = set(sc.pair_coeffs)
        if name.startswith("coul/") or name == "zero":
            assigned = {(i, j) for i in range(1, T + 1)
                        for j in range(i, T + 1)}
        else:
            assigned = set(explicit)
            if name in _HYBRID_MIX_STYLES:
                # within-sub-style mixing assigns (i,j) when both
                # diagonals belong to it (PairHybrid::init_one)
                for i in range(1, T + 1):
                    for j in range(i + 1, T + 1):
                        if (i, i) in explicit and (j, j) in explicit:
                            assigned.add((i, j))
            zr = _HYBRID_ZERO_ROW.get(name)
            if zr is not None:
                for i in range(1, T + 1):
                    for j in range(i, T + 1):
                        if (i, j) not in explicit:
                            sc.pair_coeffs[(i, j)] = zr + (0.0,)
        excl = np.ones((T + 1, T + 1), bool)
        for (i, j) in assigned:
            excl[i, j] = excl[j, i] = False
        if base_excl is not None:
            excl |= base_excl
        pair, cut = _build_sub_pair(sc, u, excl, dtype)
        amask = ~excl
        cut_all = np.maximum(cut_all, np.where(amask, cut, 0.0))
        if "coul" in name:
            cut_all = np.maximum(
                cut_all, np.where(amask, sc.pair.cut_coul, 0.0))
        built.append(pair)
        # coul/long sub-styles need the kspace g_ewald patched in later
        flags.append("coul" in name and not any(
            s in name for s in ("debye", "msm", "dsf", "wolf", "cut")))
        if "coul" in name:
            # kspace setup reads script.pair.cut_coul (ewald.cpp init
            # asks the pair for its coulomb cutoff)
            script.pair.cut_coul = max(script.pair.cut_coul,
                                       sc.pair.cut_coul)
    return built[0], tuple(built[1:]), tuple(flags), cut_all


def _build_dpd_pair(script, u, dtype):
    """pair dpd / dpd/tstat (pair_dpd.cpp settings/coeff/init_one):
    returns (cut matrix, DPDParams); the force itself is the dedicated
    dense DPD kernel (ops/dpd.py), not a PairParams kernel."""
    import jax.numpy as jnp

    from lidp_tpu.ops.dpd import DPDParams

    spec = script._dpd
    T = script.ntypes
    tstat = spec["tstat"]
    nc = 1 if tstat else 2
    a0 = np.zeros((T + 1, T + 1))
    gam = np.zeros((T + 1, T + 1))
    cut = np.zeros((T + 1, T + 1))
    seen = np.zeros((T + 1, T + 1), bool)
    for (i, j), co in script.pair_coeffs.items():
        if tstat:
            gam[i, j] = gam[j, i] = co[0]
        else:
            a0[i, j] = a0[j, i] = co[0]
            gam[i, j] = gam[j, i] = co[1]
        cut[i, j] = cut[j, i] = (co[nc] if len(co) > nc
                                 else script.pair.cut_lj_global)
        seen[i, j] = seen[j, i] = True
    for i in range(1, T + 1):
        for j in range(i, T + 1):
            if not seen[i, j]:
                raise ValueError(f"All pair coeffs are not set (dpd {i} {j})")
    # sigma = sqrt(2 kB T gamma) (init_one:236); constant-T form — the
    # tstat ramp uses the start temperature
    sigma = np.sqrt(2.0 * u.boltz * spec["T"] * gam)
    dpdp = DPDParams(
        a0=jnp.asarray(a0, dtype), gamma=jnp.asarray(gam, dtype),
        sigma=jnp.asarray(sigma, dtype), cut=jnp.asarray(
            np.where(cut > 0, cut, 1.0), dtype),
        cutsq=jnp.asarray(cut * cut, dtype),
        special_lj=jnp.asarray(script.special_lj, dtype),
        dtinvsqrt=jnp.asarray(1.0 / np.sqrt(max(script.dt, 1e-300)),
                              dtype),
        seed=int(spec["seed"]), tstat=tstat)
    return cut, dpdp


def _build_generic_pair(script, u, excl_types, dtype):
    """PairParams for the non-LJ pair styles (pair_morse/buck/yukawa/gauss/
    soft/born/coul_*.cpp).  Off-diagonal coefficients must be given
    explicitly — these styles have no mixing (init_one: 'All pair coeffs
    are not set')."""
    from lidp_tpu.ops.pair import make_generic_pair_params

    name = script.pair.name
    kind, nc = _GENERIC_PAIR_KINDS[name]
    T = script.ntypes
    coul = "coul" in name
    tabs = [np.zeros((T + 1, T + 1)) for _ in range(5)]
    cut = np.full((T + 1, T + 1), script.pair.cut_lj_global)
    if kind in ("mie", "lj/gromacs", "lj96", "lj/smooth/linear",
                "lj/smooth", "ufm", "lj/cubic"):
        return _build_mixed_generic_pair(script, u, excl_types, dtype,
                                         kind, nc)
    if kind == "zbl":
        return _build_zbl_pair(script, u, excl_types, dtype)
    if kind != "none":
        seen = np.zeros((T + 1, T + 1), bool)
        for (i, j), co in script.pair_coeffs.items():
            vals, cij = co[:nc], co[nc] if len(co) > nc else co[-1]
            if kind == "morse":
                d0, alpha, r0 = vals
                row = (d0, alpha, r0, 2.0 * d0 * alpha, 0.0)
            elif kind == "buck":
                A, rho, C = vals
                row = (A, 1.0 / rho, C, 0.0, 0.0)
            elif kind == "yukawa":
                row = (vals[0], script._yukawa_kappa, 0.0, 0.0, 0.0)
            elif kind == "gauss":
                row = (vals[0], vals[1], 0.0, 0.0, 0.0)
            elif kind == "soft":
                row = (vals[0], 0.0, 0.0, 0.0, 0.0)
            elif kind == "born":
                A, rho, sg, C, D = vals
                row = (A, 1.0 / rho, C, sg, D)
            elif kind == "lj/expand":
                e_, sg, delta = vals
                s6_ = sg ** 6
                row = (48.0 * e_ * s6_ * s6_, 24.0 * e_ * s6_,
                       4.0 * e_ * s6_ * s6_, 4.0 * e_ * s6_, delta)
            elif kind == "beck":
                row = tuple(vals)   # AA, BB, aa, alpha, beta verbatim
            for k, v in enumerate(row):
                tabs[k][i, j] = tabs[k][j, i] = v
            cut[i, j] = cut[j, i] = co[nc] if len(co) > nc else cij
            seen[i, j] = seen[j, i] = True
        for i in range(1, T + 1):
            for j in range(i, T + 1):
                if not seen[i, j]:
                    raise ValueError(
                        f"All pair coeffs are not set ({name} {i} {j})")
    elif name == "zero":
        # pair_style zero: no forces, but the global cutoff still drives
        # neighbor-list construction (pair_zero.cpp)
        pass
    else:
        cut = np.zeros((T + 1, T + 1))
    coul_kind = "long"
    g_ewald = 0.0   # coul/cut & cut styles: undamped 1/r (erfc(0) == 1)
    if "debye" in name:
        coul_kind = "debye"
        g_ewald = script._debye_kappa   # kappa rides in g_ewald
    elif name.endswith("msm"):
        coul_kind = "msm"
    elif name.endswith("/dsf"):
        coul_kind = "dsf"
        g_ewald = script._dsf_alpha     # alpha rides in g_ewald
    elif name.endswith("/wolf"):
        coul_kind = "wolf"
        g_ewald = script._dsf_alpha
    pair = make_generic_pair_params(
        kind, tabs[0], tabs[1], tabs[2], tabs[3],
        tabs[4] if kind in ("born", "lj/expand", "beck") else None,
        cut_lj=cut, cut_coul=script.pair.cut_coul if coul else 0.0,
        coul=coul, qqrd2e=u.qqr2e, g_ewald=g_ewald,
        special_lj=np.array(script.special_lj),
        special_coul=np.array(script.special_coul),
        shift=getattr(script, "_pair_shift", False),
        excl_types=excl_types, coul_kind=coul_kind, dtype=dtype)
    return pair, cut


def _mix_pair_tables(script):
    """Per-type-pair eps/sigma/cut tables with geometric mixing for unset
    pairs (Pair::mix_energy/mix_distance defaults for lj/cut styles)."""
    T = script.ntypes
    eps = np.zeros((T + 1, T + 1))
    sig = np.zeros((T + 1, T + 1))
    cut = np.full((T + 1, T + 1), script.pair.cut_lj_global)
    seen = np.zeros((T + 1, T + 1), bool)
    for (i, j), (e, s, c) in script.pair_coeffs.items():
        eps[i, j] = eps[j, i] = e
        sig[i, j] = sig[j, i] = s
        cut[i, j] = cut[j, i] = c
        seen[i, j] = seen[j, i] = True
    mix = getattr(script, "_pair_mix", "geometric")
    for i in range(1, T + 1):
        for j in range(i + 1, T + 1):
            if not seen[i, j]:
                if not (seen[i, i] and seen[j, j]):
                    continue
                eps[i, j] = eps[j, i] = np.sqrt(eps[i, i] * eps[j, j])
                if mix == "arithmetic":
                    sig[i, j] = sig[j, i] = 0.5 * (sig[i, i] + sig[j, j])
                else:
                    sig[i, j] = sig[j, i] = np.sqrt(sig[i, i] * sig[j, j])
                cut[i, j] = cut[j, i] = 0.5 * (cut[i, i] + cut[j, j])
    return eps, sig, cut


def _parse_wall_gran(script, spec, groups, u, npad):
    """fix ID group wall/gran pairstyle kn kt gamman gammat xmu dampflag
    wallstyle args [wiggle dim amp period | shear dim vshear]
    (fix_wall_gran.cpp:49-190) and fix wall/gran/region ... region ID
    (fix_wall_gran_region.cpp) — granular wall contacts with per-contact
    shear history."""
    import jax.numpy as jnp

    from lidp_tpu.integrate.gran_runner import WallGranFix

    a = list(spec.args)
    kind = a[0]
    if kind not in ("hooke", "hooke/history", "hertz/history"):
        raise ValueError(f"fix wall/gran interaction style {kind}")
    kn = float(a[1])
    kt = kn * 2.0 / 7.0 if a[2] == "NULL" else float(a[2])
    gamman = float(a[3])
    gammat = 0.5 * gamman if a[4] == "NULL" else float(a[4])
    xmu = float(a[5])
    if int(a[6]) == 0:
        gammat = 0.0
    if kind == "hertz/history":
        kn /= u.nktv2p
        kt /= u.nktv2p
    gm = jnp.asarray(groups[spec.group])
    kw = dict(kind=kind, kn=kn, kt=kt, gamman=gamman, gammat=gammat,
              xmu=xmu, gmask=gm, time_origin=int(script.step))
    i = 7
    style = a[i]
    if style in ("xplane", "yplane", "zplane"):
        kw["wallstyle"] = style
        kw["lo"] = -1.0e30 if a[i + 1] == "NULL" else float(a[i + 1])
        kw["hi"] = 1.0e30 if a[i + 2] == "NULL" else float(a[i + 2])
        i += 3
    elif style == "zcylinder":
        kw["wallstyle"] = style
        kw["cylradius"] = float(a[i + 1])
        i += 2
    elif style == "region":
        kw["wallstyle"] = "region"
        kw["region_contacts"] = _region_gran_contacts(script, a[i + 1])
        i += 2
    else:
        raise ValueError(f"fix wall/gran wallstyle {style}")
    while i < len(a):
        if a[i] == "wiggle":
            kw["wiggle"] = True
            kw["axis"] = "xyz".index(a[i + 1])
            kw["amplitude"] = float(a[i + 2])
            kw["omega_w"] = 2.0 * np.pi / float(a[i + 3])
            i += 4
        elif a[i] == "shear":
            kw["wshear"] = True
            kw["axis"] = "xyz".index(a[i + 1])
            kw["vshear"] = float(a[i + 2])
            i += 3
        else:
            raise ValueError(f"fix wall/gran keyword {a[i]}")
    return WallGranFix(**kw)


def _region_gran_contacts(script, rname):
    """Contact generators for fix wall/gran/region: x (N,3) ->
    [(rdist, del wall->atom, ok, rwall)], one per region face, mirroring
    Region::surface_interior (region_block.cpp / region_sphere.cpp:115 /
    region_cylinder.cpp:223; flat faces rwall=0, sphere -R, cylinder
    shell -2R).  Static regions only (no velocity_contact)."""
    import jax.numpy as jnp

    reg = script.regions[rname]
    s3 = np.asarray(script._region_spacing(rname), float)
    if isinstance(reg, tuple) and reg and reg[0] == "sphere":
        c = np.asarray(reg[1:4], float) * s3
        rad = float(reg[4]) * s3[0]

        def gen(x):
            d = x - c
            dist = jnp.sqrt(jnp.sum(d * d, 1))
            inside = (dist <= rad) & (dist > 0.0)
            rdist = rad - dist
            dl = d * (1.0 - rad / jnp.where(dist > 0, dist, 1.0))[:, None]
            rw = jnp.full(x.shape[0], -rad, x.dtype)
            return [(jnp.where(inside, rdist, -1.0), dl, inside, rw)]
        return gen
    if isinstance(reg, tuple) and reg and reg[0] == "cylinder":
        axis = "xyz".index(reg[1])
        o1, o2 = [d for d in range(3) if d != axis]
        c1v, c2v = float(reg[2]) * s3[o1], float(reg[3]) * s3[o2]
        rad = float(reg[4]) * s3[o1]
        lo_a = float(reg[5]) * s3[axis]
        hi_a = float(reg[6]) * s3[axis]

        def gen(x):
            d1 = x[:, o1] - c1v
            d2 = x[:, o2] - c2v
            dist = jnp.sqrt(d1 * d1 + d2 * d2)
            inside = ((dist <= rad) & (x[:, axis] >= lo_a)
                      & (x[:, axis] <= hi_a))
            out = []
            shell_ok = inside & (dist > 0.0)
            scale = 1.0 - rad / jnp.where(dist > 0, dist, 1.0)
            dl = (jnp.zeros_like(x).at[:, o1].set(d1 * scale)
                  .at[:, o2].set(d2 * scale))
            rw = jnp.full(x.shape[0], -2.0 * rad, x.dtype)
            out.append((jnp.where(shell_ok, rad - dist, -1.0), dl,
                        shell_ok, rw))
            for coord, sgn in ((lo_a, 1.0), (hi_a, -1.0)):
                rf = (x[:, axis] - coord) * sgn
                dlf = jnp.zeros_like(x).at[:, axis].set(rf * sgn)
                out.append((jnp.where(inside, rf, -1.0), dlf, inside,
                            None))
            return out
        return gen
    # block: legacy 6-tuple (INF faces contribute no wall)
    b = np.asarray(reg, float) * np.repeat(s3, 2)

    def gen(x):
        inside = jnp.ones(x.shape[0], bool)
        for dim in range(3):
            if np.isfinite(b[2 * dim]):
                inside &= x[:, dim] >= b[2 * dim]
            if np.isfinite(b[2 * dim + 1]):
                inside &= x[:, dim] <= b[2 * dim + 1]
        out = []
        for dim in range(3):
            for coord, sgn in ((b[2 * dim], 1.0), (b[2 * dim + 1], -1.0)):
                if not np.isfinite(coord):
                    continue
                rf = (x[:, dim] - coord) * sgn
                dlf = jnp.zeros_like(x).at[:, dim].set(rf * sgn)
                out.append((jnp.where(inside, rf, -1.0), dlf, inside,
                            None))
        return out
    return gen


def _build_granular_sim(script, sys, u, dtype, n, npad, _padA, groups, dim_):
    """Granular (atom_style sphere + pair gran/*) simulation assembly:
    bench/in.chute's stack — gran/hooke/history contacts, fix gravity
    chute, fix freeze, fix nve/sphere, compute erotate/sphere."""
    import jax.numpy as jnp

    from lidp_tpu.integrate.gran_runner import GranRunner
    from lidp_tpu.ops import granular as gran_mod
    from lidp_tpu.ops.cells import CellConfig

    if getattr(script, "radius", None) is None:
        raise ValueError("pair gran/* requires atom_style sphere data")
    radius = _padA(script.radius, 0.0)
    rmass = _padA(script.rmass, 1.0)
    omega0 = _padA(script.omega, 0.0)

    # fix pour atoms join "all" at insertion: the all-group mask must
    # cover the padded slots (sys.mask gates the real atom set everywhere)
    groups = dict(groups)
    groups["all"] = np.ones(npad, bool)

    frozen = np.zeros(npad, bool)
    active = np.ones(npad, bool)
    grav = np.zeros(3)
    grav_mag = 0.0
    nvt_spec = None
    walls = []
    pour_specs = []
    for spec in script.fixes.values():
        if spec.style == "freeze":
            frozen = np.asarray(groups[spec.group], bool)
        elif spec.style in ("wall/gran", "wall/gran/region"):
            walls.append(_parse_wall_gran(script, spec, groups, u, npad))
        elif spec.style == "pour":
            pour_specs.append(spec)
        elif spec.style == "gravity":
            mag = float(spec.args[0])
            grav_mag = mag
            if spec.args[1] == "chute":
                # fix_gravity.cpp:313: theta = 180 - angle, phi = 0
                th = np.deg2rad(180.0 - float(spec.args[2]))
                grav = mag * np.array([np.sin(th), 0.0, np.cos(th)])
            elif spec.args[1] == "vector":
                d3 = np.array([float(v) for v in spec.args[2:5]])
                grav = mag * d3 / np.linalg.norm(d3)
            else:
                raise NotImplementedError(
                    f"fix gravity style {spec.args[1]}")
        elif spec.style in ("nve/sphere", "nvt/sphere"):
            active = np.asarray(groups[spec.group], bool)
            if spec.style == "nvt/sphere":
                nvt_spec = spec
        elif spec.style in ("print", "ave/time", "ave/chunk"):
            pass
        else:
            raise NotImplementedError(
                f"fix style {spec.style} on granular systems")

    excl = None
    eg = getattr(script, "neigh_exclude_group", None)
    if eg is not None:
        excl = np.asarray(groups[eg], bool)

    kind = script.pair.name[len("gran/"):]
    if kind not in ("hooke/history", "hooke", "hertz/history"):
        raise NotImplementedError(f"pair_style gran/{kind}")
    gp = gran_mod.make_gran_params(
        script.gran_args, radius, rmass, frozen, excl=excl,
        dt=script.dt, dtype=dtype, kind=kind)

    pours = []
    if pour_specs:
        from lidp_tpu.pour import parse_pour

        if grav_mag <= 0.0:
            raise ValueError("No fix gravity defined for fix pour")
        for spec in pour_specs:
            pours.append(parse_pour(spec, script, None, grav_mag,
                                    u.ftm2v))

    L = script.box_hi - script.box_lo
    rad_max = float(np.max(script.radius)) if n else 0.0
    for pf_ in pours:
        rad_max = max(rad_max, pf_.radius_one, pf_.radius_hi)
    cutneigh = 2.0 * rad_max + script.skin
    n_eff = npad if pours else n
    ncfg = CellConfig.for_box(L, cutneigh,
                              density=n_eff / float(np.prod(L)),
                              cap_slack=5.0)

    shrink = None
    bstyles = getattr(script, "boundary_styles", None)
    if bstyles is not None:
        from lidp_tpu.box import ShrinkSpec

        code = {"p": 0, "f": 0, "s": 2, "m": 3}
        lo_c = tuple(code[st[0]] for st in bstyles)
        hi_c = tuple(code[st[1]] for st in bstyles)
        if any(c in (2, 3) for c in lo_c + hi_c):
            small = tuple(1.0e-4 * (script.box_hi - script.box_lo))
            shrink = ShrinkSpec(lo_style=lo_c, hi_style=hi_c, small=small,
                                min_lo=tuple(script.box_lo),
                                min_hi=tuple(script.box_hi))

    nvt_params = None
    if nvt_spec is not None:
        # fix nvt/sphere group temp Tstart Tstop Tdamp (fix_nvt_sphere.cpp)
        from lidp_tpu.integrate.nvt import NVTParams

        a_nvt = list(nvt_spec.args)
        it = a_nvt.index("temp")
        t0, t1, tper = (float(a_nvt[it + 1]), float(a_nvt[it + 2]),
                        float(a_nvt[it + 3]))
        ng = int(np.count_nonzero(active[:n]))
        nfin = int(np.count_nonzero(active[:n]
                                    & (np.asarray(radius[:n]) > 0)))
        # compute_temp_sphere.cpp dof: 2*dim per finite-radius atom in
        # the ALL rotation mode, dim per point atom, minus extra dim
        gdof = (2 * dim_ * nfin + dim_ * (ng - nfin)) - dim_
        nvt_params = NVTParams.create(
            script.dt, u.ftm2v, rmass, t0, tper, dof=gdof, boltz=u.boltz,
            mvv2e=u.mvv2e, t_stop=t1, dtype=dtype)
    runner = GranRunner(
        gp=gp, neighbor_cfg=ncfg, dt=script.dt, ftm2v=u.ftm2v,
        gmask=jnp.asarray(active), grav=jnp.asarray(grav, dtype),
        skin=script.skin, shrink=shrink,
        rebuild_every=script.neigh_every, delay=script.neigh_delay,
        check=script.neigh_check, nvt=nvt_params, walls=tuple(walls))
    runner._omega0 = jnp.asarray(omega0, dtype)

    norm = getattr(script, "_thermo_norm", None)
    tp = ThermoParams.create(
        rmass, dof=dim_ * n - dim_, units=u,
        norm=(u.name == "lj") if norm is None else norm,
        natoms=n, dim=dim_)
    sim_obj = Simulation(script=script, sys=sys, runner=runner,
                         thermo_params=tp, group_thermo={}, natoms=n)
    sim_obj.pour_fixes = pours
    sim_obj.halt_spec = None
    sim_obj.dtreset_cfg = None
    sim_obj._restrain_factory = None
    sim_obj._tmd_factory = None
    sim_obj.deform_cfg = None
    sim_obj.gg_computes = {}
    sim_obj.msd_computes = {}
    sim_obj.rdf_computes = {}
    sim_obj.simple_computes = {}
    sim_obj.vacf_computes = {}
    sim_obj.peratom_computes = {}
    sim_obj.reduce_computes = {}
    sim_obj.tempvar_computes = {}
    sim_obj.chunk_computes = {}
    sim_obj.chunkagg_computes = {}
    sim_obj.hf_computes = {}
    sim_obj.slice_computes = {}
    sim_obj.mesh = None
    sim_obj.n_padded = npad
    # compute erotate/sphere columns read runner istate omega
    sim_obj.erotate_computes = {
        cid: np.asarray(groups[sc[0]], bool)
        for cid, sc in script.computes.items()
        if len(sc) == 3 and sc[1] == "erotate/sphere"}
    sim_obj.tempsphere_computes = {
        cid: np.asarray(groups[sc[0]], bool)
        for cid, sc in script.computes.items()
        if len(sc) == 3 and sc[1] == "temp/sphere"}
    for cid, sc in script.computes.items():
        if len(sc) == 3 and sc[1] in ("erotate/sphere/atom",
                                      "contact/atom"):
            sim_obj.peratom_computes[cid] = (
                np.asarray(groups[sc[0]], bool), sc[1], sc[2])
        if len(sc) == 3 and sc[1] == "reduce":
            sim_obj.reduce_computes[cid] = (
                np.asarray(groups[sc[0]], bool), sc[2])
    sim_obj.gran_radius = jnp.asarray(radius, dtype)
    sim_obj.gran_rmass = jnp.asarray(rmass, dtype)

    sys2, res, nlist, istate = runner.setup(sys)
    sim_obj.sys, sim_obj.res = sys2, res
    sim_obj.nlist, sim_obj.istate = nlist, istate
    if bool(nlist.overflow):
        raise RuntimeError("granular cell capacity overflow at setup")
    return sim_obj


@dataclasses.dataclass
class Simulation:
    script: object
    sys: object
    runner: Runner
    thermo_params: ThermoParams
    group_thermo: dict           # compute id -> ThermoParams (temp computes)
    res: object = None
    nlist: object = None
    istate: object = None
    natoms: int = 0

    @staticmethod
    def from_script(script) -> "Simulation":
        import jax.numpy as jnp

        u = script.units
        eps_diel = float(getattr(script, "dielectric", 1.0))
        if eps_diel != 1.0:
            # dielectric command (force.cpp: qqrd2e = qqr2e/dielectric)
            import dataclasses as _dc
            u = _dc.replace(u, qqr2e=u.qqr2e / eps_diel)
        # the charmmfsw/charmmfsh pair styles switch qqr2e to the CHARMM
        # constant under units real (pair_lj_charmmfsw_coul_charmmfsh.cpp
        # :50-58, force.cpp:56-57 qqr2e_charmm_real = 332.0716)
        _names_q = [script.pair.name] + [nm for nm, _ in
                                         getattr(script, "pair_hybrid",
                                                 None) or []]
        if u.name == "real" and any("charmmfsw" in nm or "charmmfsh" in nm
                                    for nm in _names_q):
            import dataclasses as _dc
            u = _dc.replace(u, qqr2e=332.0716 / eps_diel)
        dtype = script.dtype
        n = script.x.shape[0]
        dim_ = getattr(script, "dimension", 3)
        mass_atom = script.mass_type[script.type]
        if getattr(script, "rmass", None) is not None:
            # atom_style sphere: per-atom mass from diameter*density
            # (atom_vec_sphere.cpp) overrides the per-type table
            mass_atom = np.asarray(script.rmass, float)
        alpha = script.alpha_type[script.type]

        # ---- multi-chip sharding (GSPMD): pad the atom axis to a multiple
        # of the mesh size, then device_put the state over the mesh and let
        # XLA partition the existing jitted step (SPMD sharding-in-types) —
        # the TPU-native replacement for comm_brick.cpp's halo machinery.
        # Opt in via the `processors` command / -sharding CLI flag.
        ndev = int(getattr(script, "n_shard_devices", 0) or 0)
        mesh = None
        npad = n
        # fix pour: pre-allocate padded slots for the full insertion
        # budget (atoms appear by unmasking, the capacity never grows)
        pour_extra = sum(int(f_.args[0]) for f_ in script.fixes.values()
                         if f_.style == "pour")
        npad = n + pour_extra
        # production fast-polar engine (parallel/fast_polar.py): the panel
        # kernels need a lane-aligned atom axis, so pad it up front when the
        # script is eligible (the dense (N,3,N,3) tensor path is impossible
        # at production sizes) — masked padding is harmless everywhere else
        from lidp_tpu.parallel.fast_polar import (aligned_npad as _fp_npad,
                                                  prescan as _fp_prescan)
        _fast_polar_pre = _fp_prescan(script, n)
        if _fast_polar_pre:
            npad = _fp_npad(n + pour_extra)
        if ndev > 1:
            import jax as _jax

            from lidp_tpu.parallel.shard import AXIS, make_mesh

            avail = len(_jax.devices())
            if ndev > avail:
                raise ValueError(
                    f"processors/{ndev=} exceeds available devices ({avail})")
            mesh = make_mesh(ndev)
            npad = -(-(n + pour_extra) // ndev) * ndev

        def _padA(a, fill=0.0):
            if a is None:
                return None
            a = np.asarray(a)
            if npad == a.shape[0]:
                return a
            out = np.full((npad,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        # group masks padded False; real-count checks keep script.groups
        groups = {k: _padA(v, False) for k, v in script.groups.items()}
        mask_pad = np.arange(npad) < n
        alpha = _padA(alpha)

        tilt = getattr(script, "box_tilt", None)
        needs_tri = any(
            f_.style == "deform" and any(t in f_.args
                                         for t in ("xy", "xz", "yz"))
            for f_ in script.fixes.values())
        box = Box.create(script.box_lo, script.box_hi, dtype=dtype,
                         periodic=getattr(script, "periodic",
                                          (True, True, True)),
                         tilt=tilt, force_triclinic=needs_tri)
        triclinic = box.triclinic
        if (triclinic and script.kspace is not None
                and script.kspace[0].startswith("pppm")):
            raise NotImplementedError(
                "triclinic + pppm: triclinic mesh pending (use ewald; "
                "pppm.cpp triclinic branch)")
        if needs_tri and script.kspace is not None:
            raise NotImplementedError(
                "fix deform with tilt + kspace: dynamic reciprocal-lattice "
                "tracking pending (rescale_coeffs is orthogonal-only)")
        sys = make_system(
            _padA(script.x), box=box, v=_padA(script.v), q=_padA(script.q),
            type=_padA(script.type, 0), mol=_padA(script.mol, 0), alpha=alpha,
            image=_padA(script.image, 0), mask=mask_pad, dtype=dtype)
        sys = sys.replace(step=jnp.asarray(script.step, jnp.int32))

        if script.pair.name.startswith("gran/"):
            # granular sphere systems (bench/in.chute): dedicated runner
            # with omega + contact-shear state threaded through the scan
            return _build_granular_sim(script, sys, u, dtype, n, npad,
                                       _padA, groups, dim_)

        # ---- pair tables ----
        eamp = None
        if script.pair.name == "eam":
            from lidp_tpu.ops.eam import build_eam_params

            eamp, eam_mass = build_eam_params(script.eam_file, dtype=dtype)
            if script.mass_type is None or script.mass_type[1] == 0.0:
                if script.mass_type is None:
                    script.mass_type = np.zeros(script.ntypes + 1)
                script.mass_type[1:] = eam_mass   # mass from funcfl (pair_eam.cpp)
                mass_atom = script.mass_type[script.type]
        elif script.pair.name in ("eam/alloy", "eam/fs"):
            from lidp_tpu.ops.eam import build_eam_alloy_params

            eamp, alloy_mass = build_eam_alloy_params(
                script.eam_file, script.eam_type_elems, dtype=dtype,
                fs=script.pair.name == "eam/fs")
            if script.mass_type is None:
                script.mass_type = alloy_mass
                mass_atom = script.mass_type[script.type]
        # padded atoms get unit mass so 1/m stays finite (f == 0 keeps v == 0)
        mass_atom = _padA(mass_atom, 1.0)
        coul = "coul" in script.pair.name
        charmm = "charmm" in script.pair.name
        excl_types = None
        excl_list = getattr(script, "neigh_exclude_types", None)
        if excl_list:
            # neigh_modify exclude type: masked out of every pair kernel
            # (the reference drops them from neighbor lists, neighbor.cpp)
            excl_types = np.zeros((script.ntypes + 1, script.ntypes + 1),
                                  bool)
            for t1, t2 in excl_list:
                excl_types[t1, t2] = excl_types[t2, t1] = True
        pname = script.pair.name
        tip4p_spec = getattr(script.pair, "tip4p", None)
        etail = ptail = 0.0
        extra_pairs = ()
        extra_coul_long = ()
        dpdp = None
        disp_b_peratom = None   # set by the */long/* dispersion styles
        # DREIDING hydrogen bonds ride beside the 2-body kernels: pull
        # hbond/dreiding/* sub-styles out of the hybrid list (3-body term,
        # ops/hbond.py) and remember their settings + raw coeff rows
        hbond_specs = []
        _hyb_saved = None
        if pname in ("hybrid", "hybrid/overlay") and any(
                nm.startswith("hbond/dreiding")
                for nm, _ in script.pair_hybrid):
            keep_h, keep_raw_h = [], []
            for k_h, (nm_h, args_h) in enumerate(script.pair_hybrid):
                if nm_h.startswith("hbond/dreiding"):
                    rows = [[it_, jt_] + list(tk_) for (it_, jt_, tk_)
                            in script.hybrid_raw_coeffs[k_h]
                            if tk_ is not None]
                    hbond_specs.append((nm_h, list(args_h), rows))
                else:
                    keep_h.append(script.pair_hybrid[k_h])
                    keep_raw_h.append(script.hybrid_raw_coeffs[k_h])
            _hyb_saved = (script.pair_hybrid, script.hybrid_raw_coeffs)
            script.pair_hybrid = keep_h
            script.hybrid_raw_coeffs = keep_raw_h
        elif pname.startswith("hbond/dreiding"):
            hbond_specs.append((pname,
                                list(script._hbond_settings),
                                [list(r) for r in script.hbond_coeffs]))
        if pname == "table":
            pair, cut = _build_table_pair(script, excl_types, dtype)
        elif pname in ("dpd", "dpd/tstat"):
            cut, dpdp = _build_dpd_pair(script, u, dtype)
            # benign placeholder so downstream pair plumbing stays happy;
            # ForceField gets pair=None (the DPD kernel is dense-only)
            from lidp_tpu.ops.pair import make_generic_pair_params

            z0 = np.zeros((script.ntypes + 1, script.ntypes + 1))
            pair = make_generic_pair_params(
                "none", z0, z0, cut_lj=z0, qqrd2e=u.qqr2e, dtype=dtype)
        elif pname in ("hybrid", "hybrid/overlay"):
            try:
                pair, extra_pairs, extra_coul_long, cut = \
                    _build_hybrid_pair(script, u, excl_types, dtype)
            finally:
                if _hyb_saved is not None:
                    script.pair_hybrid, script.hybrid_raw_coeffs = \
                        _hyb_saved
        elif pname.startswith("hbond/dreiding"):
            # standalone hbond: a zero 2-body base, the 3-body term added
            # in compute_forces
            from lidp_tpu.ops.pair import make_generic_pair_params

            z0 = np.zeros((script.ntypes + 1, script.ntypes + 1))
            pair = make_generic_pair_params(
                "none", z0, z0, cut_lj=z0, qqrd2e=u.qqr2e, dtype=dtype)
            cut = np.full((script.ntypes + 1, script.ntypes + 1),
                          float(script._hbond_settings[2]))
        elif pname in _GENERIC_PAIR_KINDS:
            pair, cut = _build_generic_pair(script, u, excl_types, dtype)
        elif pname in ("lj/long/coul/long", "buck/long/coul/long") or (
                pname == "lj/long/tip4p/long"
                and getattr(script, "_tip4p_lj_long", False)):
            # both vdW-dispersion and coulomb long: real-space kernel is
            # the short-range part + g6-damped r^-6 complement (kind
            # lj/long or buck/long); geometric mixing of the r^-6
            # coefficient is REQUIRED for the B_i B_j k-space
            # factorization (pair_lj_long_coul_long.cpp init_one +
            # ewald_disp func[1]; pair_buck_long_coul_long.cpp /
            # pair_lj_long_tip4p_long.cpp analogous)
            from lidp_tpu.ops.pair import make_generic_pair_params

            # specials are fine: the kernel applies the reference's
            # special-case algebra (factor on the bare potential + the
            # rn*(1-f) dispersion add-back) in ops/pair._pair_terms
            # tip4p flavor: the main kernel is vdW-only — Coulomb runs on
            # charge sites via the tip4p block (coul=False)
            has_coul = tip4p_spec is None
            if pname == "buck/long/coul/long":
                T_ = script.ntypes
                tA = np.zeros((T_ + 1, T_ + 1))
                tRinv = np.zeros((T_ + 1, T_ + 1))
                tC = np.zeros((T_ + 1, T_ + 1))
                cut = np.full((T_ + 1, T_ + 1), script.pair.cut_lj_global)
                seen = np.zeros((T_ + 1, T_ + 1), bool)
                for (i_, j_), co in script.pair_coeffs.items():
                    A_, rho_, C_ = co[:3]
                    tA[i_, j_] = tA[j_, i_] = A_
                    tRinv[i_, j_] = tRinv[j_, i_] = 1.0 / rho_
                    tC[i_, j_] = tC[j_, i_] = C_
                    seen[i_, j_] = seen[j_, i_] = True
                for i_ in range(1, T_ + 1):
                    for j_ in range(i_ + 1, T_ + 1):
                        if not seen[i_, j_]:
                            # sigma mixing for buck/long (init_one:
                            # geometric on A and C, harmonic-free rho mix)
                            raise ValueError(
                                "All pair coeffs are not set "
                                f"(buck/long/coul/long {i_} {j_})")
                pair = make_generic_pair_params(
                    "buck/long", tA, tRinv, tC, np.zeros_like(tA),
                    np.ones_like(tA),   # t5 = g_ewald_6, patched at kspace
                    cut_lj=cut, cut_coul=script.pair.cut_coul,
                    coul=has_coul, qqrd2e=u.qqr2e,
                    special_lj=np.array(script.special_lj),
                    special_coul=np.array(script.special_coul),
                    excl_types=excl_types, dtype=dtype)
                # B_i = sqrt(|C_tt|) (EwaldDisp::init_coeffs func[1])
                c_d = np.array([0.0] + [tC[t, t]
                                        for t in range(1,
                                                       script.ntypes + 1)])
                disp_b_peratom = np.sqrt(np.abs(c_d))[script.type]
            else:
                eps, sig, cut = _mix_pair_tables(script)
                s6t = sig ** 6
                pair = make_generic_pair_params(
                    "lj/long", 48.0 * eps * s6t * s6t, 24.0 * eps * s6t,
                    4.0 * eps * s6t * s6t, 4.0 * eps * s6t,
                    np.ones_like(eps),  # t5 = g_ewald_6, patched at kspace
                    cut_lj=cut, cut_coul=script.pair.cut_coul,
                    coul=has_coul, qqrd2e=u.qqr2e,
                    special_lj=np.array(script.special_lj),
                    special_coul=np.array(script.special_coul),
                    excl_types=excl_types, dtype=dtype)
                # per-atom B_i = sqrt(4 eps_tt) sig_tt^3
                # (EwaldDisp::init_coeffs) for whichever dispersion
                # k-solver (ewald/disp or pppm/disp)
                eps_d = np.array([0.0] + [eps[t, t]
                                          for t in range(1,
                                                         script.ntypes + 1)])
                sig_d = np.array([0.0] + [sig[t, t]
                                          for t in range(1,
                                                         script.ntypes + 1)])
                disp_b_peratom = (np.sqrt(4.0 * eps_d)
                                  * sig_d ** 3)[script.type]
        else:
            eps, sig, cut = _mix_pair_tables(script)
            if getattr(script, "_pair_tail", False) and not charmm:
                # pair_modify tail yes: LJ long-range corrections summed
                # per i<=j type pair with the off-diagonal doubled
                # (pair_lj_cut.cpp init_one etail_ij/ptail_ij +
                # pair.cpp:247-253); thermo divides by the (possibly
                # evolving) volume at sample time.
                counts = np.bincount(np.asarray(script.type),
                                     minlength=script.ntypes + 1)
                for i_t in range(1, script.ntypes + 1):
                    for j_t in range(i_t, script.ntypes + 1):
                        s6_ = float(sig[i_t, j_t]) ** 6
                        rc_ = float(cut[i_t, j_t])
                        rc3 = rc_ ** 3
                        rc6 = rc3 * rc3
                        rc9 = rc3 * rc6
                        fac = float(counts[i_t]) * float(counts[j_t]) \
                            * float(eps[i_t, j_t]) * s6_ / (9.0 * rc9)
                        mult = 1.0 if i_t == j_t else 2.0
                        etail += mult * 8.0 * np.pi * fac * (s6_ - 3.0 * rc6)
                        ptail += mult * 16.0 * np.pi * fac \
                            * (2.0 * s6_ - 3.0 * rc6)
            is_debye = "debye" in pname
            is_msm = pname.endswith("/msm")
            is_dsf = pname.endswith("/dsf")
            is_wolf = pname.endswith("/wolf")
            is_ch_cut = pname.endswith("coul/charmm")
            is_ch_imp = pname.endswith("coul/charmm/implicit")
            is_fsw = "charmmfsw" in pname
            is_fsh = pname.endswith("coul/charmmfsh")
            pair = make_pair_params(
                eps, sig, cut,
                cut_coul=(script.pair.cut_coul
                          if (coul or tip4p_spec is not None) else 0.0),
                special_lj=np.array(script.special_lj),
                special_coul=np.array(script.special_coul),
                qqrd2e=u.qqr2e, coul=coul,
                g_ewald=(script._debye_kappa if is_debye
                         else script._dsf_alpha if (is_dsf or is_wolf)
                         else 0.0),
                shift=getattr(script, "_pair_shift", False),
                cut_lj_inner=script.pair.cut_lj_inner, charmm=charmm,
                excl_types=excl_types,
                coul_kind=("debye" if is_debye
                           else "msm" if is_msm
                           else "dsf" if is_dsf
                           else "wolf" if is_wolf
                           else "charmm/implicit" if is_ch_imp
                           else "charmm" if is_ch_cut
                           else "charmmfsh" if is_fsh else "long"),
                cut_coul_inner=script.pair.cut_coul_inner,
                charmm_fsw=is_fsw,
                dtype=dtype)
        if getattr(script, "neigh_exclude_mol", False):
            pair = dataclasses.replace(pair, excl_mol=True)

        # ---- kspace ----
        ew = None
        es = None
        pppmp = None
        ew6 = None
        b_atom_pad = None
        pppm_dispp = None
        msmp = None
        if script.kspace is not None and script.kspace[0].startswith("pppm"):
            from lidp_tpu.ops.pppm import PPPMParams, setup_pppm

            style, acc = script.kspace
            if style not in ("pppm", "pppm/tip4p", "pppm/cg",
                             "pppm/stagger", "pppm/disp",
                             "pppm/disp/tip4p"):
                raise NotImplementedError(f"kspace_style {style}")
            # pppm/cg (pppm_cg.cpp) restricts spreading/interpolation to the
            # charged-atom subset — a sparsity optimization whose math is
            # identical; our dense TPU scatter/gather is the same program
            # either way (q=0 atoms contribute nothing), so it aliases pppm.
            ps = setup_pppm(
                accuracy_rel=acc, qqrd2e=u.qqr2e, q=script.q, natoms=n,
                cutoff=script.pair.cut_coul,
                box_lengths=script.box_hi - script.box_lo,
                g_ewald=getattr(script, "_gewald_override", None))
            pair = dataclasses.replace(
                pair, g_ewald=jnp.asarray(ps.g_ewald, dtype))
            if extra_pairs:
                extra_pairs = tuple(
                    dataclasses.replace(
                        pe, g_ewald=jnp.asarray(ps.g_ewald, dtype))
                    if fl else pe
                    for pe, fl in zip(extra_pairs, extra_coul_long[1:]))
            pppmp = PPPMParams.from_setup(
                ps, u.qqr2e, float(np.sum(script.q ** 2)),
                float(np.sum(script.q)), dtype=dtype,
                stagger=(style == "pppm/stagger"))
            if style in ("pppm/disp", "pppm/disp/tip4p"):
                # dispersion mesh alongside the charge mesh
                # (pppm_disp.cpp geometric branch; pppm_disp_tip4p.cpp
                # additionally maps the charge mesh to M sites, which the
                # ForceField tip4p block already does generically)
                from lidp_tpu.ops.pppm import (PPPMDispParams,
                                               setup_pppm_disp)

                if disp_b_peratom is None and style == "pppm/disp":
                    raise NotImplementedError(
                        "kspace pppm/disp needs a */long/* dispersion "
                        "pair style")
            if style in ("pppm/disp", "pppm/disp/tip4p") \
                    and disp_b_peratom is not None:
                # pair flag "cut long" leaves the dispersion function off
                # (pppm_disp.cpp init: ewald_order bit 6 unset)
                ps6 = setup_pppm_disp(
                    accuracy_rel=acc, qqrd2e=u.qqr2e,
                    b_atom=disp_b_peratom, natoms=n,
                    cutoff=script.pair.cut_lj_global,
                    box_lengths=script.box_hi - script.box_lo,
                    g6=getattr(script, "_gewald6_override", None))
                pair = dataclasses.replace(
                    pair, lj5=jnp.full((script.ntypes + 1,) * 2, ps6.g6,
                                       dtype))
                pppm_dispp = PPPMDispParams.from_setup(ps6)
                b_atom_pad = jnp.asarray(_padA(disp_b_peratom, 0.0), dtype)
        elif (script.kspace is not None
                and script.kspace[0] in ("msm", "msm/cg")):
            # multilevel summation (msm.cpp; msm/cg aliases msm — the
            # charged-subset optimization is a no-op in the dense mesh
            # program, as with pppm/cg)
            from lidp_tpu.ops.msm import MSMParams, setup_msm

            style, acc = script.kspace
            ms = setup_msm(
                accuracy_rel=acc, qqrd2e=u.qqr2e, q=script.q, natoms=n,
                cutoff=script.pair.cut_coul,
                box_lengths=script.box_hi - script.box_lo,
                cutoff_adjust=getattr(script, "_msm_cutoff_adjust", True))
            msmp = MSMParams.from_setup(ms)
            if ms.cutoff != script.pair.cut_coul:
                # the adjusted cutoff feeds back into the pair style and
                # the neighbor sizing (msm.cpp:1048 pokes pair cut_coul)
                script.log(f"Adjusting Coulombic cutoff for MSM, "
                           f"new cutoff = {ms.cutoff:g}")
                script.pair.cut_coul = ms.cutoff
                cc2 = jnp.asarray(ms.cutoff ** 2, dtype)
                pair = dataclasses.replace(
                    pair, cut_coulsq=cc2,
                    cutsq=jnp.maximum(pair.cutsq, cc2))
        elif script.kspace is not None:
            style, acc = script.kspace
            # ewald/disp on an uncharged system: the charge function is
            # simply disabled and only the requested extra functions run
            # (EwaldDisp::init function selection)
            uncharged = (float(np.sum(script.q ** 2)) == 0.0
                         and disp_b_peratom is not None)
            if not uncharged:
                es = setup_ewald_disp(
                    accuracy_rel=acc, qqrd2e=u.qqr2e, q=script.q, natoms=n,
                    cutoff=script.pair.cut_coul,
                    box_lengths=script.box_hi - script.box_lo,
                    g_ewald=getattr(script, "_gewald_override", None),
                    tilt=(tilt if triclinic else None))
                pair = dataclasses.replace(
                    pair, g_ewald=jnp.asarray(es.g_ewald, dtype))
                if extra_pairs:
                    extra_pairs = tuple(
                        dataclasses.replace(
                            pe, g_ewald=jnp.asarray(es.g_ewald, dtype))
                        if fl else pe
                        for pe, fl in zip(extra_pairs,
                                          extra_coul_long[1:]))
                ew = EwaldParams.from_setup(es, u.qqr2e, dtype=dtype)
            if disp_b_peratom is not None:
                # exact-k dispersion function of ewald/disp (func[1])
                from lidp_tpu.ops.ewald import (Ewald6Params,
                                                setup_dispersion)

                # EwaldDisp forces g_ewald_6 = g_ewald (ewald_disp.cpp
                # :230) — the dispersion damping equals the charge
                # parameter; an uncharged system falls back to the Newton
                # solve (and kspace_modify gewald/disp is honored only by
                # pppm/disp, as in the reference)
                es6 = setup_dispersion(
                    accuracy_rel=acc, qqrd2e=u.qqr2e,
                    b_atom=disp_b_peratom, natoms=n,
                    cutoff=script.pair.cut_lj_global,
                    box_lengths=script.box_hi - script.box_lo,
                    g6=(es.g_ewald if es is not None
                        else getattr(script, "_gewald_override", None)))
                pair = dataclasses.replace(
                    pair, lj5=jnp.full((script.ntypes + 1,) * 2, es6.g6,
                                       dtype))
                ew6 = Ewald6Params.from_setup(es6, dtype=dtype)
                b_atom_pad = jnp.asarray(_padA(disp_b_peratom, 0.0), dtype)

        # ---- polarization ----
        pol = None
        if script.pair.name.endswith("/polarization"):
            p = script.pair
            pol = pol_ops.PolarizationSettings(
                iterations_max=p.iterations_max,
                damping_type=(pol_ops.DAMPING_EXPONENTIAL
                              if p.damping_type == "exponential"
                              else pol_ops.DAMPING_NONE),
                polar_damp=p.polar_damp, zodid=p.zodid,
                polar_precision=p.polar_precision,
                fixed_iteration=p.fixed_iteration, polar_gs=p.polar_gs,
                polar_gs_ranked=p.polar_gs_ranked, polar_gamma=p.polar_gamma,
                use_previous=p.use_previous)

        # ---- TIP4P off-site charge (pair lj/cut/tip4p/long) ----
        tipp = None
        if tip4p_spec is not None:
            import math as _math

            from lidp_tpu.ops.tip4p import make_tip4p_params

            otype, htype, btype, atype, qdist = tip4p_spec
            if btype not in script.bond_coeffs or \
                    atype not in script.angle_coeffs:
                raise ValueError("TIP4P needs bond/angle coeffs for the "
                                 "O-H bond and H-O-H angle types")
            r0 = float(script.bond_coeffs[btype][1])
            th0 = _math.radians(float(script.angle_coeffs[atype][1]))
            # alpha = qdist / (cos(theta0/2) * r0)  (init_style :471-474)
            t_alpha = qdist / (_math.cos(0.5 * th0) * r0)
            tipp = make_tip4p_params(
                _padA(script.type, 0), np.arange(1, npad + 1),
                otype, htype, t_alpha, dtype=dtype)
            if n > DENSE_PATH_MAX_ATOMS:
                raise NotImplementedError(
                    "TIP4P pair styles run the dense path only "
                    f"(n <= {DENSE_PATH_MAX_ATOMS})")

        sp_code = None
        sp_idx = sp_lvl = None
        has_bonds = (getattr(script, "_bonds", None) is not None
                     and len(script._bonds))
        if has_bonds:
            if n <= DENSE_PATH_MAX_ATOMS:
                code = topo_mod.special_codes_dense(n, script._bonds)
                if npad != n:
                    code = np.pad(code, ((0, npad - n), (0, npad - n)))
                sp_code = jnp.asarray(code)
            si, sl = topo_mod.special_lists(n, script._bonds)
            if npad != n:
                # remap the "invalid" fill (== n) past the padding, then pad
                si = np.where(si == n, npad, si)
                si = np.concatenate(
                    [si, np.full((npad - n, si.shape[1]), npad, si.dtype)])
                sl = np.concatenate(
                    [sl, np.zeros((npad - n, sl.shape[1]), sl.dtype)])
            sp_idx = jnp.asarray(si)
            sp_lvl = jnp.asarray(sl, jnp.int32)

        cmapp = None
        for fid_c, spec_c0 in script.fixes.items():
            if spec_c0.style == "cmap":
                from lidp_tpu.ops.cmap import make_cmap_params

                ct = getattr(script, "_crossterms", None)
                if ct is None:
                    raise ValueError(
                        "fix cmap requires read_data ... fix ID "
                        "crossterm CMAP")
                fm = getattr(script, "_fix_modify", {}).get(fid_c, {})
                cmapp = make_cmap_params(
                    os.path.join(script.root, spec_c0.args[0]),
                    np.asarray(ct), dtype=dtype,
                    energy=fm.get("energy") == "yes")
                sim_cmap_fid = fid_c

        hbp = ()
        if hbond_specs:
            from lidp_tpu.ops.hbond import make_hbond_params

            if not has_bonds:
                raise ValueError("pair hbond/dreiding requires a "
                                 "molecular system (init_style :393)")
            code_h = topo_mod.special_codes_dense(n, script._bonds)
            for nm_h, args_h, rows_h in hbond_specs:
                hbp += (make_hbond_params(
                    rows_h, script.ntypes, int(args_h[0]),
                    float(args_h[1]), float(args_h[2]), float(args_h[3]),
                    np.asarray(script._bonds), n, npad, script.type,
                    list(script.special_lj), special_code=code_h,
                    dtype=dtype, morse=nm_h.endswith("morse")),)

        # ---- fix shake pre-pass: find clusters and disable the constrained
        # bonds/angles from the bonded force terms (find_clusters negates
        # their types in the reference, fix_shake.cpp:681)
        shake_found = None
        shake_cfg = None
        bond_keep = None
        angle_keep = None
        spec_sh = next((f_ for f_ in script.fixes.values()
                        if f_.style in ("shake", "rattle")), None)
        if spec_sh is not None and has_bonds:
            from lidp_tpu.ops import shake as shake_mod

            a_sh = spec_sh.args
            shake_cfg = (float(a_sh[0]), int(a_sh[1]))
            lists = {"b": [], "a": [], "m": [], "t": []}
            key = None
            for tok in a_sh[3:]:
                if tok in lists:
                    key = tok
                elif key == "m":
                    lists[key].append(float(tok))
                elif key is not None:
                    lists[key].append(int(tok))
            TBs = max(script.bond_coeffs.keys(), default=0)
            br0 = np.zeros(TBs + 1)
            for bt_, co in script.bond_coeffs.items():
                br0[bt_] = co[1]
            TAs = max(script.angle_coeffs.keys(), default=0)
            ath0 = np.zeros(TAs + 1)
            for at_, co in script.angle_coeffs.items():
                ath0[at_] = np.deg2rad(co[1])
            has_ang = (getattr(script, "_angles", None) is not None
                       and len(script._angles))
            shake_found = shake_mod.find_clusters(
                n, script._bonds - 1, script._bond_types,
                script._angles - 1 if has_ang else None,
                getattr(script, "_angle_types", None), mass_atom,
                b_types=lists["b"], a_types=lists["a"], masses=lists["m"],
                t_types=lists["t"], type_atom=script.type,
                bond_r0=br0, angle_theta0=ath0)
            if shake_found is not None:
                bond_keep = np.ones(len(script._bonds), bool)
                bond_keep[shake_found[5]] = False
                if has_ang:
                    angle_keep = np.ones(len(script._angles), bool)
                    angle_keep[shake_found[6]] = False

        # ---- bonded term ----
        # (MOLECULE-package style families; builders in
        # styles/bonded_builders.py — one params pytree per hybrid
        # sub-style, summed by forcefield.compute_forces)
        from lidp_tpu.styles.bonded_builders import (
            build_angle_params, build_bond_params, build_dihedral_params,
            build_improper_params)

        bondp = anglep = dihedralp = improperp = None
        if has_bonds and script.bond_style is not None:
            pair_tables = None
            if (script.bond_style == "quartic"
                    or (script.bond_style == "hybrid"
                        and "quartic" in script.bond_style_args)):
                if script.pair is not None and (
                        script.pair.name.startswith("lj/cut")
                        or script.pair.name == "zero"):
                    pair_tables = (_mix_pair_tables(script)
                                   if script.pair.name != "zero" else None)
                else:
                    raise NotImplementedError(
                        "bond quartic pair subtraction supports lj/cut")
            bondp = build_bond_params(
                script, dtype, bond_keep, pair_tables) or None
        if (getattr(script, "_angles", None) is not None
                and len(script._angles) and script.angle_style is not None):
            anglep = build_angle_params(script, dtype, angle_keep) or None
        if (getattr(script, "_dihedrals", None) is not None
                and len(script._dihedrals)
                and script.dihedral_style is not None):
            try:
                eps_tbl, sig_tbl = eps, sig   # charmm 1-4 mixing tables
            except NameError:                 # non-LJ pair style in force
                eps_tbl = sig_tbl = None
            dihedralp = build_dihedral_params(
                script, dtype, u, eps_tbl, sig_tbl) or None
        if (getattr(script, "_impropers", None) is not None
                and len(script._impropers)
                and script.improper_style is not None):
            improperp = build_improper_params(script, dtype) or None

        # fix deform also forces the every-step-ev path: the chunk-boundary
        # energy re-tally runs after apply_deform, i.e. with NEXT step's
        # box — the reference tallies during the force call, before
        # FixDeform::end_of_step moves the box
        has_baro = any(f_.style in ("npt", "nph", "npt/sphere",
                                    "nph/sphere", "press/berendsen",
                                    "box/relax", "deform",
                                    "rigid/npt", "rigid/nph",
                                    "rigid/npt/small", "rigid/nph/small")
                       for f_ in script.fixes.values())
        has_vdep_pf = any(f_.style in ("shake", "rattle", "langevin",
                                       "viscous")
                          for f_ in script.fixes.values())
        adapt_cfg = None
        for f_ in script.fixes.values():
            if f_.style == "adapt":
                # fix ID group adapt N pair STYLE a * * v_NAME
                a_ad = f_.args
                if ("pair" not in a_ad or "a" not in a_ad
                        or not any(t.startswith("v_") for t in a_ad)):
                    raise NotImplementedError(
                        "fix adapt supports 'pair STYLE a * * v_VAR' only")
                vname = next(t for t in a_ad if t.startswith("v_"))[2:]
                ramps = getattr(script, "_ramp_vars", {})
                if vname not in ramps:
                    raise NotImplementedError(
                        "fix adapt requires an equal-style ramp() variable")
                adapt_cfg = ramps[vname]

        # reference-stored-coordinate shift for the polar fdotr virial:
        # read_data remaps atoms into the box (setting image flags); the
        # pair virial then comes from virial_fdotr_compute over those stored
        # positions, re-wrapped only at reneighbor (Domain::pbc).  Our x
        # drifts unwrapped (rigid path), so the remap captured at run start
        # is the exact stored-coordinate offset for the golden windows.
        polar_xshift = None
        if pol is not None:
            L0 = script.box_hi - script.box_lo
            x0 = script.x
            polar_xshift = jnp.asarray(_padA(
                -np.floor((x0 - script.box_lo) / L0) * L0), dtype)

        ff = ForceField(pair=(None if (eamp is not None
                                       or dpdp is not None) else pair),
                        dpd=dpdp,
                        polar_xshift=polar_xshift, tip4p=tipp,
                        tip4p_cut=(getattr(script.pair, "tip4p_mode",
                                           "long") == "cut"),
                        ewald=ew, ewald6=ew6, b_atom=b_atom_pad,
                        pppm_disp=pppm_dispp, msm=msmp,
                        extra_pairs=extra_pairs,
                        polar=pol, sp_code=sp_code,
                        bond=bondp, angle=anglep, dihedral=dihedralp,
                        improper=improperp,
                        pppm=pppmp, eam=eamp, sp_idx=sp_idx, sp_lvl=sp_lvl,
                        qqrd2e=u.qqr2e, hbond=hbp, cmap=cmapp,
                        adapt=adapt_cfg,
                        adapt_window=(jnp.zeros(2, jnp.int32)
                                      if adapt_cfg is not None else None),
                        kspace_dynamic=has_baro and ew is not None)

        # ---- integrator from fixes ----
        integ = None
        dof_removed = 0.0
        # fine-grained removal records for sub-group temperature computes:
        # ('atoms', mask, per_atom_dof) or ('pairs', (pa, qa)) — a shake
        # constraint counts toward a group's dof only when both its atoms
        # are group members (ComputeTemp queries Fix::dof(igroup), which
        # FixShake computes per group, fix_shake.cpp::dof)
        dof_removals = []
        rigid_groups = []
        # post_force hooks use one normalized protocol: fn(sys, f) ->
        # (f', extra_virial6), applied in fix-declaration order like
        # Modify::post_force (modify.cpp:454). pf_hooks_setup mirrors
        # pf_hooks but shake uses its half-dtfsq setup variant.
        pf_hooks = []
        pf_hooks_setup = []
        pi_hooks = []           # Modify::post_integrate hooks
        deform_fix = None
        eos_hooks = []          # Modify::end_of_step, declaration order
        halt_spec = None
        rattle_params = None
        pending_temp_fix = None
        shake_dof_removed = 0
        from lidp_tpu.styles import FixBuildCtx, build_fixes

        # per-style builders live in lidp_tpu/styles/ (the force.cpp:83-88
        # macro-registry analog): adding a fix style touches one module
        fctx = FixBuildCtx(
            script=script, groups=groups, u=u, dtype=dtype, npad=npad,
            n=n, mass_atom=mass_atom, dim=dim_, padA=_padA, sys=sys,
            shake_found=shake_found, shake_cfg=shake_cfg,
            pf_hooks=pf_hooks, pf_hooks_setup=pf_hooks_setup,
            pi_hooks=pi_hooks, eos_hooks=eos_hooks,
            dof_removals=dof_removals, rigid_groups=rigid_groups,
            dof_removed=dof_removed)
        build_fixes(fctx)
        sys = fctx.sys
        integ = fctx.integ
        dof_removed = fctx.dof_removed
        shake_dof_removed = fctx.shake_dof_removed
        rattle_params = fctx.rattle_params
        halt_spec = fctx.halt_spec
        pending_temp_fix = fctx.pending_temp_fix
        deform_fix = fctx.deform_fix
        dtreset_cfg = getattr(fctx, "dtreset_cfg", None)
        restrain_factory = getattr(fctx, "restrain_factory", None)
        tmd_factory = getattr(fctx, "tmd_factory", None)
        spring_chunk_cfg = getattr(fctx, "spring_chunk_cfg", None)
        if spring_chunk_cfg is not None:
            # fix spring/chunk (fix_spring_chunk.cpp): chunk assignment is
            # static (the reference locks the chunk compute); com0 is the
            # COM at the first force evaluation = the run-setup positions
            import jax

            from lidp_tpu.box import unwrap as _unwrap_b

            spec_c = script.computes[spring_chunk_cfg["chunk"]]
            which = spec_c[2]["which"]
            if which == "molecule":
                raw = np.asarray(script.mol)[:n]
            elif which == "type":
                raw = np.asarray(script.type)[:n]
            else:
                raise NotImplementedError(
                    "fix spring/chunk needs a molecule or type chunk "
                    "(bin chunks move with the atoms; the reference locks"
                    " them for the same reason)")
            # molecule ID 0 = "in no chunk" (ComputeChunkAtom: ichunk 0
            # atoms are skipped by every chunk consumer)
            valid = raw > 0
            _, inv = np.unique(raw[valid], return_inverse=True)
            nch = (int(inv.max()) + 1) if len(inv) else 0
            ids_full = np.full(n, nch, np.int32)
            ids_full[valid] = inv.astype(np.int32)
            ids_j = jnp.asarray(_padA(ids_full, nch))
            gm_sc = jnp.asarray(groups[spring_chunk_cfg["group"]]) \
                & jnp.asarray(_padA(valid, False))
            m_sc = jnp.asarray(mass_atom, dtype)
            xu0 = _unwrap_b(sys.x, sys.box, sys.image)
            m_eff0 = jnp.where(gm_sc & jnp.asarray(sys.mask), m_sc, 0.0)
            M0 = jax.ops.segment_sum(m_eff0, ids_j, num_segments=nch + 1)
            com0_sc = (jax.ops.segment_sum(m_eff0[:, None] * xu0, ids_j,
                                           num_segments=nch + 1)
                       / jnp.where(M0 > 0, M0, 1.0)[:, None])
            k_sc = spring_chunk_cfg["k"]

            def _spring_chunk_pf(sys_, f_, _ids=ids_j, _g=gm_sc, _m=m_sc,
                                 _c0=com0_sc, _k=k_sc, _nch=nch):
                from lidp_tpu.box import unwrap as _unw

                me = jnp.where(_g & sys_.mask, _m, 0.0)
                xu = _unw(sys_.x, sys_.box, sys_.image)
                M = jax.ops.segment_sum(me, _ids, num_segments=_nch + 1)
                com = (jax.ops.segment_sum(me[:, None] * xu, _ids,
                                           num_segments=_nch + 1)
                       / jnp.where(M > 0, M, 1.0)[:, None])
                d = com - _c0
                r = jnp.sqrt(jnp.sum(d * d, axis=1))
                r = jnp.maximum(r, 1.0e-10)
                # fcom = k*d/r / M, applied as f_i -= m_i * fcom[chunk]
                # (fix_spring_chunk.cpp post_force); empty chunks (M=0,
                # incl. the ichunk-0 pad segment) get zero — the naive
                # 1e-300 guard underflows to a 0/0 NaN in the product
                Msafe = jnp.where(M > 0, M, 1.0)
                fcom = jnp.where(
                    (M > 0)[:, None],
                    _k * d / (r * Msafe)[:, None], 0.0)
                f_ = f_ - me[:, None] * fcom[_ids]
                return f_, jnp.zeros(6, f_.dtype)

            pf_hooks.append(_spring_chunk_pf)
            pf_hooks_setup.append(_spring_chunk_pf)
        if integ is None:
            nvep = nve_mod.NVEParams.create(0.0, u.ftm2v, mass_atom, dtype=dtype)
            integ = nve_integrator(nvep)   # no integration fix: atoms frozen

        # ---- neighbor strategy ----
        ncfg = None
        rebuild_every = 1
        if triclinic and eamp is not None:
            raise NotImplementedError(
                "triclinic + eam: the EAM cell kernel is orthogonal-only")
        if script.pair.name == "table" or tipp is not None \
                or dpdp is not None:
            # tabulated pairs run the dense minimum-image path (the cell
            # kernel's per-slot table gathers would blow up the
            # (cells,cap,K,NT) working set); tip4p's off-site coulomb and
            # the DPD (N,N) noise-matrix kernel are dense-only too
            pass
        elif n > DENSE_PATH_MAX_ATOMS or script.speed_mode or eamp is not None:
            cutmax = float(np.max(cut))
            if coul:
                cutmax = max(cutmax, script.pair.cut_coul)
            if eamp is not None:
                cutmax = float(eamp.cut)
            L = script.box_hi - script.box_lo
            try:
                from lidp_tpu.ops.cells import CellConfig, perp_widths

                # slack 1.7 measured safe across the bundled benchmarks
                # (sticky overflow aborts the run if a cell ever overfills)
                ncfg = CellConfig.for_box(
                    L, cutmax + script.skin,
                    density=n / float(np.prod(L)), cap_slack=1.7,
                    perp=(perp_widths(L, tilt) if triclinic else None))
            except ValueError:
                if triclinic:
                    raise NotImplementedError(
                        "triclinic box too thin for the cell stencil above "
                        f"the dense cap ({DENSE_PATH_MAX_ATOMS} atoms)")
                ncfg = NeighborConfig.for_box(L, cutmax + script.skin)
            rebuild_every = script.neigh_every

        # thermostats parsed BEFORE a constraint fix must still see the
        # constrained dof (the reference's temperature computes query
        # fix_dof at run time, fix 1 nvt + fix 2 shake ordering works)
        if (shake_dof_removed and integ is not None
                and hasattr(integ.params, "dof")):
            newp = dataclasses.replace(
                integ.params,
                dof=float(integ.params.dof) - shake_dof_removed)
            integ = dataclasses.replace(integ, params=newp)

        end_of_step = None
        if pending_temp_fix is not None:
            # fix temp/rescale (fix_temp_rescale.cpp end_of_step) and
            # temp/berendsen (fix_temp_berendsen.cpp); dof includes all
            # constraint removals, hence built after the fixes loop
            spec_t = pending_temp_fix
            a_t = spec_t.args
            # temperature group: the fix's own group, unless fix_modify
            # attached a temp compute (fix.cpp modify_params 'temp')
            tmod = getattr(script, "_fix_modify", {}).get(
                spec_t.fid, {}).get("temp")
            tgrp_name = (script.computes[tmod][0] if tmod is not None
                         else spec_t.group)
            tgrp = script.groups[tgrp_name]
            ng_t = int(np.count_nonzero(tgrp))
            # only constraints whose atoms all lie inside the temperature
            # group reduce its dof (fix_shake.cpp::dof per-group count)
            rm_t = 0.0
            for rec in dof_removals:
                if rec[0] == "atoms":
                    _, amask, per = rec
                    rm_t += per * int(np.count_nonzero(
                        amask[:len(tgrp)] & tgrp))
                elif rec[0] == "pairs":
                    _pa, _qa = rec[1]
                    tg = np.asarray(tgrp)
                    rm_t += int(np.count_nonzero(
                        tg[_pa] & tg[_qa]))
                else:   # rigid: all-or-nothing per body set
                    rsetup = rec[1]
                    inb = rsetup.body_of_atom >= 0
                    if np.all(np.asarray(tgrp)[inb]):
                        rm_t += rsetup.dof_removed
            dof_t = dim_ * ng_t - dim_ - rm_t
            tmask_j = jnp.asarray(groups[tgrp_name])
            m_t = jnp.asarray(mass_atom, dtype)
            # velocity scaling applies to the FIX group's atoms
            vmask_j = jnp.asarray(groups[spec_t.group])[:, None]

            def _temp_of(sys_):
                ke2 = u.mvv2e * jnp.sum(
                    jnp.where(sys_.mask & tmask_j, m_t, 0.0)[:, None]
                    * sys_.v * sys_.v)
                return ke2 / (dof_t * u.boltz)

            if spec_t.style == "temp/rescale":
                nev_t, t_tgt = int(a_t[0]), float(a_t[1])
                window, fraction = float(a_t[3]), float(a_t[4])

                def end_of_step(sys_, res_=None):
                    t_cur = _temp_of(sys_)
                    lam = jnp.sqrt(1.0 + fraction * (t_tgt / t_cur - 1.0))
                    apply = ((sys_.step % nev_t) == 0) \
                        & (jnp.abs(t_cur - t_tgt) > window)
                    scale = jnp.where(apply & vmask_j[:, 0], lam, 1.0)
                    return sys_.replace(v=sys_.v * scale[:, None])
            else:
                t_tgt, t_damp = float(a_t[0]), float(a_t[2])

                def end_of_step(sys_, res_=None):
                    t_cur = _temp_of(sys_)
                    lam = jnp.sqrt(
                        1.0 + script.dt / t_damp * (t_tgt / t_cur - 1.0))
                    scale = jnp.where(vmask_j[:, 0], lam, 1.0)
                    return sys_.replace(v=sys_.v * scale[:, None])

        if eos_hooks:
            prev_e = end_of_step

            def end_of_step(sys_, res_=None, _hooks=tuple(eos_hooks),
                            _prev=prev_e):
                for h in _hooks:
                    sys_ = h(sys_, res_)
                return _prev(sys_, res_) if _prev is not None else sys_

        if rattle_params is not None:
            from lidp_tpu.ops import shake as shake_mod

            prev_eos = end_of_step

            def end_of_step(sys_, res_=None, _p=rattle_params,
                            _prev=prev_eos):
                sys_ = shake_mod.rattle_velocity(sys_, _p)
                return _prev(sys_, res_) if _prev is not None else sys_

        def _compose_pf(hooks):
            if not hooks:
                return None

            def composed(sys_, f_, _hooks=tuple(hooks)):
                vtot = jnp.zeros(6, f_.dtype)
                for h in _hooks:
                    f_, v6 = h(sys_, f_)
                    vtot = vtot + v6
                return f_, vtot

            return composed

        post_force = _compose_pf(pf_hooks)
        post_force_setup = (_compose_pf(pf_hooks_setup)
                            if pf_hooks_setup != pf_hooks else None)

        shrink = None
        bstyles = getattr(script, "boundary_styles", None)
        if bstyles is not None and script._created_box is not None:
            from lidp_tpu.box import ShrinkSpec

            code = {"p": 0, "f": 0, "s": 2, "m": 3}
            lo_c = tuple(code[st[0]] for st in bstyles)
            hi_c = tuple(code[st[1]] for st in bstyles)
            if any(c in (2, 3) for c in lo_c + hi_c):
                c_lo, c_hi = script._created_box
                small = tuple(1.0e-4 * (c_hi - c_lo))
                shrink = ShrinkSpec(lo_style=lo_c, hi_style=hi_c,
                                    small=small, min_lo=tuple(c_lo),
                                    min_hi=tuple(c_hi))

        respa_cfg = getattr(script, "_respa", None)
        if respa_cfg is not None:
            from lidp_tpu.integrate.driver import RespaRunner

            only_nve = all(f_.style == "nve"
                           for f_ in script.fixes.values())
            if not only_nve:
                raise NotImplementedError(
                    "run_style respa currently supports fix nve only")
            loops_r, terms_r = respa_cfg
            runner = RespaRunner(
                ff=ff, dt=script.dt, ftm2v=u.ftm2v,
                mass_atom=jnp.asarray(mass_atom, dtype),
                loops=loops_r, terms=terms_r,
                neighbor_cfg=ncfg, rebuild_every=rebuild_every,
                shrink=shrink)
            norm_r = getattr(script, "_thermo_norm", None)
            sim_obj = Simulation(script=script, sys=sys, runner=runner,
                                 thermo_params=ThermoParams.create(
                                     mass_atom, dof=dim_ * n - dim_,
                                     units=u,
                                     norm=((u.name == "lj")
                                           if norm_r is None else norm_r),
                                     natoms=n, dim=dim_),
                                 group_thermo={}, natoms=n)
            sim_obj.halt_spec = halt_spec
            sim_obj.gg_computes = {}
            sim_obj.msd_computes = {}
            sim_obj.rdf_computes = {}
            sim_obj.mesh = None
            sim_obj.n_padded = npad
            return sim_obj

        post_integrate = None
        if pi_hooks:
            def post_integrate(sys_, _hooks=tuple(pi_hooks)):
                for h in _hooks:
                    sys_ = h(sys_)
                return sys_

        runner = Runner(ff=ff, integ=integ, neighbor_cfg=ncfg,
                        rebuild_every=rebuild_every, post_force=post_force,
                        end_of_step=end_of_step,
                        post_force_setup=post_force_setup,
                        shrink=shrink, post_integrate=post_integrate,
                        check=script.neigh_check, skin=script.skin,
                        delay=script.neigh_delay,
                        # barostats consume the virial every step, and
                        # velocity-dependent post_force hooks (shake/rattle
                        # constraint forces+virial, langevin noise+friction,
                        # viscous drag) cannot be re-tallied at the chunk
                        # boundary: the re-tally would see post-final-
                        # integrate velocities, skewing the carried force
                        # and the constraint virial (found via peptide
                        # step-50 Press parity).  Everything else samples
                        # energies at chunk (thermo) boundaries.
                        every_step_ev=has_baro or has_vdep_pf)

        if pol is not None and _fast_polar_pre:
            # production fast-polar engine: panel forces + device/host CG
            # composed with the script's integrator fixes (VERDICT r4 #1)
            from lidp_tpu.parallel.fast_polar import maybe_attach

            _fr = maybe_attach(
                runner, script=script, ff=ff, pol=pol, sys=sys, n=n,
                npad=npad, dt=script.dt, ftm2v=u.ftm2v, dtype=dtype,
                sp_lists=((np.asarray(sp_idx), np.asarray(sp_lvl))
                          if sp_idx is not None else None),
                log=script.log)
            if _fr is not None:
                runner = _fr
        if (pol is not None and n > DENSE_PATH_MAX_ATOMS
                and type(runner).__name__ == "Runner"):
            script.log(
                "WARNING: polarization above the dense-path size cap is "
                "running the O(N^2) tensor path (fast-polar engine "
                "ineligible: unsupported fix/kspace/bonded composition)")

        # ---- thermo ----
        # compute_modify thermo_temp extra N (compute.cpp modify_params)
        # overrides the default extra dof (= dim)
        extra_dof = dim_
        cmod = getattr(script, "_compute_modify", {})
        if "extra" in cmod.get("thermo_temp", {}):
            extra_dof = float(cmod["thermo_temp"]["extra"])
        dof = dim_ * n - extra_dof - dof_removed
        norm_m = getattr(script, "_thermo_norm", None)
        tp = ThermoParams.create(mass_atom, dof=dof, units=u,
                                 norm=((u.name == "lj")
                                       if norm_m is None else norm_m),
                                 natoms=n, dim=dim_,
                                 etail=etail, ptail=ptail)
        group_tp = {}
        gg_computes = {}
        rigid_computes = {}
        msd_computes = {}
        rdf_computes = {}
        simple_computes = {}
        chunk_computes = {}
        chunkagg_computes = {}
        hf_computes = {}
        slice_computes = {}
        press_computes = {}
        vacf_computes = {}
        peratom_computes = {}
        reduce_computes = {}
        tempvar_computes = {}
        for cid, spec_c in script.computes.items():
            if len(spec_c) == 3 and spec_c[1] in ("ke/rigid",
                                                  "erotate/rigid"):
                # body translational/rotational KE of the rigid fix
                # (compute_ke_rigid.cpp:60-75 / compute_erotate_rigid.cpp)
                rigid_computes[cid] = spec_c[1]
                continue
            if len(spec_c) == 3 and spec_c[1] == "rigid/local":
                continue   # evaluated at dump-local time
            if len(spec_c) == 3 and spec_c[1] == "group/group":
                gg_computes[cid] = (
                    jnp.asarray(groups[spec_c[0]]),
                    jnp.asarray(groups[spec_c[2]]))
                continue
            if len(spec_c) == 3 and spec_c[1] == "msd":
                msd_computes[cid] = (script.groups[spec_c[0]].copy(),
                                     np.asarray(spec_c[2]))
                continue
            if len(spec_c) == 3 and spec_c[1] == "rdf":
                rdf_computes[cid] = (script.groups[spec_c[0]].copy(),
                                     int(spec_c[2]))
                continue
            if len(spec_c) == 3 and spec_c[1] in ("com", "gyration", "ke",
                                                  "pe"):
                simple_computes[cid] = (script.groups[spec_c[0]].copy(),
                                        spec_c[1])
                continue
            if len(spec_c) == 3 and spec_c[1] == "vacf":
                vacf_computes[cid] = (script.groups[spec_c[0]].copy(),
                                      np.asarray(spec_c[2]))
                continue
            if len(spec_c) == 3 and spec_c[1] in (
                    "ke/atom", "pe/atom", "stress/atom", "coord/atom",
                    "cluster/atom", "displace/atom", "property/atom",
                    "centro/atom", "cna/atom", "fragment/atom",
                    "aggregate/atom", "orientorder/atom",
                    "hexorder/atom", "global/atom"):
                peratom_computes[cid] = (script.groups[spec_c[0]].copy(),
                                         spec_c[1], spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1] == "heat/flux":
                hf_computes[cid] = (script.groups[spec_c[0]].copy(),
                                    list(spec_c[2]["ids"]))
                continue
            if len(spec_c) == 3 and spec_c[1] == "slice":
                slice_computes[cid] = dict(spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1] == "pressure":
                press_computes[cid] = dict(spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1] == "reduce":
                reduce_computes[cid] = (script.groups[spec_c[0]].copy(),
                                        spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1] in ("temp/ramp",
                                                  "temp/region",
                                                  "temp/profile",
                                                  "temp/deform"):
                tempvar_computes[cid] = (script.groups[spec_c[0]].copy(),
                                         spec_c[1], spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1] == "chunk/atom":
                chunk_computes[cid] = (script.groups[spec_c[0]].copy(),
                                       spec_c[2])
                continue
            if len(spec_c) == 3 and spec_c[1].endswith("/chunk"):
                chunkagg_computes[cid] = (
                    script.groups[spec_c[0]].copy(), spec_c[1],
                    spec_c[2]["chunk"], spec_c[2]["extra"])
                continue
            gname, style = spec_c[0], spec_c[1]
            gmask = groups[gname]
            ng = int(gmask.sum())
            gdof = dim_ * ng - dim_
            if "extra" in cmod.get(cid, {}):
                gdof = dim_ * ng - float(cmod[cid]["extra"])
            vcomp = (True, True, True)
            com_bias = False
            if style == "temp/partial":
                flags = spec_c[2]
                vcomp = tuple(bool(f) for f in flags) + (True,) * (
                    3 - len(flags))
                nper = sum(1 for f in flags if f)
                # compute_temp_partial.cpp:77-86
                gdof = nper * ng - (nper / dim_) * dim_
            elif style == "temp/com":
                com_bias = True
            for gsp, rsetup in rigid_groups:
                # bodies wholly inside the compute group lose constrained dof
                inb = rsetup.body_of_atom >= 0
                if np.all(gmask[inb] == True):  # noqa: E712
                    gdof -= rsetup.dof_removed
            gm = np.where(gmask, mass_atom, 0.0)
            group_tp[cid] = ThermoParams.create(
                gm, dof=gdof, units=u, norm=False, natoms=ng, dim=dim_,
                vcomp=vcomp, com_bias=com_bias)

        ttid = getattr(script, "_thermo_temp", None)
        if ttid is not None:
            # thermo_modify temp ID (thermo.cpp modify_params): temp, ke,
            # etotal's KE part and the pressure's kinetic tensor all follow
            # the designated compute's group + dof.  norm/natoms stay global.
            tgmask = groups[script.computes[ttid][0]]
            ngt = int(np.count_nonzero(tgmask))
            tdof = dim_ * ngt - dim_ - dof_removed
            tp = ThermoParams.create(
                np.where(tgmask, mass_atom, 0.0), dof=tdof, units=u,
                norm=(u.name == "lj"), natoms=n, dim=dim_)

        sim_obj = Simulation(script=script, sys=sys, runner=runner,
                             thermo_params=tp, group_thermo=group_tp,
                             natoms=n)
        sim_obj.halt_spec = halt_spec
        sim_obj.dtreset_cfg = dtreset_cfg
        sim_obj._restrain_factory = restrain_factory
        sim_obj._tmd_factory = tmd_factory
        sim_obj._pf_hooks = pf_hooks
        sim_obj._compose_pf = _compose_pf
        sim_obj.deform_cfg = None
        if deform_fix is not None:
            # fix deform N x|y|z final lo hi | scale F | xy|xz|yz final T
            # [remap x|none] [units box|lattice]  (fix_deform.cpp)
            a_d = list(deform_fix.args[1:])   # skip N
            cfg = dict(dims={}, tilts={}, remap=True, vremap=False)
            s3 = getattr(script, "lattice_spacing3", None)
            s3 = (np.asarray(s3, float) if s3 is not None
                  else np.full(3, script.lattice_spacing or 1.0))
            units_box = "units" in a_d and a_d[a_d.index("units") + 1] == "box"
            if units_box:
                s3 = np.ones(3)
            i = 0
            while i < len(a_d):
                k = a_d[i]
                if k in ("x", "y", "z"):
                    d = "xyz".index(k)
                    if a_d[i + 1] == "final":
                        cfg["dims"][d] = ("final",
                                          float(a_d[i + 2]) * s3[d],
                                          float(a_d[i + 3]) * s3[d])
                        i += 4
                    elif a_d[i + 1] == "scale":
                        cfg["dims"][d] = ("scale", float(a_d[i + 2]))
                        i += 3
                    elif a_d[i + 1] == "delta":
                        cfg["dims"][d] = ("delta",
                                          float(a_d[i + 2]) * s3[d],
                                          float(a_d[i + 3]) * s3[d])
                        i += 4
                    elif a_d[i + 1] in ("vel", "erate", "trate"):
                        # vel has distance/time units; erate/trate are
                        # dimensionless strain rates (fix_deform.cpp:248)
                        sc = s3[d] if a_d[i + 1] == "vel" else 1.0
                        cfg["dims"][d] = (a_d[i + 1],
                                          float(a_d[i + 2]) * sc)
                        i += 3
                    else:
                        raise NotImplementedError(
                            f"fix deform {k} {a_d[i + 1]}")
                elif k in ("xy", "xz", "yz"):
                    ti = ("xy", "xz", "yz").index(k)
                    if a_d[i + 1] == "final":
                        cfg["tilts"][ti] = ("final",
                                            float(a_d[i + 2]) * s3[0])
                        i += 3
                    elif a_d[i + 1] == "delta":
                        cfg["tilts"][ti] = ("delta",
                                            float(a_d[i + 2]) * s3[0])
                        i += 3
                    elif a_d[i + 1] in ("vel", "erate", "trate"):
                        sc = s3[0] if a_d[i + 1] == "vel" else 1.0
                        cfg["tilts"][ti] = (a_d[i + 1],
                                            float(a_d[i + 2]) * sc)
                        i += 3
                    else:
                        raise NotImplementedError(
                            f"fix deform {k} {a_d[i + 1]}")
                elif k == "remap":
                    # x: remap coords affinely; v: adjust velocities of
                    # atoms crossing a periodic boundary by the box face
                    # velocity (Domain::pbc, domain.cpp:542); none: neither
                    cfg["remap"] = a_d[i + 1] == "x"
                    cfg["vremap"] = a_d[i + 1] == "v"
                    i += 2
                elif k == "units":
                    i += 2
                else:
                    raise NotImplementedError(f"fix deform keyword {k}")
            sim_obj.deform_cfg = cfg
            if runner.deform_remap != cfg["remap"]:
                # deform_remap is baked statically into the jitted scan;
                # rebuild the wrappers with the parsed value
                runner.deform_remap = cfg["remap"]
                runner.__post_init__()
        sim_obj.gg_computes = gg_computes
        sim_obj.rigid_computes = rigid_computes
        sim_obj.cmap_fid = (sim_cmap_fid if cmapp is not None else None)
        sim_obj.msd_computes = msd_computes
        sim_obj.rdf_computes = rdf_computes
        sim_obj.simple_computes = simple_computes
        sim_obj.vacf_computes = vacf_computes
        sim_obj.peratom_computes = peratom_computes
        sim_obj.reduce_computes = reduce_computes
        sim_obj.tempvar_computes = tempvar_computes
        sim_obj.chunk_computes = chunk_computes
        sim_obj.chunkagg_computes = chunkagg_computes
        sim_obj.hf_computes = hf_computes
        sim_obj.slice_computes = slice_computes
        sim_obj.press_computes = press_computes
        sim_obj.mesh = mesh
        sim_obj.n_padded = npad

        if mesh is not None:
            # lay every device array onto the mesh: (npad, ...) leaves are
            # sharded over the atom axis, everything else replicated; the
            # jitted step then runs SPMD with XLA-inserted collectives
            import jax as _jax
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            sh_atoms = NamedSharding(mesh, _P(AXIS))
            sh_repl = NamedSharding(mesh, _P())

            def _put(leaf):
                if not (hasattr(leaf, "shape") and hasattr(leaf, "dtype")):
                    return leaf
                sh = (sh_atoms if leaf.ndim >= 1 and leaf.shape[0] == npad
                      else sh_repl)
                return _jax.device_put(leaf, sh)

            def _put_tree(t):
                return _jax.tree.map(_put, t)

            sim_obj.sys = _put_tree(sim_obj.sys)
            runner.ff = _put_tree(runner.ff)
            runner.integ = dataclasses.replace(
                runner.integ, params=_put_tree(runner.integ.params))
            sim_obj.thermo_params = _put_tree(sim_obj.thermo_params)
            sim_obj.group_thermo = {k: _put_tree(v)
                                    for k, v in group_tp.items()}
            sim_obj.gg_computes = {k: (_put(a), _put(b))
                                   for k, (a, b) in gg_computes.items()}
        return sim_obj

    # ------------------------------- running -------------------------------

    def _fix_vector_sample(self, spec, step):
        """fix vector Nevery value... (fix_vector.cpp): append the sampled
        global values to a growing time series on the Nevery grid.  Also
        invoked at run setup (FixVector::setup -> end_of_step samples when
        ntimestep == nextstep, fix_vector.cpp:242-253); _last_step guards
        double-sampling when a run boundary lands on the grid."""
        nev = int(spec.args[0])
        if not nev or step % nev != 0:
            return
        if getattr(spec, "_last_step", None) == step:
            return
        spec._last_step = step
        row = self._thermo_row()
        vals = []
        for t in spec.args[1:]:
            key = t[2:] if t.startswith("c_") else t.lower()
            v = row.get("c_" + key, row.get(key))
            vals.append(float(v) if v is not None else 0.0)
        buf = getattr(spec, "_series", [])
        buf.append(vals[0] if len(vals) == 1 else vals)
        spec._series = buf

    def _host_fixes(self, step):
        """fix print (fix_print.cpp: $-substituted message every N) and
        fix ave/time (fix_ave_time.cpp: Nevery/Nrepeat/Nfreq running
        averages of thermo/compute scalars), evaluated host-side at scan
        chunk boundaries — their periods fold into the chunk gcd."""
        for spec in self.script.fixes.values():
            if spec.style == "controller":
                # fix ID group controller Nevery alpha Kp Ki Kd pvar
                # setpoint cvar (fix_controller.cpp::end_of_step):
                # cv += -alpha(Kp tau err + Ki tau^2 sumerr + Kd deltaerr)
                # evaluated at scan-chunk boundaries (the Nevery period
                # folds into the chunk gcd); consumers re-read the
                # internal variable when the next chunk re-composes
                a_c = spec.args
                nev = int(a_c[0])
                if not nev or step % nev:
                    continue
                alpha, kp, ki, kd = (float(a_c[1]), float(a_c[2]),
                                     float(a_c[3]), float(a_c[4]))
                pvar, setpt, cvar = a_c[5], float(a_c[6]), a_c[7]
                row = self._thermo_row()
                if pvar.startswith("v_"):
                    cur = float(self.script.var_value(pvar[2:]))
                else:
                    cur = float(row[pvar.replace("C_", "c_")
                                    if pvar.startswith("C_") else pvar])
                st_c = getattr(spec, "_ctrl", None)
                if st_c is None:
                    try:
                        cv0 = float(self.script.var_value(cvar))
                    except (KeyError, ValueError):
                        cv0 = 0.0
                    st_c = {"control": cv0,
                            "sumerr": 0.0, "olderr": 0.0, "first": True}
                err = cur - setpt
                if st_c["first"]:
                    st_c["first"] = False
                    deltaerr = 0.0
                else:
                    deltaerr = err - st_c["olderr"]
                    st_c["sumerr"] += err
                tau = nev * self.script.dt
                st_c["control"] += -kp * alpha * tau * err
                st_c["control"] += -ki * alpha * tau * tau * st_c["sumerr"]
                st_c["control"] += -kd * alpha * deltaerr
                st_c["olderr"] = err
                spec._ctrl = st_c
                self.script._internal_vars[cvar] = float(st_c["control"])
                continue
            if spec.style == "print":
                nev = int(spec.args[0])
                if nev and step % nev == 0:
                    # reassemble the quoted message (the tokenizer split it)
                    toks = list(spec.args[1:])
                    msg_toks = []
                    for t_ in toks:
                        msg_toks.append(t_)
                        if t_.endswith('"') and (len(msg_toks) > 1
                                                  or len(t_) > 1):
                            break
                    msg = " ".join(msg_toks).strip('"')
                    row = self._thermo_row()
                    import re as _re

                    def _sub(m):
                        k = m.group(1)
                        v = row.get(k.lower())
                        if v is None:
                            v = self.script.var_str(k)
                            if v is None:
                                v = ""
                        return f"{v:.8g}" if isinstance(v, float) else str(v)

                    out = _re.sub(r"\$\{(\w+)\}", _sub, msg)
                    fpath = None
                    if "file" in spec.args:
                        fpath = spec.args[
                            list(spec.args).index("file") + 1]
                    if fpath:
                        import os as _os
                        mode = "a" if getattr(spec, "_started", False) \
                            else "w"
                        with open(_os.path.join(self.script.root, fpath),
                                  mode) as fh:
                            fh.write(out + "\n")
                        spec._started = True
                    else:
                        self.script.log(out)
            elif spec.style == "ave/chunk":
                self._ave_chunk(spec, step)
            elif spec.style == "store/state":
                # fix store/state N field... (fix_store_state.cpp):
                # snapshot per-atom fields every N steps (N=0: once at
                # setup); exposed as f_ID[col] to dumps and reductions
                from lidp_tpu.computes import peratom_column

                nev = int(spec.args[0])
                first = not hasattr(spec, "_peratom_store")
                if first or (nev and step % nev == 0):
                    cols = [peratom_column(self, t)
                            for t in spec.args[1:]]
                    spec._peratom_store = (cols[0] if len(cols) == 1
                                           else np.stack(cols, axis=1))
            elif spec.style == "ave/atom":
                # fix ave/atom Nevery Nrepeat Nfreq field...
                # (fix_ave_atom.cpp): per-atom Nrepeat-sample window
                # averages refreshed every Nfreq, exposed as f_ID[col]
                from lidp_tpu.computes import peratom_column

                nev, nrep, nfreq = (int(spec.args[0]), int(spec.args[1]),
                                    int(spec.args[2]))
                if nev and step % nev == 0:
                    cols = [peratom_column(self, t)
                            for t in spec.args[3:]]
                    sample = (cols[0] if len(cols) == 1
                              else np.stack(cols, axis=1))
                    buf = getattr(spec, "_samples", [])
                    buf.append(sample)
                    spec._samples = buf[-nrep:]
                if nfreq and step % nfreq == 0 \
                        and getattr(spec, "_samples", None):
                    spec._peratom_store = (
                        np.mean(spec._samples, axis=0))
            elif spec.style in ("ave/histo", "ave/histo/weight"):
                self._ave_histo(spec, step)
            elif spec.style == "ave/correlate":
                self._ave_correlate(spec, step)
            elif spec.style == "vector":
                self._fix_vector_sample(spec, step)
            elif spec.style == "ave/time":
                self._ave_time(spec, step)

    def _ave_time(self, spec, step):
        """fix ave/time Nevery Nrepeat Nfreq value... [mode scalar|vector]
        [file F] (fix_ave_time.cpp): Nrepeat-window running averages of
        global scalars (mode scalar) or of global vectors/arrays such as
        the */chunk computes (mode vector; file rows follow the reference
        layout `step nrows` then `row v1 v2 ...`)."""
        a = list(spec.args)
        nev, nrep, nfreq = int(a[0]), int(a[1]), int(a[2])
        vals, mode, fpath = [], "scalar", None
        i = 3
        while i < len(a):
            if a[i] == "mode":
                mode = a[i + 1]; i += 2
            elif a[i] == "file":
                fpath = a[i + 1]; i += 2
            elif a[i] in ("ave", "start", "format"):
                i += 2
            elif a[i] in ("off", "title1", "title2", "title3"):
                i += 2
            else:
                vals.append(a[i]); i += 1

        def _resolve_vector(tok):
            # c_ID -> full per-chunk/global array; c_ID[j] -> one column
            import re as _re
            mm = _re.match(r"c_(\w+)(?:\[(\d+)\])?$", tok)
            if mm and mm.group(1) in getattr(self, "slice_computes", {}):
                arr = np.asarray(self.eval_slice(mm.group(1)), float)
                if mm.group(2):
                    arr = arr[:, [int(mm.group(2)) - 1]]
                return arr
            return self._global_array(tok)

        if nev and step % nev == 0:
            if mode == "vector":
                sample = np.concatenate(
                    [_resolve_vector(t) for t in vals], axis=1)
            else:
                row = self._thermo_row()
                out = []
                for what in vals:
                    key = (what[2:] if what.startswith("c_")
                           else what.lower())
                    v = row.get("c_" + key, row.get(key))
                    out.append(float(v) if v is not None else 0.0)
                sample = np.asarray(out)
            buf = getattr(spec, "_avebuf", [])
            buf.append(sample)
            spec._avebuf = buf[-nrep:]
        if nfreq and step % nfreq == 0 and getattr(spec, "_avebuf", None):
            ave = np.mean(spec._avebuf, axis=0)
            self.script.ave_time_values = getattr(
                self.script, "ave_time_values", {})
            self.script.ave_time_values.setdefault(spec.fid, []).append(
                (step, ave if ave.size > 1 else float(ave.reshape(-1)[0])))
            if fpath:
                import os as _os
                fmode = "a" if getattr(spec, "_started", False) else "w"
                with open(_os.path.join(self.script.root, fpath),
                          fmode) as fh:
                    if mode == "vector":
                        fh.write(f"{step} {ave.shape[0]}\n")
                        for r in range(ave.shape[0]):
                            fh.write(" ".join(
                                [str(r + 1)] + [f"{v:.10g}"
                                                for v in ave[r]]) + "\n")
                    else:
                        fh.write(" ".join(
                            [str(step)] + [f"{v:.10g}"
                                           for v in ave.reshape(-1)])
                            + "\n")
                spec._started = True

    def _global_array(self, tok):
        """Resolve c_ID / c_ID[j] naming a global vector/array compute
        (chunk aggregates, heat/flux) to a 2-d array."""
        import re as _re

        mm = _re.match(r"c_(\w+)(?:\[(\d+)\])?$", tok)
        if not mm:
            raise ValueError(f"global array input {tok}")
        name = mm.group(1)
        if name in getattr(self, "chunkagg_computes", {}):
            from lidp_tpu.computes import eval_chunk_agg

            arr = np.asarray(eval_chunk_agg(self, name), float)
        elif name in getattr(self, "hf_computes", {}):
            from lidp_tpu.computes import eval_heat_flux

            arr = np.asarray(eval_heat_flux(self, name), float)
        else:
            raise ValueError(f"{tok}: not a global vector/array compute")
        if arr.ndim == 1:
            arr = arr[:, None]
        if mm.group(2):
            arr = arr[:, [int(mm.group(2)) - 1]]
        return arr

    def eval_slice(self, cid):
        """compute slice Nstart Nstop Nskip input...
        (ComputeSlice::extract_one): 1-based inclusive row selection of
        global vectors/arrays; one output column per input."""
        spec = self.slice_computes[cid]
        # Nstop is EXCLUSIVE (compute_slice.cpp: for i = nstart;
        # i < nstop; i += nskip)
        sel = slice(spec["start"] - 1, spec["stop"] - 1, spec["skip"])
        cols = [self._global_array(t)[sel] for t in spec["inputs"]]
        return np.concatenate(cols, axis=1)

    def _dt_reset(self, cfg):
        """fix dt/reset (FixDtReset::end_of_step): bound the timestep so
        no atom moves more than xmax; applied at run-chunk boundaries
        (the chunk size divides Nevery).  Updates the integrator's traced
        dt params in place — no recompile."""
        n = self.natoms
        gm = np.asarray(cfg["group"])[:n]
        v = np.asarray(self.sys.v)[:n][gm]
        f = np.asarray(self.res.f)[:n][gm]
        m = np.asarray(self.thermo_params.mass_atom)[:n][gm]
        ftm2v = self.script.units.ftm2v
        BIG = 1.0e20
        vsq = (v * v).sum(1)
        fsq = (f * f).sum(1)
        minv = np.where(m > 0, 1.0 / np.maximum(m, 1e-300), 0.0)
        xmax = cfg["xmax"]
        dtv = np.where(vsq > 0, xmax / np.sqrt(np.maximum(vsq, 1e-300)),
                       BIG)
        dtf = np.where(fsq > 0, np.sqrt(
            2.0 * xmax / (ftm2v * np.sqrt(np.maximum(fsq, 1e-300))
                          * np.maximum(minv, 1e-300))), BIG)
        dt = np.minimum(dtv, dtf)
        dele = (dt[:, None] * v
                + (0.5 * dt * dt * minv * ftm2v)[:, None] * f)
        delr = np.sqrt((dele * dele).sum(1))
        dt = np.where(delr > xmax, dt * xmax / np.maximum(delr, 1e-300),
                      dt)
        newdt = float(dt.min()) if dt.size else BIG
        if cfg["tmin"] is not None:
            newdt = max(newdt, cfg["tmin"])
        if cfg["tmax"] is not None:
            newdt = min(newdt, cfg["tmax"])
        if newdt == self.script.dt:
            return
        self.script.dt = newdt
        p = self.runner.integ.params
        import jax.numpy as jnp
        updates = {}
        for fld, val in (("dtv", newdt),
                         ("dtf", 0.5 * newdt * self.script.units.ftm2v),
                         ("dtq", 0.5 * newdt)):
            if getattr(p, fld, None) is not None:
                updates[fld] = jnp.asarray(val, self.sys.x.dtype)
        self.runner.integ = dataclasses.replace(
            self.runner.integ, params=dataclasses.replace(p, **updates))

    def _ave_histo(self, spec, step):
        """fix ave/histo Nevery Nrepeat Nfreq lo hi Nbin value... [file F]
        (fix_ave_histo.cpp): histogram of per-atom or global values,
        Nrepeat samples accumulated, stats + bins written every Nfreq.
        File rows follow the reference layout: a `step nbins total
        missing min max` header then `i coord count count/total`."""
        from lidp_tpu.computes import peratom_column

        a = list(spec.args)
        nev, nrep, nfreq = int(a[0]), int(a[1]), int(a[2])
        lo, hi, nbin = float(a[3]), float(a[4]), int(a[5])
        vals = []
        i = 6
        fpath = None
        while i < len(a):
            if a[i] == "file":
                fpath = a[i + 1]; i += 2
            elif a[i] == "mode":
                i += 2
            else:
                vals.append(a[i]); i += 1
        if nev and step % nev == 0:
            gm = np.asarray(self.script.groups[spec.group])[:self.natoms]
            samples = []
            for t in vals:
                try:
                    arr = peratom_column(self, t)
                    samples.append(np.asarray(arr)[gm])
                except (KeyError, ValueError):
                    row = self._thermo_row()
                    key = t[2:] if t.startswith("c_") else t.lower()
                    v = row.get("c_" + key, row.get(key))
                    samples.append(np.array([float(v)]))
            if spec.style == "ave/histo/weight":
                # fix ave/histo/weight (fix_ave_histo_weight.cpp): the
                # first value is binned, the second supplies the weights
                data, weights = samples[0], samples[1]
                inside = (data >= lo) & (data <= hi)
                hist, _ = np.histogram(data[inside], bins=nbin,
                                       range=(lo, hi),
                                       weights=weights[inside])
                st = getattr(spec, "_histo", None)
                if st is None:
                    st = dict(hist=np.zeros(nbin), total=0.0, missing=0.0,
                              vmin=np.inf, vmax=-np.inf, nsamp=0)
                st["hist"] = st["hist"] + hist
                st["total"] += float(weights[inside].sum())
                st["missing"] += float(weights[~inside].sum())
                if len(data):
                    st["vmin"] = min(st["vmin"], float(data.min()))
                    st["vmax"] = max(st["vmax"], float(data.max()))
                st["nsamp"] += 1
                spec._histo = st
                self._histo_emit(spec, step, nfreq, nbin, lo, hi, fpath)
                return
            data = np.concatenate(samples)
            inside = (data >= lo) & (data <= hi)
            hist, _ = np.histogram(data[inside], bins=nbin,
                                   range=(lo, hi))
            st = getattr(spec, "_histo", None)
            if st is None:
                st = dict(hist=np.zeros(nbin), total=0.0, missing=0.0,
                          vmin=np.inf, vmax=-np.inf, nsamp=0)
            st["hist"] = st["hist"] + hist
            st["total"] += inside.sum()
            st["missing"] += (~inside).sum()
            if len(data):
                st["vmin"] = min(st["vmin"], float(data.min()))
                st["vmax"] = max(st["vmax"], float(data.max()))
            st["nsamp"] += 1
            if st["nsamp"] > nrep:
                st = dict(hist=np.asarray(hist, float),
                          total=float(inside.sum()),
                          missing=float((~inside).sum()),
                          vmin=float(data.min()) if len(data) else np.inf,
                          vmax=float(data.max()) if len(data) else -np.inf,
                          nsamp=1)
            spec._histo = st
        self._histo_emit(spec, step, nfreq, nbin, lo, hi, fpath)

    def _histo_emit(self, spec, step, nfreq, nbin, lo, hi, fpath):
        if nfreq and step % nfreq == 0 and getattr(spec, "_histo", None):
            st = spec._histo
            self.script.ave_histo_values = getattr(
                self.script, "ave_histo_values", {})
            self.script.ave_histo_values[spec.fid] = dict(st)
            if fpath:
                import os as _os

                mode = "a" if getattr(spec, "_started", False) else "w"
                binw = (hi - lo) / nbin
                with open(_os.path.join(self.script.root, fpath),
                          mode) as fh:
                    tot = max(st["total"], 1.0)
                    fh.write(f"{step} {nbin} {st['total']:.8g} "
                             f"{st['missing']:.8g} {st['vmin']:.8g} "
                             f"{st['vmax']:.8g}\n")
                    for b in range(nbin):
                        fh.write(f"{b + 1} {lo + (b + 0.5) * binw:.8g} "
                                 f"{st['hist'][b]:.8g} "
                                 f"{st['hist'][b] / tot:.8g}\n")
                spec._started = True
            spec._histo = None

    def _ave_correlate(self, spec, step):
        """fix ave/correlate Nevery Nrepeat Nfreq value... [file F]
        (fix_ave_correlate.cpp, type auto): <A(t) A(t+m*Nevery)> over the
        trailing Nrepeat samples, written every Nfreq."""
        a = list(spec.args)
        nev, nrep, nfreq = int(a[0]), int(a[1]), int(a[2])
        vals, fpath = [], None
        i = 3
        while i < len(a):
            if a[i] == "file":
                fpath = a[i + 1]; i += 2
            elif a[i] in ("type", "ave", "start"):
                i += 2
            else:
                vals.append(a[i]); i += 1
        if nev and step % nev == 0:
            row = self._thermo_row()
            samp = []
            for t in vals:
                key = t[2:] if t.startswith("c_") else t.lower()
                v = row.get("c_" + key, row.get(key))
                samp.append(float(v) if v is not None else 0.0)
            buf = getattr(spec, "_series", [])
            buf.append(samp)
            spec._series = buf[-nrep:]
        if nfreq and step % nfreq == 0 \
                and getattr(spec, "_series", None):
            series = np.asarray(spec._series)      # (nsamp, nval)
            nsamp = len(series)
            corr = np.zeros((nrep, series.shape[1]))
            cnt = np.zeros(nrep)
            for m in range(min(nrep, nsamp)):
                prod = series[:nsamp - m] * series[m:]
                corr[m] = prod.mean(axis=0)
                cnt[m] = nsamp - m
            self.script.ave_correlate_values = getattr(
                self.script, "ave_correlate_values", {})
            self.script.ave_correlate_values[spec.fid] = (corr, cnt)
            if fpath:
                import os as _os

                mode = "a" if getattr(spec, "_started", False) else "w"
                with open(_os.path.join(self.script.root, fpath),
                          mode) as fh:
                    fh.write(f"{step} {min(nrep, nsamp)}\n")
                    for m in range(min(nrep, nsamp)):
                        fh.write(f"{m + 1} {m * nev} {int(cnt[m])} "
                                 + " ".join(f"{c:.8g}" for c in corr[m])
                                 + "\n")
                spec._started = True

    def _chunk_ids(self, cid):
        """Per-atom chunk index (1..nchunk, 0 = outside group) plus the
        printed per-chunk coordinate — compute_chunk_atom.cpp bin/1d
        (setup_xyz_bins), type and molecule styles."""
        gmask, spec = self.chunk_computes[cid]
        n = self.natoms
        if spec["which"] == "type":
            ids = np.asarray(self.sys.type)[:n].astype(int)
            nchunk = int(self.script.ntypes)
            coord = None
        elif spec["which"] == "molecule":
            ids = np.asarray(self.sys.mol)[:n].astype(int)
            nchunk = int(ids.max()) if n else 0
            coord = None
        else:   # bin/1d, bin/2d, bin/3d (setup_xyz_bins)
            dims = spec.get("dims", [spec["dim"]])
            origins = spec.get("origins", [spec["origin"]])
            deltas = spec.get("deltas", [spec["delta"]])
            per_dim = []   # (idx0 (n,), nbin, centers (nbin,))
            for d, org, delta in zip(dims, origins, deltas):
                lo = float(np.asarray(self.sys.box.lo)[d])
                prd = float(np.asarray(self.sys.box.lengths)[d])
                if spec["units"] == "reduced":
                    delta = delta * prd
                elif spec["units"] == "lattice" and \
                        getattr(self.script, "lattice_spacing", 0.0):
                    delta = delta * self.script.lattice_spacing3[d]
                origin = {"lower": lo, "upper": lo + prd,
                          "center": lo + 0.5 * prd}.get(org, None)
                if origin is None:
                    origin = float(org)
                # extend origin down to cover the box (setup_xyz_bins)
                while origin > lo:
                    origin -= delta
                nbin = int(np.ceil((lo + prd - origin) / delta))
                x = np.asarray(self.sys.x)[:n, d]
                x = x - prd * np.floor((x - lo) / prd)   # wrap periodic
                idx0 = np.clip(
                    np.floor((x - origin) / delta).astype(int), 0,
                    nbin - 1)
                per_dim.append(
                    (idx0, nbin, origin + (np.arange(nbin) + 0.5) * delta))
            nchunk = 1
            ids0 = np.zeros(n, int)
            for idx0, nbin, _ in per_dim:
                ids0 = ids0 * nbin + idx0   # row-major, last dim fastest
                nchunk *= nbin
            ids = ids0 + 1
            # per-chunk printed coordinates, one column per binned dim
            grids = np.meshgrid(*[c for _, _, c in per_dim],
                                indexing="ij")
            coord = np.stack([g.reshape(-1) for g in grids], axis=-1)
            if len(per_dim) == 1:
                coord = coord[:, 0]
        ids = np.where(gmask[:n] & np.asarray(self.sys.mask)[:n], ids, 0)
        return ids, nchunk, coord

    def _ave_chunk(self, spec, step):
        """fix ave/chunk (fix_ave_chunk.cpp): Nevery-sampled, Nrepeat-window
        per-chunk averages of per-atom values, written every Nfreq steps."""
        nev, nrep, nfreq = (int(spec.args[0]), int(spec.args[1]),
                            int(spec.args[2]))
        ccid = spec.args[3]
        vals = []
        i = 4
        opts = {}
        while i < len(spec.args):
            a_ = spec.args[i]
            if a_ in ("vx", "vy", "vz", "fx", "fy", "fz", "density/number",
                      "density/mass", "temp"):
                vals.append(a_); i += 1
            elif a_ in ("file", "norm", "units", "ave"):
                opts[a_] = spec.args[i + 1]; i += 2
            else:
                i += 2
        if nev == 0 or step % nev:
            pass
        else:
            ids, nchunk, coord = self._chunk_ids(ccid)
            n = self.natoms
            v = np.asarray(self.sys.v)[:n]
            f = np.asarray(self.res.f)[:n]
            m = np.asarray(self.thermo_params.mass_atom)[:n]
            count = np.bincount(ids, minlength=nchunk + 1)[1:]
            cols = []
            for w in vals:
                if w in ("vx", "vy", "vz"):
                    src = v[:, "xyz".index(w[1])]
                elif w in ("fx", "fy", "fz"):
                    src = f[:, "xyz".index(w[1])]
                elif w == "density/number":
                    src = None
                elif w == "density/mass":
                    src = m
                elif w == "temp":
                    # per-chunk T = sum m v^2 / (dim*Ncount*boltz) with the
                    # chunk COM not removed (fix_ave_chunk temp default)
                    src = (m[:, None] * v * v).sum(1)
                tot = (np.bincount(ids, weights=src, minlength=nchunk + 1)[1:]
                       if src is not None else count.astype(float))
                cols.append(tot)
            buf = getattr(spec, "_chunkbuf", None)
            if buf is None or buf[0] != nchunk:
                buf = (nchunk, np.zeros((len(vals), nchunk)),
                       np.zeros(nchunk), 0)
            acc_cols = buf[1] + np.stack(cols)
            acc_cnt = buf[2] + count
            spec._chunkbuf = (nchunk, acc_cols, acc_cnt, buf[3] + 1,
                              coord)
        if nfreq and step % nfreq == 0 and getattr(spec, "_chunkbuf", None):
            nchunk, acc_cols, acc_cnt, nsamp, coord = spec._chunkbuf
            tp = self.thermo_params
            cspec = self.chunk_computes[ccid][1]
            if cspec["which"] == "bin/1d" and nchunk > 1 and \
                    coord is not None:
                # bin volume = delta x cross-section (compute_chunk_atom
                # bin_volumes), even when the last bin overhangs the box
                d = cspec["dim"]
                L = np.asarray(self.sys.box.lengths)
                delta_eff = float(coord[1] - coord[0])
                vol_chunk = delta_eff * float(np.prod(L)) / float(L[d])
            elif cspec["which"] in ("bin/2d", "bin/3d") and \
                    coord is not None:
                L = np.asarray(self.sys.box.lengths)
                vol_chunk = float(np.prod(L))
                for col, d in enumerate(cspec["dims"]):
                    u = np.unique(coord[:, col])
                    de = float(u[1] - u[0]) if len(u) > 1 else float(L[d])
                    vol_chunk *= de / float(L[d])
            else:
                vol_chunk = float(self.sys.box.volume) / max(nchunk, 1)
            out_rows = []
            safe = np.maximum(acc_cnt, 1.0)
            for k in range(nchunk):
                row = [k + 1]
                if coord is not None:
                    if np.ndim(coord) == 2:
                        row.extend(coord[k])   # Coord1 Coord2 [Coord3]
                    else:
                        row.append(coord[k])
                row.append(acc_cnt[k] / nsamp)
                for wi, w in enumerate(vals):
                    tot = acc_cols[wi, k]
                    if w == "density/number":
                        row.append(tot / nsamp / vol_chunk)
                    elif w == "density/mass":
                        row.append(tot / nsamp / vol_chunk)
                    elif w == "temp":
                        dof = tp.dim * max(acc_cnt[k] / nsamp, 1e-300)
                        row.append(tot / nsamp * tp.mvv2e
                                   / (dof * tp.boltz))
                    else:   # per-atom average (norm all default)
                        row.append(tot / safe[k])
                out_rows.append(row)
            self.script.ave_chunk_values = getattr(
                self.script, "ave_chunk_values", {})
            self.script.ave_chunk_values[spec.fid] = (step, out_rows)
            if "file" in opts:
                import os as _os
                mode = "a" if getattr(spec, "_started", False) else "w"
                with open(_os.path.join(self.script.root, opts["file"]),
                          mode) as fh:
                    if mode == "w":
                        fh.write("# Chunk-averaged data for fix "
                                 f"{spec.fid}\n")
                    fh.write(f"{step} {nchunk} "
                             f"{acc_cnt.sum() / max(nsamp, 1):g}\n")
                    for row in out_rows:
                        fh.write("  " + " ".join(
                            f"{v_:g}" for v_ in row) + "\n")
                spec._started = True
            spec._chunkbuf = None

    def _thermo_row(self):
        import jax.numpy as jnp

        from lidp_tpu.thermo import thermo_row

        extra = getattr(self.istate, "virial", None)
        raw = thermo_row(self.sys, self.res, self.thermo_params,
                         extra_virial=extra)
        raw = dict(raw)
        # group temperature computes join the same batched transfer
        # (each is an async jitted dispatch; only the transfer blocks)
        for cid, tp in self.group_thermo.items():
            raw["c_" + cid] = temperature(self.sys, tp)
        # ONE device->host transfer for all scalars: per-scalar float()
        # costs one RPC each through the axon tunnel (~30 ms x ~25
        # columns ~= 0.75 s per thermo row — measured dominating the
        # script-driven polar bench at thermo 1)
        import jax as _jax

        wide = (jnp.float64 if _jax.config.jax_enable_x64
                else jnp.float32)
        stacked = np.asarray(jnp.stack(
            [jnp.asarray(v).astype(wide) for v in raw.values()]))
        row = {k: float(x) for k, x in zip(raw, stacked)}
        row["atoms"] = self.natoms
        # topology counts (thermo.cpp compute_bonds etc.) — includes
        # turned-off (negative-type) interactions like the reference
        for kw_, attr_ in (("bonds", "_bonds"), ("angles", "_angles"),
                           ("dihedrals", "_dihedrals"),
                           ("impropers", "_impropers")):
            t_ = getattr(self.script, attr_, None)
            row[kw_] = 0 if t_ is None else len(t_)
        for cid, gmask in getattr(self, "erotate_computes", {}).items():
            from lidp_tpu.ops.granular import erotate_sphere

            import jax.numpy as _jnp

            m = _jnp.asarray(gmask) & self.sys.mask
            row["c_" + cid] = float(erotate_sphere(
                self.istate.omega, self.gran_radius, self.gran_rmass, m,
                mvv2e=self.thermo_params.mvv2e))
        for cid, gmask in getattr(self, "tempsphere_computes",
                                  {}).items():
            # compute temp/sphere (compute_temp_sphere.cpp): t =
            # sum m v^2 + sum 0.4 m r^2 w^2, dof = 6/atom for finite
            # radius (3d ALL mode) - extra_dof
            tp = self.thermo_params
            n = self.natoms
            gm = np.asarray(gmask)[:n]
            v = np.asarray(self.sys.v)[:n]
            w = np.asarray(self.istate.omega)[:n]
            r_ = np.asarray(self.gran_radius)[:n]
            m = np.asarray(self.gran_rmass)[:n]
            t = (m * (v * v).sum(1)
                 + 0.4 * m * r_ * r_ * (w * w).sum(1))[gm].sum() * tp.mvv2e
            # 6/3 dof for finite/point particles in 3d, 3/2 in 2d
            dof = float(np.where(r_[gm] > 0,
                                 6 if tp.dim == 3 else 3,
                                 tp.dim).sum()) - tp.dim
            row["c_" + cid] = t / (dof * tp.boltz) if dof > 0 else 0.0
        for cid, (ma, mb) in getattr(self, "gg_computes", {}).items():
            row["c_" + cid] = float(self._group_group_energy(ma, mb))
        for cid, rstyle in getattr(self, "rigid_computes", {}).items():
            row["c_" + cid] = self._rigid_scalar(rstyle)
        if getattr(self, "cmap_fid", None) is not None:
            # f_ID thermo column: the fix cmap crossterm energy
            # (compute_scalar, fix_cmap.cpp:623; extensive)
            tp_c = self.thermo_params
            nrm = float(tp_c.natoms) if tp_c.norm else 1.0
            row["f_" + self.cmap_fid] = float(self.res.ecmap) / nrm
        for cid, (gmask, style) in getattr(self, "simple_computes",
                                           {}).items():
            from lidp_tpu.box import unwrap as _unwrap

            m = np.asarray(self.thermo_params.mass_atom)[:self.natoms][gmask]
            # image @ h for triclinic (Domain::unmap semantics)
            xu = np.asarray(_unwrap(self.sys.x, self.sys.box,
                                    self.sys.image))[:self.natoms][gmask]
            if style == "com":
                com = (m[:, None] * xu).sum(0) / m.sum()
                for d in range(3):
                    row[f"c_{cid}[{d + 1}]"] = com[d]
            elif style == "gyration":
                com = (m[:, None] * xu).sum(0) / m.sum()
                d2 = np.sum((xu - com) ** 2, axis=1)
                row[f"c_{cid}"] = float(np.sqrt((m * d2).sum() / m.sum()))
            elif style == "ke":
                v = np.asarray(self.sys.v)[:self.natoms][gmask]
                row[f"c_{cid}"] = float(
                    0.5 * self.thermo_params.mvv2e
                    * np.sum(m[:, None] * v * v))
            elif style == "pe":
                row[f"c_{cid}"] = float(self.res.pe)
        for cid, (gmask, x0) in getattr(self, "msd_computes", {}).items():
            # compute_msd.cpp: mean square displacement of unwrapped coords
            from lidp_tpu.box import unwrap as _unwrap

            xu = np.asarray(_unwrap(self.sys.x, self.sys.box,
                                    self.sys.image))[:self.natoms]
            d = (xu - x0)[gmask]
            comps = (d * d).mean(axis=0)
            row[f"c_{cid}[1]"], row[f"c_{cid}[2]"], row[f"c_{cid}[3]"] = comps
            row[f"c_{cid}[4]"] = comps.sum()
        for cid, (gmask, v0) in getattr(self, "vacf_computes", {}).items():
            # compute_vacf.cpp: <v(t).v(0)> components + total, group mean
            v = np.asarray(self.sys.v)[:self.natoms][gmask]
            comps = (v * v0[gmask]).mean(axis=0)
            row[f"c_{cid}[1]"], row[f"c_{cid}[2]"], row[f"c_{cid}[3]"] = comps
            row[f"c_{cid}[4]"] = comps.sum()
        for cid in getattr(self, "reduce_computes", {}):
            from lidp_tpu.computes import eval_reduce

            out = eval_reduce(self, cid)
            # reduce sum is extensive (compute_reduce.cpp extvector=1):
            # thermo normalizes it by natoms under `norm yes`
            nrm = (1.0 / self.thermo_params.natoms
                   if (self.thermo_params.norm
                       and self.reduce_computes[cid][1]["mode"] == "sum")
                   else 1.0)
            if isinstance(out, list):
                for k_, val in enumerate(out):
                    row[f"c_{cid}[{k_ + 1}]"] = float(val) * nrm
            else:
                row[f"c_{cid}"] = float(out) * nrm
        for cid, (gmask, style, args) in getattr(self, "tempvar_computes",
                                                 {}).items():
            row[f"c_{cid}"] = float(self._temp_variant(gmask, style, args))
        row["dt"] = float(self.script.dt)   # thermo.cpp compute_dt
        # v_NAME thermo columns: evaluate the equal-style expression NOW
        # (thermo.cpp compute_variable -> Variable::compute_equal); the
        # base row above is published as the keyword context so thermo
        # keywords inside the expression see THIS row, not a recursion
        prev_kw = self.script._kw_row
        self.script._kw_row = row
        try:
            for c_ in getattr(self.script, "thermo_columns", ()):
                if c_.startswith("v_"):
                    try:
                        row[c_] = float(self.script.var_value(c_[2:]))
                    except (KeyError, ValueError):
                        pass
        finally:
            self.script._kw_row = prev_kw
        for cid, spec_p in getattr(self, "press_computes", {}).items():
            # compute pressure (compute_pressure.cpp): (ke tensor from
            # the named temperature compute + virial) / (dim V) * nktv2p
            import dataclasses as _dc

            from lidp_tpu.thermo import pressure as _press_fn

            vir6 = np.asarray(self.res.virial)
            ev = getattr(self.istate, "virial", None)
            if ev is not None:
                vir6 = vir6 + np.asarray(ev)
            tcid = spec_p["temp"]
            tp_p = self.group_thermo.get(tcid, self.thermo_params)
            if tcid == "NULL" or "virial" in spec_p["kw"]:
                tp_p = _dc.replace(
                    tp_p,
                    mass_atom=np.zeros_like(np.asarray(tp_p.mass_atom)))
            row[f"c_{cid}"] = float(_press_fn(self.sys, tp_p, vir6))
        for cid in getattr(self, "slice_computes", {}):
            sl = self.eval_slice(cid)
            if sl.shape[1] == 1:
                for k_ in range(sl.shape[0]):
                    row[f"c_{cid}[{k_ + 1}]"] = float(sl[k_, 0])
        for cid in getattr(self, "hf_computes", {}):
            from lidp_tpu.computes import eval_heat_flux

            hf = eval_heat_flux(self, cid)
            for k_ in range(6):
                row[f"c_{cid}[{k_ + 1}]"] = float(hf[k_])
        for cid, spec_c in getattr(self, "chunkagg_computes", {}).items():
            # temp/chunk with no per-chunk values is a global scalar
            # (ComputeTempChunk::compute_scalar)
            if spec_c[1] == "temp/chunk" and not any(
                    t in ("temp", "kecom", "internal") for t in spec_c[3]):
                from lidp_tpu.computes import eval_chunk_agg

                row[f"c_{cid}"] = float(eval_chunk_agg(self, cid))
        return row

    def _temp_variant(self, gmask, style, args):
        """compute temp/ramp, temp/region, temp/profile scalars
        (compute_temp_ramp.cpp, compute_temp_region.cpp,
        compute_temp_profile.cpp dof conventions)."""
        n = self.natoms
        dim = self.thermo_params.dim
        gm = np.asarray(gmask)[:n]
        v = np.asarray(self.sys.v)[:n].copy()
        x = np.asarray(self.sys.x)[:n]
        m = np.asarray(self.thermo_params.mass_atom)[:n]
        mvv2e = self.thermo_params.mvv2e
        boltz = self.thermo_params.boltz
        if style == "temp/ramp":
            # vdim vlo vhi dim clo chi [units lattice|box]; lattice units
            # scale coords AND velocities (compute_temp_ramp.cpp:60-75)
            s3 = (np.ones(3) if "box" in args
                  else np.asarray(self.script._spacing3()))
            vdim = "xyz".index(args[0].lstrip("v"))
            cdim = "xyz".index(args[3])
            vlo, vhi = float(args[1]) * s3[vdim], float(args[2]) * s3[vdim]
            clo, chi = float(args[4]) * s3[cdim], float(args[5]) * s3[cdim]
            frac = np.clip((x[:, cdim] - clo) / (chi - clo), 0.0, 1.0)
            v[:, vdim] -= vlo + frac * (vhi - vlo)
            dof = dim * gm.sum() - dim
            t = mvv2e * (m[gm, None] * v[gm] ** 2).sum()
        elif style == "temp/region":
            from lidp_tpu.computes import _current_x

            rm = np.asarray(self.script._region_mask(
                args[0], x=_current_x(self.sys, n)))[:n]
            sel = gm & rm
            dof = dim * sel.sum() - dim
            t = mvv2e * (m[sel, None] * v[sel] ** 2).sum()
        elif style == "temp/deform":
            # bias = streaming velocity of the deforming box
            # (ComputeTempDeform::compute_scalar,
            # compute_temp_deform.cpp:127-145); zero rate outside a
            # deforming run
            hr = np.asarray(getattr(self, "_h_rate", np.zeros(6)))
            hlo = np.asarray(getattr(self, "_h_ratelo", np.zeros(3)))
            hinv = np.asarray(self.sys.box.h_inv)
            lam = (x - np.asarray(self.sys.box.lo)) @ hinv.T
            vs = np.stack(
                [hr[0] * lam[:, 0] + hr[5] * lam[:, 1]
                 + hr[4] * lam[:, 2] + hlo[0],
                 hr[1] * lam[:, 1] + hr[3] * lam[:, 2] + hlo[1],
                 hr[2] * lam[:, 2] + hlo[2]], axis=1)
            v = v - vs
            dof = dim * gm.sum() - dim
            t = mvv2e * (m[gm, None] * v[gm] ** 2).sum()
        elif style == "temp/profile":
            # xflag yflag zflag x|y|z nbin (1d binning;
            # compute_temp_profile.cpp:60 — Evans-Morriss: dof loses
            # dim per bin)
            flags = [int(args[0]), int(args[1]), int(args[2])]
            assert args[3] in "xyz", "temp/profile supports 1d binning"
            bdim = "xyz".index(args[3])
            nbin = int(args[4])
            lo = float(np.asarray(self.sys.box.lo)[bdim])
            L = float(np.asarray(self.sys.box.lengths)[bdim])
            # bin_assign wraps a drifted coord by ONE period before
            # indexing (compute_temp_profile.cpp bin_assign)
            c = x[:, bdim].copy()
            if bool(np.asarray(self.sys.box.periodic)[bdim]):
                c = np.where(c < lo, c + L, c)
                c = np.where(c >= lo + L, c - L, c)
            ib = np.clip(((c - lo) / L * nbin).astype(int), 0, nbin - 1)
            for d_ in range(3):
                if not flags[d_]:
                    continue
                msum = np.bincount(ib[gm], m[gm], minlength=nbin)
                psum = np.bincount(ib[gm], (m * v[:, d_])[gm],
                                   minlength=nbin)
                vave = np.where(msum > 0, psum / np.maximum(msum, 1e-300),
                                0.0)
                v[:, d_] -= vave[ib]
            dof = dim * gm.sum() - dim - dim * nbin
            t = mvv2e * (m[gm, None] * v[gm] ** 2).sum()
        else:
            raise ValueError(style)
        return t / (dof * boltz) if dof > 0 else 0.0

    def compute_rdf(self, cid):
        """compute rdf (compute_rdf.cpp): returns (Nbin, 3) [r, g(r), coord]
        over the group, binned to the pair cutoff."""
        gmask, nbin = self.rdf_computes[cid]
        x = np.asarray(self.sys.x)[:self.natoms][gmask]
        L = np.asarray(self.sys.box.lengths)
        cut = float(np.sqrt(np.max(np.asarray(self.runner.ff.pair.cutsq)))
                    if self.runner.ff.pair is not None
                    else np.asarray(self.runner.ff.eam.cut))
        d = x[:, None, :] - x[None, :, :]
        d -= L * np.round(d / L)
        r = np.sqrt((d * d).sum(-1))
        iu = np.triu_indices(len(x), 1)
        rr = r[iu]
        rr = rr[rr < cut]
        hist, edges = np.histogram(rr, bins=nbin, range=(0.0, cut))
        rc = 0.5 * (edges[1:] + edges[:-1])
        npairs_density = len(x) * (len(x) - 1) / 2 / float(np.prod(L))
        shell = 4.0 / 3.0 * np.pi * (edges[1:]**3 - edges[:-1]**3)
        g = hist / (shell * npairs_density)
        coord = np.cumsum(hist) * 2.0 / len(x)
        return np.stack([rc, g, coord], axis=1)

    def _pour_events(self, ev_step):
        """Run every fix pour whose next insertion lands on ev_step
        (FixPour::pre_exchange).  Mutates sys/gp/res host-side, pre-winding
        new atoms one initial_integrate backward so the scan's own first
        half-kick + drift reproduces the reference's mid-step insertion
        state exactly (see lidp_tpu/pour.py module doc)."""
        import jax.numpy as jnp

        from lidp_tpu.ops.cells import build_cells
        from lidp_tpu.ops.granular import migrate_shear

        runner = self.runner
        gp = runner.gp
        dtype = self.sys.x.dtype
        x = np.asarray(self.sys.x).copy()
        v = np.asarray(self.sys.v).copy()
        radius = np.asarray(gp.radius).copy()
        rmass = np.asarray(gp.rmass).copy()
        mask = np.asarray(self.sys.mask).copy()
        f = np.asarray(self.res.f).copy()
        grav_vec = np.asarray(runner.grav, float)
        all_rows = []
        for pf in self.pour_fixes:
            if pf.next_event() == ev_step:
                all_rows += pf.insert(ev_step, x, v, radius, rmass, mask,
                                      self.natoms)
        if not all_rows:
            return
        dtf2 = 0.5 * runner.dt * runner.ftm2v
        for s in all_rows:
            # pre-wind: the scan's initial kick adds dtf2*grav and drifts
            # by dt*v; invert so the atom lands at its insertion state
            x[s] = x[s] - runner.dt * v[s]
            v[s] = v[s] - dtf2 * grav_vec
            f[s] = rmass[s] * grav_vec
        sys2 = self.sys.replace(
            x=jnp.asarray(x, dtype), v=jnp.asarray(v, dtype),
            mask=jnp.asarray(mask))
        runner.gp = dataclasses.replace(
            gp, radius=jnp.asarray(radius, dtype),
            rmass=jnp.asarray(rmass, dtype))
        new_nlist = build_cells(sys2.x, sys2.mask, sys2.box,
                                runner.neighbor_cfg)
        st = self.istate
        shear = migrate_shear(st.shear, self.nlist, new_nlist)
        self.istate = dataclasses.replace(
            st, shear=shear, x_ref=sys2.x,
            last_build=jnp.asarray(int(sys2.step), jnp.int32))
        self.nlist = new_nlist
        self.sys = sys2
        self.res = dataclasses.replace(self.res, f=jnp.asarray(f, dtype))
        self.natoms += len(all_rows)
        self.thermo_params = dataclasses.replace(
            self.thermo_params,
            mass_atom=jnp.asarray(rmass, dtype),
            natoms=self.natoms,
            dof=3 * self.natoms - 3)
        # the sphere computes read these snapshots (erotate/temp/sphere)
        self.gran_radius = runner.gp.radius
        self.gran_rmass = runner.gp.rmass

    def _rigid_scalar(self, rstyle):
        """compute ke/rigid (compute_ke_rigid.cpp:60-75 + FixRigid::
        extract_ke, fix_rigid.cpp:2650-2659): 0.5*mvv2e*sum M vcm^2;
        erotate/rigid (compute_erotate_rigid.cpp + extract_erotational,
        fix_rigid.cpp:2665-2687): 0.5*mvv2e*sum I_k wbody_k^2 with
        zero-inertia components dropped."""
        from lidp_tpu.integrate.rigid import q_to_matrix

        p = self.runner.integ.params
        st = self.istate
        tp = self.thermo_params
        # both computes are extensive (extscalar=1): thermo normalizes
        # them per atom when norm is on (thermo.cpp lj-units default)
        norm = float(tp.natoms) if tp.norm else 1.0
        if rstyle == "ke/rigid":
            m = np.asarray(p.masstotal)
            vcm = np.asarray(st.vcm)
            return float(
                0.5 * tp.mvv2e * np.sum(m * np.sum(vcm * vcm, 1))) / norm
        R = np.asarray(q_to_matrix(st.quat))        # columns = body axes
        L = np.asarray(st.angmom)
        inertia = np.asarray(p.inertia)
        mbody = np.einsum("bij,bi->bj", R, L)       # R^T L
        wbody = np.where(inertia > 0.0,
                         mbody / np.where(inertia > 0.0, inertia, 1.0), 0.0)
        return float(
            0.5 * tp.mvv2e * np.sum(inertia * wbody * wbody)) / norm

    def _group_group_energy(self, maska, maskb):
        """compute group/group: pairwise LJ+coul energy between two groups
        via single() (compute_group_group.cpp — polarization omitted like
        the reference's single())."""
        import jax
        import jax.numpy as jnp

        from lidp_tpu.box import minimum_image
        from lidp_tpu.ops.pair import pair_single

        pp = self.runner.ff.pair

        @jax.jit
        def gg(x, q, t, ma, mb):
            d = minimum_image(x[:, None, :] - x[None, :, :],
                              self.sys.box.lengths)
            rsq = jnp.sum(d * d, axis=-1)
            pairm = (ma[:, None] & mb[None, :]
                     & ~jnp.eye(x.shape[0], dtype=bool))
            # count each unordered pair once even if both in both groups
            both = ma & mb
            dbl = both[:, None] & both[None, :]
            w = jnp.where(pairm, jnp.where(dbl, 0.5, 1.0), 0.0)
            rsq = jnp.where(pairm, rsq, 1.0)
            e, _ = pair_single(rsq, t[:, None], t[None, :],
                               q[:, None], q[None, :], pp)
            incut = rsq < pp.cutsq[t[:, None], t[None, :]]
            return jnp.sum(jnp.where(incut, e * w, 0.0))

        return gg(self.sys.x, self.sys.q, self.sys.type, maska, maskb)

    def _emit(self):
        row = self._thermo_row()
        self.script.thermo_rows.append(row)
        if self.script.thermo_callback:
            self.script.thermo_callback(row)
        cb_cols = self.script.thermo_columns
        vals = []
        for c in cb_cols:
            key = {"etotal": "etotal", "ke": "ke", "pe": "pe",
                   "evdwl": "evdwl", "ecoul": "ecoul", "elong": "elong",
                   "epol": "epol", "temp": "temp", "press": "press",
                   "step": "step", "epair": "epair", "emol": "emol",
                   }.get(c, c)
            vals.append(row.get(key, float("nan")))
        # thermo_modify format float FMT (thermo.cpp modify_params):
        # %-style format for every float column
        ffmt = getattr(self.script, "_thermo_float_format", None)
        self.script.log(" ".join(
            f"{int(v)}" if c == "step"
            else (ffmt % v if ffmt else f"{v:.8g}")
            for c, v in zip(cb_cols, vals)))

    _HEADER = {"step": "Step", "etotal": "TotEng", "ke": "KinEng",
               "pe": "PotEng", "evdwl": "E_vdwl", "ecoul": "E_coul",
               "elong": "E_long", "epol": "E_pol", "temp": "Temp",
               "press": "Press", "epair": "E_pair", "emol": "E_mol",
               "ebond": "E_bond", "eangle": "E_angle", "edihed": "E_dihed",
               "eimp": "E_impro", "vol": "Volume", "density": "Density",
               "atoms": "Atoms", "lx": "Lx", "ly": "Ly", "lz": "Lz",
               "xlo": "Xlo", "xhi": "Xhi", "ylo": "Ylo", "yhi": "Yhi",
               "zlo": "Zlo", "zhi": "Zhi", "xy": "Xy", "xz": "Xz",
               "yz": "Yz", "dt": "Dt", "bonds": "Bonds",
               "angles": "Angles", "dihedrals": "Diheds",
               "impropers": "Impros"}

    def run(self, nsteps: int):
        import time

        t_start = time.perf_counter()
        # thermostat ramps span exactly this run (FixNH::compute_temp_target
        # uses update->beginstep/endstep)
        integ = getattr(self.runner, "integ", None)
        if integ is not None and getattr(integ.params, "ramp_begin",
                                         None) is not None:
            import jax.numpy as jnp
            b = int(self.sys.step)
            self.runner.integ = dataclasses.replace(
                integ, params=dataclasses.replace(
                    integ.params,
                    ramp_begin=jnp.asarray(b, jnp.int32),
                    ramp_end=jnp.asarray(b + nsteps, jnp.int32)))
        if getattr(self.runner, "nvt", None) is not None and hasattr(
                self.runner, "gp"):
            # fix nvt/sphere T ramp spans exactly this run (fix_nh.cpp
            # compute_temp_target)
            import jax.numpy as jnp
            b = int(self.sys.step)
            self.runner.nvt = dataclasses.replace(
                self.runner.nvt,
                ramp_begin=jnp.asarray(b, jnp.int32),
                ramp_end=jnp.asarray(b + nsteps, jnp.int32))
        if getattr(getattr(self.runner, "ff", None), "adapt",
                   None) is not None:
            import jax.numpy as jnp
            b = int(self.sys.step)
            self.runner.ff = dataclasses.replace(
                self.runner.ff,
                adapt_window=jnp.asarray([b, b + nsteps], jnp.int32))
        if getattr(self, "deform_cfg", None):
            import jax.numpy as jnp

            from lidp_tpu.integrate.driver import DeformParams

            cfg = self.deform_cfg
            b = int(self.sys.step)
            box = self.sys.box
            lo0 = np.asarray(box.lo, float)
            hi0 = np.asarray(box.hi, float)
            t0 = (np.asarray(box.tilt, float) if box.tilt is not None
                  else None)
            delt = nsteps * self.script.dt
            lo_t, hi_t = lo0.copy(), hi0.copy()
            for d, spec_d in cfg["dims"].items():
                if spec_d[0] == "final":
                    lo_t[d], hi_t[d] = spec_d[1], spec_d[2]
                elif spec_d[0] == "delta":
                    lo_t[d] = lo0[d] + spec_d[1]
                    hi_t[d] = hi0[d] + spec_d[2]
                elif spec_d[0] == "vel":
                    # box grows by vel*time, split evenly (fix_deform.cpp)
                    lo_t[d] = lo0[d] - 0.5 * delt * spec_d[1]
                    hi_t[d] = hi0[d] + 0.5 * delt * spec_d[1]
                elif spec_d[0] == "erate":
                    half = 0.5 * delt * spec_d[1] * (hi0[d] - lo0[d])
                    lo_t[d], hi_t[d] = lo0[d] - half, hi0[d] + half
                elif spec_d[0] == "trate":
                    c = 0.5 * (lo0[d] + hi0[d])
                    h = 0.5 * (hi0[d] - lo0[d]) * np.exp(spec_d[1] * delt)
                    lo_t[d], hi_t[d] = c - h, c + h
                else:   # scale: hold the center fixed (fix_deform.cpp)
                    c = 0.5 * (lo0[d] + hi0[d])
                    h = 0.5 * (hi0[d] - lo0[d]) * spec_d[1]
                    lo_t[d], hi_t[d] = c - h, c + h
            t_t = t0.copy() if t0 is not None else None
            for ti, spec_t in cfg["tilts"].items():
                if spec_t[0] == "final":
                    t_t[ti] = spec_t[1]
                elif spec_t[0] == "delta":
                    t_t[ti] = t0[ti] + spec_t[1]
                elif spec_t[0] == "vel":
                    t_t[ti] = t0[ti] + delt * spec_t[1]
                elif spec_t[0] == "erate":
                    # strain rate * perpendicular box length at run start
                    # (fix_deform.cpp:499-506): xy scales by the y length,
                    # xz and yz by the z length
                    perp = {0: hi0[1] - lo0[1], 1: hi0[2] - lo0[2],
                            2: hi0[2] - lo0[2]}[ti]
                    t_t[ti] = t0[ti] + delt * spec_t[1] * perp
                elif spec_t[0] == "trate":
                    t_t[ti] = t0[ti] * np.exp(spec_t[1] * delt)
                else:
                    raise NotImplementedError(spec_t[0])
            # h_rate in LAMMPS Voigt order [lx ly lz yz xz xy] +
            # h_ratelo = d(lo)/dt (domain.h:78; constant over the run for
            # these linear schedules) — consumed by fix nvt/sllod,
            # compute temp/deform and the remap-v boundary crossing
            h_rate = np.zeros(6)
            h_rate[:3] = ((hi_t - lo_t) - (hi0 - lo0)) / delt
            if t_t is not None:
                h_rate[3] = (t_t[2] - t0[2]) / delt   # yz
                h_rate[4] = (t_t[1] - t0[1]) / delt   # xz
                h_rate[5] = (t_t[0] - t0[0]) / delt   # xy
            h_ratelo = (lo_t - lo0) / delt
            self._h_rate, self._h_ratelo = h_rate, h_ratelo
            dt_ = self.sys.x.dtype
            self.runner.deform = DeformParams(
                window=jnp.asarray([b, b + nsteps], jnp.int32),
                lo0=jnp.asarray(lo0, dt_), hi0=jnp.asarray(hi0, dt_),
                tilt0=(jnp.asarray(t0, dt_) if t0 is not None else None),
                lo_t=jnp.asarray(lo_t, dt_), hi_t=jnp.asarray(hi_t, dt_),
                tilt_t=(jnp.asarray(t_t, dt_) if t_t is not None
                        else None),
                h_rate=(jnp.asarray(h_rate, dt_) if cfg.get("vremap")
                        else None))
            integ2 = self.runner.integ
            if integ2 is not None and getattr(integ2.params, "sllod",
                                              False):
                self.runner.integ = dataclasses.replace(
                    integ2, params=dataclasses.replace(
                        integ2.params,
                        h_rate=jnp.asarray(h_rate, dt_),
                        h_ratelo=jnp.asarray(h_ratelo, dt_)))
        if getattr(self, "_tmd_factory", None) is not None:
            # fix tmd: rho schedule spans exactly this run; rho_start is
            # the mass-weighted RMSD to the target at run start
            # (FixTMD::init recomputes it per run)
            from lidp_tpu.box import unwrap as _unw_t

            make_hook, rho_stop_t, xf_t, gm_t, mass_t, mt_t = \
                self._tmd_factory
            b = int(self.sys.step)
            nre = self.natoms
            xu = np.asarray(_unw_t(self.sys.x, self.sys.box,
                                   self.sys.image))[:nre]
            d_t = (xu - xf_t)[gm_t]
            rho0 = float(np.sqrt(
                (mass_t[gm_t] * (d_t * d_t).sum(1)).sum() / mt_t))
            self.runner.tmd_hook = make_hook((b, b + nsteps), rho0)
            self.runner.__post_init__()
        if getattr(self, "_restrain_factory", None) is not None:
            # fix restrain K ramps span exactly this run
            # (fix_restrain.cpp: delta over beginstep..endstep); the ramp
            # window is baked into the hook, so re-compose + re-jit
            make_hook, old_hook = self._restrain_factory
            b = int(self.sys.step)
            new_hook = make_hook((b, b + nsteps))
            hooks = self._pf_hooks
            hooks[hooks.index(old_hook)] = new_hook
            self._restrain_factory = (make_hook, new_hook)
            self.runner.post_force = self._compose_pf(hooks)
            self.runner.__post_init__()
        if self.res is None:
            self.sys, self.res, self.nlist, self.istate = \
                self.runner.setup(self.sys)
        # FixDtReset::setup fires end_of_step once at run setup, before
        # the step-0 thermo row (fix_dt_reset.cpp:125)
        if getattr(self, "dtreset_cfg", None):
            self._dt_reset(self.dtreset_cfg)
        # FixVector::setup samples at run start when the step lands on the
        # Nevery grid (fix_vector.cpp:242-253)
        for spec_v in self.script.fixes.values():
            if spec_v.style == "vector":
                self._fix_vector_sample(spec_v, int(self.sys.step))
        # msd/chunk captures its reference per-chunk COM at run setup
        # (ComputeMSDChunk::setup)
        for cid_, spec_ in getattr(self, "chunkagg_computes", {}).items():
            if spec_[1] == "msd/chunk" and \
                    cid_ not in getattr(self, "_msdchunk_ref", {}):
                from lidp_tpu.computes import eval_chunk_agg
                eval_chunk_agg(self, cid_)
        self.script.log(" ".join(
            self._HEADER.get(c, c) for c in self.script.thermo_columns))
        # store/state setup-time snapshot (fix_store_state.cpp end_of_setup
        # semantics) must exist before the step-0 dump references f_ID
        from lidp_tpu.computes import peratom_column

        for spec in self.script.fixes.values():
            if (spec.style == "store/state"
                    and not hasattr(spec, "_peratom_store")):
                cols = [peratom_column(self, t) for t in spec.args[1:]]
                spec._peratom_store = (cols[0] if len(cols) == 1
                                       else np.stack(cols, axis=1))
        if not getattr(self.script, "_suppress_start_row", False):
            self._emit()
        self.script._suppress_start_row = False
        self._dump()
        # FixAveTime::setup -> end_of_step fires at the setup step when
        # nrepeat == 1 and the step is a multiple of Nfreq (nextvalid()
        # pulls nvalid back to the current step in that case)
        step0 = int(self.sys.step)
        for spec in self.script.fixes.values():
            if (spec.style == "ave/time" and int(spec.args[1]) == 1
                    and int(spec.args[2]) > 0
                    and step0 % int(spec.args[2]) == 0
                    and not getattr(spec, "_started_setup", False)):
                spec._started_setup = True
                self._ave_time(spec, step0)
        remaining = nsteps
        every = self.script.thermo_every or nsteps
        dump_every = min([d.every for d in self.script.dumps.values()],
                         default=0)
        chunk_opts = [every]
        if dump_every:
            chunk_opts.append(dump_every)
        halt = getattr(self, "halt_spec", None)
        if halt:
            chunk_opts.append(max(1, halt[0]))
        dtr = getattr(self, "dtreset_cfg", None)
        if dtr:
            chunk_opts.append(dtr["nevery"])
        for spec in self.script.fixes.values():
            if spec.style in ("print", "ave/time", "ave/chunk",
                              "store/state", "ave/atom", "ave/histo",
                              "ave/histo/weight", "ave/correlate",
                              "vector", "controller"):
                chunk_opts.append(max(1, int(spec.args[0])))
        chunk = int(np.gcd.reduce(chunk_opts)) if chunk_opts else nsteps
        # timer timeout: end the run cleanly when the wall clock budget is
        # exhausted (Timer::check_timeout, verlet.cpp:241 — we check at
        # scan-chunk boundaries rather than every step)
        _tt = getattr(self.script, "_timer_timeout", None)
        deadline = (time.perf_counter() + _tt) if _tt is not None else None
        pour_fixes = getattr(self, "pour_fixes", None) or []
        while remaining > 0:
            if deadline is not None and time.perf_counter() > deadline:
                self.script.log(
                    "Walltime reached, timer timeout — ending run early")
                break
            todo = min(chunk, remaining)
            if pour_fixes:
                step_now = int(self.sys.step)
                evs = [p.next_event() for p in pour_fixes]
                evs = [e for e in evs if e is not None]
                if evs and min(evs) == step_now + 1:
                    self._pour_events(step_now + 1)
                    evs = [p.next_event() for p in pour_fixes]
                    evs = [e for e in evs if e is not None]
                # keep chunk boundaries on the absolute thermo grid
                # (thermo.cpp next_thermo is in absolute multiples), then
                # stop the scan just before the next insertion step
                if step_now % chunk:
                    todo = min(todo, chunk - step_now % chunk)
                if evs:
                    todo = min(todo, max(1, min(evs) - 1 - step_now))
            self.sys, self.res, self.nlist, self.istate = self.runner.run(
                self.sys, self.res, self.nlist, self.istate, todo)
            remaining -= todo
            step = int(self.sys.step)
            if self.nlist is not None and bool(self.nlist.overflow):
                raise RuntimeError(
                    "neighbor cell capacity overflow during run "
                    "(Neighbor 'dangerous build' analog) — increase "
                    "cap_slack")
            self._host_fixes(step)
            if dtr and step % dtr["nevery"] == 0:
                self._dt_reset(dtr)
            if halt and (halt[0] == 0 or step % max(1, halt[0]) == 0):
                # fix halt (fix_halt.cpp:146): conditional graceful stop;
                # attribute is a thermo keyword or v_NAME equal-variable
                nev, attr, op, val, action = halt
                row = self._thermo_row()
                cur = row.get(attr)
                if cur is None and attr.startswith("v_"):
                    try:
                        cur = float(self.script.var_value(attr[2:]))
                    except (KeyError, ValueError):
                        cur = None
                if cur is not None:
                    hit = {"<": cur < val, "<=": cur <= val,
                           ">": cur > val, ">=": cur >= val,
                           "==": cur == val, "!=": cur != val}[op]
                    if hit:
                        if action == "error":
                            raise RuntimeError(
                                f"Fix halt condition met: {attr} {op} {val}")
                        self.script.log(
                            f"Fix halt condition met on step {step}: "
                            f"{attr} {op} {val}")
                        self._emit()
                        self._dump()
                        break
            if every and step % every == 0 or remaining == 0:
                self._emit()
            self._dump()
        self.script.step = int(self.sys.step)

        # end-of-run summary (Finish::end, finish.cpp:64)
        import jax

        jax.block_until_ready(self.sys.x)
        wall = time.perf_counter() - t_start
        if nsteps > 0 and wall > 0:
            rate = nsteps / wall
            dt_ns = self.script.dt * self.script.units.femtosecond * 1e-6
            self.script.log(
                f"Loop time of {wall:.6g} on 1 procs for {nsteps} steps "
                f"with {self.natoms} atoms")
            self.script.log(
                f"Performance: {rate * dt_ns * 86400:.3f} ns/day, "
                f"{rate:.3f} timesteps/s")
            if getattr(self.script, "_timer_mode", None) == "full":
                # per-phase breakdown (Timer categories, timer.h:25-28) via
                # unfused re-evaluation of each force term
                from lidp_tpu.utils.timing import profile_forces

                profile_forces(self.sys, self.runner.ff, self.nlist,
                               log=self.script.log)

    def _dump(self):
        from lidp_tpu.io.dump import write_dump_frame

        step = int(self.sys.step)
        for d in self.script.dumps.values():
            if d.every and step % d.every == 0:
                gmask = self.script.groups[d.group]
                if d.style == "dcd":
                    from lidp_tpu.io.dump import write_dcd_frame

                    write_dcd_frame(d, self.sys, self.script, gmask)
                    continue
                if d.style == "local":
                    from lidp_tpu.io.dump import write_local_frame

                    ffobj = self.runner.ff
                    rigid = None
                    p_ = getattr(self.runner.integ, "params", None)
                    if hasattr(p_, "nbody") and hasattr(self.istate, "xcm"):
                        rigid = (p_, self.istate)
                    write_local_frame(d, self.sys, self.script, gmask,
                                      pair=ffobj.pair,
                                      sp_code=ffobj.sp_code,
                                      rigid=rigid)
                    continue
                if d.style in ("image", "movie"):
                    from lidp_tpu.io.dump import write_image_frame

                    if d.style == "movie":
                        # dump_movie.cpp pipes frames to ffmpeg; we write
                        # numbered PPM frames next to the target and
                        # assemble at undump/script end if ffmpeg exists
                        import dataclasses as _dc

                        k = getattr(d, "_movie_frame", 0)
                        d._movie_frame = k + 1
                        frame = _dc.replace(
                            d, path=f"{d.path}.{k:06d}.ppm")
                        frame._movie_frame = None
                        write_image_frame(frame, self.sys, self.script,
                                          gmask)
                        continue
                    write_image_frame(d, self.sys, self.script, gmask)
                    continue
                if d.style == "cfg":
                    from lidp_tpu.io.dump import write_cfg_frame

                    write_cfg_frame(d, self.sys, self.script, gmask)
                    continue
                fcur = None if self.res is None else self.res.f
                write_dump_frame(d, self.sys, self.script, gmask, f=fcur)
