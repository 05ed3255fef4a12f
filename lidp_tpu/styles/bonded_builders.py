"""Builders for the MOLECULE-package bonded style families.

Translates the parsed script state (bond/angle/dihedral/improper style +
per-type coefficient lists) into ops.bonded params pytrees, mirroring the
coeff orders of the reference's bond_*.cpp / angle_*.cpp /
dihedral_*.cpp / improper_*.cpp ::coeff methods.  `hybrid` styles
(bond_hybrid.cpp etc.) are decomposed here: each sub-style gets its own
params pytree with the term list filtered to its assigned types, and the
caller sums the contributions (the XLA-friendly analog of the
reference's per-term style dispatch).

Every builder returns a tuple of params (empty tuple if no terms).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def read_lammps_table(path, keyword):
    """Parse one section of a LAMMPS bond/angle table file
    (bond_table.cpp::read_table): `keyword` line, `N <n> ...` params
    line, blank, then `index x energy force` rows."""
    with open(path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if ln and not ln.startswith("#") and ln.split()[0] == keyword:
            break
        i += 1
    else:
        raise ValueError(f"keyword {keyword} not found in {path}")
    params = lines[i + 1].split()
    if params[0] != "N":
        raise ValueError(f"table {keyword}: expected N line")
    n = int(params[1])
    rows = []
    j = i + 2
    while len(rows) < n and j < len(lines):
        ln = lines[j].strip()
        j += 1
        if not ln or ln.startswith("#"):
            continue
        toks = ln.split()
        rows.append([float(v) for v in toks[1:4]])
    if len(rows) != n:
        raise ValueError(f"table {keyword}: expected {n} rows")
    arr = np.array(rows)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def _uniform_resample(xf, ef, ff, m=None):
    """The reference spline-resamples file tables onto N uniform points
    (bond_table.cpp compute_table); a file already uniform passes
    through exactly.  An already-uniform grid is kept verbatim (linear
    lookups then match the reference bit-for-bit); non-uniform grids are
    linearly resampled onto max(4*len, 2048) points (the reference uses
    a cubic spline here — dense linear resampling bounds the deviation
    without its ringing)."""
    dx = np.diff(xf)
    if m is None and np.allclose(dx, dx[0], rtol=1e-9, atol=0.0):
        return np.asarray(xf), np.asarray(ef), np.asarray(ff)
    m = m or max(4 * len(xf), 2048)
    xs = np.linspace(xf[0], xf[-1], m)
    return xs, np.interp(xs, xf, ef), np.interp(xs, xf, ff)


def _partition_hybrid(style, style_args, coeffs):
    """hybrid: coeff lines are `type sub-style args...`.  Returns
    [(sub_style, {type: args}), ...] keeping the style_args order."""
    subs = list(style_args)
    if len(set(subs)) != len(subs):
        raise NotImplementedError(
            f"{style} hybrid with duplicate sub-styles")
    per = {s: {} for s in subs}
    for t, co in coeffs.items():
        if not co or not isinstance(co[0], str):
            raise ValueError(
                f"{style} hybrid coeff for type {t} must name a sub-style")
        sname = co[0]
        if sname == "none":
            continue
        if sname not in per:
            raise ValueError(f"{style} hybrid: unknown sub-style {sname}")
        per[sname][t] = co[1:]
    return [(s, per[s]) for s in subs if per[s]]


# --------------------------------- bonds -----------------------------------

_BOND_NCOEFF = {"harmonic": 2, "fene": 4, "fene/expand": 5, "morse": 3,
                "nonlinear": 3, "gromos": 2, "quartic": 5, "zero": 0}


def _bond_params_one(style, coeffs, bidx, btyp, TB, dtype, script,
                     pair_tables, root):
    """One BondParams for one (sub-)style over the given bond subset."""
    from lidp_tpu.ops.bonded import BondParams

    c = np.zeros((5, TB + 1))
    extra = {}
    if style == "table":
        # bond_coeff type file keyword (bond_table.cpp::coeff)
        tabs = {}
        for bt, co in coeffs.items():
            fpath = os.path.join(root, str(co[0]))
            xf, ef, ff = read_lammps_table(fpath, str(co[1]))
            tabs[bt] = _uniform_resample(xf, ef, ff)
        m = max(len(t[0]) for t in tabs.values())
        te = np.zeros((TB + 1, m))
        tf = np.zeros((TB + 1, m))
        tlo = np.zeros(TB + 1)
        tdr = np.ones(TB + 1)
        for bt, (xs, es, fs) in tabs.items():
            if len(xs) != m:
                xs, es, fs = _uniform_resample(xs, es, fs, m)
            te[bt], tf[bt] = es, fs
            tlo[bt] = xs[0]
            tdr[bt] = xs[1] - xs[0]
        extra = dict(tab_e=jnp.asarray(te, dtype),
                     tab_f=jnp.asarray(tf, dtype),
                     tab_rlo=jnp.asarray(tlo, dtype),
                     tab_dr=jnp.asarray(tdr, dtype))
    else:
        need = _BOND_NCOEFF[style]
        for bt, co in coeffs.items():
            vals = [float(v) for v in co[:need]]
            if len(vals) != need:
                raise ValueError(
                    f"bond_style {style} needs {need} coeffs, got {co}")
            for ci, v in enumerate(vals):
                c[ci, bt] = v
    if style == "quartic":
        # subtract the lj/cut pair single of intact bonds
        # (bond_quartic.cpp pair->single block, special_bonds 1 1 1)
        if pair_tables is not None:
            eps, sig, cut = pair_tables
            s6 = sig ** 6
            shift = getattr(script, "_pair_shift", False)
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.where(cut > 0, (sig / np.where(cut > 0, cut, 1.0)
                                           ) ** 6, 0.0)
            off = (4.0 * eps * (ratio * ratio - ratio)) if shift else (
                np.zeros_like(eps))
            extra.update(
                plj1=jnp.asarray(48.0 * eps * s6 * s6, dtype),
                plj2=jnp.asarray(24.0 * eps * s6, dtype),
                plj3=jnp.asarray(4.0 * eps * s6 * s6, dtype),
                plj4=jnp.asarray(4.0 * eps * s6, dtype),
                pcutsq=jnp.asarray(cut * cut, dtype),
                poffset=jnp.asarray(off, dtype),
                ptype=jnp.asarray(script.type, jnp.int32))
    return BondParams(
        idx=jnp.asarray(bidx, jnp.int32), btype=jnp.asarray(btyp, jnp.int32),
        k=jnp.asarray(c[0], dtype), r0=jnp.asarray(c[1], dtype),
        eps=jnp.asarray(c[2], dtype), sigma=jnp.asarray(c[3], dtype),
        c5=jnp.asarray(c[4], dtype), style=style, **extra)


def build_bond_params(script, dtype, bond_keep=None, pair_tables=None):
    """Tuple of BondParams (one per hybrid sub-style; len 1 otherwise)."""
    bidx = script._bonds - 1
    btyp = np.asarray(getattr(script, "_bond_types",
                              np.ones(len(script._bonds))))
    # delete_bonds turns interactions off by negating the type
    # (delete_bonds.cpp:173); type 0 rows hit the zeroed coeff slot
    btyp = np.maximum(btyp, 0)
    if bond_keep is not None:
        bidx, btyp = bidx[bond_keep], btyp[bond_keep]
    if not len(bidx):
        return ()
    TB = max(script.bond_coeffs.keys(), default=0)
    root = getattr(script, "root", ".")
    if script.bond_style == "hybrid":
        out = []
        for sname, coeffs in _partition_hybrid(
                "bond", script.bond_style_args, script.bond_coeffs):
            types = set(coeffs.keys())
            sel = np.isin(btyp, list(types))
            if not sel.any():
                continue
            out.append(_bond_params_one(
                sname, coeffs, bidx[sel], btyp[sel], TB, dtype, script,
                pair_tables, root))
        return tuple(out)
    return (_bond_params_one(
        script.bond_style, script.bond_coeffs, bidx, btyp, TB, dtype,
        script, pair_tables, root),)


# --------------------------------- angles ----------------------------------

def _angle_params_one(style, coeffs, aidx, atyp, TA, dtype, root):
    from lidp_tpu.ops.bonded import AngleParams

    ka = np.zeros(TA + 1)
    th0 = np.zeros(TA + 1)
    c3 = np.zeros(TA + 1)
    c4 = np.zeros(TA + 1)
    extra = {}
    if style == "table":
        tabs = {}
        for at, co in coeffs.items():
            fpath = os.path.join(root, str(co[0]))
            xf, ef, ff = read_lammps_table(fpath, str(co[1]))
            # angle_table.cpp:242: theta deg->rad, f to energy/radian
            tabs[at] = _uniform_resample(
                np.deg2rad(xf), ef, ff * 180.0 / np.pi)
        m = max(len(t[0]) for t in tabs.values())
        te = np.zeros((TA + 1, m))
        tf = np.zeros((TA + 1, m))
        tlo = np.zeros(TA + 1)
        tdt = np.ones(TA + 1)
        for at, (xs, es, fs) in tabs.items():
            if len(xs) != m:
                xs, es, fs = _uniform_resample(xs, es, fs, m)
            te[at], tf[at] = es, fs
            tlo[at] = xs[0]
            tdt[at] = xs[1] - xs[0]
        extra = dict(tab_e=jnp.asarray(te, dtype),
                     tab_f=jnp.asarray(tf, dtype),
                     tab_tlo=jnp.asarray(tlo, dtype),
                     tab_dt=jnp.asarray(tdt, dtype))
    else:
        for at, co in coeffs.items():
            if style == "zero":
                continue
            vals = [float(v) for v in co]
            ka[at] = vals[0]
            if style in ("harmonic", "charmm", "cosine/squared",
                         "cosine/delta"):
                th0[at] = np.deg2rad(vals[1])
            if style == "charmm":
                c3[at], c4[at] = vals[2], vals[3]
            if style == "cosine/periodic":
                # C B n -> k = C/n^2 (angle_cosine_periodic.cpp::coeff)
                b, n_ = vals[1], vals[2]
                ka[at] = vals[0] / (n_ * n_)
                c3[at], c4[at] = b, n_
    kw = {}
    if style == "charmm":
        kw = dict(k_ub=jnp.asarray(c3, dtype), r_ub=jnp.asarray(c4, dtype))
    elif style == "cosine/periodic":
        kw = dict(k_ub=jnp.asarray(c3, dtype), r_ub=jnp.asarray(c4, dtype))
    return AngleParams(
        idx=jnp.asarray(aidx, jnp.int32), atype=jnp.asarray(atyp, jnp.int32),
        k=jnp.asarray(ka, dtype), theta0=jnp.asarray(th0, dtype),
        style=style, **kw, **extra)


def build_angle_params(script, dtype, angle_keep=None):
    aidx = script._angles - 1
    atyp = np.maximum(np.asarray(script._angle_types), 0)
    if angle_keep is not None:
        aidx, atyp = aidx[angle_keep], atyp[angle_keep]
    if not len(aidx):
        return ()
    TA = max(script.angle_coeffs.keys(), default=0)
    root = getattr(script, "root", ".")
    if script.angle_style == "hybrid":
        out = []
        for sname, coeffs in _partition_hybrid(
                "angle", script.angle_style_args, script.angle_coeffs):
            sel = np.isin(atyp, list(coeffs.keys()))
            if not sel.any():
                continue
            out.append(_angle_params_one(
                sname, coeffs, aidx[sel], atyp[sel], TA, dtype, root))
        return tuple(out)
    return (_angle_params_one(
        script.angle_style, script.angle_coeffs, aidx, atyp, TA, dtype,
        root),)


# -------------------------------- dihedrals --------------------------------

def _dihedral_params_one(style, coeffs, didx, dtyp, TD, dtype, script, u,
                         eps, sig):
    from lidp_tpu.ops.bonded import DihedralParams

    cs = np.zeros((5, TD + 1))
    for dt_, co in coeffs.items():
        if style == "zero":
            continue
        for ci, val in enumerate([float(v) for v in co[:5]]):
            cs[ci, dt_] = val
    extra = {}
    if style in ("charmm", "charmmfsw"):
        # K n d(deg) weight; weighted 1-4 pair term needs q, types,
        # and the pair style's 14 tables (dihedral_charmm.cpp::coeff
        # + init_style pair extract).  Per-type eps14/sig14 mix with
        # the same rule as the main tables (arithmetic for charmm).
        cs[2] = np.deg2rad(cs[2])
        T14 = script.ntypes
        e14_t = np.array([eps[t, t] for t in range(T14 + 1)])
        s14_t = np.array([sig[t, t] for t in range(T14 + 1)])
        for (i14, j14), (e14, s14) in getattr(
                script, "pair_coeffs14", {}).items():
            if i14 == j14:
                e14_t[i14], s14_t[i14] = e14, s14
        eps14 = np.sqrt(np.outer(e14_t, e14_t))
        sig14 = 0.5 * (s14_t[:, None] + s14_t[None, :])
        for (i14, j14), (e14, s14) in getattr(
                script, "pair_coeffs14", {}).items():
            eps14[i14, j14] = eps14[j14, i14] = e14
            sig14[i14, j14] = sig14[j14, i14] = s14
        s6 = sig14**6
        extra = dict(
            q=jnp.asarray(script.q, dtype),
            lj14_3=jnp.asarray(4.0 * eps14 * s6 * s6, dtype),
            lj14_4=jnp.asarray(4.0 * eps14 * s6, dtype),
            type_=jnp.asarray(script.type, jnp.int32),
            qqrd2e=u.qqr2e)
        if style == "charmmfsw":
            # dihedral_charmmfsw.cpp init_style: cutoffs + dihedflag from
            # the paired charmm pair style
            p = script.pair
            extra.update(
                cut_lj_inner14=float(getattr(p, "cut_lj_inner", 0.0)),
                cut_lj14=float(p.cut_lj_global),
                cut_coul14=float(getattr(p, "cut_coul", 0.0)
                                 or p.cut_lj_global),
                dihedflag=0 if "charmmfsh" in p.name else 1)
    return DihedralParams(
        idx=jnp.asarray(didx, jnp.int32),
        dtype_=jnp.asarray(dtyp, jnp.int32),
        c1=jnp.asarray(cs[0], dtype), c2=jnp.asarray(cs[1], dtype),
        c3=jnp.asarray(cs[2], dtype), c4=jnp.asarray(cs[3], dtype),
        c5=jnp.asarray(cs[4], dtype), style=style, **extra)


def build_dihedral_params(script, dtype, u, eps, sig):
    didx = script._dihedrals - 1
    dtyp = np.maximum(np.asarray(script._dihedral_types), 0)
    if not len(didx):
        return ()
    TD = max(script.dihedral_coeffs.keys(), default=0)
    if script.dihedral_style == "hybrid":
        out = []
        for sname, coeffs in _partition_hybrid(
                "dihedral", script.dihedral_style_args,
                script.dihedral_coeffs):
            sel = np.isin(dtyp, list(coeffs.keys()))
            if not sel.any():
                continue
            out.append(_dihedral_params_one(
                sname, coeffs, didx[sel], dtyp[sel], TD, dtype, script, u,
                eps, sig))
        return tuple(out)
    return (_dihedral_params_one(
        script.dihedral_style, script.dihedral_coeffs, didx, dtyp, TD,
        dtype, script, u, eps, sig),)


# -------------------------------- impropers --------------------------------

def _improper_params_one(style, coeffs, iidx, ityp, TI, dtype):
    from lidp_tpu.ops.bonded import ImproperParams

    ki = np.zeros(TI + 1)
    chi0 = np.zeros(TI + 1)
    c2 = np.zeros(TI + 1)
    c3 = np.zeros(TI + 1)
    for it_, co in coeffs.items():
        if style == "zero":
            continue
        vals = [float(v) for v in co]
        ki[it_] = vals[0]
        if style == "harmonic":
            chi0[it_] = np.deg2rad(vals[1])
        elif style == "cvff":
            c2[it_], c3[it_] = vals[1], vals[2]    # d(+-1), n
        elif style == "umbrella":
            w0 = np.deg2rad(vals[1])
            chi0[it_] = w0
            # improper_umbrella.cpp::coeff C = K/sin^2(w0)
            c2[it_] = ki[it_] / np.sin(w0) ** 2 if w0 != 0.0 else 0.0
    return ImproperParams(
        idx=jnp.asarray(iidx, jnp.int32), itype=jnp.asarray(ityp, jnp.int32),
        k=jnp.asarray(ki, dtype), chi0=jnp.asarray(chi0, dtype),
        c2=jnp.asarray(c2, dtype), c3=jnp.asarray(c3, dtype), style=style)


def build_improper_params(script, dtype):
    iidx = script._impropers - 1
    ityp = np.maximum(np.asarray(script._improper_types), 0)
    if not len(iidx):
        return ()
    TI = max(script.improper_coeffs.keys(), default=0)
    if script.improper_style == "hybrid":
        out = []
        for sname, coeffs in _partition_hybrid(
                "improper", script.improper_style_args,
                script.improper_coeffs):
            sel = np.isin(ityp, list(coeffs.keys()))
            if not sel.any():
                continue
            out.append(_improper_params_one(
                sname, coeffs, iidx[sel], ityp[sel], TI, dtype))
        return tuple(out)
    return (_improper_params_one(
        script.improper_style, script.improper_coeffs, iidx, ityp, TI,
        dtype),)
