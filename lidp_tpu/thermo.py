"""Thermodynamic observables (thermo_style custom columns).

Matches the reference computes: temperature (compute_temp.cpp:74 — dof =
dim*N - extra_dof - fix_dof), pressure (compute_pressure.cpp:178 — kinetic
trace + virial over 3V, nktv2p), potential energy incl. polarization
(compute_pe.cpp:80, thermo.cpp:2224 epol keyword).  In lj units thermo values
are normalized per atom (thermo_modify norm default), in real units they are
extensive — as in Thermo::compute (thermo.cpp:332).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.forcefield import ForceResult
from lidp_tpu.state import System
from lidp_tpu.units import Units


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ThermoParams:
    mass_atom: jax.Array   # (N,) per-atom mass
    dof: float             # temperature degrees of freedom (after fix adjustments)
    boltz: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    mvv2e: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    nktv2p: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    norm: bool = dataclasses.field(metadata=dict(static=True), default=False)
    natoms: int = dataclasses.field(metadata=dict(static=True), default=0)
    mv2d: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    dim: int = dataclasses.field(metadata=dict(static=True), default=3)
    # compute temp/partial: per-component selection (compute_temp_partial)
    vcomp: tuple = dataclasses.field(metadata=dict(static=True),
                                     default=(True, True, True))
    # compute temp/com: subtract the group's center-of-mass velocity
    com_bias: bool = dataclasses.field(metadata=dict(static=True),
                                       default=False)
    # pair_modify tail: long-range LJ corrections (pair.cpp:247-253
    # accumulation; thermo.cpp:1789 adds etail/V to PE, compute_pressure
    # .cpp:292 adds ptail/V to each diagonal virial component)
    etail: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    ptail: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @staticmethod
    def create(mass_atom, dof, units: Units, norm: bool, natoms: int,
               dim: int = 3, vcomp=(True, True, True), com_bias=False,
               etail=0.0, ptail=0.0):
        return ThermoParams(
            mass_atom=jnp.asarray(mass_atom),
            dof=float(dof), boltz=units.boltz, mvv2e=units.mvv2e,
            nktv2p=units.nktv2p, norm=norm, natoms=natoms,
            mv2d=getattr(units, "mv2d", 1.0), dim=dim,
            vcomp=tuple(bool(v) for v in vcomp), com_bias=bool(com_bias),
            etail=float(etail), ptail=float(ptail),
        )


def ke_total(sys: System, tp: ThermoParams):
    m = tp.mass_atom * sys.mask
    v = sys.v
    if tp.com_bias:
        # compute_temp_com.cpp: thermal KE relative to the group vcm
        vcm = jnp.sum(m[:, None] * v, axis=0) / jnp.maximum(jnp.sum(m),
                                                            1e-300)
        v = v - vcm[None, :]
    vv = v * v
    if not all(tp.vcomp):
        vv = vv * jnp.asarray(tp.vcomp, v.dtype)[None, :]
    msum = jnp.sum(m[:, None] * vv)
    return 0.5 * msum * tp.mvv2e


@jax.jit
def temperature(sys: System, tp: ThermoParams):
    return 2.0 * ke_total(sys, tp) / (tp.dof * tp.boltz)


def pressure(sys: System, tp: ThermoParams, virial6):
    """compute_pressure.cpp: 2d uses area (xprd*yprd) and averages over the
    first `dim` diagonal components; mvv here is the FULL kinetic trace,
    which equals the in-plane trace in 2d (v_z == 0)."""
    mvv = 2.0 * ke_total(sys, tp)       # = dof*boltz*T
    if tp.dim == 2:
        w = virial6[0] + virial6[1]
        L = sys.box.lengths
        return (mvv + w) / (2.0 * L[0] * L[1]) * tp.nktv2p
    w = virial6[0] + virial6[1] + virial6[2]
    if tp.ptail:
        w = w + 3.0 * tp.ptail / sys.box.volume
    return (mvv + w) / (3.0 * sys.box.volume) * tp.nktv2p


def thermo_row(sys: System, res: ForceResult, tp: ThermoParams,
               extra_virial=None) -> dict:
    """All standard columns used by the bundled inputs.

    extra_virial: fix contributions (e.g. rigid constraint virial) added to
    the pair/kspace virial for the pressure, as in Modify's virial hooks.

    Compiled as ONE jitted function: evaluated eagerly, the ~30 scalar ops
    here each pay a first-time op-by-op XLA compile (~0.2 s on CPU, ~0.4 s
    through the axon tunnel — measured 145 s of a 150 s `run 0` on the EAM
    bench, the BENCH_r02 "compile timeout" root cause).
    """
    if extra_virial is None:
        return _thermo_row_jit(sys, res, tp)
    return _thermo_row_extra_jit(sys, res, tp, extra_virial)


@jax.jit
def _thermo_row_jit(sys, res, tp):
    return _thermo_row_impl(sys, res, tp, None)


@jax.jit
def _thermo_row_extra_jit(sys, res, tp, extra_virial):
    return _thermo_row_impl(sys, res, tp, extra_virial)


def _thermo_row_impl(sys: System, res: ForceResult, tp: ThermoParams,
                     extra_virial) -> dict:
    ke = ke_total(sys, tp)
    pe = res.pe
    etail = tp.etail / sys.box.volume if tp.etail else 0.0
    pe = pe + etail
    virial = res.virial if extra_virial is None else res.virial + extra_virial
    norm = float(tp.natoms) if tp.norm else 1.0
    return {
        "step": sys.step,
        "temp": temperature(sys, tp),
        "ke": ke / norm,
        "pe": pe / norm,
        "etotal": (ke + pe) / norm,
        "evdwl": res.evdwl / norm,
        "ecoul": res.ecoul / norm,
        "elong": res.elong / norm,
        "epol": res.epol / norm,
        "epair": (res.epair + etail) / norm,
        "emol": res.emol / norm,
        "ebond": res.ebond / norm,
        "eangle": res.eangle / norm,
        "edihed": res.edihed / norm,
        "eimp": res.eimp / norm,
        "press": pressure(sys, tp, virial),
        # 2d vol is the box area (thermo.cpp compute_vol)
        "vol": (sys.box.lengths[0] * sys.box.lengths[1] if tp.dim == 2
                else sys.box.volume),
        "density": tp.mv2d * jnp.sum(tp.mass_atom * sys.mask) / sys.box.volume,
        # box geometry keywords (thermo.cpp lx/ly/lz, xlo..zhi, xy/xz/yz)
        "lx": sys.box.lengths[0], "ly": sys.box.lengths[1],
        "lz": sys.box.lengths[2],
        "xlo": sys.box.lo[0], "ylo": sys.box.lo[1], "zlo": sys.box.lo[2],
        "xhi": sys.box.hi[0], "yhi": sys.box.hi[1], "zhi": sys.box.hi[2],
        "xy": (sys.box.tilt[0] if sys.box.tilt is not None
               else jnp.zeros((), sys.x.dtype)),
        "xz": (sys.box.tilt[1] if sys.box.tilt is not None
               else jnp.zeros((), sys.x.dtype)),
        "yz": (sys.box.tilt[2] if sys.box.tilt is not None
               else jnp.zeros((), sys.x.dtype)),
    }
