"""Force/velocity modifier fixes: addforce, aveforce, spring/self, viscous,
efield, momentum, recenter, halt (fix_*.cpp semantics)."""

import numpy as np
import pytest

SETUP = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.0 12345 loop geom
"""


def _fresh(extra):
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute((SETUP + extra).strip().splitlines())
    return s


def test_addforce():
    s = _fresh("fix 1 all nve\nfix 2 all addforce 0.5 0.0 -0.25\nrun 1")
    sim = s._sim
    # re-evaluate base forces without the fix for comparison
    s2 = _fresh("fix 1 all nve\nrun 1")
    f1 = np.asarray(sim.res.f)
    f2 = np.asarray(s2._sim.res.f)
    d = f1 - f2
    assert np.allclose(d[:, 0], 0.5, atol=1e-10)
    assert np.allclose(d[:, 1], 0.0, atol=1e-10)
    assert np.allclose(d[:, 2], -0.25, atol=1e-10)


def test_aveforce():
    s = _fresh("fix 1 all nve\nfix 2 all aveforce 0.1 NULL NULL\nrun 1")
    f = np.asarray(s._sim.res.f)
    # all x components equal favg+0.1; y/z untouched (sum to ~0)
    assert np.allclose(f[:, 0], f[0, 0], atol=1e-10)
    assert not np.allclose(f[:, 1], f[0, 1], atol=1e-10)


def test_viscous_damps():
    s = _fresh("fix 1 all nve\nfix 2 all viscous 5.0\nrun 50")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    # strong drag: KE decays hard (pe->ke conversion keeps it above the
    # bare exp(-2*gamma*t) estimate)
    assert rows[50]["ke"] < 0.25 * rows[0]["ke"]


def test_spring_self_tether():
    s = _fresh("fix 1 all nve\nfix 2 all spring/self 50.0\nrun 200")
    sim = s._sim
    L = np.asarray(sim.sys.box.lengths)
    xu = np.asarray(sim.sys.x) + np.asarray(sim.sys.image) * L
    x0 = np.asarray(s.x)  # ... script.x is updated? use data captured below
    # atoms stay near their tether (melt would otherwise diffuse)
    # re-derive initial positions from a fresh script
    s0 = _fresh("fix 1 all nve\nrun 0")
    x_init = np.asarray(s0._sim.sys.x)
    d = xu - x_init
    assert np.abs(d).max() < 1.5


def test_momentum_zeroes_vcm():
    s = _fresh("fix 1 all nve\nfix 2 all addforce 0.1 0 0\n"
               "fix 3 all momentum 5 linear 1 1 1\nrun 10")
    v = np.asarray(s._sim.sys.v)
    vcm = v.mean(axis=0)
    assert np.abs(vcm).max() < 1e-10


def test_recenter_holds_com():
    s = _fresh("fix 1 all nve\nfix 2 all addforce 0.05 0 0\n"
               "fix 3 all recenter INIT INIT INIT units box\nrun 20")
    sim = s._sim
    L = np.asarray(sim.sys.box.lengths)
    xu = np.asarray(sim.sys.x) + np.asarray(sim.sys.image) * L
    s0 = _fresh("run 0")
    com0 = np.asarray(s0._sim.sys.x).mean(axis=0)
    assert np.abs(xu.mean(axis=0) - com0).max() < 1e-6


def test_halt_stops_run():
    s = _fresh("fix 1 all nve\nfix 2 all halt 10 temp > 0.0 break\n"
               "thermo 10\nrun 100")
    # condition true at the first check -> stops at step 10
    assert int(s.step) == 10


def test_efield():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute((SETUP.replace("atom_style atomic", "atom_style full")
               + "fix 1 all nve\nfix 2 all efield 1.0 0.0 0.0\nrun 1"
               ).strip().splitlines())
    # q == 0 everywhere: efield adds nothing, but must run
    assert np.isfinite(s.thermo_rows[-1]["etotal"])
