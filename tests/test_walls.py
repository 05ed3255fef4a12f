"""Wall fixes: wall/reflect (post_integrate reflection,
fix_wall_reflect.cpp:188), wall/lj93 (9-3 potential wall,
fix_wall_lj93.cpp), planeforce/lineforce projections."""

import numpy as np
import pytest

BASE = """
units lj
atom_style atomic
boundary p p f
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.5 12345 loop geom
fix 1 all nve
"""


def _run(extra, steps=200):
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute((BASE + extra + f"\nrun {steps}").strip().splitlines())
    return s


def test_wall_reflect_confines():
    a0 = (4 / 0.8442) ** (1 / 3) * 3
    s = _run(f"fix 2 all wall/reflect zlo 0.0 zhi {a0}")
    z = np.asarray(s._sim.sys.x)[:, 2]
    assert z.min() >= 0.0 - 1e-9
    assert z.max() <= a0 + 1e-9
    assert np.isfinite(s.thermo_rows[-1]["etotal"])


def test_wall_lj93_confines_and_repels():
    a0 = (4 / 0.8442) ** (1 / 3) * 3
    s = _run(f"fix 2 all wall/lj93 zlo -0.8 1.0 1.0 2.5 "
             f"zhi {a0 + 0.8} 1.0 1.0 2.5")
    z = np.asarray(s._sim.sys.x)[:, 2]
    # the 9-3 wall's strong repulsion keeps atoms off the wall planes
    assert z.min() > -0.6
    assert z.max() < a0 + 0.6
    assert np.isfinite(s.thermo_rows[-1]["etotal"])


def test_wall_lj93_force_value():
    """Single static atom at distance d from a zlo wall: force matches the
    analytic 9-3 derivative."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
boundary p p f
region box block 0 10 0 10 0 10 units box
create_box 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
""".strip().splitlines())
    n = 1
    s.x = np.array([[5.0, 5.0, 1.3]])
    s.v = np.zeros((n, 3))
    s.q = np.zeros(n)
    s.type = np.ones(n, np.int32)
    s.mol = np.zeros(n, np.int32)
    s.image = np.zeros((n, 3), np.int32)
    s._bonds = np.zeros((0, 2), np.int64)
    s.groups["all"] = np.ones(n, bool)
    s.mass_type = np.array([0.0, 1.0])
    s.one("fix 1 all nve")
    s.one("fix 2 all wall/lj93 zlo 0.0 1.0 1.0 2.5")
    s.one("run 0")
    fz = float(np.asarray(s._sim.res.f)[0, 2])
    d = 1.3
    eps = sig = 1.0
    # -dE/dd with E = eps(2/15 (s/d)^9 - (s/d)^3)
    fref = eps * (9 * 2 / 15 * sig**9 / d**10 - 3 * sig**3 / d**4)
    assert abs(fz - fref) < 1e-10, (fz, fref)


def test_planeforce():
    s = _run("fix 2 all planeforce 0.0 0.0 1.0", steps=1)
    f = np.asarray(s._sim.res.f)
    # forces projected onto the z-plane's normal... planeforce KEEPS the
    # in-plane part: f.n == 0
    assert np.abs(f[:, 2]).max() < 1e-12


def test_lineforce():
    s = _run("fix 2 all lineforce 1.0 0.0 0.0", steps=1)
    f = np.asarray(s._sim.res.f)
    assert np.abs(f[:, 1]).max() < 1e-12
    assert np.abs(f[:, 2]).max() < 1e-12
