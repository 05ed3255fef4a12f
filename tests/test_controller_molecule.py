"""fix controller (fix_controller.cpp PID on an internal-style variable),
molecule templates + create_atoms mol (molecule.cpp + create_atoms.cpp
add_molecule with bit-exact RanMars rotation streams), and fix external
pf/array (fix_external.cpp) — goldens vs the rebuilt reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript


def _rows(tmp_path, text, name="in.t"):
    (tmp_path / name).write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / name))
    return s, {int(r["step"]): r for r in s.thermo_rows}


CTRL_GOLDEN = [
    (0, 1.44, 0.0),
    (2, 1.43094633109, -0.00115473165544),
    (4, 1.40207301061, -0.000723451414781),
    (6, 1.34788480347, 0.00124303534668),
]


def test_controller_golden(tmp_path):
    _, rows = _rows(tmp_path, """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
variable tcv internal 0.0
compute tt all temp
fix pid all controller 2 1.0 0.5 0.1 0.05 c_tt 1.2 tcv
thermo 2
thermo_style custom step temp v_tcv
run 6
""")
    for step, t, cv in CTRL_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-10), step
        assert float(r["v_tcv"]) == pytest.approx(cv, rel=1e-9,
                                                  abs=1e-15), step


WAT_MOL = """# simple water-like molecule

3 atoms
2 bonds
1 angles

Coords

1 0.0 0.0 0.0
2 0.9 0.0 0.0
3 -0.25 0.87 0.0

Types

1 1
2 2
3 2

Charges

1 -0.8
2 0.4
3 0.4

Bonds

1 1 1 2
2 1 1 3

Angles

1 1 2 1 3
"""

MOL_GOLDEN = [
    (0, 0.0, -0.00703248296474, 0.000542290015933, 0.0125819278056,
     -0.0150568746291),
    (2, 0.000136423356773, -0.00723479082424, 0.000537246527902,
     0.0123839161798, -0.0150098291177),
    (4, 0.000537140043828, -0.00783167859765, 0.000522334666078,
     0.0118023584169, -0.0148709318694),
]


def test_molecule_create_atoms_golden(tmp_path):
    (tmp_path / "wat.mol").write_text(WAT_MOL)
    s, rows = _rows(tmp_path, """units lj
atom_style full
boundary p p p
lattice sc 0.05
region box block 0 3 0 3 0 3
create_box 2 box bond/types 1 angle/types 1 extra/bond/per/atom 4
molecule wat wat.mol
create_atoms 0 box mol wat 4523
mass 1 15.0
mass 2 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 0.2 1.5
pair_coeff 2 2 0.05 0.8
bond_style harmonic
bond_coeff 1 60.0 0.9
angle_style harmonic
angle_coeff 1 30.0 104.0
special_bonds lj/coul 0.0 0.0 0.5
fix 1 all nve
thermo 2
thermo_style custom step temp pe ebond eangle press atoms
run 4
""")
    assert s.x.shape[0] == 81          # 27 molecules x 3 atoms
    assert len(s._bonds) == 54
    assert len(s._angles) == 27
    for step, t, pe, eb, ea, pr in MOL_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-10,
                                                 abs=1e-15), step
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-10), step
        assert float(r["ebond"]) == pytest.approx(eb, rel=1e-10), step
        assert float(r["eangle"]) == pytest.approx(ea, rel=1e-10), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-9), step


def test_fix_external_pf_array(tmp_path):
    """fix external pf/array adds the caller-supplied per-atom forces —
    equivalent by construction to fix addforce for a uniform array."""
    from lidp_tpu.api import lammps

    base = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.0 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
"""
    grp = "region half block 0 1 INF INF INF INF\ngroup half region half\n"
    lmp = lammps()
    lmp.commands_string(base + grp + "fix e half external pf/array 1\n")
    n = lmp.get_natoms()
    lmp.fix_external_set_force(
        "e", np.tile([0.3, -0.2, 0.1], (n, 1)))
    lmp.command("run 4")
    pe_ext = lmp.get_thermo("pe")

    lmp2 = lammps()
    lmp2.commands_string(base + grp + "fix e half addforce 0.3 -0.2 0.1\n")
    lmp2.command("run 4")
    assert pe_ext == pytest.approx(lmp2.get_thermo("pe"), rel=1e-12)
    # and it is NOT a no-op
    lmp3 = lammps()
    lmp3.commands_string(base)
    lmp3.command("run 4")
    assert abs(pe_ext - lmp3.get_thermo("pe")) > 1e-10


def test_fix_external_pf_callback_per_step(tmp_path):
    """fix external pf/callback fires the registered callback on the
    ncall grid EVERY step (fix_external.cpp:150-156, via an ordered
    io_callback inside the scan), with current positions, and the
    position-dependent force shapes the dynamics (equivalent to
    fix spring/self for a k(x-x0) callback)."""
    from lidp_tpu.api import lammps

    base = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.0 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
"""
    lmp = lammps()
    lmp.commands_string(base + "fix e all external pf/callback 1 1\n")
    x0 = np.array(lmp.lmp.x, float)
    calls = []

    def cb(caller, step, nlocal, ids, x, fext):
        calls.append((int(step), np.array(x)))
        fext[:] = -0.5 * (x - x0)       # spring/self with K=0.5

    lmp.set_fix_external_callback("e", cb)
    lmp.command("run 6")
    pe_cb = lmp.get_thermo("pe")

    # fired on EVERY step 0..6 (setup + 6 scan steps)
    steps = [s for s, _ in calls]
    assert set(range(0, 7)).issubset(set(steps)), steps
    # positions the callback saw CHANGE between steps (not a frozen
    # run-chunk snapshot)
    by_step = {s: x for s, x in calls}
    assert np.abs(by_step[6] - by_step[1]).max() > 1e-6

    lmp2 = lammps()
    lmp2.commands_string(base + "fix e all spring/self 0.5\n")
    lmp2.command("run 6")
    assert pe_cb == pytest.approx(lmp2.get_thermo("pe"), rel=1e-9)


TMD_TARGET_SEED = 7
TMD_GOLDEN = [
    (0, 0.1, -6.77336805325, -6.15167893675),
    (5, 3.20675708383, -6.53258593082, -2.05275725477),
    (10, 3.21919408826, -5.17834306357, 4.75317144236),
    (15, 5.05817743185, -2.10530533331, 19.9333202856),
]


def test_fix_tmd_golden(tmp_path):
    """fix tmd (fix_tmd.cpp): the rho-schedule holonomic constraint's
    Lagrange multiplier and x/v corrections match the rebuilt reference
    exactly through step 15 (the step-20 row sits past a neighbor
    rebuild whose timing differs under the violent steering; rel ~4e-5)."""
    a = (4 / 0.8442) ** (1 / 3)
    basis = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
    pts = np.array([((i + b[0]) * a, (j + b[1]) * a, (k + b[2]) * a)
                    for k in range(3) for j in range(3) for i in range(3)
                    for b in basis])
    rng = np.random.RandomState(TMD_TARGET_SEED)
    tgt = pts + 0.35 * rng.uniform(-1, 1, pts.shape)
    with open(tmp_path / "target.tmd", "w") as f:
        for i, p in enumerate(tgt):
            f.write(f"{i+1} {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
    _, rows = _rows(tmp_path, """units lj
atom_style atomic
atom_modify map array
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 0.1 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
neighbor 0.3 bin
fix 1 all nve
fix steer all tmd 0.05 target.tmd 0
thermo 5
thermo_style custom step temp pe press
run 20
""")
    for step, t, pe, pr in TMD_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-10), step
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-10), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-9), step
    assert float(rows[20]["pe"]) == pytest.approx(28.4489095941, rel=1e-3)


# fix tmd statistics file rows from the rebuilt reference (16Mar18,
# /tmp/lmpsrc/lmp_serial) on the same steering run with
# `fix steer all tmd 0.05 target.tmd 5 tmd_ref.out`:
# step -> (rho_target, rho_old, gamma_back, gamma_forward, lambda,
#          work_lambda, work_analytical)
TMD_STAT_GOLDEN = {
    5: (0.277552, 0.292722, 0.0512666, -0.000561087, 64829.6,
        -3948.49, 28.104),
    10: (0.201701, 0.216871, 0.0664696, -0.0034958, 62274.3,
         -8770.78, 177.365),
    15: (0.125851, 0.141021, 0.0862944, -0.0217203, 52571.4,
         -13128.0, 812.693),
    20: (0.05, 0.0651701, -0.103906, -0.374926, -29253.1,
         -14670.9, 4380.48),
}


def test_fix_tmd_stats_file_golden(tmp_path):
    """fix tmd N>0 statistics file (fix_tmd.cpp:263-275): per-step work
    accumulators leave the scan via an ordered io_callback; rows golden
    vs the rebuilt reference.  The step-20 row sits past the
    neighbor-rebuild divergence of the trajectory itself (see
    test_fix_tmd_golden) so it gets a loose tolerance."""
    a = (4 / 0.8442) ** (1 / 3)
    basis = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
    pts = np.array([((i + b[0]) * a, (j + b[1]) * a, (k + b[2]) * a)
                    for k in range(3) for j in range(3) for i in range(3)
                    for b in basis])
    rng = np.random.RandomState(TMD_TARGET_SEED)
    tgt = pts + 0.35 * rng.uniform(-1, 1, pts.shape)
    with open(tmp_path / "target.tmd", "w") as f:
        for i, p in enumerate(tgt):
            f.write(f"{i+1} {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
    _rows(tmp_path, """units lj
atom_style atomic
atom_modify map array
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 0.1 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
neighbor 0.3 bin
fix 1 all nve
fix steer all tmd 0.05 target.tmd 5 tmd.out
thermo 5
thermo_style custom step temp pe press
run 20
""")
    lines = (tmp_path / "tmd.out").read_text().splitlines()
    assert lines[0].startswith("# Step rho_target rho_old gamma_back")
    got = {}
    for ln in lines[1:]:
        t = ln.split()
        got[int(t[0])] = [float(v) for v in t[1:]]
    assert sorted(got) == [5, 10, 15, 20]
    for step, ref in TMD_STAT_GOLDEN.items():
        rel = 1e-4 if step < 20 else 2e-2
        for v, r in zip(got[step], ref):
            assert v == pytest.approx(r, rel=rel, abs=1e-6), (step, ref)
