"""Top-level command breadth vs the rebuilt reference:

displace_atoms (move/ramp/random, displace_atoms.cpp), create_bonds /
delete_bonds (create_bonds.cpp / delete_bonds.cpp), dielectric
(force.cpp), change_box (change_box.cpp), rerun / read_dump (rerun.cpp /
read_dump.cpp), restart cadence (output.cpp), compute_modify extra
(compute.cpp), balance / info / shell / write_coeff smoke.

All numeric goldens were minted with the REBUILT reference binary
(%.12g thermo formats) this round.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript


def _run_script(tmp_path, text, name="in.t"):
    path = tmp_path / name
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return s


MELT_HEAD = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
"""


def test_displace_atoms_golden(tmp_path):
    """move (units box) + ramp (units lattice) + random (coordinate-seeded
    RanPark, bit-exact) — PotEng/Press match the rebuilt reference to all
    12 printed digits."""
    s = _run_script(tmp_path, MELT_HEAD + """region half block 0 2 INF INF INF INF
group half region half
displace_atoms half move 0.1 0.05 -0.02 units box
displace_atoms all ramp x 0.0 0.2 y 0.0 4.0 units lattice
displace_atoms half random 0.05 0.05 0.05 12345 units box
thermo_style custom step pe press
run 0
""")
    row = s.thermo_rows[0]
    assert float(row["pe"]) == pytest.approx(-6.31700262237, rel=1e-11)
    assert float(row["press"]) == pytest.approx(-3.99669822971, rel=1e-11)


BONDS_GOLDEN = [
    # (pe, ebond, press) after: create_bonds many; delete_bonds bond 1;
    # undo; stats (no-op)
    (9.29548429083, 10.564190967, -39.7155186387),
    (-1.26870667616, 0.0, -2.08651481722),
    (9.29548429083, 10.564190967, -39.7155186387),
    (9.29548429083, 10.564190967, -39.7155186387),
]


def test_create_delete_bonds_golden(tmp_path):
    s = _run_script(tmp_path, """units lj
atom_style bond
boundary p p p
special_bonds lj/coul 0.0 1.0 1.0
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box bond/types 2 extra/bond/per/atom 14
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
bond_style harmonic
bond_coeff 1 50.0 1.0
bond_coeff 2 30.0 1.2
create_bonds many all all 1 0.9 1.2
thermo_style custom step pe ebond press bonds
run 0
delete_bonds all bond 1
run 0
delete_bonds all bond 1 undo
run 0
delete_bonds all stats
run 0
""")
    assert len(s._bonds) == 648
    rows = s.thermo_rows
    assert len(rows) == 4
    for row, (pe, eb, pr) in zip(rows, BONDS_GOLDEN):
        assert float(row["pe"]) == pytest.approx(pe, rel=1e-11)
        assert float(row["ebond"]) == pytest.approx(eb, abs=1e-11)
        assert float(row["press"]) == pytest.approx(pr, rel=1e-10)
        assert float(row["bonds"]) == 648


DIEL_HEAD = """units real
atom_style charge
boundary p p p
region box block 0 20 0 20 0 20
create_box 2 box
create_atoms 1 single 5.0 5.0 5.0 units box
create_atoms 2 single 8.0 5.0 5.0 units box
mass 1 22.99
mass 2 35.45
set type 1 charge 1.0
set type 2 charge -1.0
pair_style lj/cut/coul/cut 8.0
pair_coeff 1 1 0.1 2.5
pair_coeff 2 2 0.1 3.4
"""


@pytest.mark.parametrize("eps,ecoul,pe", [
    (1.0, -110.687903333, -110.741002443),
    (2.0, -55.3439516667, -55.397050776),
])
def test_dielectric_golden(tmp_path, eps, ecoul, pe):
    """dielectric scales qqrd2e by 1/eps; also locks the exact-1/r
    coul/cut path (the A&S erfc polynomial is ~1e-9 off at x=0 and must
    not be used for undamped coulomb)."""
    s = _run_script(tmp_path, DIEL_HEAD + f"""dielectric {eps}
thermo_style custom step pe ecoul evdwl
run 0
""")
    row = s.thermo_rows[0]
    assert float(row["ecoul"]) == pytest.approx(ecoul, rel=1e-11)
    assert float(row["pe"]) == pytest.approx(pe, rel=1e-11)
    assert float(row["evdwl"]) == pytest.approx(-0.0530991093085, rel=1e-10)


CBOX_GOLDEN = [
    # (pe, press, vol, lx, ly, xy)
    (-6.77336805325, -6.23531727009, 303.24567638, 6.71838476553,
     6.71838476553, 0.0),
    (-5.0304211914, -5.02516167799, 376.252959857, 7.25585554677,
     7.71838476553, 0.0),
    (-5.03062470129, -4.9725011367, 376.252959857, 7.25585554677,
     7.71838476553, 0.8),
]


def test_change_box_golden(tmp_path):
    """x scale + y delta + remap, then triclinic xy final + remap."""
    s = _run_script(tmp_path, MELT_HEAD + """thermo_style custom step pe press vol lx ly lz xy
run 0
change_box all x scale 1.08 y delta -0.5 0.5 remap units box
run 0
change_box all triclinic xy final 0.8 remap units box
run 0
""")
    rows = s.thermo_rows
    assert len(rows) == 3
    for row, (pe, pr, vol, lx, ly, xy) in zip(rows, CBOX_GOLDEN):
        assert float(row["pe"]) == pytest.approx(pe, rel=1e-11)
        assert float(row["press"]) == pytest.approx(pr, rel=1e-10)
        assert float(row["vol"]) == pytest.approx(vol, rel=1e-11)
        assert float(row["lx"]) == pytest.approx(lx, rel=1e-11)
        assert float(row["ly"]) == pytest.approx(ly, rel=1e-11)
        assert float(row["xy"]) == pytest.approx(xy, abs=1e-12)


RERUN_GOLDEN = [
    (0, 1.44, -6.77336805325, -5.02441789509),
    (2, 1.43088638838, -6.75981254732, -4.93997774118),
    (4, 1.40164128098, -6.71630169257, -4.67881423204),
    (6, 1.34670307903, -6.63405990592, -4.21816452883),
]

RERUN_HEAD = MELT_HEAD.replace(
    "pair_style", "velocity all create 1.44 87287 loop geom\npair_style")


def test_rerun_golden(tmp_path):
    """rerun re-evaluates every dump snapshot; thermo rows match the
    rebuilt reference's rerun on the equivalent (bit-exact velocity
    create + NVE) trajectory."""
    _run_script(tmp_path, RERUN_HEAD + """neighbor 0.3 bin
fix 1 all nve
dump d1 all custom 2 melt.dump id type x y z vx vy vz
dump_modify d1 sort id format float %.15g
run 6
""", name="in.mk")
    s = _run_script(tmp_path, MELT_HEAD + """neighbor 0.3 bin
thermo 2
thermo_style custom step temp pe press
rerun melt.dump dump x y z vx vy vz
""", name="in.rr")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, pe, press in RERUN_GOLDEN:
        assert float(rows[step]["temp"]) == pytest.approx(temp, rel=1e-8)
        assert float(rows[step]["pe"]) == pytest.approx(pe, rel=1e-8)
        assert float(rows[step]["press"]) == pytest.approx(press, rel=1e-7)


def test_read_dump(tmp_path):
    """read_dump pulls one snapshot's x/v into the current system."""
    _run_script(tmp_path, RERUN_HEAD + """neighbor 0.3 bin
fix 1 all nve
dump d1 all custom 2 melt.dump id type x y z vx vy vz
dump_modify d1 sort id format float %.15g
run 6
""", name="in.mk")
    s = _run_script(tmp_path, MELT_HEAD + """neighbor 0.3 bin
thermo_style custom step temp pe press
read_dump melt.dump 4 x y z vx vy vz
run 0
""", name="in.rd")
    row = s.thermo_rows[-1]
    assert int(row["step"]) == 4
    assert float(row["temp"]) == pytest.approx(1.40164128098, rel=1e-8)
    assert float(row["pe"]) == pytest.approx(-6.71630169257, rel=1e-8)


MISC_GOLDEN = [(0, 1.42666666667, -6.77336805325),
               (4, 1.38909085311, -6.71723495264)]


def test_misc_commands_golden(tmp_path):
    """compute_modify thermo_temp extra 0 (dof = 3N), restart cadence
    writing alternating files, balance/info/shell/write_coeff accepted."""
    s = _run_script(tmp_path, """units lj
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
compute_modify thermo_temp extra 0
thermo_style custom step temp pe
balance 1.0 shift x 5 1.0
info system
restart 2 rs.a rs.b
run 4
write_coeff coeffs.out
shell mkdir subdir
""")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, pe in MISC_GOLDEN:
        assert float(rows[step]["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(rows[step]["pe"]) == pytest.approx(pe, rel=1e-10)
    assert os.path.exists(tmp_path / "rs.a")
    assert os.path.exists(tmp_path / "rs.b")
    assert os.path.isdir(tmp_path / "subdir")
    assert "pair_coeff 1 1" in open(tmp_path / "coeffs.out").read()
    # every step printed exactly once despite the restart segmentation
    assert sorted(int(r["step"]) for r in s.thermo_rows) == [0, 2, 4]


def test_restart_resume_exact(tmp_path):
    """A run resumed from a `restart`-cadence checkpoint reproduces the
    uninterrupted trajectory exactly (state-pytree checkpoints)."""
    base = """units lj
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
thermo_style custom step pe
"""
    s1 = _run_script(tmp_path, base + "restart 2 ck.a\nrun 4\n",
                     name="in.a")
    s2 = _run_script(tmp_path, base + "read_restart ck.a\nrun 0\n",
                     name="in.b")
    r1 = {int(r["step"]): r for r in s1.thermo_rows}
    r2 = s2.thermo_rows[-1]
    # ck.a was last written at step 4
    assert int(r2["step"]) == 4
    assert float(r2["pe"]) == pytest.approx(float(r1[4]["pe"]), rel=1e-13)


def test_clear_and_quit(tmp_path):
    s = _run_script(tmp_path, MELT_HEAD + "run 0\nclear\n")
    assert s.x is None
    with pytest.raises(SystemExit):
        _run_script(tmp_path, "units lj\nquit\n", name="in.q")


PRESSC_GOLDEN = [
    (0, -5.03092527009, -5.03092527009, -6.23531727009),
    (2, -4.94619235677, -4.94619235677, -6.14301201899),
    (4, -4.68560074718, -4.68560074718, -5.85827124538),
]


def test_compute_pressure_golden(tmp_path):
    """compute ID group pressure temp-ID [NULL virial]
    (compute_pressure.cpp) as a named thermo column."""
    s = _run_script(tmp_path, """units lj
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
compute myt all temp
compute myp all pressure myt
compute pv all pressure NULL virial
thermo 2
thermo_style custom step press c_myp c_pv
run 4
""")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, pr, myp, pv in PRESSC_GOLDEN:
        r = rows[step]
        assert float(r["press"]) == pytest.approx(pr, rel=1e-11)
        assert float(r["c_myp"]) == pytest.approx(myp, rel=1e-11)
        assert float(r["c_pv"]) == pytest.approx(pv, rel=1e-11)


def test_bond_write_golden(tmp_path):
    """bond_write (Bond::write_file, bond.cpp:223): tabulated rows match
    the rebuilt reference's output exactly (1.8/7.2 at +-0.15/0.3 from
    r0 = 1.1 for k = 80)."""
    s = _run_script(tmp_path, """units lj
atom_style bond
boundary p p p
region box block 0 10 0 10 0 10
create_box 1 box bond/types 1 extra/bond/per/atom 2
create_atoms 1 single 2.0 2.0 2.0
create_atoms 1 single 3.0 2.0 2.0
mass 1 1.0
pair_style zero 2.0
pair_coeff * *
bond_style harmonic
bond_coeff 1 80.0 1.1
create_bonds single/bond 1 1 2
bond_write 1 5 0.8 1.4 bw.table HARM
""")
    rows = []
    for ln in open(tmp_path / "bw.table"):
        t = ln.split()
        if len(t) == 4 and t[0].isdigit():
            rows.append([float(v) for v in t])
    gold = [[1, 0.8, 7.2, 48.0], [2, 0.95, 1.8, 24.0],
            [3, 1.1, 0.0, 0.0], [4, 1.25, 1.8, -24.0],
            [5, 1.4, 7.2, -48.0]]
    assert np.allclose(rows, gold, rtol=1e-12, atol=1e-12)
    hdr = open(tmp_path / "bw.table").read()
    assert "N 5 EQ 1.1" in hdr and "HARM" in hdr
