"""Round-3 fix breadth batch 2 vs the rebuilt reference: dt/reset
(fix_dt_reset.cpp), restrain (fix_restrain.cpp), spring/chunk
(fix_spring_chunk.cpp), store/force (fix_store_force.cpp),
ave/histo/weight (fix_ave_histo_weight.cpp).  Goldens minted from the
REBUILT 16Mar18 binary (%.15g thermo, norm no)."""
import jax.numpy as jnp
import numpy as np
import pytest

MELT = """units lj
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

FMT = "thermo_modify format float %.15g norm no\n"


def _run(tmp_path, text):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.s").write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.s"))
    return s


# step dt temp pe press
DTRESET_GOLDEN = [
    [0, 0.00411343905341568, 3.0, -1733.98222163279, -3.71261023883558],
    [2, 0.00412541307459453, 2.98699702419234, -1729.04204950894,
     -3.59289707975143],
    [4, 0.00417677268564182, 2.94347728412273, -1712.50421909125,
     -3.21232814531447],
    [8, 0.00448062892097403, 2.68759023932981, -1614.70394693982,
     -1.29239663137881],
]


def test_dt_reset_golden(tmp_path):
    """fix dt/reset 1 NULL NULL 0.02 units box: per-step displacement-
    bounded timestep incl. the setup-time reset before the step-0 row;
    every printed digit (dt, temp, pe, press) matches over 8 steps."""
    s = _run(tmp_path, MELT + "velocity all create 3.0 87287 loop geom\n"
             "fix 1 all nve\n"
             "fix 2 all dt/reset 1 NULL NULL 0.02 units box\n"
             "thermo 2\nthermo_style custom step dt temp pe press\n"
             + FMT + "run 8\n")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, dt, temp, pe, press in DTRESET_GOLDEN:
        r = rows[step]
        assert float(r["dt"]) == pytest.approx(dt, rel=1e-12)
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-11)
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-11)
        assert float(r["press"]) == pytest.approx(press, rel=1e-10)


# step temp pe press
RESTRAIN_GOLDEN = [
    [0, 1.44, -1733.98222163279, -5.02441789508558],
    [2, 1.4367426159752, -1730.50787150201, -4.93496402113716],
    [4, 1.42295520463449, -1719.30711610436, -4.65943531997958],
    [8, 1.34054642383009, -1662.61715168178, -3.42844331660661],
]


def test_restrain_golden(tmp_path):
    """fix restrain bond+angle+dihedral with a K ramp over the run:
    harmonic bond/angle restraints + CHARMM-style dihedral restraint
    E=K(1+cos(phi-phi0)); matches the rebuilt reference to all digits."""
    s = _run(tmp_path, MELT.replace(
        "atom_style atomic", "atom_style atomic\natom_modify map array")
        + "velocity all create 1.44 87287 loop geom\n"
        "fix 1 all nve\n"
        "fix 2 all restrain bond 1 6 50.0 80.0 1.5 "
        "angle 1 2 3 30.0 30.0 90.0 dihedral 1 2 3 4 10.0 20.0 120.0\n"
        "thermo 2\nthermo_style custom step temp pe press\n"
        + FMT + "run 8\n")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, pe, press in RESTRAIN_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-10)
        assert float(r["press"]) == pytest.approx(press, rel=1e-9)


SPRINGCHUNK_GOLDEN = [
    [0, 0.45, 4800.42038120383, 4.11942761804422],
    [2, 0.458504136156788, 4779.62438393004, 4.11505154930584],
    [4, 0.501066709263273, 4715.1372953412, 4.13153816633705],
    [8, 0.682568486772114, 4470.87269893675, 4.22808648991081],
]


def test_spring_chunk_golden(tmp_path):
    """fix spring/chunk on molecule chunks of the 2d micelle system
    (solvent mol-0 atoms are chunk-less and must be excluded); matches
    the rebuilt reference to ~13 digits over 8 steps."""
    s = _run(tmp_path, """dimension 2
units lj
atom_style bond
special_bonds lj/coul 0.0 1.0 1.0
read_data /root/reference/examples/micelle/data.micelle
pair_style soft 1.12246
pair_coeff * * 10.0
bond_style harmonic
bond_coeff 1 50.0 0.75
velocity all create 0.45 2349852 loop geom
compute cm all chunk/atom molecule
compute comc all com/chunk cm
fix 1 all nve
fix 2 all enforce2d
fix 3 all spring/chunk 20.0 cm comc
thermo 2
thermo_style custom step temp pe press
""" + FMT + "run 8\n")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, pe, press in SPRINGCHUNK_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-9)
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-10)
        assert float(r["press"]) == pytest.approx(press, rel=1e-9)


# step temp max(f_sf[1]) max(f_sf[2]) max(fx) max(fy) — stored (pre-
# viscous) force differs from the live damped force
STOREFORCE_GOLDEN = [
    [2, 1.41661398947369, 2.06755657078329, 2.06135821633858,
     2.91925715598452, 2.72862539371689],
    [4, 1.37371799238317, 5.75388819934907, 5.05433220707665,
     6.58711407235229, 5.9275767241124],
]


def test_store_force_golden(tmp_path):
    """fix store/force: f_ID columns resolve to the pure pair force
    before fix viscous damped it; reduce-max golden vs the reference."""
    s = _run(tmp_path, MELT + "velocity all create 1.44 87287 loop geom\n"
             "fix 1 all nve\n"
             "fix sf all store/force\n"
             "fix 3 all viscous 0.5\n"
             "compute r1 all reduce max f_sf[1] f_sf[2] fx fy\n"
             "thermo 2\n"
             "thermo_style custom step temp c_r1[1] c_r1[2] c_r1[3] "
             "c_r1[4]\n" + FMT + "run 4\n")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, s1, s2, fx, fy in STOREFORCE_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(r["c_r1[1]"]) == pytest.approx(s1, rel=1e-9)
        assert float(r["c_r1[2]"]) == pytest.approx(s2, rel=1e-9)
        assert float(r["c_r1[3]"]) == pytest.approx(fx, rel=1e-9)
        assert float(r["c_r1[4]"]) == pytest.approx(fy, rel=1e-9)


# step-2 frame of the reference histw.txt: header + 6 weighted bins
HISTW_GOLDEN = (547.314, [21.5223, 160.958, 84.122, 100.355, 180.357,
                          0.0])


def test_ave_histo_weight_golden(tmp_path):
    """fix ave/histo/weight: vx binned with per-atom KE weights; the
    step-2 frame's weighted totals match the rebuilt reference."""
    s = _run(tmp_path, MELT + "velocity all create 1.44 87287 loop geom\n"
             "compute myke all ke/atom\n"
             "fix 1 all nve\n"
             "fix h all ave/histo/weight 2 1 2 -3.0 3.0 6 vx c_myke "
             "mode vector file histw.txt\nrun 2\n")
    lines = [ln for ln in open(tmp_path / "histw.txt")
             if not ln.startswith("#")]
    frames = {}
    i = 0
    while i < len(lines):
        head = lines[i].split()
        step, nbin = int(head[0]), int(head[1])
        frames[step] = (float(head[2]),
                        [float(lines[i + 1 + b].split()[2])
                         for b in range(nbin)])
        i += 1 + nbin
    total, bins = frames[2]
    assert total == pytest.approx(HISTW_GOLDEN[0], rel=1e-5)
    for got, want in zip(bins, HISTW_GOLDEN[1]):
        assert got == pytest.approx(want, rel=1e-5, abs=1e-8)


def test_box_relax_golden(tmp_path):
    """fix box/relax iso 0.0 during minimize: the cell relaxes to the
    zero-pressure fcc minimum.  The reference folds the strain in as a
    minimizer dof; our outer secant loop reaches the same fixed point —
    final lx / pe match the rebuilt reference to ~9 digits."""
    import numpy as np

    from lidp_tpu.forcefield import compute_forces

    s = _run(tmp_path, """units lj
atom_style atomic
boundary p p p
lattice fcc 1.2
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all box/relax iso 0.0 vmax 0.001
min_style cg
minimize 1e-12 1e-12 10000 10000
""")
    sim = s._sim
    lx = float(np.asarray(sim.sys.box.lengths)[0])
    res = compute_forces(sim.sys, sim.runner.ff)
    press = float(np.asarray(res.virial)[:3].sum() / 3
                  / np.asarray(sim.sys.box.volume))
    assert lx == pytest.approx(6.19841369776372, rel=1e-8)
    assert float(res.epair) == pytest.approx(-2073.50292294247, rel=1e-9)
    assert abs(press) < 1e-6
