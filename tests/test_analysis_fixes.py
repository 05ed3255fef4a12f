"""compute msd / rdf (compute_msd.cpp, compute_rdf.cpp) and
fix temp/rescale / temp/berendsen (end_of_step thermostats)."""

import numpy as np
import pytest

BASE = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.44 87287 loop geom
"""


def _lmp(extra):
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(BASE + extra)
    return L


def test_msd_grows_from_zero():
    L = _lmp("compute m all msd\nfix 1 all nve\n")
    m0 = L.extract_compute("m")
    assert m0.shape == (4,) and np.allclose(m0, 0.0)
    L.command("run 50")
    m1 = L.extract_compute("m")
    assert m1[3] > 1e-3                      # liquid: atoms moved
    assert abs(m1[3] - m1[:3].sum()) < 1e-12
    L.close()


def test_rdf_structure():
    L = _lmp("compute r all rdf 50\nfix 1 all nve\nrun 20\n")
    rdf = L.extract_compute("r")
    assert rdf.shape == (50, 3)
    r, g, coord = rdf[:, 0], rdf[:, 1], rdf[:, 2]
    # excluded core, first LJ peak near 2^(1/6), normalization ~1 at cutoff
    assert g[r < 0.85].max() == 0.0
    assert g[(r > 1.0) & (r < 1.25)].max() > 1.5
    assert 0.5 < g[-5:].mean() < 1.5
    assert np.all(np.diff(coord) >= 0)
    L.close()


def test_temp_rescale_controls():
    L = _lmp("fix 1 all nve\nfix 2 all temp/rescale 5 0.7 0.7 0.02 0.8\n")
    L.command("run 120")
    t = L.get_thermo("temp")
    assert abs(t - 0.7) < 0.1, t
    L.close()


def test_temp_berendsen_controls():
    L = _lmp("fix 1 all nve\nfix 2 all temp/berendsen 0.7 0.7 0.5\n")
    L.command("run 150")
    t = L.get_thermo("temp")
    assert abs(t - 0.7) < 0.08, t
    L.close()


def test_simple_computes():
    """compute com/gyration/ke/pe (compute_{com,gyration,ke,pe}.cpp)."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
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
compute c1 all com
compute rg all gyration
compute ek all ke
compute ep all pe
fix 1 all nve
thermo 5
run 5
""".strip().splitlines())
    r = s.thermo_rows[-1]
    sim = s._sim
    L = np.asarray(sim.sys.box.lengths)
    xu = np.asarray(sim.sys.x) + np.asarray(sim.sys.image) * L
    com = xu.mean(axis=0)
    for d in range(3):
        assert abs(r[f"c_c1[{d + 1}]"] - com[d]) < 1e-10
    rg = np.sqrt(np.mean(np.sum((xu - com) ** 2, axis=1)))
    assert abs(r["c_rg"] - rg) < 1e-10
    # lj units: ke column is normalized per atom, compute ke is extensive
    assert abs(r["c_ek"] - r["ke"] * s.x.shape[0]) < 1e-9
    assert abs(r["c_ep"] - r["pe"] * s.x.shape[0]) < 1e-9


def test_temp_partial_and_com():
    """compute temp/partial (component-selected dof,
    compute_temp_partial.cpp:77-86) and temp/com (vcm-subtracted)."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.0 12345 loop geom mom no
compute tx all temp/partial 1 0 0
compute tc all temp/com
compute tfull all temp
fix 1 all nve
velocity all set NULL NULL NULL
run 0
""".strip().splitlines())
    r = s.thermo_rows[-1]
    sim = s._sim
    v = np.asarray(sim.sys.v)
    n = v.shape[0]
    # temp/partial x: ke_x / (0.5 * dof_partial * kB)
    dof_px = 1 * n - (1 / 3) * 3
    t_ref = np.sum(v[:, 0] ** 2) / dof_px
    assert abs(r["c_tx"] - t_ref) < 1e-10, (r["c_tx"], t_ref)
    # temp/com: subtract vcm
    vcm = v.mean(axis=0)
    ke2 = np.sum((v - vcm) ** 2)
    t_com = ke2 / (3 * n - 3)
    assert abs(r["c_tc"] - t_com) < 1e-10
    # with mom no, vcm != 0 so temp/com < temp
    assert r["c_tc"] <= r["c_tfull"] + 1e-12


def test_fix_print_and_ave_time(tmp_path):
    """fix print (fix_print.cpp) and fix ave/time (fix_ave_time.cpp)."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    msgs = []
    s = LammpsScript(log=lambda *a: msgs.append(" ".join(map(str, a))))
    s.root = str(tmp_path)
    s.execute("""
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
compute tt all temp
fix 1 all nve
fix 2 all print 20 "T=${temp} step=${step}"
fix 3 all ave/time 10 5 50 c_tt file ave.out
run 100
""".strip().splitlines())
    prints = [m for m in msgs if m.startswith("T=")]
    assert len(prints) >= 5
    assert "step=20" in prints[0] or "step=" in prints[0]
    data = np.loadtxt(tmp_path / "ave.out")
    data = np.atleast_2d(data)
    assert data.shape[0] >= 2           # rows at steps 50 and 100
    assert np.all(np.isfinite(data[:, 1]))
    # averaged temp near the run's temperatures
    assert 0.2 < data[-1, 1] < 1.2
