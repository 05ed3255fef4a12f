"""pair_write (Pair::write_file / single()) and write_data (write_data.cpp
inverse of read_data)."""

import numpy as np
import pytest


def test_pair_write_table(tmp_path):
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string("""
units lj
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
""")
    out = tmp_path / "lj.table"
    L.command(f"pair_write 1 1 500 r 0.8 2.5 {out} LJ11")
    txt = out.read_text()
    assert "N 500 R 0.8 2.5" in txt and "LJ11" in txt
    rows = np.array([[float(v) for v in ln.split()]
                     for ln in txt.splitlines()
                     if ln and ln[0].isdigit()])
    assert rows.shape == (500, 4)
    r, e, f = rows[:, 1], rows[:, 2], rows[:, 3]
    # analytic LJ at a few points
    for k in (0, 250, 498):
        ee = 4.0 * (r[k]**-12 - r[k]**-6)
        ff = 24.0 * (2.0 * r[k]**-12 - r[k]**-6) / r[k]
        if r[k] < 2.5:
            assert abs(e[k] - ee) < 1e-10 * max(1, abs(ee))
            assert abs(f[k] - ff) < 1e-9 * max(1, abs(ff))
    # F = -dE/dr numerically along the table (interior points)
    dr = r[1] - r[0]
    fd = -(e[2:] - e[:-2]) / (2 * dr)     # at r[1:-1]
    # last interior point straddles the (unshifted) cutoff energy jump;
    # atol covers the F=0 crossing at r = 2^(1/6)
    assert np.allclose(fd[:-1], f[1:-2], rtol=2e-3, atol=1e-2)
    L.close()


def test_pair_write_rejects_bad_args(tmp_path):
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string("""
units lj
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
""")
    with pytest.raises(ValueError, match="Invalid cutoffs"):
        L.command(f"pair_write 1 1 50 r 3.0 2.5 {tmp_path}/x.table T")
    with pytest.raises(ValueError, match="Invalid style"):
        L.command(f"pair_write 1 1 50 bitmap 0.8 2.5 {tmp_path}/x.table T")
    L.close()


def test_write_data_roundtrip(tmp_path):
    """write_data then read_data reproduces coordinates, charges, bonds and
    the step-0 energies."""
    import sys as _s

    _s.path.insert(0, "/root/repo/tests")
    from test_shake import _water_data

    from lidp_tpu.api import lammps

    (tmp_path / "water.data").write_text(_water_data())
    setup = """
units real
atom_style full
bond_style harmonic
angle_style harmonic
pair_style lj/cut/coul/long 8.0 8.0
kspace_style ewald 1.0e-4
read_data {data}
pair_coeff 1 1 0.1521 3.1507
pair_coeff 2 2 0.0 0.0
bond_coeff 1 450.0 0.9572
angle_coeff 1 55.0 104.52
special_bonds lj/coul 0.0 0.0 0.0
fix 1 all nve
"""
    L1 = lammps()
    L1.commands_string(setup.format(data=tmp_path / "water.data"))
    pe1 = L1.get_thermo("pe")
    L1.command(f"write_data {tmp_path}/out.data")
    x1 = L1.extract_atom("x")
    q1 = L1.extract_atom("q")
    L1.close()

    L2 = lammps()
    L2.commands_string(setup.format(data=tmp_path / "out.data"))
    np.testing.assert_allclose(L2.extract_atom("x"), x1, atol=1e-12)
    np.testing.assert_allclose(L2.extract_atom("q"), q1, atol=1e-14)
    assert abs(L2.get_thermo("pe") - pe1) < 1e-9 * max(1.0, abs(pe1))
    L2.close()
