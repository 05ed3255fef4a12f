"""compute group/group (compute_group_group.cpp) and velocity set/zero/scale
(velocity.cpp)."""

import numpy as np
import pytest

SETUP = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 2 box
create_atoms 1 box
set type 1 type/fraction 2 0.5 777
mass 1 1.0
mass 2 1.5
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
pair_coeff 2 2 0.5 0.9 2.5
group one type 1
group two type 2
compute gg one group/group two
compute g11 one group/group one
fix 1 all nve
"""


@pytest.fixture(scope="module")
def lmp():
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(SETUP)
    yield L
    L.close()


def test_group_group_partition(lmp):
    """E(one,two) + E(one,one) + E(two,two) == total evdwl."""
    lmp.command("compute g22 two group/group two")
    e12 = lmp.extract_compute("gg")
    e11 = lmp.extract_compute("g11")
    e22 = lmp.extract_compute("g22")
    total = lmp.get_thermo("evdwl") * lmp.get_natoms()  # lj units normalize
    assert abs((e12 + e11 + e22) - total) < 1e-9 * max(1.0, abs(total))
    assert e12 != 0.0 and e11 != 0.0


def test_velocity_set_and_zero(lmp):
    n = lmp.get_natoms()
    lmp.command("velocity all set 0.1 NULL 0.0")
    v = lmp.extract_atom("v")
    # velocity default units are LATTICE (velocity.cpp scale_flag=1):
    # vx = 0.1 * xlattice with xlattice = (4/0.8442)^(1/3)
    xlat = (4.0 / 0.8442) ** (1.0 / 3.0)
    assert np.allclose(v[:, 0], 0.1 * xlat) and np.allclose(v[:, 2], 0.0)
    lmp.command("velocity all zero linear")
    v = lmp.extract_atom("v")
    m = lmp.extract_atom("mass")[lmp.extract_atom("type")]
    assert np.abs((m[:, None] * v).sum(0)).max() < 1e-12


def test_velocity_scale(lmp):
    lmp.command("velocity all create 1.0 12345 loop geom")
    lmp.command("velocity all scale 0.5")
    assert abs(lmp.get_thermo("temp") - 0.5) < 1e-10
