"""Library API (lidp_tpu.api) — the python/lammps.py analog.

Drives a small LJ melt entirely through the lammps class: commands,
get_natoms, get_thermo, extract_atom, scatter_atoms, extract_global,
variables, and the PyLammps attribute-call wrapper.
"""

import numpy as np
import pytest

SETUP = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
neighbor 0.3 bin
fix 1 all nve
"""


@pytest.fixture(scope="module")
def lmp():
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(SETUP)
    yield L
    L.close()


def test_natoms_and_globals(lmp):
    assert lmp.get_natoms() == 4 * 4**3
    assert lmp.extract_global("ntypes") == 1
    assert lmp.extract_global("boltz") == 1.0
    lo, hi, _, _, _, per, _ = lmp.extract_box()
    assert per == [1, 1, 1]
    assert hi[0] > lo[0]


def test_thermo_before_and_after_run(lmp):
    t0 = lmp.get_thermo("temp")
    assert abs(t0 - 1.44) < 1e-6          # velocity create target
    pe0 = lmp.get_thermo("pe")
    assert pe0 < 0                         # bound LJ crystal
    lmp.command("run 10")
    assert lmp.extract_global("ntimestep") == 10
    e0 = pe0 + lmp.get_thermo("ke") if False else None
    etot = lmp.get_thermo("etotal")
    # NVE conserves E to f64 tolerance over 10 steps
    assert abs(etot - (pe0 + 1.5 * t0 * (1 - 1 / lmp.get_natoms()))) < 1e-3


def test_extract_atom(lmp):
    x = lmp.extract_atom("x")
    v = lmp.extract_atom("v")
    f = lmp.extract_atom("f")
    n = lmp.get_natoms()
    assert x.shape == (n, 3) and v.shape == (n, 3) and f.shape == (n, 3)
    assert np.all(np.isfinite(x))
    t = lmp.extract_atom("type")
    assert t.min() == 1 and t.max() == 1
    ids = lmp.extract_atom("id")
    assert ids[0] == 1 and ids[-1] == n
    with pytest.raises(KeyError):
        lmp.extract_atom("nope")


def test_scatter_atoms_invalidates_forces(lmp):
    pe_before = lmp.get_thermo("pe")
    x = lmp.extract_atom("x")
    x2 = x + 0.01 * np.sin(np.arange(x.size).reshape(x.shape))
    lmp.scatter_atoms("x", x2)
    pe_after = lmp.get_thermo("pe")
    assert pe_after != pe_before           # forces recomputed on new coords
    lmp.scatter_atoms("x", x)              # restore
    assert abs(lmp.get_thermo("pe") - pe_before) < 1e-9


def test_variables(lmp):
    lmp.set_variable("myvar", 3.5)
    assert lmp.extract_variable("myvar") == 3.5
    lmp.command("variable two equal 2.0")
    assert lmp.extract_variable("two") == 2.0


def test_pylammps_wrapper():
    from lidp_tpu.api import PyLammps

    L = PyLammps()
    L.units("lj")
    L.lattice("fcc", 0.8442)
    L.region("box", "block", 0, 2, 0, 2, 0, 2)
    L.create_box(1, "box")
    L.create_atoms(1, "box")
    L.mass(1, 1.0)
    L.pair_style("lj/cut", 2.5)
    L.pair_coeff(1, 1, 1.0, 1.0, 2.5)
    L.fix(1, "all", "nve")
    assert L.atoms == 4 * 2**3
    assert L.eval("pe") < 0


def test_cmdargs_var_and_log(tmp_path):
    from lidp_tpu.api import lammps

    logf = tmp_path / "api.log"
    L = lammps(cmdargs=["-log", str(logf), "-var", "rho", "0.8442"])
    L.commands_string("""
units lj
lattice fcc ${rho}
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
run 0
""")
    assert L.get_natoms() == 32
    L.close()
    assert logf.exists() and "Step" in logf.read_text()
