"""dump atom style, fix setforce, run upto, group region/union/subtract."""

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
region bot block INF INF INF 1.0 INF INF
group bottom region bot
group top subtract all bottom
group both union top bottom
velocity all create 1.0 87287 loop geom
fix 1 all nve
fix 2 bottom setforce 0.0 NULL 0.0
"""


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    from lidp_tpu.api import lammps

    d = tmp_path_factory.mktemp("misc")
    L = lammps()
    L.commands_string(SETUP)
    L.command(f"dump 1 all atom 10 {d}/dump.atom")
    L.command("run 20")
    L.command("run 30 upto")
    return L, d


def test_groups(sim):
    L, _ = sim
    s = L.lmp
    nb = int(s.groups["bottom"].sum())
    assert 0 < nb < 108
    assert s.groups["top"].sum() == 108 - nb
    assert s.groups["both"].all()


def test_setforce_zeroes_components(sim):
    L, _ = sim
    f = L.extract_atom("f")
    gm = L.lmp.groups["bottom"]
    assert np.abs(f[gm][:, 0]).max() == 0.0
    assert np.abs(f[gm][:, 2]).max() == 0.0
    assert np.abs(f[gm][:, 1]).max() > 0.0      # NULL keeps y
    assert np.abs(f[~gm]).max() > 0.0


def test_run_upto_and_dump_atom(sim):
    L, d = sim
    assert L.extract_global("ntimestep") == 30   # run 30 upto
    txt = (d / "dump.atom").read_text()
    assert "ITEM: ATOMS id type xs ys zs" in txt
    # scaled coordinates within [0,1)
    rows = [ln.split() for ln in txt.splitlines()
            if len(ln.split()) == 5 and ln.split()[0].isdigit()]
    xs = np.array([[float(v) for v in r[2:]] for r in rows])
    assert xs.min() >= 0.0 and xs.max() <= 1.0


def test_timer_timeout_ends_run_early():
    """timer timeout (timer.cpp modify_params + Timer::check_timeout,
    verlet.cpp:241): an exhausted walltime budget ends the run cleanly at
    the next chunk boundary instead of completing all steps."""
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(SETUP)
    L.command("timer timeout 0:0:0")
    L.command("run 100")
    assert L.extract_global("ntimestep") == 0     # budget gone before step 1
    # a fresh unlimited budget lets the next run proceed
    L.command("timer timeout unlimited")
    L.command("run 10")
    assert L.extract_global("ntimestep") == 10


def test_timer_timeout_parse_formats():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.one("timer timeout 3600")
    assert s._timer_timeout == 3600.0
    s.one("timer timeout 1:30")
    assert s._timer_timeout == 90.0
    s.one("timer loop timeout 2:00:00 every 50")
    assert s._timer_timeout == 7200.0 and s._timer_mode == "loop"
    s.one("timer timeout off")
    assert s._timer_timeout is None


def test_thermo_modify_format_float(tmp_path):
    """thermo_modify format float %.15g (thermo.cpp:586) widens every float
    thermo column in the log."""
    from lidp_tpu.api import lammps

    log = tmp_path / "log.fmt"
    L = lammps(cmdargs=["-log", str(log)])
    L.commands_string(SETUP)
    L.command("thermo_modify format float %.15g")
    L.command("run 0")
    txt = log.read_text()
    row = [ln for ln in txt.splitlines() if ln.startswith("0 ")][-1]
    vals = row.split()
    # default %.8g prints at most 8 significant digits; %.15g keeps 15
    assert any(len(v.replace("-", "").replace(".", "").lstrip("0")) > 9
               for v in vals[1:]), row
