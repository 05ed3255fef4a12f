"""run_style respa — rRESPA multi-timescale integration (respa.cpp).

Two checks: (1) respa with every loop factor 1 is ALGEBRAICALLY velocity
Verlet — positions must match the verlet driver to near machine precision;
(2) with stiff bonds subcycled 4x on the inner level, the outer timestep can
exceed verlet's stability limit while conserving energy.
"""

import numpy as np
import pytest

from tests.test_shake import _water_data

BASE = """
units real
atom_style full
boundary p p p
bond_style harmonic
angle_style harmonic
pair_style lj/cut 8.0
read_data {data}
pair_coeff 1 1 0.1521 3.1507
pair_coeff 2 2 0.01 1.0
bond_coeff 1 450.0 0.9572
angle_coeff 1 55.0 104.52
special_bonds lj/coul 0.0 0.0 0.0
velocity all create 150.0 87287 loop geom
fix 1 all nve
timestep {dt}
{runstyle}
run {steps}
"""


def _run(tmp_path, dt, steps, runstyle=""):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "water.data").write_text(_water_data())
    s = LammpsScript()
    s.execute(BASE.format(data=tmp_path / "water.data", dt=dt,
                          steps=steps, runstyle=runstyle)
              .strip().splitlines())
    return s


def test_respa_loops1_equals_verlet(tmp_path):
    sv = _run(tmp_path / "v", 0.5, 20)
    sr = _run(tmp_path / "r", 0.5, 20,
              "run_style respa 2 1 bond 1 pair 2")
    xv = np.asarray(sv._sim.sys.x)
    xr = np.asarray(sr._sim.sys.x)
    assert np.abs(xv - xr).max() < 1e-10, np.abs(xv - xr).max()


def test_respa_subcycling_conserves(tmp_path):
    s = _run(tmp_path / "s", 1.0, 200,
             "run_style respa 2 4 bond 1 angle 1 pair 2")
    rows = s.thermo_rows
    e0, e1 = rows[0]["etotal"], rows[-1]["etotal"]
    ke0 = rows[0]["ke"]
    assert np.isfinite(e1)
    # drift small relative to the kinetic energy scale
    assert abs(e1 - e0) < 0.05 * max(abs(ke0), 1.0), (e0, e1)


def _mkdirs(tmp_path):
    for d in ("v", "r", "s"):
        (tmp_path / d).mkdir(exist_ok=True)


@pytest.fixture(autouse=True)
def _dirs(tmp_path):
    _mkdirs(tmp_path)
