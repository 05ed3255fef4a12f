"""Golden-log parity for polarization/examples/MOF5+Methane, driven through
the LAMMPS-script interpreter (the full stack: data file, groups, computes,
frozen framework, rigid sub-group, SCF polarization).

Golden rows from log.lammps (LAMMPS 2 Feb 2013 build, 5 steps, 1324 atoms,
Pair time 99.73%): e.g. step 0:
  TotEng 28664530  KinEng 536.5888  E_vdwl 28709884  E_coul -33263.466
  E_long -12621.609  E_pol -5.9227026  Temp 288.94771  movingtemp 294.67669
"""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

SRC = "/root/reference/polarization/examples/MOF5+Methane"


@pytest.fixture(scope="module")
def rows(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mof5_methane")
    shutil.copy(os.path.join(SRC, "MOF5+PCRC.restart.pdb.data"), tmp)
    with open(os.path.join(SRC, "MOF5+PCRC.restart.pdb.input")) as fh:
        text = fh.read()
    text = text.replace("equal  100000 # number of steps",
                        "equal  5 # number of steps")
    path = os.path.join(tmp, "in.mof5")
    with open(path, "w") as fh:
        fh.write(text)

    script = LammpsScript(dtype=jnp.float64)
    script.file(path)
    return script.thermo_rows


GOLDEN = {
    0: dict(etotal=28664530.0, ke=536.5888, evdwl=28709884.0,
            ecoul=-33263.466, elong=-12621.609, epol=-5.9227026,
            temp=288.94771, c_movingtemp=294.67669),
    5: dict(ke=534.60054, ecoul=-33263.696, elong=-12621.612,
            epol=-5.998442, temp=287.87705, c_movingtemp=291.32483),
}

TOL = dict(
    etotal=dict(rel=1e-6), ke=dict(rel=1e-5), evdwl=dict(rel=1e-6),
    ecoul=dict(rel=3e-6), elong=dict(rel=1e-5), epol=dict(rel=2e-4),
    temp=dict(rel=1e-5), c_movingtemp=dict(rel=1e-4),
)


def test_thermo_rows(rows):
    assert len(rows) >= 6
    by_step = {int(r["step"]): r for r in rows}
    for step, golden in GOLDEN.items():
        for key, val in golden.items():
            assert by_step[step][key] == pytest.approx(val, **TOL[key]), (
                step, key, by_step[step][key])
