"""Golden-log parity for polarization/examples/MOF5+Methane, driven through
the LAMMPS-script interpreter (the full stack: data file, groups, computes,
frozen framework, rigid sub-group, SCF polarization).

Two golden tiers:

1. The committed log (LAMMPS 2 Feb 2013 build, 5 steps, 1324 atoms) at
   *erfc-table* tolerances: the reference evaluates the real-space erfc via a
   12-bit lookup table (ncoultablebits, Pair::init_tables pair.cpp:313); we
   evaluate the A&S polynomial exactly.  Root-caused in round 2 by rebuilding
   the reference from this exact source (with the atom-array allocation
   defect SURVEY.md section 0.1 patched) and rerunning: with
   `pair_modify table 0` the rebuilt reference reproduces OUR ecoul to
   2e-10 (step 5), while with the default table it reproduces the committed
   2013 log to every printed digit.  So ecoul rel 3e-6 below is the
   reference's table interpolation error, not ours.

2. A full-precision golden (thermo_modify format %.15g) from that rebuilt
   table-0 reference run, matched tightly: step-0 epol to 1e-12, step-5
   ecoul/elong to ~1e-9.  The step-5 epol tolerance (5e-7) is the SCF
   stopping-tolerance floor: both solvers (reference ranked Gauss-Seidel,
   ours CG) stop at precision 1e-11 with different residual *directions*,
   and use_previous warm-starts compound that over 5 steps; everything else
   agrees at 1e-8 or better.
"""

import os
import re
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

SRC = "/root/reference/polarization/examples/MOF5+Methane"


@pytest.fixture(scope="module")
def script(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mof5_methane")
    shutil.copy(os.path.join(SRC, "MOF5+PCRC.restart.pdb.data"), tmp)
    with open(os.path.join(SRC, "MOF5+PCRC.restart.pdb.input")) as fh:
        text = fh.read()
    assert re.search(r"variable  nstep      equal  5\b", text)
    path = os.path.join(tmp, "in.mof5")
    with open(path, "w") as fh:
        fh.write(text)

    script = LammpsScript(dtype=jnp.float64)
    script.file(path)
    return script


@pytest.fixture(scope="module")
def rows(script):
    return script.thermo_rows


GOLDEN = {
    0: dict(etotal=28664530.0, ke=536.5888, evdwl=28709884.0,
            ecoul=-33263.466, elong=-12621.609, epol=-5.9227026,
            temp=288.94771, c_movingtemp=294.67669),
    5: dict(ke=534.60054, ecoul=-33263.696, elong=-12621.612,
            epol=-5.998442, temp=287.87705, c_movingtemp=291.32483),
}

TOL = dict(
    etotal=dict(rel=1e-6), ke=dict(rel=1e-6), evdwl=dict(rel=1e-6),
    ecoul=dict(rel=3e-6),   # reference 12-bit erfc table (see module doc)
    elong=dict(rel=1e-6),
    epol=dict(rel=5e-7),    # SCF 1e-11 stopping-tolerance floor over 5 steps
    temp=dict(rel=1e-6), c_movingtemp=dict(rel=1e-5),
)

# Rebuilt-reference full-precision golden (table 0, %.15g thermo): the same
# 2018 source tree this repo is judged against, erfc evaluated exactly.
GOLDEN_HP = {
    0: dict(etotal=28664529.9144434, ke=536.588802473299,
            evdwl=28709884.3316078, ecoul=-33263.4741488414,
            elong=-12621.6091154757, epol=-5.92270256835963,
            temp=288.947710143389, c_movingtemp=294.676691770976),
    5: dict(etotal=28664529.9094351, ke=534.600540956414,
            evdwl=28709886.6244105, ecoul=-33263.7047653392,
            elong=-12621.6123089666, epol=-5.99844199705221,
            temp=287.877051177302, c_movingtemp=291.324829781667),
}

TOL_HP = {
    0: dict(etotal=dict(rel=1e-9), ke=dict(rel=1e-10),
            evdwl=dict(rel=1e-9), ecoul=dict(rel=1e-10),
            elong=dict(rel=1e-11), epol=dict(rel=1e-12),
            temp=dict(rel=1e-10), c_movingtemp=dict(rel=1e-10)),
    5: dict(etotal=dict(rel=1e-8), ke=dict(rel=2e-7),
            evdwl=dict(rel=1e-8), ecoul=dict(rel=1e-8),
            elong=dict(rel=1e-9), epol=dict(rel=5e-7),
            temp=dict(rel=2e-7), c_movingtemp=dict(rel=5e-7)),
}


def test_thermo_rows(rows):
    assert len(rows) >= 6
    by_step = {int(r["step"]): r for r in rows}
    for step, golden in GOLDEN.items():
        for key, val in golden.items():
            assert by_step[step][key] == pytest.approx(val, **TOL[key]), (
                "2013-log", step, key, by_step[step][key])


def test_thermo_rows_full_precision(rows):
    by_step = {int(r["step"]): r for r in rows}
    for step, golden in GOLDEN_HP.items():
        for key, val in golden.items():
            assert by_step[step][key] == pytest.approx(
                val, **TOL_HP[step][key]), (
                "rebuilt-reference", step, key, by_step[step][key])


def test_moving_dump_parity(script):
    """Per-atom position parity vs the committed sorbate dump
    (MOF5+PCRC.restart.pdb.dump: group moving, sort id, every step,
    frames 0-5, 3-decimal wrapped coords)."""
    frames = []
    with open(os.path.join(SRC, "MOF5+PCRC.restart.pdb.dump")) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        n = int(lines[i + 3])
        body = lines[i + 9:i + 9 + n]
        frames.append(np.array([[float(v) for v in ln.split()[:3]]
                                for ln in body]))
        i += 9 + n
    assert len(frames) == 6

    sim = script._sim
    moving = np.asarray(script.groups["moving"])
    L = float(2 * 12.8345)
    x_final = np.asarray(sim.sys.x)[:script.x.shape[0]][moving]
    theirs = frames[5]
    assert theirs.shape == x_final.shape
    d = x_final - theirs
    d -= L * np.round(d / L)
    # 3-decimal dump quantization + 5 steps of SCF-residual divergence
    assert np.abs(d).max() < 2e-3, np.abs(d).max()

    # frame 0 == the data-file sorbate coordinates exactly (5e-4 rounding)
    x0 = np.asarray(script.data.x)[moving]
    d0 = x0 - frames[0]
    d0 -= L * np.round(d0 / L)
    assert np.abs(d0).max() < 6e-4
