"""Rebuilt-reference full-precision goldens for the two remaining
polarization examples: MOF5+H2 and SIFSIX-2-Cu-i+CO2.

The committed logs for these examples are truncated, so round 3 rebuilt the
reference from the judged source tree (the round-2 MOF5+Methane technique:
allocation defect SURVEY.md section 0.1 patched into atom_vec_full; the
2018-absent accelerator_omp.h stubbed; `pair_modify table 0` so erfc is
exact; `thermo_modify format float %.15g`).  Rebuild recipe notes:

* MOF5+H2: `neigh_modify exclude molecule all` is pre-2015 syntax; the 2018
  tree spells it `molecule/intra` (neighbor.cpp:2305).  Our grammar accepts
  both.  The run is physically tame and our rows match the rebuilt
  reference to every printed %.15g-rounded digit at steps 0/4/8.

* SIFSIX+CO2: the 2018 reference ABORTS in fix rigid's principal-moment
  recheck (fix_rigid.cpp:2084): its linear CO2 bodies carry tiny-mass
  off-axis virtual sites whose recomputed moment (~2e-5) exceeds the
  absolute TOLERANCE=1e-6.  For golden generation that check was relaxed to
  a relative one (check-only change).  Even then, the reference's rigid
  integrator amplifies the near-singular inertia axis (I3 only ~2x the
  EPSILON*max zeroing threshold, so it is NOT zeroed and omega3 = L3/I3
  explodes): under plain rigid/NVE its own TotEng grows +47 kcal/mol in ONE
  1-fs step (60793588.4 -> 60793635.9), essentially all of it in one CO2
  body, while step-0 forces agree with ours to ~1e-3 abs.  Our no-squish
  integrator conserves (TotEng drift < 1e-7 over 8 steps).  The golden is
  therefore the STEP-0 row (physics, not integrator pathology); the
  conservation contrast is asserted as its own test.

  The step-0 epol tolerance is 2e-5 rel: this system has near-overlapped
  atoms (E_vdwl ~ 6e7 kcal/mol), so the dipole system is ill-conditioned
  and the reference's ranked-GS and our CG stop at measurably different
  points despite the shared 1e-11 change criterion.  evdwl 5e-8 rel is
  f64 summation-order noise at the 6e7 scale.
"""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

SIFSIX = "/root/reference/polarization/examples/SIFSIX-2-Cu-i+CO2"
MOF5H2 = "/root/reference/polarization/examples/MOF5+H2"


def _run(tmp, data_src, data_name, input_src, nsteps, extra_sub=()):
    from lidp_tpu.io.script import LammpsScript

    shutil.copy(os.path.join(data_src, data_name), tmp)
    text = open(input_src).read()
    # cut at the first run command, append a short run
    for marker in ("run    50000", "run    ${nstep_eq}"):
        if marker in text:
            text = text.partition(marker)[0]
            break
    for old, new in extra_sub:
        text = text.replace(old, new)
    text += f"run {nsteps}\n"
    path = os.path.join(tmp, "in.golden")
    open(path, "w").write(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(path)
    return s


COLS = ("etotal", "ke", "pe", "evdwl", "ecoul", "elong", "epol", "temp",
        "press", "c_movingtemp")


def _row(vals):
    return dict(zip(COLS, vals))


MOF5H2_GOLDEN = {
    0: _row((-16523.1320900236, 620.778991259041, -17143.9110812826,
             -138.913039031495, -16.8237251807373, -16983.2767739228,
             -4.89754314757222, 284.765479130816, -233.089794382082,
             289.977153091324)),
    4: _row((-16522.7323033357, 619.645092857492, -17142.3773961932,
             -138.640589021927, -15.6294163773591, -16983.29433065,
             -4.81306014396531, 284.245334077344, 891.0660570177,
             288.739410957573)),
    8: _row((-16522.6442924484, 616.195247996099, -17138.8395404445,
             -136.975576673397, -13.7660054154036, -16983.3139538124,
             -4.78400454330338, 282.662811571405, 921.780923757269,
             284.973625298104)),
}

# tolerances: step 0 tight (same state, exact erfc); steps 4/8 allow SCF
# warm-start drift compounding (cf. test_mof5_methane.py TOL_HP)
MOF5H2_TOL = {
    0: dict(etotal=1e-9, ke=1e-10, pe=1e-9, evdwl=1e-9, ecoul=1e-9,
            elong=1e-11, epol=1e-10, temp=1e-10, press=1e-6,
            c_movingtemp=1e-10),
    4: dict(etotal=1e-8, ke=2e-7, pe=1e-8, evdwl=1e-7, ecoul=1e-6,
            elong=1e-9, epol=1e-6, temp=2e-7, press=1e-4,
            c_movingtemp=5e-7),
    8: dict(etotal=1e-8, ke=2e-6, pe=1e-8, evdwl=1e-6, ecoul=1e-5,
            elong=1e-9, epol=1e-5, temp=2e-6, press=1e-3,
            c_movingtemp=5e-6),
}

SIFSIX_GOLDEN0 = _row((60793588.375572, 851.151021695883, 60792737.2245503,
                       60807409.144826, -5955.3591603127, -8673.45055974336,
                       -43.1105556451049, 299.207330682844,
                       1384046412.96336, 308.716840489766))

SIFSIX_TOL0 = dict(etotal=5e-8, ke=1e-10, pe=5e-8, evdwl=5e-8, ecoul=1e-9,
                   elong=1e-11, epol=2e-5, temp=1e-10, press=1e-6,
                   c_movingtemp=1e-10)


@pytest.mark.slow
def test_mof5_h2_golden(tmp_path):
    s = _run(str(tmp_path), MOF5H2, "MOF5+BSSP.restart.pdb.data",
             os.path.join(MOF5H2, "MOF5+BSSP.restart.pdb.input"), 8,
             extra_sub=(("neigh_modify exclude molecule all",
                         "neigh_modify exclude molecule/intra all"),))
    by_step = {int(r["step"]): r for r in s.thermo_rows}
    for step, golden in MOF5H2_GOLDEN.items():
        for key, val in golden.items():
            tol = MOF5H2_TOL[step][key]
            assert by_step[step][key] == pytest.approx(val, rel=tol), (
                step, key, by_step[step][key], val)


@pytest.mark.slow
def test_sifsix_golden_step0_and_conservation(tmp_path):
    # rigid/nve instead of rigid/nvt: the conservation assertion below is
    # only meaningful without a thermostat; step-0 physics is identical
    s = _run(str(tmp_path), SIFSIX, "BIPA+CO2.pdb.data",
             os.path.join(SIFSIX, "BIPA+CO2.pdb.input"), 8,
             extra_sub=(("fix    rigid_nvt moving rigid/nvt molecule temp "
                         "${temperature} ${temperature} 500 tparam 50 1 3",
                         "fix    rigid_nvt moving rigid/nve molecule"),))
    by_step = {int(r["step"]): r for r in s.thermo_rows}
    for key, val in SIFSIX_GOLDEN0.items():
        tol = SIFSIX_TOL0[key]
        assert by_step[0][key] == pytest.approx(val, rel=tol), (
            key, by_step[0][key], val)
    # energy conservation under rigid/NVE where the reference pumps
    # +47 kcal/mol in one step through the near-singular inertia axis
    e0, e8 = by_step[0]["etotal"], by_step[8]["etotal"]
    assert abs(e8 - e0) / abs(e0) < 1e-6, (e0, e8)
