"""examples/micelle golden parity (log.5Oct16.micelle.g++.1).

Exercises fix adapt with an equal-style ramp() variable (soft-potential
push-off), temp/rescale, 2d bonds with special fene, a MID-SCRIPT pair_style
change (soft -> lj/cut with per-pair cutoffs), unfix, reset_timestep, and
sequential runs with state carried through the rebuild.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

MICELLE = "/root/reference/examples/micelle"

# Step Temp E_pair E_mol TotEng Press (stage 1, log:70-76)
GOLD1 = {
    0: (0.45, 0.40003481, 2.2200223e-06, 0.84966203, 0.78952518),
    50: (0.47411013, 0.67721272, 0.057404514, 1.2083323, 1.3375852),
    100: (0.45, 0.73046745, 0.054836584, 1.234929, 2.3196516),
    200: (0.45, 0.78481891, 0.076931503, 1.3113754, 3.0412388),
    1000: (0.45, 0.47691182, 0.08808163, 1.0146185, 6.0177568),
}
# stage 2 after pair_style lj/cut + reset_timestep (log:155)
GOLD2_0 = (0.45, -1.7056163, 0.08808163, -1.1679097, 3.9431686)


@pytest.fixture(scope="module")
def micelle():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = MICELLE
    lines = []
    for ln in open(f"{MICELLE}/in.micelle").read().splitlines():
        t = ln.split("#")[0].strip()
        if t.startswith("run") and t.split()[1] == "60000":
            ln = "run 0"           # stage 2: step-0 parity only
        lines.append(ln)
    s.execute(lines)
    return s


def test_micelle_stage1(micelle):
    rows = {int(r["step"]): r for r in micelle.thermo_rows
            if r is micelle.thermo_rows[0]
            or int(r["step"]) <= 1000}
    # the interpreter appends stage-2 rows after reset_timestep; collect the
    # FIRST occurrence of each step (stage 1)
    rows = {}
    for r in micelle.thermo_rows:
        st = int(r["step"])
        if st not in rows:
            rows[st] = r
    for step, (t, ep, em, et, p) in GOLD1.items():
        r = rows[step]
        assert abs(r["temp"] - t) < 2e-6, (step, r["temp"], t)
        assert abs(r["epair"] - ep) < 2e-5, (step, r["epair"], ep)
        assert abs(r["emol"] - em) < 2e-5, (step, r["emol"], em)
        assert abs(r["etotal"] - et) < 5e-5, (step, r["etotal"], et)


def test_micelle_stage2_step0(micelle):
    # last row = stage-2 step 0 (after unfix adapt, pair_style lj/cut,
    # reset_timestep 0)
    r = micelle.thermo_rows[-1]
    assert int(r["step"]) == 0
    t, ep, em, et, p = GOLD2_0
    assert abs(r["temp"] - t) < 2e-6
    assert abs(r["epair"] - ep) < 5e-5, (r["epair"], ep)
    assert abs(r["emol"] - em) < 2e-5
    assert abs(r["etotal"] - et) < 1e-4
    assert abs(r["press"] - p) < 5e-3
