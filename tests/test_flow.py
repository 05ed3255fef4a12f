"""examples/flow Couette golden parity (log.5Oct16.flow.couette.g++.1).

Exercises boundary p s p shrink-wrap in ONE dim, hex lattice, sub-group
temp/rescale with fix_modify temp (bias compute group), boundary-group
velocity set + setforce walls, and thermo_modify temp.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

FLOW = "/root/reference/examples/flow"

# Step Temp E_pair TotEng Press Volume (log:~70)
GOLD = {
    0: (1.0, 0.0, 0.71190476, 0.52314537, 571.54286),
    500: (1.0644427, -0.31382888, 0.44395296, 3.0013076, 571.54286),
}


@pytest.fixture(scope="module")
def flow():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = FLOW
    lines = []
    for ln in open(f"{FLOW}/in.flow.couette").read().splitlines():
        t = ln.split("#")[0].strip()
        if t.startswith("run"):
            ln = "run 500"
        lines.append(ln)
    s.execute(lines)
    return s


def test_flow_step0_exact(flow):
    r = flow.thermo_rows[0]
    t, ep, et, p, v = GOLD[0]
    assert abs(r["temp"] - t) < 1e-9
    assert abs(r["epair"] - ep) < 1e-9
    assert abs(r["etotal"] - et) < 1e-7
    assert abs(r["press"] - p) < 1e-7
    assert abs(r["vol"] - v) < 1e-4


def test_flow_step500(flow):
    rows = {int(r["step"]): r for r in flow.thermo_rows}
    t, ep, et, p, v = GOLD[500]
    r = rows[500]
    # driven steady shear; rows should track the golden closely
    assert abs(r["temp"] - t) < 0.05, r["temp"]
    assert abs(r["epair"] - ep) < 0.05, r["epair"]
    assert abs(r["etotal"] - et) < 0.05, r["etotal"]


def test_flow_poiseuille_step0():
    """The Poiseuille variant: setforce with NULL components, aveforce on
    a sub-group, addforce driving the flow region."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = FLOW
    lines = []
    for ln in open(f"{FLOW}/in.flow.pois").read().splitlines():
        t = ln.split("#")[0].strip()
        if t.startswith("run"):
            ln = "run 100"
        lines.append(ln)
    s.execute(lines)
    r = s.thermo_rows[0]
    assert abs(r["temp"] - 1.0) < 1e-9
    assert abs(r["epair"] - 0.0) < 1e-9
    rows = {int(rr["step"]): rr for rr in s.thermo_rows}
    assert np.isfinite(rows[100]["etotal"])
