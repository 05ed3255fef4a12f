"""examples/crack golden-log parity (log.5Oct16.crack.g++.1).

Exercises the non-periodic boundary stack: `boundary s s p` shrink-wrap
(Domain::reset_box), hex lattice, INF block regions, group union/subtract,
set group type, velocity create on a sub-group with a named temp compute,
lattice-scaled velocity set/ramp, neigh_modify exclude type, setforce,
and thermo_modify temp.
"""

import pytest

pytestmark = pytest.mark.slow

# Step Temp E_pair TotEng Press  (log.5Oct16.crack.g++.1:101-102)
GOLD = {
    0: (0.065651733, -3.2595015, -3.1987287, -0.036239172),
    200: (0.060086376, -3.2531936, -3.1975725, -0.23125026),
}


@pytest.fixture(scope="module")
def crack():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = "/root/reference/examples/crack"
    lines = open("/root/reference/examples/crack/in.crack").read().splitlines()
    lines = [("run 200" if ln.strip().startswith("run") else ln)
             for ln in lines]
    s.execute(lines)
    return s


def test_crack_created_atoms(crack):
    assert crack.x.shape[0] == 8141          # log: Created 8141 atoms


def test_crack_step0_exact(crack):
    r = crack.thermo_rows[0]
    t, ep, et, p = GOLD[0]
    assert abs(r["temp"] - t) < 5e-9
    assert abs(r["epair"] - ep) < 5e-7
    assert abs(r["etotal"] - et) < 5e-7
    assert abs(r["press"] - p) < 5e-8


def test_crack_step200_trajectory(crack):
    rows = {int(r["step"]): r for r in crack.thermo_rows}
    t, ep, et, p = GOLD[200]
    r = rows[200]
    assert abs(r["temp"] - t) < 1e-7
    assert abs(r["epair"] - ep) < 1e-6
    assert abs(r["etotal"] - et) < 1e-6
    # with Neighbor::decide displacement-check semantics the shrink-wrap
    # rebuild schedule matches the reference, so Press (which carries the
    # stale box volume) now agrees to all printed digits
    assert abs(r["press"] - p) < 1e-6


def test_crack_box_shrinkwrap(crack):
    import numpy as np

    # after 200 steps the pulled boundary has expanded the box; Volume at
    # step 200 in the log is 8638.8101 (vs 8605.5917 at step 0)
    sim = crack._sim
    L = np.asarray(sim.sys.box.lengths)
    area = L[0] * L[1]
    assert 8600.0 < area < 8700.0
    assert sim.sys.box.periodic == (False, False, True)
