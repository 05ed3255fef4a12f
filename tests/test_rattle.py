"""fix rattle — SHAKE + velocity-stage constraint (RIGID/fix_rattle.cpp).

Same TIP3P-like water as test_shake, integrated with `fix rattle`: on top of
the position-manifold checks, the velocity constraint r_c . (v_p - v_q) = 0
must hold to tight tolerance after every step (vrattle, fix_rattle.cpp:240),
which plain SHAKE does NOT guarantee.
"""

import numpy as np
import pytest

from tests.test_shake import R_OH, THETA, WATER_SCRIPT, _water_data


@pytest.fixture(scope="module")
def water_rattle(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    d = tmp_path_factory.mktemp("rattle")
    (d / "water.data").write_text(_water_data())
    script = WATER_SCRIPT.replace("fix 1 all shake", "fix 1 all rattle")
    s = LammpsScript()
    s.execute(script.format(data=d / "water.data").strip().splitlines())
    s.one("run 50")
    return s


def _constraint_geometry(s):
    sim = s._sim
    x = np.asarray(sim.sys.x)[:s.x.shape[0]]
    v = np.asarray(sim.sys.v)[:s.x.shape[0]]
    L = np.asarray(sim.sys.box.lengths)
    nmol = len(x) // 3
    out = []
    for m in range(nmol):
        o, h1, h2 = 3 * m, 3 * m + 1, 3 * m + 2
        for a, b in ((o, h1), (o, h2), (h1, h2)):
            r = x[a] - x[b]
            r -= L * np.round(r / L)
            out.append((r, v[a] - v[b]))
    return out


def test_rattle_positions_on_manifold(water_rattle):
    th = np.deg2rad(THETA)
    d_hh = 2.0 * R_OH * np.sin(th / 2)
    targets = [R_OH, R_OH, d_hh]
    for i, (r, _) in enumerate(_constraint_geometry(water_rattle)):
        assert abs(np.linalg.norm(r) - targets[i % 3]) < 5e-4


def test_rattle_velocities_on_manifold(water_rattle):
    """r_c . v_rel == 0 after the velocity stage — the RATTLE guarantee."""
    for r, dv in _constraint_geometry(water_rattle):
        # tolerance: units real, |v| ~ 1e-2 A/fs, |r| ~ 1 A
        assert abs(np.dot(r, dv)) < 1e-7, (r, dv)


def test_rattle_energy_finite(water_rattle):
    rows = water_rattle.thermo_rows
    assert np.isfinite(rows[-1]["etotal"])
