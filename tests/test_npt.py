"""fix npt / nph — Nose-Hoover + MTK barostat (fix_nh.cpp).

LJ liquid under iso coupling must regulate BOTH temperature and pressure to
their targets; z-only (rhodo-style) coupling must dilate only z.
"""

import numpy as np
import pytest

NPT_INPUT = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.0 87287 loop geom
fix 1 all npt temp 1.0 1.0 0.5 iso 1.0 1.0 5.0
thermo 100
"""


@pytest.fixture(scope="module")
def npt_run():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute(NPT_INPUT.strip().splitlines())
    s.one("run 3000")
    return s


def test_npt_regulates_pressure_and_temperature(npt_run):
    rows = npt_run.thermo_rows
    assert len(rows) >= 20
    # averages over the equilibrated second half
    half = rows[len(rows) // 2:]
    press = np.mean([r["press"] for r in half])
    temp = np.mean([r["temp"] for r in half])
    assert abs(temp - 1.0) < 0.1, f"temp {temp}"
    assert abs(press - 1.0) < 0.3, f"press {press}"


def test_npt_volume_responds(npt_run):
    rows = npt_run.thermo_rows
    v0, vend = rows[0]["vol"], rows[-1]["vol"]
    # fcc 0.8442 at T=1 has P ~ +5; the box must expand toward P=1
    assert vend > v0 * 1.02, f"vol {v0} -> {vend}"


def test_npt_z_only_dilates_z():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute(NPT_INPUT.replace(
        "fix 1 all npt temp 1.0 1.0 0.5 iso 1.0 1.0 5.0",
        "fix 1 all npt temp 1.0 1.0 0.5 z 1.0 1.0 5.0 &\n    mtk no pchain 0 tchain 1").strip().splitlines())
    s.one("run 200")
    sys = s._sim.sys
    L = np.asarray(sys.box.hi) - np.asarray(sys.box.lo)
    L0 = s.box_hi - s.box_lo
    assert abs(L[0] - L0[0]) < 1e-12 and abs(L[1] - L0[1]) < 1e-12
    assert abs(L[2] - L0[2]) > 1e-3


def test_nph_no_thermostat():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute(NPT_INPUT.replace(
        "fix 1 all npt temp 1.0 1.0 0.5 iso 1.0 1.0 5.0",
        "fix 1 all nph iso 1.0 1.0 5.0").strip().splitlines())
    s.one("run 200")
    rows = s.thermo_rows
    assert np.isfinite(rows[-1]["press"])
    # no thermostat: eta chain untouched
    ist = s._sim.istate
    assert float(np.abs(np.asarray(ist.eta_dot)).max()) == 0.0


def test_npt_pressure_ramp():
    """fix npt with Pstart != Pstop: the barostat target ramps over the
    run (FixNH::compute_press_target) — density must increase toward the
    higher final pressure."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.0 12345 loop geom
fix 1 all npt temp 1.0 1.0 0.5 iso 0.5 6.0 2.0
thermo 200
run 1600
""".strip().splitlines())
    rows = {int(r["step"]): r for r in s.thermo_rows}
    v0 = rows[0]["vol"]
    v_end = rows[1600]["vol"]
    # ramping P 0.5 -> 6.0 must compress the box substantially
    assert v_end < 0.85 * v0, (v0, v_end)
    # late-run pressure approaches the ramped (high) target
    assert rows[1600]["press"] > 2.0, rows[1600]["press"]
