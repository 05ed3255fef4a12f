"""pair_style table (pair_table.cpp): closes the loop with pair_write —
tabulate lj/cut via pair_write, read the table back with pair_style table,
and reproduce the analytic system's energy/forces to interpolation accuracy.
"""

import numpy as np
import pytest

SETUP_LJ = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
"""


def test_pair_write_roundtrip(tmp_path):
    from lidp_tpu.io.script import LammpsScript

    # 1. generate the table from the analytic potential
    s1 = LammpsScript()
    s1.root = str(tmp_path)
    s1.execute(SETUP_LJ.strip().splitlines())
    s1.one("pair_write 1 1 2000 r 0.8 2.5 lj.table LJ11")

    # 2. same system through pair_style table
    s2 = LammpsScript()
    s2.root = str(tmp_path)
    s2.execute(SETUP_LJ.replace(
        "pair_style lj/cut 2.5\npair_coeff 1 1 1.0 1.0 2.5",
        "pair_style table linear 2000\npair_coeff 1 1 lj.table LJ11 2.5")
        .strip().splitlines())
    # identical short melt in both so the compared state has real forces
    for s_ in (s1, s2):
        s_.one("velocity all create 1.0 99 loop geom")
        s_.one("run 5")
    r1 = s1.thermo_rows[-1]
    r2 = s2.thermo_rows[-1]
    assert abs(r1["epair"] - r2["epair"]) < 2e-5, (r1["epair"], r2["epair"])
    f1 = np.asarray(s1._sim.res.f)
    f2 = np.asarray(s2._sim.res.f)
    scale = np.abs(f1).max()
    assert scale > 1.0
    assert np.abs(f1 - f2).max() < 1e-3 * scale


def test_table_dynamics(tmp_path):
    """Short NVE on the tabulated potential conserves energy."""
    from lidp_tpu.io.script import LammpsScript

    s1 = LammpsScript()
    s1.root = str(tmp_path)
    s1.execute(SETUP_LJ.strip().splitlines())
    s1.one("pair_write 1 1 4000 r 0.8 2.5 lj2.table LJ11")

    s = LammpsScript()
    s.root = str(tmp_path)
    s.execute((SETUP_LJ.replace(
        "pair_style lj/cut 2.5\npair_coeff 1 1 1.0 1.0 2.5",
        "pair_style table linear 4000\npair_coeff 1 1 lj2.table LJ11 2.5")
        + "velocity all create 0.5 12345 loop geom\nthermo 50\nrun 100")
        .strip().splitlines())
    rows = {int(r["step"]): r for r in s.thermo_rows}
    e0, e1 = rows[0]["etotal"], rows[100]["etotal"]
    assert abs(e1 - e0) < 5e-3 * max(1.0, abs(e0)), (e0, e1)
