"""fix pour (fix_pour.cpp, ATOM mode): granular particle insertion —
free-fall nfreq/nper derivation, squared-biased insertion height, exact
RanPark draw order (xyz/radius/velocity/density), overlap rejection, and
the free-fall-matched initial velocity.

GOLDEN rows minted from the REBUILT 16Mar18 reference
(/tmp/lmpsrc/lmp_serial + allocation patch) on the identical 2-seed-grain
box this test regenerates.  Columns: step atoms ke c_rot (norm no).

Case one: nper >= ninsert (one insertion event, 10 grains, diam one).
Case multi: nper=2, events every 129 steps (5 events incl. a partial
last), diam range + dens range + vel keywords — every RanPark draw path.
"""

import numpy as np
import pytest

DATA = """pour golden seed box

2 atoms

1 atom types

-3.2 3.2 xlo xhi
-3.2 3.2 ylo yhi
0.0 12.0 zlo zhi

Atoms

1 1 1.0 1.0 -1.1 0.4 0.5
2 1 1.0 1.0 1.3 -0.8 0.5

Velocities

1 0.0 0.0 0.0 0.0 0.0 0.0
2 0.0 0.0 0.0 0.0 0.0 0.0
"""

BASE = """units lj
atom_style sphere
boundary p p f
newton off
comm_modify vel yes
read_data {data}
pair_style gran/hooke/history 400.0 NULL 8.0 NULL 0.5 1
pair_coeff * *
neighbor 0.3 bin
neigh_modify every 1 delay 0 check yes
region ins block -2.5 2.5 -2.5 2.5 8.0 11.5 units box
region ins2 block -2.5 2.5 -2.5 2.5 9.0 10.5 units box
timestep 0.005
fix 1 all gravity 1.0 vector 0 0 -1
fix 2 all nve/sphere
fix w all wall/gran hooke/history 400.0 NULL 8.0 NULL 0.5 1 zplane 0.0 NULL
{pour}
compute rot all erotate/sphere
thermo_style custom step atoms ke c_rot
thermo_modify norm no
thermo 25
run {steps}
"""

GOLDEN = {
    "one": [
        [0, 2, 0.0, 0.0],
        [25, 12, 5.72951983931557, 0.0],
        [50, 12, 6.63014699052024, 0.0],
        [100, 12, 8.67680222340131, 0.0],
        [150, 12, 11.0507181992047, 0.0],
        [200, 12, 13.7518914999265, 0.0],
        [250, 12, 16.7803153067604, 0.0],
    ],
    "multi": [
        [0, 2, 0.0, 0.0],
        [25, 4, 2.58767581452554, 0.0],
        [125, 4, 3.88086335598149, 0.0],
        [150, 6, 8.6147574746494, 0.0],
        [250, 6, 12.1206654120616, 0.0],
        [275, 8, 15.249594124824, 0.0],
        [400, 10, 24.5778042219482, 0.0],
        [500, 10, 32.2569329135838, 0.0],
        [550, 11, 38.3159600010107, 0.0],
        [575, 11, 31.742043776901, 0.00602620308678922],
        [600, 11, 34.2766394435754, 0.00625192696469843],
    ],
}

POUR_LINE = {
    "one": ("fix ins all pour 10 1 4767548 region ins vol 0.4 50 "
            "diam one 1.0", 250),
    "multi": ("fix ins all pour 9 1 2847291 region ins2 vol 0.05 50 "
              "diam range 0.8 1.2 dens 0.9 1.1 vel -0.3 0.3 -0.3 0.3 "
              "-2.0", 600),
}


@pytest.mark.parametrize(
    "case", ["one", pytest.param("multi", marks=pytest.mark.slow)])
def test_pour_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "data.pour").write_text(DATA)
    pour, steps = POUR_LINE[case]
    (tmp_path / "in.pour").write_text(BASE.format(
        data=tmp_path / "data.pour", pour=pour, steps=steps))
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.pour"))
    got = {int(r["step"]): r for r in s.thermo_rows}
    for ref in GOLDEN[case]:
        step = int(ref[0])
        r = got[step]
        assert int(float(r["atoms"])) == int(ref[1]), (
            f"{case} step {step} atoms: {r['atoms']} vs {ref[1]}")
        # free flight is deterministic to fp noise; post-landing rows
        # (multi >= 575) are chaotic bounce — same tier as test_wall_gran
        rel = 1e-9 if (case == "one" or step < 575) else 1e-4
        for name, o, g in zip(("ke", "c_rot"),
                              (r["ke"], r["c_rot"]), ref[2:]):
            assert float(o) == pytest.approx(g, rel=rel, abs=1e-12), (
                f"{case} step {step} {name}: {float(o)} vs {g}")
