"""fix nvt/sphere + npt/sphere + nph/sphere on the generic (non-granular)
path, vs the rebuilt reference.

Central-force pair styles exert no torque, so omega evolves only through
the NH thermostat scale (FixNHSphere::nh_v_temp); the integrators track
the rotational KE tensor as (setup value) x (cumulative scale^2).
Temperature and the barostat's kinetic pressure both include the
rotational terms (compute_temp_sphere.cpp feeds FixNH).  8-sphere
colloid box with nonzero data-file omegas; per-atom masses come from
diameter*density (atom_vec_sphere.cpp).
"""

import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

DATA = """colloid test

8 atoms
1 atom types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Atoms

1 1 2.0 1.2 1.0 1.0 1.0
2 1 2.0 1.2 6.0 1.0 1.0
3 1 2.0 1.2 1.0 6.0 1.0
4 1 2.0 1.2 1.0 1.0 6.0
5 1 2.0 1.2 6.0 6.0 1.0
6 1 2.0 1.2 6.0 1.0 6.0
7 1 2.0 1.2 1.0 6.0 6.0
8 1 2.0 1.2 6.0 6.0 6.0

Velocities

1 0.1 0.0 0.0 0.0 0.0 0.1
2 -0.1 0.1 0.0 0.1 0.0 0.0
3 0.0 -0.1 0.1 0.0 0.1 0.0
4 0.1 0.0 -0.1 0.0 0.0 -0.1
5 -0.1 -0.1 0.0 -0.1 0.0 0.0
6 0.0 0.1 0.1 0.0 -0.1 0.0
7 0.1 0.1 -0.1 0.1 0.1 0.0
8 -0.1 0.0 0.1 0.0 0.0 0.1
"""

HEAD = """units lj
atom_style sphere
boundary p p p
read_data data.sph8
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
neighbor 0.3 bin
"""

TAIL = """thermo 2
thermo_style custom step temp press vol
run 4
"""


def _rows(tmp_path, fixline):
    (tmp_path / "data.sph8").write_text(DATA)
    (tmp_path / "in.t").write_text(HEAD + fixline + "\n" + TAIL)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.t"))
    return {int(r["step"]): r for r in s.thermo_rows}


NVT_GOLDEN = [
    (0, 0.0382975104438, 0.000268082573106, 1000.0),
    (2, 0.0383111557524, 0.000268178090267, 1000.0),
    (4, 0.0383521304899, 0.00026846491343, 1000.0),
]

NPT_GOLDEN = [
    (0, 0.0382975104438, 0.000268082573106, 1000.0),
    (2, 0.0383146451089, 0.0002682225572, 999.925280565),
    (4, 0.0383661063862, 0.000268643024208, 999.701166612),
]


def test_nvt_sphere_generic(tmp_path):
    rows = _rows(tmp_path, "fix 1 all nvt/sphere temp 0.2 0.2 0.5")
    for step, t, pr, vol in NVT_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-10), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-10), step
        assert float(r["vol"]) == pytest.approx(vol, rel=1e-12), step


def test_npt_sphere_generic(tmp_path):
    rows = _rows(tmp_path,
                 "fix 1 all npt/sphere temp 1.0 1.0 0.5 iso 0.1 0.1 5.0")
    for step, t, pr, vol in NPT_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-7), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-7), step
        assert float(r["vol"]) == pytest.approx(vol, rel=1e-10), step


def test_nph_sphere_generic(tmp_path):
    rows = _rows(tmp_path, "fix 1 all nph/sphere iso 0.1 0.1 5.0")
    assert 4 in rows
    # barostat active: volume moves off 1000
    assert abs(float(rows[4]["vol"]) - 1000.0) > 1e-6
