"""fix wall/region (fix_wall_region.cpp) goldens vs the rebuilt
reference: sphere region + lj93 and cylinder region + lj126, 4 NVE steps
on an f f f fcc box (Region::surface_interior contact distances, coeff
precomputes and cutoff offsets).  Plus the ave/spatial deprecation stub
(fix_deprecated.cpp) and fix balance acceptance (uniform GSPMD shard)."""

import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

HEAD = """units lj
atom_style atomic
boundary f f f
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 0.5 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
neighbor 0.3 bin
fix 1 all nve
"""

TAIL = """thermo 2
thermo_style custom step temp pe press
run 4
"""


def _rows(tmp_path, text):
    path = tmp_path / "in.t"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return {int(r["step"]): r for r in s.thermo_rows}


SPHERE_GOLDEN = [
    (0, 0.5, -4.51161585024, -3.59222615039),
    (2, 0.504716222822, -4.51871519135, -3.54965391977),
    (4, 0.507197475196, -4.52258909365, -3.45532054656),
]

CYL_GOLDEN = [
    (0, 0.5, -4.51161585024, -3.59222615039),
    (2, 0.508432404612, -4.51993895542, -3.54435639539),
    (4, 0.520723906364, -4.52720387909, -3.43424163365),
]


def test_wall_region_sphere_lj93(tmp_path):
    rows = _rows(tmp_path, HEAD
                 + "region ball sphere 2.5 2.5 2.5 5.2 units box\n"
                 + "fix w all wall/region ball lj93 1.0 1.0 2.5\n" + TAIL)
    for step, t, pe, pr in SPHERE_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-11), step
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-11), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-10), step


def test_wall_region_cylinder_lj126(tmp_path):
    rows = _rows(tmp_path, HEAD
                 + "region tube cylinder z 2.5 2.5 5.2 -1.0 7.0 units box\n"
                 + "fix w all wall/region tube lj126 1.0 1.0 2.5\n" + TAIL)
    for step, t, pe, pr in CYL_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-11), step
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-11), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-10), step


def test_ave_spatial_deprecated(tmp_path):
    """The reference replaced ave/spatial with ave/chunk and errors with
    a NOTE (fix_deprecated.cpp) — same behavior here."""
    s = LammpsScript(dtype=jnp.float64)
    s.one("units lj")
    with pytest.raises(ValueError, match="no longer available"):
        s.one("fix 1 all ave/spatial 1 1 1 x lower 1.0 density/number")


def test_fix_balance_accepted(tmp_path):
    rows = _rows(tmp_path, HEAD
                 + "fix lb all balance 10 1.0 shift x 5 1.0\n" + TAIL)
    assert 4 in rows   # run completed with the fix accepted
