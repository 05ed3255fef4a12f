"""Region styles cylinder/cone/plane/union/intersect + side/units
keywords (region_cylinder.cpp, region_cone.cpp, region_plane.cpp,
region_union.cpp, region_intersect.cpp, region.cpp options) — group
membership counts vs direct numpy evaluation on an fcc lattice."""

import numpy as np


def _make(extra_lines):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript(dtype=jnp.float64)
    s.execute("""
units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 6 0 6 0 6
create_box 1 box
create_atoms 1 box
mass 1 1.0
""".strip().splitlines())
    for ln in extra_lines:
        s.one(ln)
    return s


def test_cylinder_and_side_out():
    s = _make(["region cyl cylinder z 3 3 2 1 5",
               "group g1 region cyl",
               "region cylo cylinder z 3 3 2 1 5 side out",
               "group g2 region cylo"])
    x = s.x
    a = s._spacing3()
    dd = (x[:, 0] - 3 * a[0]) ** 2 + (x[:, 1] - 3 * a[1]) ** 2
    inside = ((dd <= (2 * a[0]) ** 2) & (x[:, 2] >= 1 * a[2])
              & (x[:, 2] <= 5 * a[2]))
    assert s.groups["g1"].sum() == inside.sum() > 0
    assert s.groups["g2"].sum() == (~inside).sum()
    assert (s.groups["g1"] ^ s.groups["g2"]).all()


def test_cone():
    s = _make(["region cn cone z 3 3 0.5 2.5 0 6 units lattice",
               "group g region cn"])
    x = s.x
    a = s._spacing3()
    t = np.clip(x[:, 2] / (6 * a[2]), 0, 1)
    rad = (0.5 + t * 2.0) * a[0]
    dd = (x[:, 0] - 3 * a[0]) ** 2 + (x[:, 1] - 3 * a[1]) ** 2
    inside = (dd <= rad * rad) & (x[:, 2] >= 0) & (x[:, 2] <= 6 * a[2])
    assert s.groups["g"].sum() == inside.sum() > 0


def test_plane_units_box():
    s = _make(["region pl plane 2.0 0 0 1 0 0 units box",
               "group g region pl"])
    inside = s.x[:, 0] >= 2.0
    assert s.groups["g"].sum() == inside.sum() > 0


def test_union_intersect():
    s = _make([
        "region s1 sphere 2 3 3 1.8",
        "region s2 sphere 4 3 3 1.8",
        "region u union 2 s1 s2",
        "region i intersect 2 s1 s2",
        "group gu region u",
        "group gi region i",
        "group g1 region s1",
        "group g2 region s2",
    ])
    g1, g2 = s.groups["g1"], s.groups["g2"]
    assert (s.groups["gu"] == (g1 | g2)).all()
    assert (s.groups["gi"] == (g1 & g2)).all()
    assert 0 < s.groups["gi"].sum() < s.groups["gu"].sum()


def test_delete_atoms_region_cylinder():
    s = _make(["region cyl cylinder x 3 3 1.5 INF INF",
               "delete_atoms region cyl"])
    a = s._spacing3()
    # survivors are all outside the cylinder
    dd = (s.x[:, 1] - 3 * a[1]) ** 2 + (s.x[:, 2] - 3 * a[2]) ** 2
    assert (dd > (1.5 * a[1]) ** 2 - 1e-9).all()
