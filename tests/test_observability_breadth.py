"""dump cfg (dump_cfg.cpp extended CFG), angle/dihedral/improper local
computes (compute_*_local.cpp) through dump local, and the rigid/small
family aliases (fix_rigid_small.cpp — our batched formulation is already
per-body parallel)."""

import os

import numpy as np
import pytest


MOLEC = """units lj
atom_style full
read_data data.bonded
pair_style zero 2.0
pair_coeff * *
bond_style harmonic
bond_coeff * 40.0 1.0
angle_style harmonic
angle_coeff 1 30.0 109.5
angle_coeff 2 40.0 115.0
dihedral_style opls
dihedral_coeff * 1.3 -0.05 0.2 0.0
improper_style harmonic
improper_coeff * 5.0 10.0
"""


@pytest.fixture()
def molec_files(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "g", os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "gen_bonded_goldens.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    g.write_data(str(tmp_path / "data.bonded"))
    return tmp_path


def _run(tmp_path, extra):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.case").write_text(MOLEC + extra)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.case"))
    return s


def test_local_bonded_computes(molec_files):
    tmp = molec_files
    s = _run(tmp, """
compute aa all angle/local theta eng
compute dd all dihedral/local phi
compute ii all improper/local chi
dump 1 all local 1 ang.dump index c_aa[1] c_aa[2]
dump 2 all local 1 tor.dump index c_dd[1] c_ii[1]
run 0
""")

    def body_of(path):
        rows = [ln.split() for ln in open(path).read().splitlines()]
        hdr = next(i for i, r in enumerate(rows)
                   if r[:2] == ["ITEM:", "ENTRIES"])
        return np.array([[float(v) for v in r] for r in rows[hdr + 1:]])

    body = body_of(tmp / "ang.dump")
    assert body.shape[0] == 16
    theta = body[:, 1]
    assert (theta > 60).all() and (theta < 180).all()
    # angle energies: K(theta-theta0)^2 recomputed here
    co = {1: (30.0, 109.5), 2: (40.0, 115.0)}
    at = np.array([1, 2] * 8)
    expect = np.array([co[t][0] for t in at]) * np.deg2rad(
        theta - np.array([co[t][1] for t in at])) ** 2
    # theta is parsed back from the %.8g dump text; dE/dtheta amplifies
    # that quantization to ~1e-6 rel on E
    np.testing.assert_allclose(body[:, 2], expect, rtol=3e-5)
    tor = body_of(tmp / "tor.dump")
    assert tor.shape[0] == 8
    assert (np.abs(tor[:, 1:]) <= 180.0).all()


def test_dump_cfg(molec_files):
    tmp = molec_files
    _run(tmp, """
dump 1 all cfg 1 conf.cfg mass type xs ys zs q
run 0
""")
    text = open(tmp / "conf.cfg").read()
    assert text.startswith("Number of particles = 32")
    assert "H0(1,1) = 12 A" in text
    assert "auxiliary[0] = q" in text
    # scaled coords in [0,1)
    data_rows = []
    for ln in text.splitlines():
        t = ln.split()
        if len(t) == 4 and not ln.startswith(("H0", "A =")):
            data_rows.append([float(v) for v in t])
    arr = np.array(data_rows)
    assert ((arr[:, :3] >= 0) & (arr[:, :3] < 1)).all()


def test_rigid_computes(molec_files):
    """compute ke/rigid + erotate/rigid (compute_ke_rigid.cpp,
    compute_erotate_rigid.cpp) and compute rigid/local through dump local
    (compute_rigid_local.cpp).  For pure rigid motion the atom KE must
    split exactly into body translational + rotational KE."""
    tmp = molec_files
    s = _run(tmp, """
velocity all create 0.3 4928459 loop geom
fix 1 all rigid/nve molecule
compute tke all ke/rigid 1
compute ter all erotate/rigid 1
compute rl all rigid/local 1 id mol mass xu omegax quatw inertiax
dump 3 all local 2 rb.dump index c_rl[2] c_rl[3] c_rl[6]
thermo_style custom step ke c_tke c_ter
thermo 2
run 4
""")
    for row in s.thermo_rows:
        ke = float(row["ke"])
        tke = float(row["c_tke"])
        ter = float(row["c_ter"])
        assert tke > 0 and ter > 0
        np.testing.assert_allclose(tke + ter, ke, rtol=1e-9)
    rows = [ln.split() for ln in open(tmp / "rb.dump").read().splitlines()]
    hdr = max(i for i, r in enumerate(rows) if r[:2] == ["ITEM:", "ENTRIES"])
    assert rows[hdr][2:] == ["index", "c_rl[2]", "c_rl[3]", "c_rl[6]"]
    body = np.array([[float(v) for v in r] for r in rows[hdr + 1:]])
    # data.bonded: 8 identical molecules -> 8 equal-mass bodies
    assert body.shape[0] == 8
    np.testing.assert_allclose(body[:, 2], body[0, 2])
    assert body[0, 2] > 0
    assert set(body[:, 1].astype(int)) == set(range(1, 9))
    # quatw column stays a valid quaternion component
    assert (np.abs(body[:, 3]) <= 1.0 + 1e-12).all()


def test_rigid_small_alias(molec_files):
    tmp = molec_files
    s = _run(tmp, """
velocity all create 0.3 4928459 loop geom
fix 1 all rigid/nve/small molecule
thermo 2
run 4
""")
    rows = s.thermo_rows
    e0 = float(rows[0]["etotal"])
    e4 = float(rows[-1]["etotal"])
    assert abs(e4 - e0) < 5e-6 * max(1.0, abs(e0))
