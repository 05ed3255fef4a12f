"""bench/in.chute — granular chute flow (GRANULAR package slice).

Step-0 golden: log.6Oct16.chute.fixed.icc.1:
  0  32000  784139.13  1601.1263  29833.783   (Step Atoms KinEng c_1 Volume)
  100 32000 784292.08  1571.0968  29834.707

Step 0 must match every printed digit (reads the sphere data file, shrink
wraps zhi, erotate/sphere over data-file omegas).  The 100-step row
reproduces KinEng/Volume to 5-6 digits; c_1 (rotational KE) agrees to ~3
digits — contact shear history is kept in the regular candidate structure
and reset for pairs whose cell/slot binning changed at a rebuild
(ops/granular.py module doc), a documented approximation of
FixNeighHistory's id-keyed remap.
"""

import os
import re
import shutil

import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

BENCH = "/root/reference/bench"


@pytest.fixture(scope="module")
def chute0(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chute")
    os.symlink(os.path.join(BENCH, "data.chute"), tmp / "data.chute")
    text = open(os.path.join(BENCH, "in.chute")).read()
    text = re.sub(r"^run.*$", "run    0", text, flags=re.M)
    path = tmp / "in.chute"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return s


def test_step0_golden(chute0):
    row = {k: float(v) for k, v in chute0.thermo_rows[0].items()}
    assert row["atoms"] == 32000
    assert row["ke"] == pytest.approx(784139.13, rel=1e-8)
    assert row["c_1"] == pytest.approx(1601.1263, rel=1e-7)
    assert row["vol"] == pytest.approx(29833.783, rel=1e-7)


def test_reader_sphere_fields(chute0):
    import numpy as np

    s = chute0
    assert s.radius.shape == (32000,)
    assert np.allclose(s.radius, 0.5)
    assert np.allclose(s.rmass, 4.0 / 3.0 * np.pi * 0.125)
    assert np.abs(s.omega).max() > 0.0


@pytest.mark.slow
def test_ten_steps_stable(chute0):
    s = chute0
    s.one("run 10")
    rows = {int(r["step"]): r for r in s.thermo_rows}
    r10 = rows[max(rows)]
    # KE changes slowly (dt=1e-4; golden moves 1.95e-4 rel over 100 steps);
    # c_1 oscillates at the contact frequency (sqrt(kn/m) ~ 620/tau, period
    # ~100 steps) so a short window only bounds it loosely — the 100-step
    # value matches the golden to 0.2% (module doc)
    assert float(r10["ke"]) == pytest.approx(784139.13, rel=5e-5)
    assert float(r10["c_1"]) == pytest.approx(1601.1263, rel=3e-2)


SPHERE_COMPUTE_GOLDEN = [
    # rebuilt reference on bench/in.chute + temp/sphere +
    # erotate/sphere/atom (reduce-summed), thermo 2, run 4:
    # step ke c_1 c_ts c_re
    [0, 784139.13, 1601.1263, 8.1849222, 1601.1263],
    [2, 784149.62, 1599.5955, 8.1850155, 1599.5955],
    [4, 784157.78, 1595.605, 8.185059, 1595.605],
]


@pytest.mark.slow
def test_sphere_computes_golden(tmp_path):
    """compute temp/sphere (compute_temp_sphere.cpp: trans+rot KE over
    6 dof/finite-radius atom) and erotate/sphere/atom
    (compute_erotate_sphere_atom.cpp) vs the rebuilt reference on the
    chute system; the per-atom column is checked through reduce sum
    (== the scalar erotate/sphere column at every step)."""
    os.symlink(os.path.join(BENCH, "data.chute"), tmp_path / "data.chute")
    text = open(os.path.join(BENCH, "in.chute")).read()
    text = re.sub(r"^thermo\t.*$", "thermo 2", text, flags=re.M)
    text = re.sub(r"^run.*$", "run 4", text, flags=re.M)
    text = text.replace(
        "compute\t\t1 all erotate/sphere",
        "compute\t\t1 all erotate/sphere\n"
        "compute\t\tts all temp/sphere\n"
        "compute\t\tea all erotate/sphere/atom\n"
        "compute\t\tre all reduce sum c_ea")
    text = re.sub(r"^thermo_style.*$",
                  "thermo_style custom step ke c_1 c_ts c_re",
                  text, flags=re.M)
    path = tmp_path / "in.sph"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, ke, c1, cts, cre in SPHERE_COMPUTE_GOLDEN:
        r = rows[step]
        assert float(r["ke"]) == pytest.approx(ke, rel=1e-7), step
        assert float(r["c_1"]) == pytest.approx(c1, rel=1e-7), step
        assert float(r["c_ts"]) == pytest.approx(cts, rel=1e-7), step
        assert float(r["c_re"]) == pytest.approx(cre, rel=1e-7), step


NVT_SPHERE_GOLDEN = [
    # rebuilt reference: in.chute with fix 3 active nvt/sphere temp 40 40
    # 0.01, thermo 2, run 4 (step ke c_1 temp)
    [0, 784139.13, 1601.1263, 16.336742],
    [2, 784397.16, 1600.1005, 16.342118],
    [4, 785142.54, 1597.61, 16.357648],
]


@pytest.mark.slow
def test_nvt_sphere_golden(tmp_path):
    """fix nvt/sphere (fix_nvt_sphere.cpp = FixNHSphere): NH chain scales
    both v and omega; temperature includes rotational KE (temp/sphere
    dof).  4-step golden vs the rebuilt reference on the chute system."""
    os.symlink(os.path.join(BENCH, "data.chute"), tmp_path / "data.chute")
    text = open(os.path.join(BENCH, "in.chute")).read()
    text = text.replace("fix\t\t3 active nve/sphere",
                        "fix\t\t3 active nvt/sphere temp 40.0 40.0 0.01")
    text = re.sub(r"^thermo\t.*$", "thermo 2", text, flags=re.M)
    text = re.sub(r"^thermo_style.*$",
                  "thermo_style custom step ke c_1 temp", text, flags=re.M)
    text = re.sub(r"^run.*$", "run 4", text, flags=re.M)
    (tmp_path / "in.nvtsph").write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.nvtsph"))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, ke, c1, temp in NVT_SPHERE_GOLDEN:
        r = rows[step]
        assert float(r["ke"]) == pytest.approx(ke, rel=1e-7), step
        assert float(r["c_1"]) == pytest.approx(c1, rel=1e-7), step
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-7), step


CONTACT_DATA = """tiny sphere test

6 atoms
1 atom types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Atoms

1 1 1.0 1.0 1.0 1.0 1.0
2 1 1.0 1.0 1.8 1.0 1.0
3 1 1.0 1.0 2.6 1.0 1.0
4 1 2.0 1.0 6.0 6.0 6.0
5 1 2.0 1.0 7.4 6.0 6.0
6 1 1.0 1.0 9.5 9.5 9.5
"""


def test_contact_atom_golden(tmp_path):
    """compute contact/atom (compute_contact_atom.cpp: pair counts with
    r < radi+radj) on a 6-sphere chain: reduce sum == 6 (three touching
    pairs double-counted), reduce max == 2 (middle of the chain) —
    golden from the rebuilt reference."""
    (tmp_path / "data.spheres").write_text(CONTACT_DATA)
    (tmp_path / "in.contact").write_text("""units lj
atom_style sphere
boundary p p p
newton off
comm_modify vel yes
read_data data.spheres
pair_style gran/hooke/history 200000.0 NULL 50.0 NULL 0.5 0
pair_coeff * *
neighbor 0.1 bin
fix 3 all nve/sphere
compute ca all contact/atom
compute re all reduce sum c_ca
compute rm all reduce max c_ca
thermo_style custom step c_re c_rm
thermo_modify norm no
run 0
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.contact"))
    row = s.thermo_rows[0]
    assert float(row["c_re"]) == 6.0
    assert float(row["c_rm"]) == 2.0


GRAN_VARIANT_GOLDEN = {
    # rows from the REBUILT reference binary on bench/in.chute with the
    # pair style swapped (4 steps, thermo 2, %.15g norm no):
    # step atoms ke c_1 vol
    "gran/hooke": [
        [0, 784139.12852822, 1601.12628728411],
        [2, 784151.00044128, 1601.12628728411],
        [4, 784163.009077438, 1601.12628728411],
    ],
    "gran/hertz/history": [
        [0, 784139.12852822, 1601.12628728411],
        [2, 784151.685179096, 1601.11403376317],
        [4, 784164.166554183, 1601.0781958997],
    ],
}


@pytest.mark.slow
@pytest.mark.parametrize("style", sorted(GRAN_VARIANT_GOLDEN))
def test_gran_variants_golden(style, tmp_path):
    """pair gran/hooke (no shear history, pair_gran_hooke.cpp) and
    gran/hertz/history (polyhertz scaling, pair_gran_hertz_history.cpp)
    vs the rebuilt reference on the chute system."""
    os.symlink(os.path.join(BENCH, "data.chute"), tmp_path / "data.chute")
    text = open(os.path.join(BENCH, "in.chute")).read()
    text = re.sub(r"^pair_style.*$",
                  f"pair_style {style} 200000.0 NULL 50.0 NULL 0.5 0",
                  text, flags=re.M)
    text = re.sub(r"^thermo\t.*$", "thermo 2", text, flags=re.M)
    text = re.sub(r"^run.*$", "run 4", text, flags=re.M)
    path = tmp_path / "in.var"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, ke, c1 in GRAN_VARIANT_GOLDEN[style]:
        assert float(rows[step]["ke"]) == pytest.approx(ke, rel=1e-9), (
            style, step)
        assert float(rows[step]["c_1"]) == pytest.approx(c1, rel=1e-8), (
            style, step)
