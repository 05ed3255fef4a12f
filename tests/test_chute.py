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
