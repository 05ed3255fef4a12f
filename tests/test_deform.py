"""fix deform (fix_deform.cpp): scheduled box deformation with affine
coordinate remap — isotropic scale on a cold crystal preserves lattice
geometry exactly, and a tilt ramp shears an orthogonal box into a
triclinic one mid-run."""

import numpy as np
import pytest


def _base(extra, n=3):
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute(f"""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 {n} 0 {n} 0 {n}
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
{extra}
run 100
""".strip().splitlines())
    return s


def test_deform_scale_affine():
    s = _base("fix 2 all deform 1 x scale 1.2 y scale 1.2 z scale 1.2 "
              "remap x units box")
    sim = s._sim
    L = np.asarray(sim.sys.box.lengths)
    a0 = (4 / 0.8442) ** (1 / 3) * 3
    assert np.allclose(L, 1.2 * a0, rtol=1e-10), L
    # cold crystal + affine remap: atoms stay on the scaled lattice
    x = np.asarray(sim.sys.x)
    lo = np.asarray(sim.sys.box.lo)
    frac = (x - lo) / L
    cell = frac * 6  # 3 cells x 2 half-basis positions per cell
    assert np.abs(cell - np.round(cell)).max() < 1e-6


def test_deform_scale_energy_consistent():
    """The deformed state's energy equals a fresh evaluation at the scaled
    geometry (box + positions consistent).  The thermo row DURING the
    deforming run is tallied before FixDeform::end_of_step moves the box
    (verlet.cpp ordering), so the comparison row comes from a follow-up
    run 0 at the settled geometry."""
    s = _base("fix 2 all deform 1 x scale 1.1 remap x units box")
    s.execute(["unfix 2", "run 0"])
    r = s.thermo_rows[-1]
    sim = s._sim
    from lidp_tpu.forcefield import compute_forces

    res = compute_forces(sim.sys, sim.runner.ff)
    assert abs(float(res.epair) / s.x.shape[0] - r["epair"]) < 1e-9


def test_deform_tilt_to_triclinic():
    s = _base("fix 2 all deform 1 xy final 1.5 remap x units box")
    sim = s._sim
    box = sim.sys.box
    assert box.triclinic
    assert abs(float(box.tilt[0]) - 1.5) < 1e-10
    # energy finite under the sheared minimum image
    assert np.isfinite(s.thermo_rows[-1]["etotal"])
