"""PPPM vs Ewald cross-validation (same tinfoil limit) + script-level use."""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.ops.ewald import EwaldParams, ewald_forces, setup_ewald_disp
from lidp_tpu.ops.pppm import pppm_forces, setup_pppm


def test_pppm_matches_ewald():
    rs = np.random.RandomState(3)
    L, n = 12.0, 40
    x = rs.uniform(0, L, (n, 3))
    q = rs.normal(size=n)
    q -= q.mean()
    es = setup_ewald_disp(accuracy_rel=1e-6, qqrd2e=1.0, q=q, natoms=n,
                          cutoff=5.0, box_lengths=[L, L, L])
    ew = EwaldParams.from_setup(es, 1.0)
    fe, ee, _ = ewald_forces(jnp.asarray(x), jnp.asarray(q),
                             jnp.asarray(L**3), ew)
    ps = setup_pppm(accuracy_rel=1e-6, qqrd2e=1.0, q=q, natoms=n, cutoff=5.0,
                    box_lengths=[L, L, L], g_ewald=es.g_ewald)
    fp, ep, _ = pppm_forces(jnp.asarray(x), jnp.asarray(q), [L, L, L], ps,
                            1.0, float((q**2).sum()), float(q.sum()))
    assert float(ep) == pytest.approx(float(ee), rel=1e-4)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fe),
                               atol=1e-4 * float(np.abs(np.asarray(fe)).max()))


def test_pppm_in_script(tmp_path):
    """kspace_style pppm in an input script produces elong close to ewald."""
    import os
    import shutil

    from lidp_tpu.io.script import LammpsScript

    src = "/root/reference/polarization/examples/Bulk H2"
    shutil.copy(os.path.join(src, "h2.data"), tmp_path)
    base = open(os.path.join(src, "h2.input")).read()
    base = base.replace("equal  100  # number of steps", "equal  0  # nsteps")

    rows = {}
    for style in ("ewald/disp 1.0e-4", "pppm 1.0e-4"):
        text = base.replace("kspace_style  ewald/disp 1.0e-4",
                            f"kspace_style  {style}")
        path = os.path.join(tmp_path, "in.t")
        open(path, "w").write(text)
        s = LammpsScript(dtype=jnp.float64)
        s.file(path)
        rows[style] = s.thermo_rows[0]
    # pppm picks its own g_ewald (adjust_gewald, pppm.cpp:1287) so elong
    # alone differs from ewald's split; the g-invariant total coulomb
    # (ecoul + elong) must agree at the requested accuracy scale
    t1 = rows["ewald/disp 1.0e-4"]["ecoul"] + rows["ewald/disp 1.0e-4"]["elong"]
    t2 = rows["pppm 1.0e-4"]["ecoul"] + rows["pppm 1.0e-4"]["elong"]
    assert t2 == pytest.approx(t1, abs=2.0)
