"""Golden-log parity for bench/in.eam (log.6Oct16.eam.fixed.icc.1).

32k-atom Cu EAM (funcfl Cu_u3.eam), metal units, velocity loop geom.
Step-0 golden: Temp 1600, E_pair -113280, TotEng -106662.09, Press 18703.573.
"""

import os
import re
import shutil

import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def rows(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("eam"))
    shutil.copy("/root/reference/bench/Cu_u3.eam", tmp)
    text = open("/root/reference/bench/in.eam").read()
    text = re.sub(r"^run.*$", "run    2", text, flags=re.M)
    text = re.sub(r"^thermo\s+50$", "thermo 1", text, flags=re.M)
    # shrink to an 6^3-cell crystal: a perfect periodic fcc lattice has
    # exactly intensive E_pair/atom and Press, so the 32k golden values
    # scale by N (CPU runtime for the f64 parity test)
    text = text.replace("equal 20*$x", "equal 6*$x").replace(
        "equal 20*$y", "equal 6*$y").replace("equal 20*$z", "equal 6*$z")
    path = os.path.join(tmp, "in.eam")
    open(path, "w").write(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(path)
    return s.thermo_rows


def test_step0_golden(rows):
    r0 = rows[0]
    scale = 864.0 / 32000.0
    assert r0["temp"] == pytest.approx(1600.0, rel=1e-9)
    assert r0["epair"] == pytest.approx(-113280.0 * scale, rel=2e-5)
    # TotEng differs from a pure scale by the dof (3N-3) KE term; recompute:
    # KE = 0.5*(3N-3)*kB*T
    ke = 0.5 * (3 * 864 - 3) * 8.617343e-5 * 1600.0
    assert r0["etotal"] == pytest.approx(-113280.0 * scale + ke, rel=2e-5)
    assert r0["press"] == pytest.approx(18703.573, rel=2e-3)


def test_energy_conserved(rows):
    # segment-polynomial refit makes forces ~1e-5-consistent with the energy
    # (rho/z2 and their derivatives are fitted independently); drift is
    # ~1.4e-5/step at 1600 K vs the reference's own ~2e-6/step
    e0 = rows[0]["etotal"]
    for r in rows:
        assert abs(r["etotal"] - e0) / abs(e0) < 2e-4
