"""Golden-log parity for bench/in.chain (log.6Oct16.chain.fixed.icc.1).

32k-atom FENE bead-spring melt: bond_style fene, special_bonds fene,
fix langevin.  Step-0 golden row: Temp 0.97029772, E_pair 0.44484087,
E_mol 20.494523, TotEng 22.394765, Press 4.6721833.  (Trajectory parity is
not asserted: fix langevin draws from the reference's RanMars stream; we use
a counter-based JAX PRNG — documented divergence.)
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
    tmp = str(tmp_path_factory.mktemp("chain"))
    shutil.copy("/root/reference/bench/data.chain", tmp)
    text = open("/root/reference/bench/in.chain").read()
    text = re.sub(r"^run.*$", "run    5", text, flags=re.M)
    path = os.path.join(tmp, "in.chain")
    open(path, "w").write(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(path)
    return s.thermo_rows


def test_step0_golden(rows):
    r0 = rows[0]
    assert r0["temp"] == pytest.approx(0.97029772, rel=1e-7)
    assert r0["epair"] == pytest.approx(0.44484087, rel=1e-6)
    assert r0["emol"] == pytest.approx(20.494523, rel=1e-6)
    assert r0["etotal"] == pytest.approx(22.394765, rel=1e-6)
    assert r0["press"] == pytest.approx(4.6721833, rel=1e-5)


def test_langevin_steps_finite(rows):
    import numpy as np

    for r in rows:
        assert np.isfinite(r["etotal"])
