"""Golden-log parity for bench/in.lj (log.6Oct16.lj.fixed.icc.1).

Step-0 thermo: Temp 1.44, E_pair -6.7733681 (per atom), TotEng -4.6134356,
Press -5.0197073.
"""

import numpy as np
import pytest

from lidp_tpu.models import lj_melt
from lidp_tpu.thermo import thermo_row


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def melt():
    return lj_melt.build(scale=1)


def test_step0_thermo(melt):
    sys, res, nlist, istate = melt.runner.setup(melt.system)
    assert not bool(nlist.overflow)
    row = {k: float(v) for k, v in thermo_row(sys, res, melt.thermo).items()}
    assert row["temp"] == pytest.approx(1.44, rel=1e-9)
    assert row["pe"] == pytest.approx(-6.7733681, rel=1e-6)
    assert row["etotal"] == pytest.approx(-4.6134356, rel=1e-6)
    assert row["press"] == pytest.approx(-5.0197073, rel=1e-5)


def test_100_steps(melt):
    sys, res, nlist, istate = melt.runner.setup(melt.system)
    sys, res, nlist, istate = melt.runner.run(sys, res, nlist, istate, 100)
    row = {k: float(v) for k, v in thermo_row(sys, res, melt.thermo).items()}
    assert int(sys.step) == 100
    # energy conservation + golden-log comparison (trajectory is chaotic;
    # LAMMPS prints: Temp 0.7574531, E_pair -5.7585055, TotEng -4.6223613)
    assert row["etotal"] == pytest.approx(-4.6223613, rel=2e-5)
    assert row["temp"] == pytest.approx(0.7574531, rel=2e-3)
    assert row["pe"] == pytest.approx(-5.7585055, rel=2e-4)
