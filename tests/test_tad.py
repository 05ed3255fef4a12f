"""TAD — temperature-accelerated dynamics (REPLICA/tad.cpp) on the
anchored double-well hop system: the event barrier recovered by TAD's
internal NEB must match the analytically known saddle, and the low-
temperature waiting time must show the Arrhenius boost."""

import numpy as np
import pytest

from tests.test_neb import _mobile_energy, write_hop_system


@pytest.fixture(scope="module")
def tad(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    tmp = tmp_path_factory.mktemp("tad")
    write_hop_system(tmp, "tad")
    s = LammpsScript()
    s.root = str(tmp)
    s.execute("""
units lj
atom_style full
read_data tad.data
pair_style lj/cut 10.0
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 1.0 1.0
group mobile type 2
fix 1 all nve
timestep 0.003
tad 80 200 50 2.0 0.3 0.01 0.5 777 nreplicas 9 group mobile
""".strip().splitlines())
    return s


def test_tad_event_barrier(tad):
    from scipy.optimize import minimize_scalar

    res = tad.tad_result
    assert len(res["events"]) >= 1, res
    opt = minimize_scalar(_mobile_energy, bounds=(0.2, 3.0),
                          method="bounded")
    barrier_ref = _mobile_energy(0.0) - float(opt.fun)
    ev = res["events"][0]
    # the NEB-extracted barrier of the thermally discovered hop must match
    # the analytic saddle
    assert abs(ev["barrier"] - barrier_ref) < 0.05 * barrier_ref, (
        ev, barrier_ref)
    # Arrhenius extrapolation: t_lo >> t_hi for T_lo << T_hi
    assert ev["t_lo"] > 100 * ev["t_hi"]


def test_tad_accepts(tad):
    res = tad.tad_result
    assert res["accepted"] is not None
