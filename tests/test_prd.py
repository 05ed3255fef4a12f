"""PRD — parallel replica dynamics (REPLICA/prd.cpp) on the anchored
double-well hop system: the mobile atom crosses the known barrier at
finite temperature; PRD must detect the transition as an event/displace
and accumulate the M-fold hyper-time boost."""

import numpy as np
import pytest

from tests.test_neb import write_hop_system


@pytest.fixture(scope="module")
def prd(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    tmp = tmp_path_factory.mktemp("prd")
    write_hop_system(tmp, "prd")
    s = LammpsScript()
    s.root = str(tmp)
    s.execute("""
units lj
atom_style full
read_data prd.data
pair_style lj/cut 10.0
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 1.0 1.0
group mobile type 2
fix 1 all nve
timestep 0.003
prd 40 200 50 2.0 0.5 12345 nreplicas 8 group mobile
""".strip().splitlines())
    return s


def test_prd_finds_hop(prd):
    res = prd.prd_result
    assert res["hyper_steps"] == 8 * 200 * 40
    # at T=2 over 64k replica-steps the 4-eps barrier must be crossed
    assert len(res["events"]) >= 1, res
    ev = res["events"][0]
    assert ev["displacement"] > 0.5
    assert res["boost"] > 1.0
