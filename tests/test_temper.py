"""Parallel tempering (lidp_tpu.replica / `temper` command) — the REPLICA
package's ensemble-parallel axis (temper.cpp), replicas vmapped on a leading
batch axis instead of one-per-MPI-partition."""

import numpy as np
import pytest

TEMPER_INPUT = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
variable t world 0.8 0.9 1.0 1.1
velocity all create 0.8 87287 loop geom
fix 1 all nvt temp 0.8 0.8 0.5
temper 200 50 $t 1 0 58728
"""


@pytest.fixture(scope="module")
def tempered():
    from lidp_tpu.io.script import LammpsScript

    lines = []
    s = LammpsScript(log=lines.append)
    s.execute(TEMPER_INPUT.strip().splitlines())
    return s, lines


def test_temper_runs_and_permutes(tempered):
    s, lines = tempered
    r = s._temper_result
    assert r.pe_trace.shape == (4, 4)
    assert np.all(np.isfinite(r.pe_trace))
    # world2temp stays a permutation of the ladder indices
    assert sorted(r.world2temp.tolist()) == [0, 1, 2, 3]
    assert r.attempt > 0
    assert int(np.asarray(r.sys.step)[0]) == 200


def test_temper_physics(tempered):
    s, lines = tempered
    r = s._temper_result
    # hotter replicas sample higher potential energy on average:
    # map each recorded pe back to its set-temp at that swap
    by_temp = {t: [] for t in range(4)}
    for k in range(r.pe_trace.shape[0]):
        w2t = r.status[k]        # mapping BEFORE this chunk's swap
        for w in range(4):
            by_temp[w2t[w]].append(r.pe_trace[k, w])
    means = [np.mean(by_temp[t]) for t in range(4)]
    assert means[0] < means[3], f"pe means not ordered: {means}"


def test_temper_status_logged(tempered):
    s, lines = tempered
    txt = "\n".join(lines)
    assert "T0 T1 T2 T3" in txt
    # a status line per swap + initial
    assert sum(1 for ln in lines if ln and ln[0].isdigit()) >= 5


def test_temper_requires_nvt():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    bad = TEMPER_INPUT.replace("fix 1 all nvt temp 0.8 0.8 0.5",
                               "fix 1 all nve")
    with pytest.raises(ValueError, match="NVT|nvt"):
        s.execute(bad.strip().splitlines())


def test_temper_swaps_exchange_temperatures(tempered):
    s, lines = tempered
    r = s._temper_result
    if r.accept == 0:
        pytest.skip("no accepted swaps in this short run")
    changed = any(not np.array_equal(r.status[i], r.status[i + 1])
                  for i in range(len(r.status) - 1))
    assert changed
