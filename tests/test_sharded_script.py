"""General-engine sharding: a LAMMPS script runs end-to-end on an 8-device
mesh with thermo rows equal to the single-device run.

The TPU-native replacement for the reference's spatial-decomposition MPI
runtime (comm_brick.cpp:463-712 halos): the `processors` command pads the
atom axis to the mesh size and lays the System over the mesh
(GSPMD sharding-in-types); XLA partitions the jitted step and inserts the
collectives.  The reference's own polarization pair style cannot run
multi-process at all (pair_lj_cut_coul_long_polarization.cpp:1320-1362 dead
ghost comm; README "does not work with multiple processors").
"""

import os
import re
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

H2_DIR = "/root/reference/polarization/examples/Bulk H2"


pytestmark = pytest.mark.slow

def _run(tmp, ndev, nsteps=4):
    shutil.copy(os.path.join(H2_DIR, "h2.data"), tmp)
    text = open(os.path.join(H2_DIR, "h2.input")).read()
    text = re.sub(r"^run\s+\S+.*$", f"run    {nsteps}", text, flags=re.M)
    path = os.path.join(tmp, "in.test")
    with open(path, "w") as fh:
        fh.write(text)
    script = LammpsScript(dtype=jnp.float64)
    script.n_shard_devices = ndev
    script.file(path)
    return script


def test_bulk_h2_sharded_matches_single(tmp_path):
    assert len(jax.devices()) >= 8
    rows1 = _run(str(tmp_path), 0).thermo_rows
    s8 = _run(str(tmp_path), 8)
    rows8 = s8.thermo_rows

    # the state really is laid out over the mesh (8 addressable shards)
    sys8 = s8._sim.sys
    assert sys8.x.shape[0] % 8 == 0
    assert len(sys8.x.addressable_shards) == 8
    shard_shapes = {sh.data.shape for sh in sys8.x.addressable_shards}
    assert shard_shapes == {(sys8.x.shape[0] // 8, 3)}

    assert len(rows1) == len(rows8) >= 3
    for r1, r8 in zip(rows1, rows8):
        for k in r1:
            assert abs(r1[k] - r8[k]) <= 1e-8 * max(1.0, abs(r1[k])), (
                k, r1[k], r8[k])

    # golden step-0 anchors (Bulk H2/log.lammps:93)
    r0 = rows8[0]
    assert abs(r0["etotal"] - 202.61103) < 2e-3
    assert abs(r0["epol"] - (-0.11226309)) < 1e-6
    assert abs(r0["temp"] - 305.06274) < 1e-4


def test_processors_command_sets_mesh():
    script = LammpsScript(dtype=jnp.float64)
    script.one("processors 2 2 2")
    assert script.n_shard_devices == 8
    script.one("processors * * 4")
    assert script.n_shard_devices == 4


PEPDIR = "/root/reference/examples/peptide"


def _run_peptide_pppm(ndev, nsteps=4):
    script = LammpsScript(dtype=jnp.float64)
    script.n_shard_devices = ndev
    script.root = PEPDIR
    lines = []
    for ln in open(f"{PEPDIR}/in.peptide").read().splitlines():
        t = ln.split("#")[0].strip()
        if t.startswith("run"):
            ln = f"run {nsteps}"
        elif t.split()[:1] == ["thermo"]:
            ln = "thermo 2"
        elif t.startswith(("dump", "compute", "thermo_modify")):
            continue
        lines.append(ln)
    script.execute(lines)
    return script


def test_peptide_pppm_sharded_matches_single(tmp_path):
    """The sharded engine covers the FULL stack incl. the pppm mesh: the
    FFT runs on the GSPMD-partitioned charge grid (XLA inserts the
    all-gathers) -- the analog of the reference's pencil-decomposed
    fft3d.cpp/remap.cpp, with the layout chosen by the compiler."""
    assert len(jax.devices()) >= 8
    rows1 = _run_peptide_pppm(0).thermo_rows
    rows8 = _run_peptide_pppm(8).thermo_rows
    assert len(rows1) == len(rows8) >= 3
    for r1, r8 in zip(rows1, rows8):
        for k in ("etotal", "ecoul", "elong", "press", "temp"):
            assert abs(r1[k] - r8[k]) <= 1e-8 * max(1.0, abs(r1[k])), (
                k, r1[k], r8[k])
