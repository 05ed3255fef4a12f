"""Rhodo-class workload smoke test (VERDICT r3 #7): the bench/in.rhodo
combination — CHARMM pair/bonded + PPPM + SHAKE + NPT (mtk no, pchain 0,
tchain 1) + special_bonds charmm — on a replicated examples/peptide cell.

data.rhodo itself is absent from the reference checkout
(.MISSING_LARGE_BLOBS); scripts/bench_rhodo_class.py runs the same stack
at 2x2x4 (32,064 atoms) on the chip.  This fast-tier test runs the exact
fix/style combination at 1x1x2 (4,008 atoms) and checks the NPT+SHAKE
trajectory stays physical.
"""

import os
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

PEPDATA = "/root/reference/examples/peptide/data.peptide"

SCRIPT = """units real
atom_style full

pair_style lj/charmm/coul/long 8.0 10.0
pair_modify mix arithmetic
bond_style harmonic
angle_style charmm
dihedral_style charmm
improper_style harmonic
kspace_style pppm 1e-4

read_data data.peptide
replicate 1 1 2

special_bonds charmm
neighbor 2.0 bin
neigh_modify delay 5

timestep 2.0
thermo 2
thermo_style custom step temp pe etotal press vol

fix 1 all npt temp 275.0 275.0 100.0 iso 1.0 1.0 1000.0 mtk no pchain 0 tchain 1
fix 2 all shake 0.0001 10 100 b 4 6 8 10 12 14 18 a 31

run 6
"""


def test_rhodo_class_stack(tmp_path):
    shutil.copy(PEPDATA, tmp_path)
    path = os.path.join(tmp_path, "in.rhodo_class")
    open(path, "w").write(SCRIPT)
    s = LammpsScript(dtype=jnp.float64)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s.file(path)
    finally:
        os.chdir(cwd)
    rows = {int(r["step"]): r for r in s.thermo_rows}
    assert set(rows) == {0, 2, 4, 6}
    r0, r6 = rows[0], rows[6]
    # 2x the peptide cell: energies scale ~2x the single-cell golden
    # (log.5Oct16.peptide.g++.1 step-0 PotEng -6372.2285 at 2004 atoms)
    assert r0["temp"] == pytest.approx(282.10052, rel=1e-3)
    assert r0["pe"] == pytest.approx(2 * -6372.2285, rel=2e-2)
    for r in rows.values():
        for k in ("temp", "pe", "press", "etotal", "vol"):
            assert np.isfinite(r[k]), (k, r)
    # NPT + SHAKE stays physical over the window
    assert 150.0 < r6["temp"] < 400.0
    assert abs(r6["etotal"] - rows[0]["etotal"]) < 0.05 * abs(
        rows[0]["etotal"])
    # the barostat actually moves the box
    assert r6["vol"] != rows[0]["vol"]
