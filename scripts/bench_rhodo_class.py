"""Rhodo-class benchmark (dev tool): the bench/in.rhodo workload CLASS —
CHARMM force field + PPPM + SHAKE + NPT at ~32k atoms — built by
replicating examples/peptide 2x2x4 (2004 -> 32,064 atoms), since
data.rhodo itself is absent from the reference checkout
(.MISSING_LARGE_BLOBS).  Fixes mirror in.rhodo: `fix shake` + `fix npt
... mtk no pchain 0 tchain 1`, special_bonds charmm, pppm 1e-4,
timestep 2.0.

Anchor: in.rhodo = 2.855 steps/s on one 2016 core
(bench/log.6Oct16.rhodo.fixed.icc.1:95).  Prints
`rhodo_class steps/s X` on the last line.
"""
import os
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript
from lidp_tpu.models.polar_bench import enable_compile_cache

enable_compile_cache()

_KS = os.environ.get("RHODO_KSPACE", "1") == "1"
_SHAKE = os.environ.get("RHODO_SHAKE", "1") == "1"
_NPT = os.environ.get("RHODO_NPT", "1") == "1"
_REP = os.environ.get("RHODO_REP", "2 2 4")

SCRIPT = f"""units real
atom_style full

pair_style lj/charmm/coul/{'long' if _KS else 'charmm'} 8.0 10.0
pair_modify mix arithmetic
bond_style harmonic
angle_style charmm
dihedral_style charmm
improper_style harmonic
{'kspace_style pppm 1e-4' if _KS else ''}

read_data data.peptide
replicate {_REP}

special_bonds charmm
neighbor 2.0 bin
neigh_modify delay 5

timestep 2.0
thermo 50

fix 1 all {'npt temp 275.0 275.0 100.0 iso 1.0 1.0 1000.0 mtk no pchain 0 tchain 1'
           if _NPT else 'nvt temp 275.0 275.0 100.0'}
{'fix 2 all shake 0.0001 10 100 b 4 6 8 10 12 14 18 a 31' if _SHAKE else ''}

run 0
"""

tmp = tempfile.mkdtemp()
shutil.copy("/root/reference/examples/peptide/data.peptide", tmp)
path = os.path.join(tmp, "in.rhodo_class")
open(path, "w").write(SCRIPT)

s = LammpsScript(dtype=jnp.float32,
                 speed_mode=os.environ.get("RHODO_SPEED", "1") == "1")
cwd = os.getcwd()
os.chdir(tmp)
try:
    s.file(path)
finally:
    os.chdir(cwd)
sim = s._sim
print("natoms", s.x.shape[0], flush=True)
NS = int(os.environ.get("RHODO_NS", "50"))
out = (sim.sys, sim.res, sim.nlist, sim.istate)
out = sim.runner.run(*out, NS)
jax.block_until_ready(out[0].x)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = sim.runner.run(*out, NS)
    jax.block_until_ready(out[0].x)
    dt = time.perf_counter() - t0
    if dt > 0.05:
        best = dt if best is None else min(best, dt)
print("overflow", bool(out[2].overflow), flush=True)
print("rhodo_class steps/s", round(NS / best, 3), flush=True)
