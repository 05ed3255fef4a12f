"""Profile the rhodo-class step phases (dev tool): where do the ~20 s/step
go at 32k CHARMM atoms?  Prints the neighbor config and per-phase wall
times on the live backend."""
import os
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript
from lidp_tpu.models.polar_bench import enable_compile_cache

enable_compile_cache()

REP = os.environ.get("RHODO_REP", "2 2 4")
KS = os.environ.get("RHODO_KSPACE", "1") == "1"

SCRIPT = f"""units real
atom_style full
pair_style lj/charmm/coul/{'long' if KS else 'charmm'} 8.0 10.0
pair_modify mix arithmetic
bond_style harmonic
angle_style charmm
dihedral_style charmm
improper_style harmonic
{'kspace_style pppm 1e-4' if KS else ''}
read_data data.peptide
replicate {REP}
special_bonds charmm
neighbor 2.0 bin
neigh_modify delay 5
timestep 2.0
fix 1 all nvt temp 275.0 275.0 100.0
run 0
"""

tmp = tempfile.mkdtemp()
shutil.copy("/root/reference/examples/peptide/data.peptide", tmp)
path = os.path.join(tmp, "in.prof")
open(path, "w").write(SCRIPT)

s = LammpsScript(dtype=jnp.float32, speed_mode=True)
cwd = os.getcwd()
os.chdir(tmp)
try:
    s.file(path)
finally:
    os.chdir(cwd)
sim = s._sim
runner = sim.runner
print("natoms", s.x.shape[0], "ncfg", runner.neighbor_cfg,
      "rebuild_every", runner.rebuild_every, "check", runner.check,
      "delay", runner.delay, flush=True)

out = (sim.sys, sim.res, sim.nlist, sim.istate)


def timeit(label, fn, *args, n=3, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return r


# phase 1: bare force evaluation (setup path: build struct + forces)
timeit("setup_force (struct+forces)", runner._force, sim.sys, runner.ff,
       neighbor_cfg=runner.neighbor_cfg, n=2)

# phase 2: one-step scan
timeit("scan nsteps=1", runner.run, *out, 1, n=3)
# phase 3: two-step scan (marginal per-step cost)
timeit("scan nsteps=2", runner.run, *out, 2, n=3)
