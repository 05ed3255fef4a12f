"""bench/in.eam 32k Cu EAM on TPU (dev tool).

Reference: 16.764 steps/s on one 2016 core (log.6Oct16.eam.fixed.icc.1:59).
Prints `eam steps/s X` on the last line.
"""
import os
import re
import shutil
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript
from lidp_tpu.models.polar_bench import enable_compile_cache

enable_compile_cache()

tmp = tempfile.mkdtemp()
shutil.copy("/root/reference/bench/Cu_u3.eam", tmp)
text = open("/root/reference/bench/in.eam").read()
text = re.sub(r"^run.*$", "run    0", text, flags=re.M)
path = os.path.join(tmp, "in.eam")
open(path, "w").write(text)

s = LammpsScript(dtype=jnp.float32, speed_mode=True)
s.file(path)
sim = s._sim
NS = 100
sys_, res, nlist, istate = sim.sys, sim.res, sim.nlist, sim.istate
out = sim.runner.run(sys_, res, nlist, istate, NS)
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
print("eam steps/s", round(NS / best, 3), flush=True)
