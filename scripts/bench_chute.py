"""bench/in.chute 32k granular chute flow on TPU (dev tool).

Reference: 187.205 timesteps/s on one 2016 core
(log.6Oct16.chute.fixed.icc.1:56).  Prints `chute steps/s X` last.
"""
import os
import re
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript
from lidp_tpu.models.polar_bench import enable_compile_cache

enable_compile_cache()

tmp = tempfile.mkdtemp()
shutil.copy("/root/reference/bench/data.chute", tmp)
text = open("/root/reference/bench/in.chute").read()
text = re.sub(r"^run.*$", "run    0", text, flags=re.M)
path = os.path.join(tmp, "in.chute")
open(path, "w").write(text)

s = LammpsScript(dtype=jnp.float32, speed_mode=True)
s.file(path)
sim = s._sim
NS = 400
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
print("chute steps/s", round(NS / best, 3), flush=True)
