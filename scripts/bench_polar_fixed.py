"""Polar bench with static-trip-count SCF (fixed_iteration mode) — dev tool
for isolating axon while_loop overhead."""
import sys
import time

import jax

from lidp_tpu.models import polar_bench

b = polar_bench.build(target_atoms=10000, n_devices=1, col_chunk=2048,
                      fixed_iterations=8)
print("natoms", b.natoms, flush=True)
t0 = time.perf_counter()
f, en = polar_bench.run_step(b, zero_init=True)
jax.block_until_ready(f)
print("step compile+run", round(time.perf_counter() - t0, 1), flush=True)
print({k: round(float(v), 2) for k, v in en.items() if v.ndim == 0}, flush=True)
t0 = time.perf_counter()
for _ in range(10):
    f, en = polar_bench.run_step(b)
jax.block_until_ready(f)
dt = (time.perf_counter() - t0) / 10
print("steady ms/step", round(dt * 1000, 1), "steps/s", round(1 / dt, 2),
      flush=True)
