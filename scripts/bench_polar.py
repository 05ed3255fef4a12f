"""Polarizable-MD benchmark runner (dev tool). Usage: python scripts/bench_polar.py [natoms]"""
import sys, time
import jax
from lidp_tpu.models import polar_bench

target = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
csz = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
b = polar_bench.build(target_atoms=target, n_devices=1, col_chunk=csz)
print("natoms", b.natoms, "npad", b.npad, flush=True)
t0 = time.perf_counter()
f, en = polar_bench.run_step(b, zero_init=True)
jax.block_until_ready(f)
print("step compile+run", round(time.perf_counter() - t0, 1), flush=True)
print({k: round(float(v), 2) for k, v in en.items() if v.ndim == 0}, flush=True)
import jax.numpy as jnp

diag = len(sys.argv) > 2 and sys.argv[2] == "diag"
if diag:
    for i in range(10):
        f, en = polar_bench.run_step(b)
        jax.block_until_ready(f)
        a = b.arrays
        print("step", i,
              {k: round(float(v), 2) for k, v in en.items() if v.ndim == 0},
              "max|f|", float(jnp.max(jnp.abs(f))),
              "max|v|", float(jnp.max(jnp.abs(a["v"]))),
              "max|mu|", float(jnp.max(jnp.abs(a["mu"]))), flush=True)
    sys.exit(0)

# steady timing: K steps per dispatch (the per-call tunnel overhead is ~40 ms)
K = 20 if target <= 20000 else 4
run = polar_bench.make_scan_runner(b, K)
f, scf = run(b)          # warmup dispatch (compile; first window has cold SCF)
jax.block_until_ready(f)
t0 = time.perf_counter()
f, scf = run(b)
jax.block_until_ready(f)
dt = (time.perf_counter() - t0) / K
print("steady ms/step", round(dt * 1000, 1), "steps/s", round(1 / dt, 3),
      "scf", float(scf[-1]), flush=True)
