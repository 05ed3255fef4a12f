"""Bisect the f64-at-scale TPU runtime fault (UNAVAILABLE kernel fault at
>=30k atoms).  Runs one variant per invocation: python probe_f64_fault.py
<variant> [natoms]."""
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lidp_tpu.models import polar_bench

variant = sys.argv[1]
natoms = int(sys.argv[2]) if len(sys.argv) > 2 else 30000

kw = dict(target_atoms=natoms, n_devices=1, col_chunk=1024,
          precision=1e-11, dtype=jnp.float64)
if variant == "while":
    b = polar_bench.build(**kw)
elif variant == "static1":
    b = polar_bench.build(**kw, cg_static_trips=1)
elif variant.startswith("static"):
    b = polar_bench.build(**kw, cg_static_trips=int(variant[6:]))
elif variant == "jacobi":
    b = polar_bench.build(**kw, fixed_iterations=4)
else:
    raise SystemExit(f"unknown variant {variant}")

print("variant", variant, "natoms", b.natoms, flush=True)
t0 = time.perf_counter()
f, en = polar_bench.run_step(b, zero_init=True)
jax.block_until_ready(f)
print("OK", variant, "compile+run", round(time.perf_counter() - t0, 1),
      {k: round(float(v), 2) for k, v in en.items() if v.ndim == 0},
      flush=True)
t0 = time.perf_counter()
f, en = polar_bench.run_step(b)
jax.block_until_ready(f)
print("OK warm step", round(time.perf_counter() - t0, 1), "s",
      "scf", float(en["scf_iters"]), flush=True)
