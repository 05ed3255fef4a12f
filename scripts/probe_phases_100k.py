"""Time each host phase at the given size/chunk, synchronizing after each
dispatch, to find which phase trips the axon runtime at 100k f64."""
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lidp_tpu.models import polar_bench

natoms = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512

b = polar_bench.build(target_atoms=natoms, n_devices=1, col_chunk=chunk,
                      precision=1e-11, dtype=jnp.float64)
a = b.arrays
ph = b.phases
x, q, typ, mol, alpha, mask = (a["x"], a["q"], a["type"], a["mol"],
                               a["alpha"], a["mask"])
print("natoms", b.natoms, "chunk", chunk, flush=True)

for name, fn, args in (
    ("nonpolar", ph["nonpolar"], (x, q, typ, mask)),
    ("wolf", ph["wolf"], (x, q, mol, mask)),
    ("eind", ph["eind"], (x, alpha, mask, a["mu"])),
    ("dipole", ph["dipole"], (x, q, mol, alpha, a["mu"], mask)),
):
    for trial in ("cold", "warm"):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name} {trial} {time.perf_counter() - t0:.1f}s", flush=True)
