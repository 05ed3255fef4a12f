"""Timing probe: K MD steps inside ONE dispatch (lax.scan) vs per-step
dispatch — isolates the axon tunnel / dispatch overhead from compute."""
import sys, time
import jax, jax.numpy as jnp
from lidp_tpu.models import polar_bench

target = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
b = polar_bench.build(target_atoms=target, n_devices=1, col_chunk=2048)
a = b.arrays
print("natoms", b.natoms, "npad", b.npad, flush=True)

step = b.step  # jitted single step

def scan_steps(x, v, f, q, t, mol, al, mu, mass, mask):
    def body(c, _):
        x, v, mu, f = c
        x2, v2, mu2, f2, en = step(x, v, f, q, t, mol, al, mu, mass, mask)
        return (x2, v2, mu2, f2), en["scf_iters"]
    (x, v, mu, f), scf = jax.lax.scan(body, (x, v, mu, f), None, length=K)
    return x, v, mu, f, scf

js = jax.jit(scan_steps)
t0 = time.perf_counter()
out = js(a["x"], a["v"], jnp.zeros_like(a["x"]), a["q"], a["type"], a["mol"],
         a["alpha"], a["mu"], a["mass"], a["mask"])
jax.block_until_ready(out[0])
print("scan compile+first:", round(time.perf_counter() - t0, 1), flush=True)
t0 = time.perf_counter()
out = js(a["x"], a["v"], jnp.zeros_like(a["x"]), a["q"], a["type"], a["mol"],
         a["alpha"], a["mu"], a["mass"], a["mask"])
jax.block_until_ready(out[0])
dt = time.perf_counter() - t0
print(f"scan {K} steps: total {dt*1000:.1f} ms -> {dt*1000/K:.1f} ms/step "
      f"({K/dt:.2f} steps/s) scf {[float(v) for v in out[4]]}", flush=True)
