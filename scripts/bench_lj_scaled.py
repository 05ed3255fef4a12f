"""Scaled-size LJ sweep (dev tool) — the reference's scaled-size benchmark
methodology (bench/README:23-39, doc/src/Section_perf.txt:21-80): the same
fcc melt at 32k / 108k / 256k / 1.05M atoms on one chip via the slot path.

Prints one `ljscale n=N steps/s X` line per size (and `ljscale_note ...` on
a capacity wall) so the caller can harvest whatever finished before its
budget ran out.
"""
import sys
import time

import jax
import jax.numpy as jnp

from lidp_tpu.models import lj_melt
from lidp_tpu.models.polar_bench import enable_compile_cache

enable_compile_cache()

# nx = 20*scale cells per dim, N = 4*nx^3: 32k, 108k, 256k, 1,048,576
SIZES = [(1.0, 100), (1.5, 100), (2.0, 100), (3.2, 50)]


def run_size(scale, nsteps, cap_slack, neighbor="slots"):
    """Returns steps/s, or None on cell-capacity overflow (retryable)."""
    n = 4 * int(round(20 * scale)) ** 3
    melt = lj_melt.build(scale=scale, dtype=jnp.float32,
                         neighbor=neighbor, cap_slack=cap_slack)
    sys_, res, nlist, istate = melt.runner.setup(melt.system)
    if bool(nlist.overflow):
        print(f"ljscale_note n={n} cell overflow at setup"
              f" (slack {cap_slack})", flush=True)
        return None
    out = melt.runner.run(sys_, res, nlist, istate, nsteps)
    jax.block_until_ready(out[0].x)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = melt.runner.run(*out, nsteps)
        jax.block_until_ready(out[0].x)
        dt = time.perf_counter() - t0
        if dt > 0.05:
            best = dt if best is None else min(best, dt)
    if bool(out[2].overflow):
        print(f"ljscale_note n={n} cell overflow during run"
              f" (slack {cap_slack})", flush=True)
        return None
    return nsteps / best


for scale, nsteps in SIZES:
    n = 4 * int(round(20 * scale)) ** 3
    try:
        # extreme-value cell occupancy: retry the size on a slack ladder
        for cap_slack in (1.5 if n <= 110_000 else 1.75, 2.0):
            v = run_size(scale, nsteps, cap_slack)
            if v is not None:
                print(f"ljscale n={n} steps/s {round(v, 3)}", flush=True)
                break
    except Exception as e:  # noqa: BLE001 — report the wall, then try the
        # XLA roll-cell path: the 256k+ Pallas slot program crashes the
        # axon remote compile helper (HTTP 500), the plain-XLA kernel
        # compiles fine (slower per step, but a real measurement)
        print(f"ljscale_note n={n} {type(e).__name__}: {e}"[:300],
              flush=True)
        try:
            v = run_size(scale, nsteps, 2.0, neighbor="cells")
            if v is not None:
                print(f"ljscale n={n} steps/s {round(v, 3)} (cells path)",
                      flush=True)
        except Exception as e2:  # noqa: BLE001
            print(f"ljscale_note n={n} cells {type(e2).__name__}: "
                  f"{e2}"[:300], flush=True)
        continue
