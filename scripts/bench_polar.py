"""Polarizable-MD benchmark runner (dev tool).

Usage: python scripts/bench_polar.py [natoms] [diag|--] [colchunk]
                                     [--precision X] [--f64] [--steps K]

Prints `steady ms/step ... steps/s ... scf ...` on the last line.
"""
import argparse
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("natoms", type=int, nargs="?", default=10000)
ap.add_argument("mode", nargs="?", default="")
ap.add_argument("colchunk", type=int, nargs="?", default=2048)
ap.add_argument("--precision", type=float, default=None)
ap.add_argument("--f64", action="store_true")
ap.add_argument("--steps", type=int, default=0)
ap.add_argument("--static-trips", type=int, default=0,
                help="CG as a fixed-length scan (avoids the f64 "
                     "while_loop TPU fault at >=30k atoms)")
ap.add_argument("--host-strips", type=int, default=1,
                help="row strips per phase dispatch (host-cg mode)")
ap.add_argument("--host-cg", action="store_true",
                help="per-phase dispatches + host-driven CG: the axon "
                     "per-dispatch execution deadline (~1-2 min) kills the "
                     "fused step at 100k-atom f64 (one O(N^2) panel ~30 s)")
ap.add_argument("--mixed", action="store_true",
                help="mixed-precision iterative refinement: f32 inner-CG "
                     "panel matvecs, f64 outer residuals (host-cg mode)")
ap.add_argument("--predict", type=int, default=1, choices=(1, 2, 3, 4),
                help="SCF initial-guess dipole extrapolation order "
                     "(1 = plain warm start)")
args = ap.parse_args()

import jax

if args.f64:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from lidp_tpu.models import polar_bench

dtype = jnp.float64 if args.f64 else jnp.float32
precision = args.precision if args.precision is not None else (
    1e-11 if args.f64 else 1e-6)

b = polar_bench.build(target_atoms=args.natoms, n_devices=1,
                      col_chunk=args.colchunk, precision=precision,
                      dtype=dtype, cg_static_trips=args.static_trips,
                      host_strips=args.host_strips)
print("natoms", b.natoms, "npad", b.npad, "precision", precision,
      "dtype", str(dtype.__name__), flush=True)
if args.host_cg:
    import functools
    step_once = functools.partial(polar_bench.host_cg_step,
                                  mixed=args.mixed)
else:
    step_once = polar_bench.run_step
t0 = time.perf_counter()
f, en = step_once(b, zero_init=True)
jax.block_until_ready(f)
print("step compile+run", round(time.perf_counter() - t0, 1), flush=True)
print({k: round(float(v), 2) for k, v in en.items() if v.ndim == 0},
      flush=True)

if args.host_cg:
    # host-driven mode times whole steps (each already many dispatches)
    K = args.steps or 2
    t0 = time.perf_counter()
    for _ in range(K):
        f, en = step_once(b)
    jax.block_until_ready(f)
    dt_step = (time.perf_counter() - t0) / K
    print("steady ms/step", round(dt_step * 1000, 1), "steps/s",
          round(1 / dt_step, 4), "scf", float(en["scf_iters"]), flush=True)
    sys.exit(0)

if args.mode == "diag":
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
if args.steps:
    K = args.steps
else:
    K = 20 if args.natoms <= 20000 else 4
    if args.f64:
        K = max(2, K // 4)
run = polar_bench.make_scan_runner(b, K, predict=args.predict)
f, scf = run(b)          # warmup dispatch (compile; first window has cold SCF)
jax.block_until_ready(f)
t0 = time.perf_counter()
f, scf = run(b)
jax.block_until_ready(f)
dt = (time.perf_counter() - t0) / K
import numpy as np  # noqa: E402
scf_avg = float(np.mean(np.asarray(scf)))
print("steady ms/step", round(dt * 1000, 1), "steps/s", round(1 / dt, 3),
      "scf", float(scf[-1]), flush=True)
# kernel-FLOPs accounting for the O(N^2) polar panels (flops/pair from
# ops/pallas_panel.py cost estimates; eind runs once per CG iteration
# + once for the initial residual): the panels are elementwise VPU work,
# so utilization is against the v5e VPU f32 peak (~3.9 TFLOP/s)
pairs = float(b.npad) ** 2
flops_step = pairs * (45.0 * (scf_avg + 1.0) + 30.0 + 140.0 + 70.0)
gfps = flops_step / dt / 1e9
print("panel_gflops", round(gfps, 1), "vpu_util_pct",
      round(100 * gfps / 3900.0, 1), "scf_avg", round(scf_avg, 2),
      flush=True)
