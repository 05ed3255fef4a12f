"""Benchmark entry point (driver-run on real TPU hardware).

Reproduces the reference's headline benchmark bench/in.lj — 32,000-atom LJ
melt, cutoff 2.5 sigma, NVE, neighbor skin 0.3 rebuilt every 20 steps — and
reports timesteps/s against the committed single-core baseline of
44.212 steps/s (bench/log.6Oct16.lj.fixed.icc.1:55).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax

BASELINE_STEPS_PER_S = 44.212   # bench/log.6Oct16.lj.fixed.icc.1
NSTEPS = 400


def main():
    import jax.numpy as jnp

    from lidp_tpu.models import lj_melt
    from lidp_tpu.thermo import thermo_row

    melt = lj_melt.build(scale=1, dtype=jnp.float32, neighbor="cells")
    sys_, res, nlist, istate = melt.runner.setup(melt.system)
    if bool(nlist.overflow):
        print(json.dumps({"error": "neighbor overflow"}))
        return 1

    # warmup with the SAME static scan length (scan length is a compile-time
    # constant; a different warmup length would leave compilation in the
    # timed region)
    s2, r2, n2, i2 = melt.runner.run(sys_, res, nlist, istate, NSTEPS)
    jax.block_until_ready(s2.x)

    t0 = time.perf_counter()
    s2, r2, n2, i2 = melt.runner.run(sys_, res, nlist, istate, NSTEPS)
    jax.block_until_ready(s2.x)
    dt = time.perf_counter() - t0
    steps_per_s = NSTEPS / dt

    # sanity: energy conservation in f32
    row = {k: float(v) for k, v in thermo_row(s2, r2, melt.thermo).items()}
    e_drift = abs(row["etotal"] - (-4.6134356)) / 4.6134356

    out = {
        "metric": "lj_32k_timesteps_per_s",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
        "etotal_rel_drift": round(e_drift, 6),
        "n_atoms": melt.natoms,
        "device": str(jax.devices()[0]),
    }

    # secondary headline: the polarizable MOF workload (BASELINE config 4/5).
    # Runs in a subprocess with a hard timeout so a cold remote compile can
    # never prevent the JSON line from printing.
    polar = _try_polar_bench(timeout_s=540)
    if polar:
        out.update(polar)
    print(json.dumps(out))
    return 0


def _try_polar_bench(timeout_s: int):
    """10.6k-atom replicated MOF5+Methane full-SCF step (sharded path).

    Reference anchor: 0.91 steps/s at 1,324 atoms on one core
    (MOF5+Methane log, Pair 99.7%); the solver is O(N^2) per sweep, so the
    single-core reference extrapolates to ~0.0142 steps/s at this size.
    """
    import os
    import re
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo:" + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            ["python", "scripts/bench_polar.py", "10000"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
    except subprocess.TimeoutExpired:
        return {"polar_mof_10k_steps_per_s": None,
                "polar_note": "compile timeout (cold cache)"}
    m = re.search(r"steps/s ([0-9.]+) scf ([0-9.]+)", r.stdout)
    if not m:
        return {"polar_mof_10k_steps_per_s": None,
                "polar_note": "failed: " + r.stdout[-200:].replace("\n", " ")}
    v, scf = float(m.group(1)), float(m.group(2))
    if scf >= 100.0:   # SCF hit iterations_max — timing would be meaningless
        return {"polar_mof_10k_steps_per_s": None,
                "polar_note": "SCF did not converge (scf=%g)" % scf}
    lammps_extrapolated = 0.91 / (10592 / 1324.0) ** 2
    return {
        "polar_mof_10k_steps_per_s": v,
        "polar_mof_10k_n_atoms": 10592,
        "polar_mof_10k_scf_iters": scf,
        "polar_vs_reference_extrapolated": round(v / lammps_extrapolated, 1),
    }


if __name__ == "__main__":
    sys.exit(main())
