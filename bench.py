"""Benchmark entry point (driver-run on real TPU hardware).

Headline: the reference's bench/in.lj — 32,000-atom LJ melt, cutoff 2.5 sigma,
NVE, neighbor skin 0.3 rebuilt every 20 steps `check no` — timesteps/s against
the committed single-core baseline of 44.212 steps/s
(bench/log.6Oct16.lj.fixed.icc.1:55).

Secondary stages, ordered by importance (the driver may kill this process at
its wall cap, so the cumulative JSON line is (re)printed after EVERY stage —
the LAST line wins): polar 10k f32 -> polar 10k f64/1e-11 -> EAM -> polar
100k f32 -> chute -> error budget -> scaled-size LJ sweep -> rhodo-class ->
polar 100k f64/1e-11.  A global wall budget (BENCH_BUDGET_S, default 1500 s)
gates each stage: stages that don't fit emit "skipped: budget" instead of
running past the driver cap.

Energy-conservation note: in.lj with `neigh_modify every 20 check no` drifts
BY CONSTRUCTION (stale lists miss fast atoms): the reference's own f64 log
drifts 1.93e-3 over its 100 steps (TotEng -4.6134356 -> -4.6223613).  We
report our 400-step f32 drift next to that anchor.

Prints the cumulative JSON line {"metric", "value", "unit", "vs_baseline",
...} after every stage; parse the LAST JSON line of stdout.
"""

import json
import os
import re
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

BASELINE_STEPS_PER_S = 44.212   # bench/log.6Oct16.lj.fixed.icc.1
REF_DRIFT_PER_100 = 1.93e-3     # the reference f64 log's own TotEng drift
NSTEPS = 400

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


# v5e VPU f32 peak: 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.9 TFLOP/s.  The
# cell kernel is elementwise (VPU-bound); MXU peak is not the right anchor.
VPU_PEAK_FLOPS = 3.9e12
FLOPS_PER_PAIR_SLOT = 40   # kernel arithmetic per stencil slot pair (lj only)
FLOPS_PER_PAIR_USEFUL = 23  # the classic LAMMPS per-neighbor-pair count


def _lj_flops_per_step(melt):
    """Analytic FLOP count of one slot-kernel force evaluation."""
    cfg = melt.runner.neighbor_cfg
    ncells = cfg.nbins[0] * cfg.nbins[1] * cfg.nbins[2]
    # the fused kernel pads the candidate lane axis to a 128 multiple
    K_pad = -(-(14 * cfg.cap) // 128) * 128
    slot_pairs = ncells * cfg.cap * K_pad
    kernel = slot_pairs * FLOPS_PER_PAIR_SLOT
    # pairs within cutoff 2.5 at rho=0.8442: (2*pi/3)*rho*rc^3 per atom
    import math
    pairs = melt.natoms * (2 * math.pi / 3) * 0.8442 * 2.5 ** 3
    useful = pairs * FLOPS_PER_PAIR_USEFUL
    return kernel, useful


def _stage_lj(out):
    import jax.numpy as jnp

    from lidp_tpu.models import lj_melt
    from lidp_tpu.thermo import thermo_row

    melt = lj_melt.build(scale=1, dtype=jnp.float32, neighbor="slots")
    sys_, res, nlist, istate = melt.runner.setup(melt.system)
    if bool(nlist.overflow):
        out["lj_note"] = "neighbor overflow"
        return

    # warmup with the SAME static scan length (scan length is a compile-time
    # constant; a different warmup length would leave compilation in the
    # timed region).  Timed runs CHAIN the state: the axon runtime can serve
    # a repeat invocation with identical arguments from cache, which would
    # fake multi-thousand-x numbers.  Take the best of three chained runs.
    s2, r2, n2, i2 = melt.runner.run(sys_, res, nlist, istate, NSTEPS)
    jax.block_until_ready(s2.x)
    # f32 energy conservation over the first 400 steps (the reference's own
    # f64 log drifts 1.93e-3 over 100 steps on this stale-list benchmark)
    row = {k: float(v) for k, v in thermo_row(s2, r2, melt.thermo).items()}
    e_drift = abs(row["etotal"] - (-4.6134356)) / 4.6134356

    best_dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        s2, r2, n2, i2 = melt.runner.run(s2, r2, n2, i2, NSTEPS)
        jax.block_until_ready(s2.x)
        dt = time.perf_counter() - t0
        if dt > 0.05:   # discard cache-artifact instant returns
            best_dt = dt if best_dt is None else min(best_dt, dt)
    steps_per_s = NSTEPS / best_dt
    if bool(n2.overflow):
        out["lj_note"] = "cell capacity overflow during run"
        return

    # step-100 golden parity vs the committed log's TotEng -4.6223613
    s1, r1, nl1, i1 = melt.runner.run(sys_, res, nlist, istate, 100)
    jax.block_until_ready(s1.x)
    row100 = {k: float(v) for k, v in thermo_row(s1, r1, melt.thermo).items()}
    step100_err = abs(row100["etotal"] - (-4.6223613)) / 4.6223613

    kernel_flops, useful_flops = _lj_flops_per_step(melt)
    out.update({
        "metric": "lj_32k_timesteps_per_s",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
        "etotal_rel_drift_400": round(e_drift, 6),
        "ref_log_drift_100": REF_DRIFT_PER_100,
        "etotal_step100_vs_log_rel": round(step100_err, 6),
        "n_atoms": melt.natoms,
        "kernel_gflops_per_s": round(kernel_flops * steps_per_s / 1e9, 1),
        "useful_gflops_per_s": round(useful_flops * steps_per_s / 1e9, 1),
        "vpu_util_pct": round(100 * kernel_flops * steps_per_s
                              / VPU_PEAK_FLOPS, 1),
        "device": str(jax.devices()[0]),
    })


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ("/root/.axon_site:/root/repo:"
                         + env.get("PYTHONPATH", ""))
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    return env


def _run_script(args, timeout_s):
    return subprocess.run(
        ["python"] + args, capture_output=True, text=True, timeout=timeout_s,
        cwd=os.path.dirname(os.path.abspath(__file__)), env=_env())


def _try_polar_bench(timeout_s: int):
    """10.6k-atom replicated MOF5+Methane full-SCF step, f32 fast path.

    Reference anchor: 0.91 steps/s at 1,324 atoms on one core
    (MOF5+Methane log, Pair 99.7%); the solver is O(N^2) per sweep, so the
    single-core reference extrapolates to ~0.0142 steps/s at this size.
    """
    try:
        r = _run_script(["scripts/bench_polar.py", "10000"], timeout_s)
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
    res = {
        "polar_mof_10k_steps_per_s": v,
        "polar_mof_10k_n_atoms": 10592,
        "polar_mof_10k_scf_iters": scf,
        "polar_vs_reference_extrapolated": round(v / lammps_extrapolated, 1),
    }
    m2 = re.search(r"panel_gflops ([0-9.]+) vpu_util_pct ([0-9.]+)", r.stdout)
    if m2:
        res["polar_panel_gflops_per_s"] = float(m2.group(1))
        res["polar_vpu_util_pct"] = float(m2.group(2))
    return res


def _try_eam(timeout_s: int):
    """bench/in.eam 32k Cu EAM; reference 16.764 steps/s on one core
    (log.6Oct16.eam.fixed.icc.1:59)."""
    try:
        r = _run_script(["scripts/bench_eam.py"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"eam_32k_steps_per_s": None,
                "eam_note": "compile timeout (cold cache)"}
    m = re.search(r"eam steps/s ([0-9.]+)", r.stdout)
    if not m:
        return {"eam_32k_steps_per_s": None,
                "eam_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    v = float(m.group(1))
    return {"eam_32k_steps_per_s": v,
            "eam_vs_baseline": round(v / 16.764, 2)}


def _try_polar_100k(timeout_s: int):
    """BASELINE config 5: the 100k-atom replicated polarizable MOF.
    The O(N^2)-serial reference extrapolates to 1.42e-4 steps/s here."""
    try:
        r = _run_script(["scripts/bench_polar.py", "100000", "run",
                         "4096", "--steps", "3"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"polar_mof_100k_steps_per_s": None,
                "polar_100k_note": "compile timeout (cold cache)"}
    m = re.search(r"steps/s ([0-9.]+) scf ([0-9.]+)", r.stdout)
    if not m:
        return {"polar_mof_100k_steps_per_s": None,
                "polar_100k_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    lammps_extrapolated = 0.91 / (105920 / 1324.0) ** 2
    return {
        "polar_mof_100k_steps_per_s": float(m.group(1)),
        "polar_mof_100k_n_atoms": 105920,
        "polar_100k_vs_reference_extrapolated": round(
            float(m.group(1)) / lammps_extrapolated, 1),
    }


def _try_chute(timeout_s: int):
    """bench/in.chute 32k granular chute; reference 187.205 steps/s on one
    core (log.6Oct16.chute.fixed.icc.1:56)."""
    try:
        r = _run_script(["scripts/bench_chute.py"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"chute_32k_steps_per_s": None,
                "chute_note": "compile timeout (cold cache)"}
    m = re.search(r"chute steps/s ([0-9.]+)", r.stdout)
    if not m:
        return {"chute_32k_steps_per_s": None,
                "chute_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    v = float(m.group(1))
    return {"chute_32k_steps_per_s": v,
            "chute_vs_baseline": round(v / 187.205, 2)}


def _try_polar_100k_1e11(timeout_s: int):
    """The north-star regime at the north-star size: 105,920 atoms,
    polar_precision 1e-11, through the PRODUCT path — the script engine
    runs the replicated MOF5+Methane input (`fix rigid/nve molecule`,
    thermo every step) and routes forces through the fast-polar engine's
    host-phase/df32 mode automatically (parallel/fast_polar.py).
    The O(N^2)-serial reference extrapolates to 1.42e-4 steps/s here."""
    try:
        r = _run_script(["scripts/bench_polar_script.py", "100000",
                         "--f64", "--precision", "1e-11", "--steps", "2"],
                        timeout_s)
    except subprocess.TimeoutExpired:
        return {"polar_100k_1e11_steps_per_s": None,
                "polar_100k_1e11_note": "timeout"}
    m = re.search(r"script n (\d+) steps/s ([0-9.eE+-]+) scf ([0-9.-]+) "
                  r"setup ([0-9.]+) compile_s ([0-9.]+)", r.stdout)
    if not m:
        return {"polar_100k_1e11_steps_per_s": None,
                "polar_100k_1e11_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    v = float(m.group(2))
    return {
        "polar_100k_1e11_steps_per_s": v,
        "polar_100k_1e11_scf_iters": float(m.group(3)),
        "polar_100k_1e11_compile_s": float(m.group(5)),
        "polar_100k_1e11_vs_reference_extrapolated": round(v / 1.42e-4, 1),
        "polar_100k_1e11_engine": "script+fix rigid/nve (fast-polar host)",
    }


def _try_polar_1e11(timeout_s: int):
    """The reference's own precision regime on TPU: f64, precision 1e-11,
    through the product script path (fast-polar host mode: df32 Pallas
    panels + mixed-precision host CG)."""
    try:
        r = _run_script(["scripts/bench_polar_script.py", "10000",
                         "--f64", "--precision", "1e-11", "--steps", "3"],
                        timeout_s)
    except subprocess.TimeoutExpired:
        return {"polar_1e11_f64_steps_per_s": None,
                "polar_1e11_note": "compile timeout (cold cache)"}
    m = re.search(r"script n (\d+) steps/s ([0-9.eE+-]+) scf ([0-9.-]+) "
                  r"setup ([0-9.]+) compile_s ([0-9.]+)", r.stdout)
    if not m:
        return {"polar_1e11_f64_steps_per_s": None,
                "polar_1e11_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    return {
        "polar_1e11_f64_steps_per_s": float(m.group(2)),
        "polar_1e11_f64_scf_iters": float(m.group(3)),
        "polar_1e11_compile_s": float(m.group(5)),
        "polar_1e11_n_atoms": int(m.group(1)),
    }


def _try_polar_script_100k_f32(timeout_s: int):
    """Product-path 100k f32 (fused scan engine from the script)."""
    try:
        r = _run_script(["scripts/bench_polar_script.py", "100000",
                         "--steps", "3"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"polar_script_100k_f32_note": "timeout"}
    m = re.search(r"script n (\d+) steps/s ([0-9.eE+-]+) scf ([0-9.-]+) "
                  r"setup ([0-9.]+) compile_s ([0-9.]+)", r.stdout)
    if not m:
        return {"polar_script_100k_f32_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    v = float(m.group(2))
    return {"polar_script_100k_f32_steps_per_s": v,
            "polar_script_100k_f32_compile_s": float(m.group(5)),
            "polar_script_100k_f32_vs_ref": round(v / 1.42e-4, 1)}


def _try_error_budget(timeout_s: int):
    """Measured f32(1e-6) vs f64(1e-11) force/mu error at 1,324 atoms."""
    try:
        r = _run_script(["scripts/polar_error_budget.py", "1324"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"f32_force_rms_rel_err": None,
                "errbudget_note": "timeout"}
    m = re.search(r"ERRBUDGET .*force_rms_rel_err=([0-9.e+-]+) "
                  r"force_max_rel_err=([0-9.e+-]+) "
                  r"mu_rms_rel_err=([0-9.e+-]+)", r.stdout)
    if not m:
        return {"f32_force_rms_rel_err": None,
                "errbudget_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    return {
        "f32_force_rms_rel_err": float(m.group(1)),
        "f32_force_max_rel_err": float(m.group(2)),
        "f32_mu_rms_rel_err": float(m.group(3)),
    }


def _try_lj_scaled(timeout_s: int):
    """Scaled-size LJ sweep (bench/README:23-39): 32k -> 1M atoms on one
    chip via the slot path; steps/s + HBM behavior at each size."""
    try:
        r = _run_script(["scripts/bench_lj_scaled.py"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"lj_scaled_note": "timeout"}
    res = {}
    for m in re.finditer(r"ljscale n=(\d+) steps/s ([0-9.]+)", r.stdout):
        res[f"lj_{int(m.group(1))//1000}k_steps_per_s"] = float(m.group(2))
    notes = [m.group(1).strip()
             for m in re.finditer(r"ljscale_note (.*)", r.stdout)]
    if notes:
        res["lj_scaled_note"] = "; ".join(notes)
    if not res:
        res["lj_scaled_note"] = ("failed: "
                                 + (r.stdout + r.stderr)[-200:]
                                 .replace("\n", " "))
    return res


def _try_rhodo_class(timeout_s: int):
    """Rhodo-class workload (CHARMM + long-range + SHAKE + NPT at ~32k
    atoms; data.rhodo itself is absent from the reference checkout, so
    examples/peptide replicated to 8 images = 32,160 atoms stands in).
    Anchor: bench/in.rhodo = 2.855 steps/s on one core
    (log.6Oct16.rhodo.fixed.icc.1:95)."""
    try:
        r = _run_script(["scripts/bench_rhodo_class.py"], timeout_s)
    except subprocess.TimeoutExpired:
        return {"rhodo_class_steps_per_s": None,
                "rhodo_note": "timeout"}
    m = re.search(r"rhodo_class steps/s ([0-9.]+)", r.stdout)
    if not m:
        return {"rhodo_class_steps_per_s": None,
                "rhodo_note": "failed: "
                + (r.stdout + r.stderr)[-200:].replace("\n", " ")}
    v = float(m.group(1))
    return {"rhodo_class_steps_per_s": v,
            "rhodo_class_n_atoms": 32064,
            "rhodo_class_vs_baseline": round(v / 2.855, 2)}


def main():
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    # stage table: (min seconds a stage needs to be worth starting, callable)
    try:
        _stage_lj(out)
    except Exception as e:  # noqa: BLE001 — always emit something
        out["lj_note"] = f"failed: {type(e).__name__}: {e}"[:200]
    emit()

    # the north-star regime (100k/1e-11) runs THIRD so a cold cache or slow
    # chip can't push it past the driver's wall cap again (it was the one
    # stage skipped in the r4 dry run)
    # (name, min seconds worth starting, per-stage cap, callable) — the cap
    # stops one slow stage from starving the rest (r4: five stages read
    # "skipped: budget"); with the compile cache warm every stage is fast
    stages = [
        ("polar10k", 60, 240, lambda t: _try_polar_bench(t)),
        ("polar1e11", 60, 300, lambda t: _try_polar_1e11(t)),
        ("polar100k_1e11", 240, 600, lambda t: _try_polar_100k_1e11(t)),
        ("eam", 60, 240, lambda t: _try_eam(t)),
        ("polar100k_script", 60, 300,
         lambda t: _try_polar_script_100k_f32(t)),
        ("lj_scaled", 60, 300, lambda t: _try_lj_scaled(t)),
        ("rhodo", 60, 300, lambda t: _try_rhodo_class(t)),
        ("chute", 60, 480, lambda t: _try_chute(t)),
        ("errbudget", 45, 180, lambda t: _try_error_budget(t)),
        ("polar100k", 60, 240, lambda t: _try_polar_100k(t)),
    ]
    for name, min_s, cap_s, fn in stages:
        rem = _remaining()
        if rem < min_s:
            out[f"{name}_note"] = f"skipped: budget ({rem:.0f}s left)"
            emit()
            continue
        t_stage = time.monotonic()
        try:
            out.update(fn(int(min(rem, cap_s))))
        except Exception as e:  # noqa: BLE001
            out[f"{name}_note"] = f"failed: {type(e).__name__}: {e}"[:200]
        out[f"{name}_elapsed_s"] = round(time.monotonic() - t_stage, 1)
        out["bench_elapsed_s"] = round(time.monotonic() - _T0, 1)
        emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
