"""Script-driven polarizable MOF benchmark — the PRODUCT path.

Unlike scripts/bench_polar.py (which drives the raw panel engine from a
stripped harness), this runs the real thing: a LAMMPS input derived from
the reference's MOF5+Methane example — `fix rigid/nve molecule`, thermo
every step, `replicate` to the target size — through the script engine,
which routes force evaluation through the production fast-polar engine
(parallel/fast_polar.py) automatically.

Reference anchor: the example logs 0.91 steps/s at 1,324 atoms on one
core (Pair 99.7%, O(N^2) serial); extrapolations to the replicated sizes
are steps/s * (1324/N)^2.

Usage: bench_polar_script.py [natoms] [--f64] [--precision P] [--steps K]
Prints: "script steps/s X scf Y setup Z compile_s W"
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOF5_DIR = "/root/reference/polarization/examples/MOF5+Methane"


def make_input(tmpdir: str, target_atoms: int, precision: float,
               nsteps: int, velocity: bool) -> str:
    import numpy as np

    n0 = 1324
    per_dim = round((target_atoms / n0) ** (1 / 3))
    reps = [max(1, per_dim)] * 3
    while int(np.prod(reps)) * n0 < target_atoms * 0.9:
        reps[int(np.argmin(reps))] += 1

    src = open(os.path.join(MOF5_DIR,
                            "MOF5+PCRC.restart.pdb.input")).read()
    out = []
    for line in src.splitlines():
        t = line.split("#")[0].strip()
        if not t:
            continue
        if t.startswith("dump"):
            continue                      # no dump in the timed benchmark
        if t.startswith("velocity") and not velocity:
            continue
        if t.startswith("variable") and "nstep" in t:
            out.append(f"variable nstep equal {nsteps}")
            continue
        if t.startswith("variable") and "freq" in t:
            out.append(f"variable freq equal "
                       f"{os.environ.get('LIDP_BENCH_THERMO', '1')}")
            continue
        if t.startswith("pair_style") and precision is not None:
            toks = t.split()
            i = toks.index("precision")
            toks[i + 1] = repr(precision)
            out.append(" ".join(toks))
            continue
        if t.startswith("read_data"):
            out.append(line)
            if reps != [1, 1, 1]:
                # the pdb-derived data ships without image flags, so the
                # driver infers them from the bond graph before this line
                # executes (topology.infer_image_flags) — replicate unmaps
                # via image flags and would otherwise tear the framework's
                # through-boundary bonds at every seam
                out.append(f"replicate {reps[0]} {reps[1]} {reps[2]}")
            continue
        if t.startswith("group moving") and reps != [1, 1, 1]:
            # replicate offsets molecule ids per copy, so `molecule > 1`
            # would mark replicated FRAMEWORK copies as moving; the
            # sorbate-only types express the example's intent at any size
            out.append("group moving type 8 9 10")
            continue
        out.append(line)
    path = os.path.join(tmpdir, "bench.input")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    # data file resolves relative to the input's directory
    link = os.path.join(tmpdir, "MOF5+PCRC.restart.pdb.data")
    if not os.path.exists(link):
        os.symlink(os.path.join(MOF5_DIR, "MOF5+PCRC.restart.pdb.data"),
                   link)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("natoms", nargs="?", type=int, default=10000)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--precision", type=float, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--velocity", action="store_true",
                    help="keep the velocity create line (host-side RanPark "
                         "loop; skipped by default at bench sizes)")
    ap.add_argument("--timing", action="store_true",
                    help="print per-phase host timings")
    args = ap.parse_args()

    import tempfile

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    if not args.f64:
        jax.config.update("jax_enable_x64", False)
    else:
        jax.config.update("jax_enable_x64", True)
    if args.timing:
        os.environ["LIDP_PHASE_TIMING"] = "1"

    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    precision = args.precision if args.precision is not None else (
        1e-11 if args.f64 else 1e-6)
    tmpdir = tempfile.mkdtemp(prefix="lidp_bench_")
    path = make_input(tmpdir, args.natoms, precision, args.steps,
                      args.velocity)

    t0 = time.perf_counter()
    s = LammpsScript(dtype=jnp.float64 if args.f64 else jnp.float32,
                     log=lambda line: print(line, flush=True))
    s.root = tmpdir
    src = open(path).read().splitlines()
    for line in src:
        t = line.split("#")[0].strip()
        if t.startswith("run"):
            continue
        s.one(line)
        if t.startswith("read_data"):
            from lidp_tpu import topology

            s.image = topology.infer_image_flags(
                s.x, getattr(s, "_bonds", None), s.box_lo, s.box_hi,
                mol=s.mol)
    n = s.x.shape[0]
    t_parse = time.perf_counter() - t0

    # warmup: one step compiles every program (scan chunk length is 1 when
    # thermo prints every step, so `run 1` compiles the same programs)
    t0 = time.perf_counter()
    s.one("run 1")
    t_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    s.one(f"run {args.steps}")
    dt = time.perf_counter() - t0
    steps_per_s = args.steps / dt
    scf = [float(r.get("scf", 0.0)) for r in s.thermo_rows]
    # scf iters come through the Simulation res; read from the engine
    try:
        scf_last = float(s._sim.res.scf_iters)
    except Exception:  # noqa: BLE001
        scf_last = -1.0
    ref = 0.91 / (n / 1324.0) ** 2
    print(f"script n {n} steps/s {steps_per_s:.6g} scf {scf_last:.1f} "
          f"setup {t_parse:.1f} compile_s {t_warm:.1f} "
          f"vs_ref {steps_per_s / ref:.1f}", flush=True)


if __name__ == "__main__":
    main()
