"""North-star benchmark config: replicated 100k-atom polarizable MOF+sorbate.

BASELINE.json config 5: "Precision-mode SCF on replicated 100k-atom
polarizable MOF".  The MOF5+Methane example cell (1324 atoms, 25.67 A) is
replicated to the requested atom count; the full polarizable force field (LJ +
real-space Ewald + reciprocal Ewald + Wolf static field + CG SCF dipoles +
dipole forces) runs through the sharded column-chunked step
(parallel/shard.py) — on a single chip that is simply a 1-device mesh.

The reference runs this workload single-rank-only at O(N^2) per GS sweep:
0.91 steps/s at 1,324 atoms (MOF5+Methane log), which extrapolates to
~1.6e-4 steps/s at 100k.  Every measured steps/s at 100k is directly
comparable to that anchor.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MOF5_DIR = "/root/reference/polarization/examples/MOF5+Methane"


def build_script(target_atoms: int = 100_000, precision: float = 1e-6):
    """Interpreter state for the replicated system (no run executed)."""
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    script = LammpsScript(dtype=jnp.float32)
    script.root = MOF5_DIR
    import os

    lines = open(os.path.join(MOF5_DIR, "MOF5+PCRC.restart.pdb.input")).read()
    for line in lines.splitlines():
        t = line.split("#")[0].strip()
        if not t or t.startswith(("run", "dump", "velocity", "fix", "thermo",
                                  "compute", "group")):
            continue
        script.one(line)

    n0 = script.x.shape[0]
    per_dim = round((target_atoms / n0) ** (1 / 3))
    reps = [max(1, per_dim)] * 3
    while np.prod(reps) * n0 < target_atoms * 0.9:
        reps[int(np.argmin(reps))] += 1
    script.one(f"replicate {reps[0]} {reps[1]} {reps[2]}")
    script.pair.polar_precision = precision
    return script


@dataclasses.dataclass
class PolarBench:
    step: object
    init: object
    arrays: dict
    natoms: int
    npad: int
    # host-driven phase mode (per-dispatch execution deadline workaround)
    phases: dict | None = None
    settings: object = None
    dt: float = 0.0
    ftm2v: float = 1.0


def enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        # persist even tiny eager-op programs: each compile is an RPC
        # through the axon tunnel (~1.5 s); ~90 of them dominated the
        # script-bench "compile" time once the big programs were cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def build(target_atoms: int = 100_000, n_devices: int = 1,
          precision: float = 1e-6, col_chunk: int = 4096,
          fixed_iterations: int | None = None, dt: float = 0.1,
          dtype=None, cg_static_trips: int = 0, host_strips: int = 1,
          panel: str = "auto"):
    """fixed_iterations: use the static-trip-count Jacobi mode instead of the
    CG while_loop (dynamic trip counts sync through the axon tunnel).

    dt: the replicated config has genuine close contacts (the reference's own
    E_vdwl is ~2.2e4 kcal/mol/atom here); at dt=1 fs a sorbate atom in a bad
    contact runs away within ~6 free-NVE steps and NaNs the SCF.  The
    benchmark measures per-step force+SCF cost, whose FLOPs are independent of
    dt, so default to dt=0.1 fs: positions still move every step (warm-start
    SCF does real work, 4-6 CG iterations) but the handful of timed steps stay
    finite."""
    import jax
    import jax.numpy as jnp

    enable_compile_cache()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lidp_tpu import units
    from lidp_tpu.forcefield import ForceField
    from lidp_tpu.ops import polarization as pol_ops
    from lidp_tpu.ops.ewald import EwaldParams, setup_ewald_disp
    from lidp_tpu.ops.pair import make_pair_params
    from lidp_tpu.parallel import shard as pshard
    from lidp_tpu.sim import _mix_pair_tables

    if dtype is None:
        dtype = jnp.float32
    np_dtype = np.dtype(str(jnp.zeros((), dtype).dtype))
    u = units.REAL
    script = build_script(target_atoms, precision)
    n = script.x.shape[0]
    mass_atom = script.mass_type[script.type]
    alpha = script.alpha_type[script.type]

    eps, sig, cut = _mix_pair_tables(script)
    es = setup_ewald_disp(
        accuracy_rel=script.kspace[1], qqrd2e=u.qqr2e, q=script.q, natoms=n,
        cutoff=script.pair.cut_coul,
        box_lengths=script.box_hi - script.box_lo)
    pair = make_pair_params(eps, sig, cut, cut_coul=script.pair.cut_coul,
                            coul=True, qqrd2e=u.qqr2e, g_ewald=es.g_ewald,
                            dtype=dtype)
    ew = EwaldParams.from_setup(es, u.qqr2e, dtype=dtype)
    p = script.pair
    s = pol_ops.PolarizationSettings(
        iterations_max=(fixed_iterations if fixed_iterations
                        else p.iterations_max),
        fixed_iteration=fixed_iterations is not None,
        damping_type=pol_ops.DAMPING_EXPONENTIAL,
        polar_damp=p.polar_damp, polar_precision=precision,
        use_previous=True, cg_static_trips=cg_static_trips)
    ff = ForceField(pair=pair, ewald=ew, polar=s, qqrd2e=u.qqr2e)

    mesh = pshard.make_mesh(n_devices)
    make, bind_box, npad, bind_special = pshard.build_sharded_polar_step(
        mesh, ff, s, n=n, dt=dt, ftm2v=u.ftm2v, col_chunk=col_chunk,
        dtype=dtype, panel=panel)
    bind_box(script.box_hi - script.box_lo)
    if getattr(script, "_bonds", None) is not None and len(script._bonds):
        from lidp_tpu import topology

        sp_idx, sp_lvl = topology.special_lists(n, script._bonds)
        bind_special(sp_idx, sp_lvl)
    step, init = make(mesh)

    # freeze the framework (the example's `fix rigid/nve moving` integrates
    # only molecules > 1; atoms outside any fix never move in the reference):
    # framework molecules are the large ones (424 atoms vs <=9 per sorbate)
    mol_ids, counts = np.unique(script.mol, return_counts=True)
    framework_mols = set(mol_ids[counts > 50])
    frozen = np.isin(script.mol, list(framework_mols))
    # the example integrates sorbates as rigid bodies; their 1e-6-amu virtual
    # sites explode under free NVE.  The benchmark measures force/SCF cost,
    # not trajectories, so floor moving-atom masses instead of porting the
    # rigid machinery into the sharded step (future round).
    mass_eff = np.where(frozen, 1e30, np.maximum(mass_atom, 10.0))

    rng = np.random.RandomState(7)
    v0 = rng.normal(scale=1e-4, size=(n, 3)) / np.sqrt(
        np.maximum(mass_atom, 1e-6))[:, None]
    v0[frozen] = 0.0

    def pad(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((npad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    sharding = NamedSharding(mesh, P(pshard.AXIS))
    put = lambda a: jax.device_put(jnp.asarray(a), sharding)
    arrays = dict(
        x=put(pad(script.x.astype(np_dtype))),
        v=put(pad(v0.astype(np_dtype))),
        q=put(pad(script.q.astype(np_dtype))),
        type=put(pad(script.type, 0)),
        mol=put(pad(script.mol, 0)),
        alpha=put(pad(alpha.astype(np_dtype))),
        mu=put(pad(np.zeros((n, 3), np_dtype))),
        mass=put(pad(mass_eff.astype(np_dtype), 1.0)),
        mask=put(pad(np.ones(n, bool), False)),
    )
    phases = (make.host_phases(strips=host_strips)
              if n_devices == 1 else None)
    return PolarBench(step=step, init=init, arrays=arrays, natoms=n,
                      npad=npad, phases=phases, settings=s,
                      dt=dt, ftm2v=u.ftm2v)


def setup_forces(bench: PolarBench):
    a = bench.arrays
    f, mu, energies = bench.init(
        a["x"], a["q"], a["type"], a["mol"], a["alpha"], a["mu"], a["mask"])
    a["mu"], a["f"] = mu, f
    return f, energies


# dipole history extrapolation coefficients for the SCF initial guess
# (Lagrange extrapolation through the last p converged dipole sets; each
# row sums to 1 so a replicated cold history reduces to plain warm-start).
# CG still iterates to the UNCHANGED convergence criterion — the predictor
# only moves the starting point closer, cutting iterations (the standard
# polarizable-MD trick; cf. Kolafa ASPC, J Comput Chem 25:335 (2004)).
_PREDICT_COEF = {
    1: (1.0,),
    2: (2.0, -1.0),
    3: (3.0, -3.0, 1.0),
    4: (4.0, -6.0, 4.0, -1.0),
}


def make_scan_runner(bench: PolarBench, k: int, predict: int = 1):
    """K MD steps inside one dispatch (lax.scan over the jitted step) — the
    per-call tunnel/dispatch overhead (~40 ms via axon) otherwise dominates:
    89.7 -> 47.5 ms/step at 10.6k atoms.  Mirrors the production driver,
    which also scans between thermo outputs (integrate/driver.py).

    predict: SCF initial-guess extrapolation order (1 = plain warm start =
    the reference's use_previous; 2/3/4 = linear/quadratic/cubic dipole
    history extrapolation, fewer CG iterations at the same tolerance)."""
    import jax

    step = bench.step
    coef = _PREDICT_COEF[predict]

    def scan_steps(x, v, f, q, t, mol, al, mu, mass, mask):
        def body(c, _):
            x, v, f, hist = c
            guess = sum(cj * hist[j] for j, cj in enumerate(coef))
            x2, v2, mu2, f2, en = step(x, v, f, q, t, mol, al, guess,
                                       mass, mask)
            hist2 = (mu2,) + hist[:-1]
            return (x2, v2, f2, hist2), en["scf_iters"]
        hist0 = (mu,) * len(coef)
        (x, v, f, hist), scf = jax.lax.scan(
            body, (x, v, f, hist0), None, length=k)
        return x, v, hist[0], f, scf

    js = jax.jit(scan_steps)

    def run(bench: PolarBench):
        a = bench.arrays
        if "f" not in a:
            import jax.numpy as jnp

            a["f"] = jnp.zeros_like(a["x"])
        x, v, mu, f, scf = js(a["x"], a["v"], a["f"], a["q"], a["type"],
                              a["mol"], a["alpha"], a["mu"], a["mass"],
                              a["mask"])
        a["x"], a["v"], a["mu"], a["f"] = x, v, mu, f
        return f, scf

    return run


def run_step(bench: PolarBench, zero_init: bool = False):
    """zero_init: start with f=0 instead of compiling the separate init
    program (benchmarking only — halves compile time; the first step's kick
    is wrong but steady-state timing is unaffected)."""
    a = bench.arrays
    if "f" not in a:
        if zero_init:
            import jax.numpy as jnp
            a["f"] = jnp.zeros_like(a["x"])
        else:
            setup_forces(bench)
    x, v, mu, f, energies = bench.step(
        a["x"], a["v"], a["f"], a["q"], a["type"], a["mol"], a["alpha"],
        a["mu"], a["mass"], a["mask"])
    a["x"], a["v"], a["mu"], a["f"] = x, v, mu, f
    return f, energies


def host_cg_step(bench: PolarBench, zero_init: bool = False,
                 mixed: bool = False):
    """One velocity-Verlet step with every expensive phase dispatched
    SEPARATELY and the CG loop driven from the host.

    Same math as parallel/shard.py local_step + ops/polarization
    scf_solve_cg, restructured because the axon tunnel enforces a
    per-dispatch execution deadline (~1-2 min).  The force + SCF
    evaluation itself is the shared productized engine
    (parallel/fast_polar.py HostPolarForces, which also hoists the
    inner-CG jit to build time); this wrapper adds the bench harness's
    velocity-Verlet kicks.  Cross-checked against the fused step in
    tests/test_host_cg.py.

    mixed=True: mixed-precision iterative refinement for the f64/1e-11
    north-star regime.  B = I + sqrt(a) T sqrt(a) is symmetric positive
    definite and strongly diagonally dominant (Thole-damped dipole
    interaction tensor scaled by polarizabilities), so classic iterative
    refinement converges in 2-3 outer passes: the expensive O(N^2) panel
    matvecs run in f32 inside an inner CG (TPU-native speed), only the
    outer residuals r = b - B y run in emulated f64.  Each outer
    correction d shrinks by ~the f32 roundoff factor (~1e-7), so the
    reference's per-sweep dipole-change criterion
    (pair_lj_cut_coul_long_polarization.cpp:1194-1210, change/(3N) <=
    precision^2 with precision 1e-11) is met after the refinement
    correction itself satisfies it — measured on the SAME metric, no
    relaxation of the convergence semantics.

    Returns (f, energies) like run_step.
    """
    import jax.numpy as jnp

    from lidp_tpu.parallel.fast_polar import HostPolarForces

    a = bench.arrays
    if "f" not in a:
        a["f"] = jnp.zeros_like(a["x"])
    hpf = getattr(bench, "_hpf", None)
    if hpf is None or hpf.mixed != mixed:
        hpf = HostPolarForces(bench.phases, bench.settings, bench.natoms,
                              mixed=mixed)
        bench._hpf = hpf

    dtf = 0.5 * bench.dt * bench.ftm2v
    mass, mask = a["mass"], a["mask"]
    minv = jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0), 0.0)
    v = a["v"] + (dtf * minv)[:, None] * a["f"]
    v = jnp.where(mask[:, None], v, 0.0)
    x = a["x"] + bench.dt * v

    f, mu, en = hpf(x, a["q"], a["type"], a["mol"], a["alpha"], a["mu"],
                    mask)
    v = v + (dtf * minv)[:, None] * f
    v = jnp.where(mask[:, None], v, 0.0)

    a["x"], a["v"], a["mu"], a["f"] = x, v, mu, f
    en = dict(en)
    en.pop("scf_converged", None)
    en["scf_iters"] = jnp.asarray(en["scf_iters"], jnp.int32)
    return f, en
