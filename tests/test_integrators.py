"""Unit tests: fix nvt thermostatting and FIRE minimization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidp_tpu import units
from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField, compute_forces
from lidp_tpu.integrate import nvt
from lidp_tpu.integrate.driver import Integrator, Runner
from lidp_tpu.integrate.minimize import fire_minimize
from lidp_tpu.ops.pair import make_pair_params
from lidp_tpu.state import make_system
from lidp_tpu.thermo import ThermoParams, temperature


def _small_lj(n_side=4, rho=0.8, T=1.0, seed=0):
    rs = np.random.RandomState(seed)
    a = (1.0 / rho) ** (1 / 3)
    g = np.arange(n_side)
    x = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3) * a
    n = x.shape[0]
    L = n_side * a
    v = rs.normal(scale=np.sqrt(T), size=(n, 3))
    v -= v.mean(0)
    eps = np.zeros((2, 2)); eps[1, 1] = 1.0
    sig = np.zeros((2, 2)); sig[1, 1] = 1.0
    cut = np.zeros((2, 2)); cut[1, 1] = 2.5
    pair = make_pair_params(eps, sig, cut)
    ff = ForceField(pair=pair)
    box = Box.create([0, 0, 0], [L, L, L])
    sys = make_system(x, box=box, v=v)
    return sys, ff, n


def test_nvt_thermostats_to_target():
    u = units.LJ
    sys, ff, n = _small_lj(T=0.5)
    t_target = 1.2
    p = nvt.NVTParams.create(0.005, 1.0, np.ones(n), t_target, 0.25,
                             dof=3 * n - 3, boltz=1.0, mvv2e=1.0)
    integ = Integrator(
        initial=lambda s, r, p_, st: nvt.initial_integrate(s, r.f, p_, st),
        final=lambda s, r, p_, st: nvt.final_integrate(s, r.f, p_, st),
        params=p, init_state=nvt.init_state)
    runner = Runner(ff=ff, integ=integ)
    st = runner.setup(sys)
    tp = ThermoParams.create(np.ones(n), dof=3 * n - 3, units=u, norm=False,
                             natoms=n)
    temps = []
    for _ in range(10):
        st = runner.run(*st, 50)
        temps.append(float(temperature(st[0], tp)))
    # time-averaged temperature near target after equilibration
    avg = np.mean(temps[4:])
    assert abs(avg - t_target) / t_target < 0.25, temps


def test_fire_minimize_perturbed_lattice():
    sys, ff, n = _small_lj(T=0.0, seed=1)
    rs = np.random.RandomState(2)
    sys = sys.replace(x=sys.x + 0.05 * rs.normal(size=(n, 3)))

    def compute(s):
        res = compute_forces(s, ff)
        return res.f, res.epair

    e_start = float(compute(sys)[1])
    sys2, e, it, conv = jax.jit(lambda s: fire_minimize(
        s, compute, jnp.ones(n), ftol=1e-8, maxiter=2000))(sys)
    assert float(e) < e_start
    fnorm = float(jnp.linalg.norm(compute(sys2)[0]))
    assert fnorm < 1e-6


def test_nvt_temperature_ramp():
    """fix nvt temp Tstart Tstop: the target ramps linearly over the run
    (FixNH::compute_temp_target) — the measured T must end near Tstop and
    pass near the midpoint mid-run."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 2.0 12345 loop geom
fix 1 all nvt temp 2.0 0.5 0.2
thermo 100
run 1200
""".strip().splitlines())
    rows = {int(r["step"]): r for r in s.thermo_rows}
    assert abs(rows[0]["temp"] - 2.0) < 1e-6
    # final T thermostatted to ~Tstop
    assert abs(rows[1200]["temp"] - 0.5) < 0.15, rows[1200]["temp"]
    # mid-run T tracks the ramp (target 1.25 at step 600)
    assert abs(rows[600]["temp"] - 1.25) < 0.3, rows[600]["temp"]


def test_nve_subgroup():
    """fix nve on a sub-group: only group atoms move (FixNVE group
    semantics); the rest stay put with velocities untouched."""
    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
region lower block INF INF INF 1.0 INF INF
group lower region lower
group upper subtract all lower
velocity all create 1.0 12345 loop geom
fix 1 upper nve
run 20
""".strip().splitlines())
    sim = s._sim
    x0 = np.asarray(s.x)           # host arrays hold the initial state
    # rebuild initial positions from a fresh parse
    s0 = LammpsScript()
    s0.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
""".strip().splitlines())
    xinit = np.asarray(s0.x)
    lower = s.groups["lower"]
    x_end = np.asarray(sim.sys.x)
    assert np.abs(x_end[lower] - xinit[lower]).max() < 1e-12
    assert np.abs(x_end[~lower] - xinit[~lower]).max() > 1e-3
