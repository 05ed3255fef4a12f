"""The bench/in.lj configuration: 32k-atom LJ melt, NVE.

Mirrors the reference benchmark input (bench/in.lj): fcc lattice at reduced
density 0.8442, 20x20x20 cells (x scale factors supported), T*=1.44 velocities
seeded geometrically (seed 87287), lj/cut 2.5, neighbor skin 0.3 rebuilt every
20 steps without checking.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from lidp_tpu import lattice, units, velocity
from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField
from lidp_tpu.integrate import nve
from lidp_tpu.integrate.driver import Runner, nve_integrator
from lidp_tpu.ops.neighbor import NeighborConfig
from lidp_tpu.ops.pair import make_pair_params
from lidp_tpu.state import System, make_system
from lidp_tpu.thermo import ThermoParams


@dataclasses.dataclass
class LJMelt:
    system: System
    runner: Runner
    thermo: ThermoParams
    natoms: int


def build(scale: float = 1, dtype=jnp.float64, *,
          neighbor: str = "list",
          max_neighbors: int = 96, bin_cap: int = 40,
          compensated: bool = False, cap_slack: float | None = None) -> LJMelt:
    """neighbor: 'list' (LAMMPS-stale-list parity), 'cells' (TPU roll kernel),
    or 'none' (dense all-pairs)."""
    u = units.LJ
    rho, nx = 0.8442, int(round(20 * scale))
    a = lattice.lattice_spacing("fcc", rho)
    x_np, hi = lattice.create_atoms_box("fcc", a, nx, nx, nx)
    n = x_np.shape[0]

    v_np = velocity.create(
        x_np, np.ones(n), 1.44, 87287, units=u, dist="uniform", loop="geom")

    box = Box.create(np.zeros(3), hi, dtype=dtype)
    sys = make_system(x_np, box=box, v=v_np, dtype=dtype)

    T = 1
    eps = np.zeros((T + 1, T + 1)); eps[1, 1] = 1.0
    sig = np.zeros((T + 1, T + 1)); sig[1, 1] = 1.0
    cut = np.zeros((T + 1, T + 1)); cut[1, 1] = 2.5
    pair = make_pair_params(eps, sig, cut, coul=False, dtype=dtype)
    ff = ForceField(pair=pair)

    ncfg = None
    if neighbor == "list":
        ncfg = NeighborConfig.for_box(hi, 2.5 + u.skin, bin_cap=bin_cap,
                                      max_neighbors=max_neighbors)
    elif neighbor in ("cells", "slots"):
        from lidp_tpu.ops.cells import CellConfig
        # slack 1.5 (cap 40 at this density) measured 1.2x faster than the
        # default 2.0 (cap 56); slack 1.25 (cap 32) overflows under the
        # melt's density fluctuations.  Overflow is carried sticky through
        # the scan and checked at chunk boundaries.  The max cell occupancy
        # is an extreme-value statistic over ncells draws, so bigger boxes
        # need more slack: 1.5 measured safe at <=108k, 256k+ overflowed
        # during the scaled sweep and gets 1.75 (cap 48).
        if cap_slack is None:
            cap_slack = 1.5 if n <= 110_000 else 1.75
        ncfg = CellConfig.for_box(hi, 2.5 + u.skin, density=rho,
                                  cap_slack=cap_slack)

    tp = ThermoParams.create(np.ones(n), dof=3 * n - 3, units=u, norm=True, natoms=n)
    if neighbor == "slots":
        # zero-gather slot-space runner + v3 Pallas kernel (TPU hot path)
        from lidp_tpu.integrate.slot_runner import SlotRunner

        runner = SlotRunner(ff=ff, neighbor_cfg=ncfg, dt=u.dt,
                            ftm2v=u.ftm2v, n=n, rebuild_every=20)
        return LJMelt(system=sys, runner=runner, thermo=tp, natoms=n)

    nvep = nve.NVEParams.create(u.dt, u.ftm2v, np.ones(n), dtype=dtype)
    runner = Runner(ff=ff, integ=nve_integrator(nvep, compensated=compensated),
                    neighbor_cfg=ncfg, rebuild_every=20)
    return LJMelt(system=sys, runner=runner, thermo=tp, natoms=n)
