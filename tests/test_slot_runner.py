"""Slot-space LJ runner (integrate/slot_runner.py + the v3 Pallas kernel).

On CPU the kernels run in pallas interpret mode (ops/pallas_pair.py
_interpret), so these tests cover the same code the TPU bench executes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField
from lidp_tpu.integrate.slot_runner import SlotRunner
from lidp_tpu.ops import cells as C
from lidp_tpu.ops import pallas_pair as PP
from lidp_tpu.ops.pair import make_pair_params


@pytest.fixture(scope="module")
def small_lj():
    rng = np.random.RandomState(1)
    Lb = 4 * 2.9
    n = 400
    g = np.stack(np.meshgrid(
        *[np.linspace(0, Lb, 8, endpoint=False)] * 3), -1).reshape(-1, 3)
    x = (g[:n] + rng.uniform(0, 0.9, (n, 3))).astype(np.float32)
    box = Box(lo=jnp.zeros(3, jnp.float32), hi=jnp.full(3, Lb, jnp.float32))
    eps = np.zeros((2, 2)); sig = np.zeros((2, 2)); cut = np.zeros((2, 2))
    eps[1, 1] = 1.0; sig[1, 1] = 1.0; cut[1, 1] = 2.5
    p = make_pair_params(eps, sig, cut, dtype=jnp.float32)
    cfg = C.CellConfig.for_box([Lb] * 3, 2.9, density=n / Lb ** 3,
                               cap_slack=3.0)
    return x, n, box, p, cfg


def test_slot_forces_match_cells(small_lj):
    """slot_lj_forces == the XLA roll kernel on forces/energy/virial."""
    x, n, box, p, cfg = small_lj
    cells = C.build_cells(jnp.asarray(x), jnp.ones(n, bool), box, cfg)
    assert not bool(cells.overflow)
    f0, ev0, _, vir0 = C.cell_pair_forces(
        jnp.asarray(x), jnp.zeros(n), jnp.ones(n, np.int32),
        jnp.ones(n, bool), cells, box, p, need_ev=True)

    sr = SlotRunner(ff=ForceField(pair=p), neighbor_cfg=cfg, dt=0.005,
                    ftm2v=1.0, n=n)
    xs, vs, im, aidg, ovf = sr._slotify(
        jnp.asarray(x), jnp.zeros((n, 3), jnp.float32),
        jnp.ones(n, jnp.float32), jnp.arange(n, dtype=jnp.int32),
        jnp.ones(n, bool), box)
    fg, ev3, vir3 = PP.slot_lj_forces(
        [xs[..., d] for d in range(3)], box, p, need_ev=True)
    f3slot = np.asarray(jnp.stack(fg, -1).reshape(-1, 3))
    aidf = np.asarray(aidg).reshape(-1)
    f3 = np.zeros((n, 3), np.float32)
    f3[aidf[aidf < n]] = f3slot[aidf < n]

    scale = float(np.abs(np.asarray(f0)).max())
    assert np.abs(f3 - np.asarray(f0)).max() / scale < 5e-6
    assert float(ev3) == pytest.approx(float(ev0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(vir3), np.asarray(vir0),
                               rtol=1e-5)


def test_slot_runner_trajectory_matches_generic(small_lj):
    """40 steps (2 in-scan rebuilds) of slot-space NVE == the generic
    Runner on the cells path: same positions, same energies."""
    from lidp_tpu.integrate import nve
    from lidp_tpu.integrate.driver import Runner, nve_integrator
    from lidp_tpu.state import make_system
    from lidp_tpu.thermo import ThermoParams, thermo_row
    from lidp_tpu import units

    x, n, box, p, cfg = small_lj
    rng = np.random.RandomState(3)
    v0 = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    sys = make_system(x, box=box, v=v0, dtype=jnp.float32)
    ff = ForceField(pair=p)
    u = units.LJ
    tp = ThermoParams.create(np.ones(n), dof=3 * n - 3, units=u,
                             norm=True, natoms=n)

    sr = SlotRunner(ff=ff, neighbor_cfg=cfg, dt=u.dt, ftm2v=u.ftm2v, n=n,
                    rebuild_every=20)
    s1, r1, nl1, i1 = sr.setup(sys)
    s1, r1, nl1, i1 = sr.run(s1, r1, nl1, i1, 40)
    assert not bool(nl1.overflow)

    nvep = nve.NVEParams.create(u.dt, u.ftm2v, np.ones(n), dtype=jnp.float32)
    gr = Runner(ff=ff, integ=nve_integrator(nvep), neighbor_cfg=cfg,
                rebuild_every=20)
    s2, r2, nl2, i2 = gr.setup(sys)
    s2, r2, nl2, i2 = gr.run(s2, r2, nl2, i2, 40)

    row1 = {k: float(v) for k, v in thermo_row(s1, r1, tp).items()}
    row2 = {k: float(v) for k, v in thermo_row(s2, r2, tp).items()}
    assert row1["etotal"] == pytest.approx(row2["etotal"], rel=1e-5)
    assert row1["temp"] == pytest.approx(row2["temp"], rel=1e-5)
    assert row1["press"] == pytest.approx(row2["press"], rel=1e-4)

    # positions match modulo periodic wrap (the slot path wraps at rebuild)
    L = np.asarray(box.lengths)
    d = np.asarray(s1.x) - np.asarray(s2.x)
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 1e-4
