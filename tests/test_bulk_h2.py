"""Golden-log parity for polarization/examples/Bulk H2 (log.lammps).

Step-0 thermo (log.lammps:93): TotEng 202.61103, KinEng 226.42419,
PotEng -23.813156, E_vdwl -23.427106, E_coul 5158.6145, E_long -5158.8882,
E_pol -0.11226309, Temp 305.06274.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from lidp_tpu import topology, units, velocity
from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField
from lidp_tpu.integrate import rigid
from lidp_tpu.integrate.driver import Runner, rigid_nve_integrator
from lidp_tpu.io.data_reader import read_data
from lidp_tpu.ops import polarization as pol
from lidp_tpu.ops.ewald import EwaldParams, setup_ewald_disp
from lidp_tpu.ops.pair import make_pair_params
from lidp_tpu.state import make_system
from lidp_tpu.thermo import ThermoParams, thermo_row

H2_DIR = "/root/reference/polarization/examples/Bulk H2"


@pytest.fixture(scope="module")
def h2():
    u = units.REAL
    data = read_data(os.path.join(H2_DIR, "h2.data"), atom_style="full")
    n = data.natoms
    mass_type = np.zeros(data.ntypes + 1)
    mass_type[1], mass_type[2], mass_type[3] = 0.00001, 1.00800, 0.00001
    mass_atom = mass_type[data.type]
    alpha_type = np.zeros(data.ntypes + 1)
    alpha_type[1], alpha_type[2], alpha_type[3] = 0.69380, 0.00044, 0.0
    alpha = alpha_type[data.type]

    v = velocity.create(
        data.x, mass_atom, 298.15, 12345, units=u, dist="gaussian",
        loop="all", momentum=True, rotation=True)

    box = Box.create(data.box_lo, data.box_hi)
    sys = make_system(data.x, box=box, v=v, q=data.q, type=data.type,
                      mol=data.mol, alpha=alpha, dtype=jnp.float64)

    # pair_style lj/cut/coul/long/polarization 2.5 10.797442 precision 1e-11
    #   max_iterations 100 damp_type exponential damp 2.1304
    #   polar_gs_ranked yes use_previous yes
    T = data.ntypes
    eps = np.zeros((T + 1, T + 1))
    sig = np.zeros((T + 1, T + 1))
    cut = np.zeros((T + 1, T + 1))
    coeffs = {
        (1, 1): (0.025363, 3.155280, 7.888200),
        (1, 2): (0.000000, 1.577640, 3.944100),
        (1, 3): (0.010451, 2.762795, 6.906987),
        (2, 2): (0.000000, 0.000000, 0.000000),
        (2, 3): (0.000000, 1.185155, 2.962887),
        (3, 3): (0.004306, 2.370310, 5.925775),
    }
    for (i, j), (e, s_, c) in coeffs.items():
        eps[i, j] = eps[j, i] = e
        sig[i, j] = sig[j, i] = s_
        cut[i, j] = cut[j, i] = c

    cut_coul = 10.797442
    pair = make_pair_params(
        eps, sig, cut, cut_coul=cut_coul, coul=True, qqrd2e=u.qqr2e,
        g_ewald=0.0, dtype=jnp.float64)

    es = setup_ewald_disp(
        accuracy_rel=1.0e-4, qqrd2e=u.qqr2e, q=data.q, natoms=n,
        cutoff=cut_coul, box_lengths=np.asarray(data.box_hi - data.box_lo))
    pair = pair.replace(g_ewald=jnp.asarray(es.g_ewald)) if hasattr(pair, "replace") else pair
    import dataclasses as dc
    pair = dc.replace(pair, g_ewald=jnp.asarray(es.g_ewald, jnp.float64))
    ew = EwaldParams.from_setup(es, u.qqr2e)

    pol_settings = pol.PolarizationSettings(
        iterations_max=100, damping_type=pol.DAMPING_EXPONENTIAL,
        polar_damp=2.1304, polar_precision=1e-11, polar_gs_ranked=True,
        use_previous=True)

    sp_dense = jnp.asarray(topology.special_codes_dense(n, data.bonds))
    # read_data remap shift for the fdotr polar virial (Press parity)
    L0 = np.asarray(data.box_hi - data.box_lo)
    xshift = jnp.asarray(
        -np.floor((data.x - np.asarray(data.box_lo)) / L0) * L0)
    ff = ForceField(pair=pair, ewald=ew, polar=pol_settings, sp_code=sp_dense,
                    qqrd2e=u.qqr2e, polar_xshift=xshift)

    rsetup = rigid.setup_bodies(data.x, mass_atom, data.mol,
                                np.ones(n, bool))
    rp = rigid.make_rigid_params(rsetup, dt=1.0, ftm2v=u.ftm2v, mass_atom=mass_atom)  # `timestep 2` precedes `units real`, which resets dt to 1.0
    runner = Runner(ff=ff, integ=rigid_nve_integrator(rp, jnp.asarray(mass_atom)),
                    neighbor_cfg=None)

    dof = 3 * n - 3 - rsetup.dof_removed
    tp = ThermoParams.create(mass_atom, dof=dof, units=u, norm=False, natoms=n)
    return sys, runner, tp, es, rsetup


GOLDEN_STEP0 = dict(
    etotal=202.61103, ke=226.42419, pe=-23.813156, evdwl=-23.427106,
    ecoul=5158.6145, elong=-5158.8882, epol=-0.11226309, temp=305.06274,
    press=2084.1534,
)

GOLDEN_ROWS = {
    1: dict(etotal=202.62011, evdwl=-23.397525, ecoul=5158.6262,
            epol=-0.11072426, temp=305.01655, press=521.68055),
    5: dict(etotal=202.74336, evdwl=-23.014909, ecoul=5158.8025,
            epol=-0.10555976, temp=304.41934, press=533.94308),
}

# Rebuilt-reference (same 2018 source, `pair_modify table 0`, round-3
# session) Press column: matches the committed log to the erfc-table error
# and OUR output to every printed digit, including the rigid constraint
# virial (FixRigid set_xv/set_v halves) and the pair fdotr image terms.
GOLDEN_PRESS_TABLE0 = {0: 2084.155, 1: 521.68171, 2: 527.49848,
                       5: 533.94355, 8: 552.45416}


def test_ewald_setup_matches_log(h2):
    # log.lammps:71,89 — G vector = 0.219679, nbox = 4, nkvec = 128
    es = h2[3]
    assert es.g_ewald == pytest.approx(0.219679, abs=1e-6)
    assert es.nbox == 4
    assert es.hvecs.shape[0] == 128


def test_rigid_dof(h2):
    # 150 linear 5-site bodies: dof = 5*150 = 750; temp dof = 2250-3-(2250-750)
    rsetup = h2[4]
    assert rsetup.nbody == 150
    assert rsetup.nlinear == 150
    assert rsetup.dof_removed == 3 * 750 - 6 * 150 + 150


def test_step0_thermo(h2):
    sys, runner, tp = h2[0], h2[1], h2[2]
    sys, res, nlist, istate = runner.setup(sys)
    row = {k: float(v) for k, v in thermo_row(
        sys, res, tp, extra_virial=istate.virial).items()}
    # The reference evaluates real-space erfc by 12-bit table interpolation
    # (Pair::init_tables, ncoultablebits default 12) — ~1e-7 relative error vs
    # our exact A&S polynomial.  ecoul/elong cancel in pe, so pe/etotal carry
    # the absolute table error (~4e-4 kcal/mol at this system size).
    for key, val in GOLDEN_STEP0.items():
        tol = dict(rel=2e-6, abs=5e-6)
        if key in ("pe", "etotal"):
            tol = dict(rel=2e-6, abs=1e-3)
        if key == "ecoul":
            tol = dict(rel=2e-7)
        if key == "press":
            tol = dict(rel=5e-6)    # erfc-table force error in the virial
        assert row[key] == pytest.approx(val, **tol), key
    assert row["press"] == pytest.approx(GOLDEN_PRESS_TABLE0[0], rel=1e-7)


def test_first_steps_trajectory(h2):
    sys, runner, tp = h2[0], h2[1], h2[2]
    sys, res, nlist, istate = runner.setup(sys)
    rows = {}
    for step in range(1, 9):
        sys, res, nlist, istate = runner.run(sys, res, nlist, istate, 1)
        rows[step] = {k: float(v) for k, v in thermo_row(
            sys, res, tp, extra_virial=istate.virial).items()}
    for step, golden in GOLDEN_ROWS.items():
        for key, val in golden.items():
            assert rows[step][key] == pytest.approx(val, rel=2e-5, abs=2e-5), (
                step, key)
    for step, val in GOLDEN_PRESS_TABLE0.items():
        if step == 0:
            continue
        assert rows[step]["press"] == pytest.approx(val, rel=1e-6), (
            "table-0 press", step)
