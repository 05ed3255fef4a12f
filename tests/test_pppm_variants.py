"""pppm/stagger, pppm/cg, and script-level pppm/disp.

- pppm/stagger (pppm_stagger.cpp): two interleaved grids averaged.  The
  staggered average must stay consistent with Ewald AND beat the
  single-grid PPPM force error at the same grid (the odd-order
  ik-differentiation aliasing cancels between the two passes).
- pppm/cg (pppm_cg.cpp): charged-subset sparsity optimization — dense TPU
  math is identical, so the style must alias pppm bit-for-bit.
- kspace pppm/disp + pair lj/long/coul/long: charge mesh + dispersion mesh
  through the script engine vs the ewald/disp exact-k run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.ops.ewald import EwaldParams, ewald_forces, setup_ewald_disp
from lidp_tpu.ops.pppm import (PPPMParams, pppm_forces_params, setup_pppm)


@pytest.fixture(scope="module")
def charged_box():
    rs = np.random.RandomState(7)
    L, n = 12.0, 48
    x = rs.uniform(0, L, (n, 3))
    q = rs.normal(size=n)
    q -= q.mean()
    return x, q, L


def _pppm_out(x, q, L, stagger, g_ewald, acc=1e-4):
    ps = setup_pppm(accuracy_rel=acc, qqrd2e=1.0, q=q, natoms=len(q),
                    cutoff=5.0, box_lengths=[L, L, L], g_ewald=g_ewald)
    p = PPPMParams.from_setup(ps, 1.0, float((q**2).sum()), float(q.sum()),
                              stagger=stagger)
    return pppm_forces_params(jnp.asarray(x), jnp.asarray(q), [L, L, L], p)


def test_stagger_beats_single_grid(charged_box):
    # the exact-k Ewald sum at the SAME g is the mesh-error reference (the
    # k-space energy depends on the real/reciprocal split point)
    x, q, L = charged_box
    es = setup_ewald_disp(accuracy_rel=1e-8, qqrd2e=1.0, q=q, natoms=len(q),
                          cutoff=5.0, box_lengths=[L, L, L])
    ew = EwaldParams.from_setup(es, 1.0)
    fe, ee, _ = ewald_forces(jnp.asarray(x), jnp.asarray(q),
                             jnp.asarray(L**3), ew)
    fe = np.asarray(fe)
    f0, e0, _ = _pppm_out(x, q, L, stagger=False, g_ewald=es.g_ewald)
    f1, e1, _ = _pppm_out(x, q, L, stagger=True, g_ewald=es.g_ewald)
    scale = np.abs(fe).max()
    err0 = np.abs(np.asarray(f0) - fe).max() / scale
    err1 = np.abs(np.asarray(f1) - fe).max() / scale
    assert float(e1) == pytest.approx(float(ee), rel=1e-4)
    assert err1 < err0, (err1, err0)
    assert err1 < 5e-5


def test_cg_aliases_pppm(charged_box):
    """Half the atoms uncharged: pppm/cg must equal pppm exactly (the
    zero-charge rows contribute nothing to the dense mesh program)."""
    from lidp_tpu.io.script import LammpsScript

    x, q, L = charged_box
    n = len(q)
    q2 = q.copy()
    q2[::2] = 0.0
    q2 -= q2.mean()

    def run(style):
        s = LammpsScript(dtype=jnp.float64)
        s.execute(f"""
units lj
atom_style full
boundary p p p
region box block 0 {L} 0 {L} 0 {L} units box
create_box 1 box
pair_style lj/cut/coul/long 3.0 5.0
pair_coeff 1 1 1.0 1.0
kspace_style {style} 1e-4
""".strip().splitlines())
        s.x = x.copy()
        s.v = np.zeros((n, 3))
        s.q = q2.copy()
        s.type = np.ones(n, np.int32)
        s.mol = np.zeros(n, np.int32)
        s.image = np.zeros((n, 3), np.int32)
        s._bonds = np.zeros((0, 2), np.int64)
        s.groups["all"] = np.ones(n, bool)
        s.mass_type = np.array([0.0, 1.0])
        s.one("fix 1 all nve")
        s.one("run 0")
        return s.thermo_rows[-1]

    r_cg = run("pppm/cg")
    r_p = run("pppm")
    for k in ("elong", "ecoul", "epair", "press"):
        assert r_cg[k] == r_p[k], k


def test_pppm_disp_script_vs_ewald_disp():
    """pair lj/long/coul/long + kspace pppm/disp through the script engine
    tracks the exact-k ewald/disp totals to mesh accuracy."""
    from scipy.spatial import cKDTree

    from lidp_tpu.io.script import LammpsScript

    rs = np.random.RandomState(5)
    L, n = 7.0, 32
    x = rs.uniform(0, L, (n, 3))
    for _ in range(300):
        t = cKDTree(x, boxsize=L)
        pairs = t.query_pairs(0.95, output_type="ndarray")
        if not len(pairs):
            break
        x[pairs[:, 0]] = rs.uniform(0, L, (len(pairs[:, 0]), 3))
    q = np.tile([0.3, -0.3], n // 2)

    def run(kstyle):
        s = LammpsScript(dtype=jnp.float64)
        s.execute(f"""
units lj
atom_style full
boundary p p p
region box block 0 {L} 0 {L} 0 {L} units box
create_box 1 box
pair_style lj/long/coul/long long long 3.0
pair_coeff 1 1 1.0 1.0
kspace_style {kstyle} 1e-6
""".strip().splitlines())
        s.x = x.copy()
        s.v = np.zeros((n, 3))
        s.q = q.copy()
        s.type = np.ones(n, np.int32)
        s.mol = np.zeros(n, np.int32)
        s.image = np.zeros((n, 3), np.int32)
        s._bonds = np.zeros((0, 2), np.int64)
        s.groups["all"] = np.ones(n, bool)
        s.mass_type = np.array([0.0, 1.0])
        s.one("fix 1 all nve")
        s.one("run 0")
        return s.thermo_rows[-1], np.asarray(s._sim.res.f)[:n]

    r_mesh, f_mesh = run("pppm/disp")
    r_ew, f_ew = run("ewald/disp")
    # the real/k split differs between the solvers by design: ewald/disp
    # forces g_ewald_6 = g_ewald (ewald_disp.cpp:230) while pppm/disp
    # runs its own accuracy iteration for g_ewald_6 (pppm_disp.cpp) —
    # only the g6-invariant totals and forces are comparable
    assert r_mesh["epair"] * n == pytest.approx(r_ew["epair"] * n, rel=2e-5)
    np.testing.assert_allclose(
        f_mesh, f_ew, atol=5e-5 * float(np.abs(f_ew).max()))
