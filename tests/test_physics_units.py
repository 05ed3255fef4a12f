"""Per-kernel physics unit tests (SURVEY.md §4: the tests the reference lacks).

- Ewald (real + reciprocal) vs a brute-force periodic-image Coulomb sum
- the A&S erfc polynomial vs scipy's erfc (documents the approximation error)
- SCF solvers: CG vs serial Gauss-Seidel reference mode on a random system
- T-tensor symmetry and trace properties
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu import units
from lidp_tpu.box import Box
from lidp_tpu.ops import polarization as P
from lidp_tpu.ops.ewald import EwaldParams, ewald_forces, setup_ewald_disp
from lidp_tpu.ops.pair import (A1, A2, A3, A4, A5, EWALD_P, make_pair_params,
                               dense_pair_forces)
from lidp_tpu.state import make_system


def test_erfc_polynomial_accuracy():
    from scipy.special import erfc as erfc_exact

    x = np.linspace(0.01, 5.0, 500)
    t = 1.0 / (1.0 + EWALD_P * x)
    approx = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * np.exp(-x * x)
    err = np.abs(approx - erfc_exact(x))
    assert err.max() < 2e-7   # A&S 7.1.26 bound (1.5e-7)


def test_ewald_nacl_madelung():
    """Real-space erfc + reciprocal Ewald must reproduce the NaCl Madelung
    constant (1.747564594...) — an absolute analytic check of the full
    electrostatics (tinfoil boundary, like the reference)."""
    MADELUNG = 1.7475645946
    a = 2.0                       # nearest-neighbor distance 1.0
    # conventional 8-ion rocksalt cell
    basis = np.array([
        [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],   # Na (+1)
        [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],   # Cl (-1)
    ]) * a
    reps = 2
    xs, qs = [], []
    for ix in range(reps):
        for iy in range(reps):
            for iz in range(reps):
                xs.append(basis + np.array([ix, iy, iz]) * a)
                qs.append(np.array([1.0] * 4 + [-1.0] * 4))
    x = np.concatenate(xs)
    q = np.concatenate(qs)
    n = len(q)
    L = reps * a

    es = setup_ewald_disp(accuracy_rel=1e-6, qqrd2e=1.0, q=q, natoms=n,
                          cutoff=1.9, box_lengths=[L, L, L])
    eps = np.zeros((2, 2)); sig = np.zeros((2, 2)); cut = np.zeros((2, 2))
    pair = make_pair_params(eps, sig, cut, cut_coul=1.9, coul=True,
                            qqrd2e=1.0, g_ewald=es.g_ewald)
    box = Box.create([0, 0, 0], [L, L, L])
    sys = make_system(x, box=box, q=q)
    _, _, ecoul, _ = dense_pair_forces(sys.x, sys.q, sys.type, 0, sys.mask,
                                       sys.box, pair)
    ew = EwaldParams.from_setup(es, 1.0)
    _, elong, _ = ewald_forces(sys.x, sys.q, sys.box.volume, ew)
    e_per_ion = float(ecoul + elong) / n
    # E/ion-pair = -Madelung q^2/r_nn with r_nn = 1.0 -> E/ion = -M/2
    assert e_per_ion == pytest.approx(-MADELUNG / 2.0, rel=2e-5)


def test_cg_matches_gauss_seidel():
    rs = np.random.RandomState(7)
    n = 40
    L = 12.0
    x = rs.uniform(0, L, (n, 3))
    alpha = rs.uniform(0.1, 1.0, n)
    e0 = jnp.asarray(rs.normal(size=(n, 3)))
    box = Box.create([0, 0, 0], [L, L, L])
    mask = jnp.ones(n, bool)
    s = P.PolarizationSettings(iterations_max=500, polar_precision=1e-12,
                               damping_type=P.DAMPING_EXPONENTIAL)
    tensor = P.dipole_field_tensor(jnp.asarray(x), jnp.asarray(alpha), mask,
                                   box, s)
    mu_cg, it_cg, div_cg = P.scf_solve(e0, jnp.asarray(alpha), tensor, s)
    mu_gs, it_gs, div_gs = P.scf_solve_gauss_seidel(
        e0, jnp.asarray(alpha), tensor, s,
        rank_metric=jnp.asarray(rs.uniform(size=n)))
    assert not bool(div_cg) and not bool(div_gs)
    np.testing.assert_allclose(np.asarray(mu_cg), np.asarray(mu_gs),
                               rtol=1e-7, atol=1e-10)
    # exact solve check: (diag(1/a) + T) mu = e0
    tm = np.asarray(tensor).reshape(3 * n, 3 * n)
    A = tm + np.diag(np.repeat(1.0 / alpha, 3))
    mu_exact = np.linalg.solve(A, np.asarray(e0).ravel()).reshape(n, 3)
    np.testing.assert_allclose(np.asarray(mu_cg), mu_exact, rtol=1e-6,
                               atol=1e-10)


def test_t_tensor_symmetry():
    rs = np.random.RandomState(1)
    n = 12
    L = 10.0
    x = jnp.asarray(rs.uniform(0, L, (n, 3)))
    alpha = jnp.ones(n)
    box = Box.create([0, 0, 0], [L, L, L])
    s = P.PolarizationSettings(damping_type=P.DAMPING_EXPONENTIAL)
    t = np.asarray(P.dipole_field_tensor(x, alpha, jnp.ones(n, bool), box, s))
    tm = t.reshape(3 * n, 3 * n)
    np.testing.assert_allclose(tm, tm.T, rtol=1e-12, atol=1e-12)


def test_cg_static_trips_matches_while():
    """cg_static_trips (fixed-length scan with masked updates) returns the
    same dipoles and live-iteration count as the while_loop CG."""
    rs = np.random.RandomState(11)
    n = 36
    L = 12.0
    x = rs.uniform(0, L, (n, 3))
    alpha = rs.uniform(0.1, 1.0, n)
    e0 = jnp.asarray(rs.normal(size=(n, 3)))
    box = Box.create([0, 0, 0], [L, L, L])
    mask = jnp.ones(n, bool)
    kw = dict(iterations_max=500, polar_precision=1e-12,
              damping_type=P.DAMPING_EXPONENTIAL)
    s_w = P.PolarizationSettings(**kw)
    s_s = P.PolarizationSettings(**kw, cg_static_trips=64)
    tensor = P.dipole_field_tensor(jnp.asarray(x), jnp.asarray(alpha), mask,
                                   box, s_w)
    mu_w, it_w, div_w = P.scf_solve(e0, jnp.asarray(alpha), tensor, s_w)
    mu_s, it_s, div_s = P.scf_solve(e0, jnp.asarray(alpha), tensor, s_s)
    assert not bool(div_w) and not bool(div_s)
    assert int(it_s) == int(it_w)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_w),
                               rtol=1e-12, atol=1e-14)
