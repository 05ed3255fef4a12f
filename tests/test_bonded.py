"""Bonded-term unit tests: harmonic/fene bonds, angles, dihedrals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, minimum_image
from lidp_tpu.ops.bonded import (AngleParams, BondParams, DihedralParams,
                                 _dihedral_energy, angle_forces, bond_forces,
                                 dihedral_forces)

BOX = Box.create([0, 0, 0], [20, 20, 20])


def test_harmonic_bond():
    x = jnp.asarray([[1.0, 1, 1], [2.5, 1, 1]])
    p = BondParams(idx=jnp.array([[0, 1]], jnp.int32),
                   btype=jnp.array([1], jnp.int32),
                   k=jnp.array([0.0, 10.0]), r0=jnp.array([0.0, 1.0]),
                   eps=jnp.zeros(2), sigma=jnp.zeros(2))
    f, e, v = bond_forces(x, BOX, p)
    assert float(e) == pytest.approx(10.0 * 0.5**2)
    # force magnitude 2*k*dr toward r0
    assert float(f[0, 0]) == pytest.approx(2 * 10.0 * 0.5)
    np.testing.assert_allclose(np.asarray(f).sum(0), 0, atol=1e-12)


def test_fene_bond_matches_formula():
    x = jnp.asarray([[0.0, 0, 0], [0.97, 0, 0]])
    K, R0, eps, sig = 30.0, 1.5, 1.0, 1.0
    p = BondParams(idx=jnp.array([[0, 1]], jnp.int32),
                   btype=jnp.array([1], jnp.int32),
                   k=jnp.array([0.0, K]), r0=jnp.array([0.0, R0]),
                   eps=jnp.array([0.0, eps]), sigma=jnp.array([0.0, sig]),
                   style="fene")
    f, e, v = bond_forces(x, BOX, p)
    r = 0.97
    e_ref = -0.5 * K * R0**2 * np.log(1 - (r / R0) ** 2)
    sr6 = (sig / r) ** 6
    e_ref += 4 * eps * (sr6**2 - sr6) + eps
    assert float(e) == pytest.approx(e_ref, rel=1e-12)


def test_angle_dihedral_force_consistency():
    """Autodiff forces equal -dE/dx by central finite differences, net force
    and net torque vanish."""
    rs = np.random.RandomState(5)
    x0 = np.array([[1.0, 1, 1], [2, 1.2, 1], [2.5, 2, 1.1], [3.5, 2.2, 1.8]])
    ap = AngleParams(idx=jnp.array([[0, 1, 2], [1, 2, 3]], jnp.int32),
                     atype=jnp.array([1, 1], jnp.int32),
                     k=jnp.array([0.0, 45.0]),
                     theta0=jnp.array([0.0, np.deg2rad(110.0)]))
    dp = DihedralParams(idx=jnp.array([[0, 1, 2, 3]], jnp.int32),
                        dtype_=jnp.array([1], jnp.int32),
                        c1=jnp.array([0.0, 1.3]), c2=jnp.array([0.0, -0.05]),
                        c3=jnp.array([0.0, 0.2]), c4=jnp.array([0.0, 0.1]))

    for fn, params in ((angle_forces, ap), (dihedral_forces, dp)):
        f, e, v = fn(jnp.asarray(x0), BOX, params)
        f = np.asarray(f)
        np.testing.assert_allclose(f.sum(0), 0, atol=1e-10)
        h = 1e-6
        for a in range(4):
            for d in range(3):
                xp = x0.copy(); xp[a, d] += h
                xm = x0.copy(); xm[a, d] -= h
                ep = float(fn(jnp.asarray(xp), BOX, params)[1])
                em = float(fn(jnp.asarray(xm), BOX, params)[1])
                assert -(ep - em) / (2 * h) == pytest.approx(
                    f[a, d], rel=1e-5, abs=1e-7), (fn, a, d)
