"""pppm/disp — dispersion mesh vs the exact-k ewald/disp sum.

The mesh geometric-dispersion solver (ops/pppm.py pppm_disp_forces, the
pppm_disp.cpp geometric-mixing analog) must reproduce the validated
ewald6_forces k-space sum (itself checked against a converged direct
lattice sum in test_dispersion.py) to 1e-6 on energy/forces/virial.
"""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def system():
    rng = np.random.RandomState(7)
    n = 48
    L = 8.0
    x = rng.uniform(0, L, size=(n, 3))
    eps = rng.uniform(0.5, 1.5, size=n)
    sig = rng.uniform(0.9, 1.1, size=n)
    b = np.sqrt(4.0 * eps * sig**6)
    return x, b, L


@pytest.fixture(scope="module")
def solved(system):
    import jax.numpy as jnp

    from lidp_tpu.ops.ewald import ewald6_forces, setup_dispersion
    from lidp_tpu.ops.pppm import pppm_disp_forces, setup_pppm_disp

    x, b, L = system
    es = setup_dispersion(accuracy_rel=1e-6, qqrd2e=1.0, b_atom=b,
                          natoms=len(x), cutoff=3.0, box_lengths=[L] * 3)
    fk, ek, vk = ewald6_forces(jnp.asarray(x), jnp.asarray(b), L**3, es)

    ps = setup_pppm_disp(accuracy_rel=1e-6, qqrd2e=1.0, b_atom=b,
                         natoms=len(x), cutoff=3.0, box_lengths=[L] * 3,
                         g6=es.g6)
    fm, em, vm = pppm_disp_forces(jnp.asarray(x), jnp.asarray(b),
                                  [L] * 3, ps)
    return (np.asarray(fk), float(ek), np.asarray(vk),
            np.asarray(fm), float(em), np.asarray(vm))


def test_energy_matches_ewald_disp(solved):
    _, ek, _, _, em, _ = solved
    assert ek != 0.0
    assert abs(em - ek) < 1e-6 * abs(ek), (em, ek)


def test_forces_match_ewald_disp(solved):
    fk, _, _, fm, _, _ = solved
    scale = np.sqrt(np.mean(np.sum(fk**2, axis=1)))
    err = np.sqrt(np.mean(np.sum((fm - fk) ** 2, axis=1)))
    assert err < 1e-6 * scale, (err, scale)


def test_virial_matches_ewald_disp(solved):
    _, _, vk, _, _, vm = solved
    scale = max(1.0, np.max(np.abs(vk)))
    assert np.max(np.abs(vm - vk)) < 2e-6 * scale, (vm, vk)


def test_grid_is_factorable(system):
    from lidp_tpu.ops.pppm import _factorable, setup_pppm_disp

    x, b, L = system
    ps = setup_pppm_disp(accuracy_rel=1e-6, qqrd2e=1.0, b_atom=b,
                         natoms=len(x), cutoff=3.0, box_lengths=[L] * 3)
    assert all(_factorable(n) for n in ps.grid)
    assert ps.g6 > 0
