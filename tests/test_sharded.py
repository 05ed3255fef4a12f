"""Sharded (multi-chip) step vs dense single-chip reference.

The shard_map row-block implementation (parallel/shard.py) must produce the
same forces/energies as the dense path on an 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lidp_tpu import units
from lidp_tpu.box import Box
from lidp_tpu.forcefield import ForceField, compute_forces
from lidp_tpu.ops import polarization as pol
from lidp_tpu.ops.ewald import EwaldParams, setup_ewald_disp
from lidp_tpu.ops.pair import make_pair_params
from lidp_tpu.parallel import shard as pshard
from lidp_tpu.state import make_system

import __graft_entry__ as graft


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_dense():
    dtype = jnp.float64
    u = units.REAL
    x, v, q, typ, mol, alpha, L = graft._tiny_polar_system(16, dtype)
    n = x.shape[0]

    eps = np.zeros((3, 3)); sig = np.zeros((3, 3)); cut = np.zeros((3, 3))
    eps[1:, 1:] = [[0.1, 0.05], [0.05, 0.03]]
    sig[1:, 1:] = [[3.0, 2.7], [2.7, 2.5]]
    cut[1:, 1:] = 6.0
    cut_coul = 6.5
    es = setup_ewald_disp(accuracy_rel=1e-4, qqrd2e=u.qqr2e, q=q, natoms=n,
                          cutoff=cut_coul, box_lengths=[L, L, L])
    pair = make_pair_params(eps, sig, cut, cut_coul=cut_coul, coul=True,
                            qqrd2e=u.qqr2e, g_ewald=es.g_ewald, dtype=dtype)
    ew = EwaldParams.from_setup(es, u.qqr2e, dtype=dtype)
    s = pol.PolarizationSettings(iterations_max=50,
                                 damping_type=pol.DAMPING_EXPONENTIAL,
                                 polar_precision=1e-10)
    ff = ForceField(pair=pair, ewald=ew, polar=s, qqrd2e=u.qqr2e)

    # dense reference
    box = Box.create([0, 0, 0], [L, L, L], dtype=dtype)
    sys = make_system(x, box=box, v=v, q=q, type=typ, mol=mol, alpha=alpha,
                      dtype=dtype)
    res = compute_forces(sys, ff)

    # sharded
    mesh = pshard.make_mesh(8)
    make, bind_box, npad, bind_special = pshard.build_sharded_polar_step(
        mesh, ff, s, n=n, dt=0.0, ftm2v=u.ftm2v, col_chunk=16, dtype=dtype)
    bind_box([L, L, L])
    step, init = make(mesh)

    def pad(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((npad,) + a.shape[1:], fill,
                      a.dtype if a.dtype != np.float64 else np.float64)
        out[:n] = a
        return out

    sharding = NamedSharding(mesh, P(pshard.AXIS))
    put = lambda a: jax.device_put(jnp.asarray(a), sharding)
    f2, mu2, energies = init(
        put(pad(x)), put(pad(q)), put(pad(typ, 0)),
        put(pad(mol, 0)), put(pad(alpha)), put(pad(np.zeros((n, 3)))),
        put(pad(np.ones(n, bool), False)))
    np.testing.assert_allclose(float(energies["evdwl"]), float(res.evdwl),
                               rtol=1e-10)
    np.testing.assert_allclose(float(energies["ecoul"]), float(res.ecoul),
                               rtol=1e-10)
    np.testing.assert_allclose(float(energies["elong"]), float(res.elong),
                               rtol=1e-9)
    np.testing.assert_allclose(float(energies["epol"]), float(res.epol),
                               rtol=1e-8)
    # CG reduction order differs between the sharded (psum) and dense paths;
    # converged forces agree to solver precision, not bitwise
    np.testing.assert_allclose(np.asarray(f2)[:n], np.asarray(res.f),
                               rtol=2e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mu2)[:n], np.asarray(res.mu),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(energies["virial"]),
                               np.asarray(res.virial), rtol=1e-8, atol=1e-9)
