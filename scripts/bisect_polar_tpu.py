"""Bisect which phase of the sharded polar step costs 10s on axon (dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import dataclasses

from lidp_tpu.models import polar_bench
from lidp_tpu.forcefield import ForceField
from lidp_tpu.ops import polarization as pol_ops
from lidp_tpu.parallel import shard as pshard
from lidp_tpu import units

polar_bench.enable_compile_cache()
u = units.REAL
script = polar_bench.build_script(10000, 1e-6)
n = script.x.shape[0]
from lidp_tpu.sim import _mix_pair_tables
from lidp_tpu.ops.ewald import EwaldParams, setup_ewald_disp
from lidp_tpu.ops.pair import make_pair_params

dtype = jnp.float32
mass_atom = script.mass_type[script.type]
alpha = script.alpha_type[script.type]
eps, sig, cut = _mix_pair_tables(script)
es = setup_ewald_disp(accuracy_rel=script.kspace[1], qqrd2e=u.qqr2e,
                      q=script.q, natoms=n, cutoff=script.pair.cut_coul,
                      box_lengths=script.box_hi - script.box_lo)
pair = make_pair_params(eps, sig, cut, cut_coul=script.pair.cut_coul,
                        coul=True, qqrd2e=u.qqr2e, g_ewald=es.g_ewald,
                        dtype=dtype)
ew = EwaldParams.from_setup(es, u.qqr2e, dtype=dtype)

s_zodid = pol_ops.PolarizationSettings(
    zodid=True, damping_type=pol_ops.DAMPING_EXPONENTIAL, use_previous=False)

variants = [
    ("pair+ewald only", ForceField(pair=pair, ewald=ew, qqrd2e=u.qqr2e), None),
    ("zodid (wolf+dipole, no SCF)",
     ForceField(pair=pair, ewald=ew, polar=s_zodid, qqrd2e=u.qqr2e), s_zodid),
]

for name, ff, s in variants:
    make, bind_box, npad, bind_special = pshard.build_sharded_polar_step(
        None, ff, s, n=n, dt=1.0, ftm2v=u.ftm2v, col_chunk=2048, dtype=dtype)
    bind_box(script.box_hi - script.box_lo)
    step, init = make(None)

    def pad(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((npad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    args = [jnp.asarray(pad(script.x.astype(np.float32))),
            jnp.asarray(pad(np.zeros((n, 3), np.float32))),
            jnp.zeros((npad, 3), jnp.float32),
            jnp.asarray(pad(script.q.astype(np.float32))),
            jnp.asarray(pad(script.type, 0)),
            jnp.asarray(pad(script.mol, 0)),
            jnp.asarray(pad(alpha.astype(np.float32))),
            jnp.asarray(pad(np.zeros((n, 3), np.float32))),
            jnp.asarray(pad(np.where(mass_atom > 0, mass_atom, 1.0)
                            .astype(np.float32), 1.0)),
            jnp.asarray(pad(np.ones(n, bool), False))]
    t0 = time.perf_counter()
    out = step(*args)
    jax.block_until_ready(out[0])
    print(name, "compile+first", round(time.perf_counter() - t0, 1), flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = step(*args)
    jax.block_until_ready(out[0])
    print(name, "steady ms/step", round((time.perf_counter() - t0) * 200, 1),
          flush=True)
