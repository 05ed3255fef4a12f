import time
import jax, jax.numpy as jnp, numpy as np
from lidp_tpu.models import polar_bench
from lidp_tpu.forcefield import ForceField
from lidp_tpu.parallel import shard as pshard
from lidp_tpu import units
from lidp_tpu.sim import _mix_pair_tables
from lidp_tpu.ops.pair import make_pair_params

polar_bench.enable_compile_cache()
u = units.REAL
script = polar_bench.build_script(10000, 1e-6)
n = script.x.shape[0]
dtype = jnp.float32
mass_atom = script.mass_type[script.type]
eps, sig, cut = _mix_pair_tables(script)
pair = make_pair_params(eps, sig, cut, cut_coul=script.pair.cut_coul,
                        coul=True, qqrd2e=u.qqr2e, g_ewald=0.2, dtype=dtype)
ff = ForceField(pair=pair, qqrd2e=u.qqr2e)
make, bind_box, npad, bind_special = pshard.build_sharded_polar_step(
    None, ff, None, n=n, dt=1.0, ftm2v=u.ftm2v, col_chunk=2048, dtype=dtype)
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
        jnp.asarray(pad(np.zeros(n, np.float32))),
        jnp.asarray(pad(np.zeros((n, 3), np.float32))),
        jnp.asarray(pad(np.ones(n, np.float32), 1.0)),
        jnp.asarray(pad(np.ones(n, bool), False))]
out = step(*args); jax.block_until_ready(out[0])
t0 = time.perf_counter()
for _ in range(5):
    out = step(*args)
jax.block_until_ready(out[0])
print("PAIR-ONLY steady ms/step", round((time.perf_counter()-t0)*200, 1), flush=True)
