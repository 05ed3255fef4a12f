"""f32-vs-f64 error budget for the polarizable force path (dev tool).

Builds the MOF5+Methane cell twice — the production f32 fast path
(precision 1e-6) and the parity-grade f64 path (precision 1e-11) — evaluates
forces + SCF dipoles from the same zero-dipole start, and prints relative
errors.  This is the measured justification for running production MD in f32
(VERDICT r1 weak #2).

Usage: python scripts/polar_error_budget.py [natoms]
"""
import sys

import jax

# This is a NUMERICAL comparison (algorithm f32-vs-f64 error), not a perf
# measurement — run it on the host CPU: f64 through the axon tunnel pays a
# multi-minute remote compile (the BENCH_r02 "timeout" null), while CPU
# finishes in seconds and elementwise f32/f64 arithmetic is IEEE on both.
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from lidp_tpu.models import polar_bench

args = [a for a in sys.argv[1:] if not a.startswith("--")]
natoms = int(args[0]) if args else 1324

out = {}
for tag, dtype, prec in (("f64", jnp.float64, 1e-11),
                         ("f32", jnp.float32, 1e-6)):
    b = polar_bench.build(target_atoms=natoms, n_devices=1,
                          precision=prec, dtype=dtype)
    f, en = polar_bench.run_step(b, zero_init=True)
    jax.block_until_ready(f)
    n = b.natoms
    out[tag] = dict(
        f=np.asarray(f)[:n].astype(np.float64),
        mu=np.asarray(b.arrays["mu"])[:n].astype(np.float64),
        en={k: float(v) for k, v in en.items() if v.ndim == 0},
    )

f64, f32 = out["f64"], out["f32"]
fn = np.linalg.norm(f64["f"], axis=1)
scale_f = np.sqrt(np.mean(fn ** 2))
err_f = np.linalg.norm(f32["f"] - f64["f"], axis=1)
mun = np.linalg.norm(f64["mu"], axis=1)
scale_mu = np.sqrt(np.mean(mun ** 2))
err_mu = np.linalg.norm(f32["mu"] - f64["mu"], axis=1)

res = {
    "natoms": natoms,
    "force_rms_rel_err": float(np.sqrt(np.mean(err_f ** 2)) / scale_f),
    "force_max_rel_err": float(np.max(err_f) / scale_f),
    "mu_rms_rel_err": float(np.sqrt(np.mean(err_mu ** 2)) / scale_mu),
    "mu_max_rel_err": float(np.max(err_mu) / scale_mu),
    "epol_rel_err": abs(f32["en"]["epol"] - f64["en"]["epol"])
    / abs(f64["en"]["epol"]),
    "ecoul_rel_err": abs(f32["en"]["ecoul"] - f64["en"]["ecoul"])
    / abs(f64["en"]["ecoul"]),
}
print("ERRBUDGET " + " ".join(f"{k}={v:.3g}" for k, v in res.items()),
      flush=True)
