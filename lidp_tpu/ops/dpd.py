"""Dissipative particle dynamics pair styles (pair_dpd.cpp,
pair_dpd_tstat.cpp) re-designed TPU-first.

F_ij = a0 wd r^ - gamma wd^2 (r^.v_ij) r^ + sigma wd theta_ij dtinvsqrt r^,
wd = 1 - r/rc, sigma = sqrt(2 kB T gamma) (pair_dpd.cpp:135-152 +
init_one:236).

The reference draws theta_ij from a serial Marsaglia stream, which makes
trajectories MPI-rank- and neighbor-order-dependent (only statistics are
reproducible).  Here theta is a counter-based construction: one
jax.random.normal matrix keyed on (seed, step), symmetrized as
(A + A^T)/sqrt(2) so theta_ij == theta_ji exactly — Newton's third law
holds to the bit, total momentum is conserved, and the marginals stay
N(0,1).  Statistics match the reference; per-step trajectories
intentionally do not (no serial RNG stream can be order-independent).

Dense-path kernel (the engine routes dpd to the minimum-image dense path;
pair counts at DPD densities are modest and the (N,N) noise matrix is the
natural TPU layout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import minimum_image


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPDParams:
    a0: jax.Array        # (T+1,T+1); zero for dpd/tstat
    gamma: jax.Array     # (T+1,T+1)
    sigma: jax.Array     # (T+1,T+1) sqrt(2 kB T gamma)
    cut: jax.Array       # (T+1,T+1)
    cutsq: jax.Array     # (T+1,T+1)
    special_lj: jax.Array   # (4,) factor_dpd table
    dtinvsqrt: jax.Array    # () 1/sqrt(dt)
    seed: int = dataclasses.field(metadata=dict(static=True), default=1)
    tstat: bool = dataclasses.field(metadata=dict(static=True),
                                    default=False)


def dpd_forces(x, v, type_, mask, box, p: DPDParams, step, sp_code=None,
               need_ev: bool = True):
    """(f, evdwl, virial6) — dense all-pairs DPD forces at `step`."""
    dtype = x.dtype
    n = x.shape[0]
    L = box.lengths

    dx = minimum_image(x[:, 0:1] - x[None, :, 0], L[0])
    dy = minimum_image(x[:, 1:2] - x[None, :, 1], L[1])
    dz = minimum_image(x[:, 2:3] - x[None, :, 2], L[2])
    rsq = dx * dx + dy * dy + dz * dz
    ti = type_[:, None]
    tj = type_[None, :]
    pm = (mask[:, None] & mask[None, :]
          & (jnp.arange(n)[:, None] != jnp.arange(n)[None, :]))
    cutsq = p.cutsq[ti, tj]
    inr = pm & (rsq < cutsq) & (rsq > 1e-20)
    rsq_s = jnp.where(inr, rsq, 1.0)
    r = jnp.sqrt(rsq_s)
    rinv = 1.0 / r

    dvx = v[:, 0:1] - v[None, :, 0]
    dvy = v[:, 1:2] - v[None, :, 1]
    dvz = v[:, 2:3] - v[None, :, 2]
    dot = dx * dvx + dy * dvy + dz * dvz
    wd = 1.0 - r / p.cut[ti, tj]

    # symmetric counter-based noise: theta_ij == theta_ji, N(0,1)
    key = jax.random.fold_in(jax.random.PRNGKey(p.seed),
                             jnp.asarray(step, jnp.int32))
    a_ = jax.random.normal(key, (n, n), dtype)
    theta = (a_ + a_.T) * (1.0 / jnp.sqrt(jnp.asarray(2.0, dtype)))

    fpair = (p.a0[ti, tj] * wd
             - p.gamma[ti, tj] * wd * wd * dot * rinv
             + p.sigma[ti, tj] * wd * theta * p.dtinvsqrt)
    if sp_code is not None:
        fpair = fpair * p.special_lj[sp_code]
    fpair = jnp.where(inr, fpair * rinv, 0.0)

    fx = jnp.sum(fpair * dx, axis=1)
    fy = jnp.sum(fpair * dy, axis=1)
    fz = jnp.sum(fpair * dz, axis=1)
    f = jnp.stack([fx, fy, fz], axis=-1)

    evdwl = jnp.zeros((), dtype)
    vir = jnp.zeros((6,), dtype)
    if need_ev:
        if not p.tstat:
            # conservative energy shifted to 0 at the cutoff
            # (pair_dpd.cpp:165-168)
            ew = 0.5 * p.a0[ti, tj] * p.cut[ti, tj] * wd * wd
            if sp_code is not None:
                ew = ew * p.special_lj[sp_code]
            evdwl = 0.5 * jnp.sum(jnp.where(inr, ew, 0.0))
        vir = 0.5 * jnp.stack([
            jnp.sum(fpair * dx * dx), jnp.sum(fpair * dy * dy),
            jnp.sum(fpair * dz * dz), jnp.sum(fpair * dx * dy),
            jnp.sum(fpair * dx * dz), jnp.sum(fpair * dy * dz)])
    return f, evdwl, vir
