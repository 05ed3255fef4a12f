"""Energy minimization (the reference's Min::run, min.cpp:406).

Implements FIRE (fast inertial relaxation engine) — one of the reference's
min styles (min_fire.cpp) and the most TPU-friendly: pure vector updates
under lax.while_loop, no line searches with data-dependent trip counts.
Stopping criteria mirror minimize's etol/ftol/maxiter semantics:
relative energy change < etol, or force 2-norm < ftol.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FireConfig:
    dt0: float
    dtmax: float
    alpha0: float = 0.1
    f_inc: float = 1.1
    f_dec: float = 0.5
    f_alpha: float = 0.99
    n_min: int = 5


def fire_minimize(sys, compute, mass_atom, *, etol=0.0, ftol=1e-6,
                  maxiter=1000, dt0=None, dtmax=None):
    """Minimize with FIRE. `compute(sys) -> (f, energy)` jittable.

    Returns (sys, energy, iterations, converged).
    """
    dtype = sys.x.dtype
    dt0 = dt0 if dt0 is not None else 0.002
    dtmax = dtmax if dtmax is not None else 10 * dt0
    cfg = FireConfig(dt0=dt0, dtmax=dtmax)
    minv = jnp.where(mass_atom > 0, 1.0 / jnp.where(mass_atom > 0, mass_atom, 1.0), 0.0)[:, None]

    f0, e0 = compute(sys)

    def cond(c):
        sys, f, e_prev, e, v, dt, alpha, npos, it = c
        fnorm = jnp.sqrt(jnp.sum(f * f))
        de = jnp.abs(e - e_prev)
        e_ok = (etol > 0.0) & (de < etol * 0.5 * (jnp.abs(e) + jnp.abs(e_prev) + 1e-30))
        f_ok = (ftol > 0.0) & (fnorm < ftol)
        return (~(e_ok | f_ok)) & (it < maxiter)

    def body(c):
        sys, f, e_prev, e, v, dt, alpha, npos, it = c
        p = jnp.sum(f * v)
        fnorm = jnp.sqrt(jnp.sum(f * f)) + 1e-30
        vnorm = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(p > 0,
                      (1.0 - alpha) * v + alpha * f / fnorm * vnorm,
                      jnp.zeros_like(v))
        uphill = p <= 0
        grow = (p > 0) & (npos > cfg.n_min)
        dt = jnp.where(grow, jnp.minimum(dt * cfg.f_inc, cfg.dtmax),
                       jnp.where(uphill, dt * cfg.f_dec, dt))
        alpha = jnp.where(grow, alpha * cfg.f_alpha,
                          jnp.where(uphill, jnp.asarray(cfg.alpha0, dtype), alpha))
        npos = jnp.where(uphill, 0, npos + 1)

        v = v + dt * f * minv
        x = sys.x + dt * v
        sys2 = sys.replace(x=x)
        f2, e2 = compute(sys2)
        return sys2, f2, e, e2, v, dt, alpha, npos, it + 1

    init = (sys, f0, jnp.asarray(jnp.inf, dtype), e0,
            jnp.zeros_like(sys.x), jnp.asarray(cfg.dt0, dtype),
            jnp.asarray(cfg.alpha0, dtype), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    sys, f, e_prev, e, v, dt, alpha, npos, it = jax.lax.while_loop(
        cond, body, init)
    fnorm = jnp.sqrt(jnp.sum(f * f))
    return sys, e, it, (fnorm < ftol) | (it < maxiter)
