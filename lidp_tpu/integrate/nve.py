"""fix nve — velocity-Verlet point-particle integration.

Matches FixNVE (fix_nve.cpp:65,109): half-kick + drift, then half-kick, with
dtf = 0.5 * dt * ftm2v.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.state import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NVEParams:
    dtv: jax.Array        # dt
    dtf: jax.Array        # 0.5 * dt * ftm2v
    mass_atom: jax.Array  # (N,)
    # fix-group mask (FixNVE only integrates its group; atoms outside any
    # time-integration fix do not move); None = all atoms
    gmask: jax.Array = None
    # fix nve/limit (fix_nve_limit.cpp): per-atom |v| clamp after each
    # half-kick, vlimitsq = (xlimit/dt)^2; None = plain nve
    vlimitsq: jax.Array = None
    # fix nve/noforce (fix_nve_noforce.cpp): drift x only, never kick v
    noforce: bool = dataclasses.field(metadata=dict(static=True),
                                      default=False)

    @staticmethod
    def create(dt: float, ftm2v: float, mass_atom, dtype=jnp.float64,
               gmask=None, xlimit=None, noforce=False):
        return NVEParams(
            dtv=jnp.asarray(dt, dtype),
            dtf=jnp.asarray(0.5 * dt * ftm2v, dtype),
            mass_atom=jnp.asarray(mass_atom, dtype),
            gmask=(None if gmask is None else jnp.asarray(gmask, bool)),
            vlimitsq=(None if xlimit is None
                      else jnp.asarray((xlimit / dt) ** 2, dtype)),
            noforce=noforce,
        )


def _upd_mask(sys, p):
    m = sys.mask
    if p.gmask is not None:
        m = m & p.gmask
    return m[:, None]


def _vclamp(v, upd, p):
    """fix nve/limit: rescale any atom whose |v| exceeds xlimit/dt."""
    vsq = jnp.sum(v * v, axis=1, keepdims=True)
    scale = jnp.sqrt(p.vlimitsq / jnp.maximum(vsq, 1e-300))
    return jnp.where(upd & (vsq > p.vlimitsq), v * scale, v)


def initial_integrate(sys: System, f, p: NVEParams) -> System:
    minv = jnp.where(p.mass_atom > 0, 1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    upd = _upd_mask(sys, p)
    if p.noforce:
        v = sys.v
    else:
        v = jnp.where(upd, sys.v + (p.dtf * minv)[:, None] * f, sys.v)
        v = jnp.where(sys.mask[:, None], v, 0.0)
        if p.vlimitsq is not None:
            v = _vclamp(v, upd, p)
    x = sys.x + jnp.where(upd, p.dtv * v, 0.0)
    return sys.replace(x=x, v=v)


def final_integrate(sys: System, f, p: NVEParams) -> System:
    if p.noforce:
        return sys
    minv = jnp.where(p.mass_atom > 0, 1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    upd = _upd_mask(sys, p)
    v = jnp.where(upd, sys.v + (p.dtf * minv)[:, None] * f, sys.v)
    v = jnp.where(sys.mask[:, None], v, 0.0)
    if p.vlimitsq is not None:
        v = _vclamp(v, upd, p)
    return sys.replace(v=v)


# --- compensated (Kahan) variant -------------------------------------------
#
# In f32 the plain x += dt*v update loses ~eps*|x| per step (|x| ~ box size
# while dt*v is ~1e-3 of it), which shows up as a secular energy drift.
# Carrying a Kahan compensation term for x and v in the integrator state
# recovers near-f64 conservation at f32 force cost; the compensation arrays
# ride in `istate` so the System pytree (and every force kernel) is unchanged.


def _kadd(a, d, c):
    """One Kahan step: a += d with running compensation c."""
    y = d - c
    t = a + y
    c_new = (t - a) - y
    return t, c_new


def kahan_init_state(sys: System, f, p: NVEParams):
    return sys, (jnp.zeros_like(sys.x), jnp.zeros_like(sys.v))


def kahan_initial_integrate(sys: System, f, p: NVEParams, st):
    cx, cv = st
    minv = jnp.where(p.mass_atom > 0,
                     1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    v, cv = _kadd(sys.v, (p.dtf * minv)[:, None] * f, cv)
    m = sys.mask[:, None]
    v = jnp.where(m, v, 0.0)
    cv = jnp.where(m, cv, 0.0)
    x, cx = _kadd(sys.x, p.dtv * v, cx)
    return sys.replace(x=x, v=v), (cx, cv)


def kahan_final_integrate(sys: System, f, p: NVEParams, st):
    cx, cv = st
    minv = jnp.where(p.mass_atom > 0,
                     1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    v, cv = _kadd(sys.v, (p.dtf * minv)[:, None] * f, cv)
    m = sys.mask[:, None]
    v = jnp.where(m, v, 0.0)
    cv = jnp.where(m, cv, 0.0)
    return sys.replace(v=v), (cx, cv)
