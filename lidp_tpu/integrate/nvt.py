"""fix nvt — point-particle Nose-Hoover thermostat (FixNH, fix_nh.cpp).

Velocity-Verlet with NH chain scaling applied before the first and after the
second half-kick (FixNH::initial_integrate:830, final_integrate:886):
  initial: chain update + v *= exp(-dtq*eta_dot[0]); v += dtf f/m; x += dt v
  final:   v += dtf f/m; chain update + scale.
Chain masses q[0] = dof*kT/freq^2, q[k>0] = kT/freq^2 (nhc_temp_integrate).

No bundled input uses plain fix nvt (the polarization examples thermostat
rigid bodies), so this provides the core-style capability with the same
update structure; rigid NH parity lives in integrate/rigid.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.state import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NVTParams:
    dtv: jax.Array
    dtf: jax.Array
    dtq: jax.Array
    mass_atom: jax.Array
    t_target: jax.Array      # t_start
    t_freq: jax.Array
    t_stop: jax.Array = None      # ramp end value (FixNH compute_temp_target)
    ramp_begin: jax.Array = None  # run begin/end steps for the ramp
    ramp_end: jax.Array = None
    # fix nvt/sllod (fix_nvt_sllod.cpp): box deformation rate in LAMMPS
    # Voigt order [lx ly lz yz xz xy] plus d(lo)/dt; replaced at run()
    # time from the fix deform schedule
    h_rate: jax.Array = None     # (6,)
    h_ratelo: jax.Array = None   # (3,)
    # fix nvt/sphere on central-force pairs (fix_nh_sphere.cpp): omega
    # has no torque source, so its KE is the setup value scaled by the
    # cumulative thermostat factor^2 (NVTState.rot_scale2)
    rot_ke20: jax.Array = None   # scalar sum 0.4 m r^2 w^2 at setup
    dof: float = dataclasses.field(metadata=dict(static=True), default=3.0)
    boltz: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    mvv2e: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    t_chain: int = dataclasses.field(metadata=dict(static=True), default=3)
    sllod: bool = dataclasses.field(metadata=dict(static=True),
                                    default=False)

    @staticmethod
    def create(dt, ftm2v, mass_atom, t_target, t_period, *, dof, boltz,
               mvv2e, t_chain=3, t_stop=None, dtype=jnp.float64):
        return NVTParams(
            dtv=jnp.asarray(dt, dtype),
            dtf=jnp.asarray(0.5 * dt * ftm2v, dtype),
            dtq=jnp.asarray(0.5 * dt, dtype),
            mass_atom=jnp.asarray(mass_atom, dtype),
            t_target=jnp.asarray(t_target, dtype),
            t_freq=jnp.asarray(1.0 / t_period, dtype),
            t_stop=jnp.asarray(t_target if t_stop is None else t_stop,
                               dtype),
            ramp_begin=jnp.zeros((), jnp.int32),
            ramp_end=jnp.zeros((), jnp.int32),
            dof=float(dof), boltz=boltz, mvv2e=mvv2e, t_chain=t_chain)


def ramp_target(start, stop, begin, end, step):
    """FixNH::compute_temp_target (fix_nh.cpp): linear ramp over the run,
    delta = (step - beginstep)/(endstep - beginstep), clamped."""
    denom = jnp.maximum(end - begin, 1).astype(start.dtype)
    delta = jnp.clip((step - begin).astype(start.dtype) / denom, 0.0, 1.0)
    return start + delta * (stop - start)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NVTState:
    eta_dot: jax.Array  # (chain,)
    rot_scale2: jax.Array = None  # cumulative scale^2 (nvt/sphere)


def _ke2(sys, p):
    return jnp.sum(p.mass_atom[:, None] * sys.v * sys.v
                   * sys.mask[:, None]) * p.mvv2e


def stream_velocity(x, box, h_rate, h_ratelo):
    """Streaming velocity of the deforming box at each atom
    (ComputeTempDeform::compute_scalar, compute_temp_deform.cpp:127-136):
    vstream = Hrate @ lamda + h_ratelo with lamda the 0-1 box coords."""
    lam = (x - box.lo) @ box.h_inv.T
    vs0 = (h_rate[0] * lam[:, 0] + h_rate[5] * lam[:, 1]
           + h_rate[4] * lam[:, 2] + h_ratelo[0])
    vs1 = h_rate[1] * lam[:, 1] + h_rate[3] * lam[:, 2] + h_ratelo[1]
    vs2 = h_rate[2] * lam[:, 2] + h_ratelo[2]
    return jnp.stack([vs0, vs1, vs2], axis=1)


def _sllod_ke2(sys, p):
    """Thermal kinetic energy (bias = streaming velocity removed)."""
    vt = sys.v - stream_velocity(sys.x, sys.box, p.h_rate, p.h_ratelo)
    return jnp.sum(p.mass_atom[:, None] * vt * vt
                   * sys.mask[:, None]) * p.mvv2e


def _sllod_v_temp(sys, p, scale):
    """FixNVTSllod::nh_v_temp: thermostat the thermal velocity only and
    apply the SLLOD -v.grad(u) correction,
      v' = vstream + (v - vstream)*factor_eta - dt/2 * (Hrate.Hinv) v
    with vdelu computed from the FULL pre-update velocity."""
    h_two = jnp.stack([
        jnp.stack([p.h_rate[0], p.h_rate[5], p.h_rate[4]]),
        jnp.stack([jnp.zeros_like(p.h_rate[0]), p.h_rate[1], p.h_rate[3]]),
        jnp.stack([jnp.zeros_like(p.h_rate[0]),
                   jnp.zeros_like(p.h_rate[0]), p.h_rate[2]]),
    ]) @ sys.box.h_inv
    vdelu = sys.v @ h_two.T
    vs = stream_velocity(sys.x, sys.box, p.h_rate, p.h_ratelo)
    v = vs + (sys.v - vs) * scale - p.dtq * vdelu
    return jnp.where(sys.mask[:, None], v, 0.0)


def _nhc(eta_dot, ke2, p: NVTParams, step=None):
    """Half-step NH chain update; returns (eta_dot, velocity scale)."""
    tt = p.t_target
    if step is not None and p.t_stop is not None:
        tt = ramp_target(p.t_target, p.t_stop, p.ramp_begin, p.ramp_end,
                         step)
    kt = p.boltz * tt
    q0 = p.dof * kt / (p.t_freq * p.t_freq)
    qk = kt / (p.t_freq * p.t_freq)
    q = [q0] + [qk] * (p.t_chain - 1)
    eta = [eta_dot[i] for i in range(p.t_chain)]
    f = [jnp.zeros_like(kt) for _ in range(p.t_chain)]
    f[0] = (ke2 - p.dof * kt) / q[0]
    for k in range(1, p.t_chain):
        f[k] = (q[k - 1] * eta[k - 1] ** 2 - kt) / q[k]
    w = p.dtq
    C = p.t_chain
    eta[C - 1] = eta[C - 1] + 0.5 * w * f[C - 1]
    for k in range(C - 2, -1, -1):
        s = jnp.exp(-0.25 * w * eta[k + 1])
        eta[k] = eta[k] * s * s + 0.5 * w * f[k] * s
    scale = jnp.exp(-w * eta[0])
    ke2 = ke2 * scale * scale
    f[0] = (ke2 - p.dof * kt) / q[0]
    for k in range(0, C - 1):
        s = jnp.exp(-0.25 * w * eta[k + 1])
        eta[k] = eta[k] * s * s + 0.5 * w * f[k] * s
        f[k + 1] = (q[k] * eta[k] ** 2 - kt) / q[k + 1]
    eta[C - 1] = eta[C - 1] + 0.5 * w * f[C - 1]
    return jnp.stack(eta), scale


def init_state(sys, f, p: NVTParams):
    return sys, NVTState(eta_dot=jnp.zeros((p.t_chain,), sys.x.dtype),
                         rot_scale2=jnp.ones((), sys.x.dtype))


def _ke2_tot(sys, p, st):
    ke2 = _sllod_ke2(sys, p) if p.sllod else _ke2(sys, p)
    if p.rot_ke20 is not None:
        ke2 = ke2 + p.rot_ke20 * st.rot_scale2
    return ke2


def initial_integrate(sys: System, f, p: NVTParams, st: NVTState):
    ke2 = _ke2_tot(sys, p, st)
    eta_dot, scale = _nhc(st.eta_dot, ke2, p, sys.step)
    rs2 = (st.rot_scale2 * scale * scale if st.rot_scale2 is not None
           else None)
    v = _sllod_v_temp(sys, p, scale) if p.sllod else sys.v * scale
    minv = jnp.where(p.mass_atom > 0,
                     1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    v = v + (p.dtf * minv)[:, None] * f
    v = jnp.where(sys.mask[:, None], v, 0.0)
    x = sys.x + p.dtv * v
    return sys.replace(x=x, v=v), NVTState(eta_dot=eta_dot,
                                           rot_scale2=rs2)


def final_integrate(sys: System, f, p: NVTParams, st: NVTState):
    minv = jnp.where(p.mass_atom > 0,
                     1.0 / jnp.where(p.mass_atom > 0, p.mass_atom, 1.0), 0.0)
    v = sys.v + (p.dtf * minv)[:, None] * f
    v = jnp.where(sys.mask[:, None], v, 0.0)
    sys = sys.replace(v=v)
    ke2 = _ke2_tot(sys, p, st)
    eta_dot, scale = _nhc(st.eta_dot, ke2, p, sys.step)
    rs2 = (st.rot_scale2 * scale * scale if st.rot_scale2 is not None
           else None)
    v2 = _sllod_v_temp(sys, p, scale) if p.sllod else sys.v * scale
    return sys.replace(v=v2), NVTState(eta_dot=eta_dot, rot_scale2=rs2)
