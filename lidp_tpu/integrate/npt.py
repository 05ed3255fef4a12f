"""fix npt / nph — Nose-Hoover thermostat + MTK barostat (fix_nh.cpp).

Reference sequencing preserved exactly (FixNH::initial_integrate :830-880,
final_integrate :886-923):

  initial:  nhc_press(:1819) -> nhc_temp(:1748, scales v by factor_eta) ->
            recompute T,P (KE changed) -> press_target(:2202) ->
            nh_omega_dot(:2228) -> nh_v_press(:1923, double half-exp scale) ->
            nve_v(:1974) -> remap half(:1058) -> nve_x(:2011) -> remap half
  final:    nve_v -> nh_v_press -> recompute T,P -> nh_omega_dot ->
            nhc_temp -> nhc_press

Masses follow the reference update-every-call rule (eta_mass_flag/
omega_mass_flag default on): eta_mass[0]=dof*k*T_t/t_freq^2, others
k*T_t/t_freq^2 (:1756-1760); omega_mass=N*k*T_t/p_freq^2 (:1830-1832);
etap_mass=k*T_t/p_freq_max^2 (:1841-1844).  Chain loops use the nc=1,
Yoshida-Suzuki-1 default.  Couplings: iso (couple xyz) and aniso per-dim
flags; triclinic and deviatoric (sigma) terms are out of scope this round.

The barostat remap scales positions and box edges about the box-center
fixedpoint (:107-109,:1145).  Styles with k-space must re-setup coefficients
on volume change (:877 force->kspace->setup()) — our Ewald tables are
box-frozen, so NPT+kspace is rejected at build time for now.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.state import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NPTParams:
    dtv: jax.Array
    dtf: jax.Array            # 0.5*dt*ftm2v
    mass_atom: jax.Array      # (N,)
    t_target: jax.Array       # thermostat target (0 size => nph)
    p_target: jax.Array       # (3,) per-dim target pressure
    t_freq: jax.Array
    p_freq: jax.Array         # (3,)
    p_freq_max: jax.Array
    natoms: jax.Array         # real atom count (omega_mass)
    dof: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    boltz: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    mvv2e: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    nktv2p: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    tchain: int = dataclasses.field(metadata=dict(static=True), default=3)
    pchain: int = dataclasses.field(metadata=dict(static=True), default=3)
    mtk: bool = dataclasses.field(metadata=dict(static=True), default=True)
    tstat: bool = dataclasses.field(metadata=dict(static=True), default=True)
    p_flag: tuple = dataclasses.field(metadata=dict(static=True),
                                      default=(True, True, True))
    iso: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # per-run linear ramps (FixNH compute_temp_target/compute_press_target):
    # the driver substitutes the ramped targets each step
    t_stop: jax.Array = None
    p_stop: jax.Array = None
    ramp_begin: jax.Array = None
    ramp_end: jax.Array = None
    # fix npt/nph/nvt + /sphere suffix (fix_nh_sphere.cpp): central-force
    # pair styles exert no torque, so omega evolves ONLY through the NH
    # thermostat scale; its KE-tensor diagonal is the initial value times
    # the cumulative scale^2 carried in NPTState.rot_scale2.  The
    # temperature AND the pressure kinetic tensor include it
    # (ComputeTempSphere::compute_vector feeds both in the reference).
    rot_ke30: jax.Array = None    # (3,) sum 0.4 m r^2 w_d^2 at setup

    @staticmethod
    def create(dt, ftm2v, mass_atom, t_target, t_period, p_target, p_period,
               *, natoms, dof, boltz, mvv2e, nktv2p, tchain=3, pchain=3,
               mtk=True, tstat=True, p_flag=(True, True, True), iso=True,
               t_stop=None, p_stop=None, dtype=jnp.float64):
        p_target = jnp.broadcast_to(jnp.asarray(p_target, dtype), (3,))
        p_period = jnp.broadcast_to(jnp.asarray(p_period, dtype), (3,))
        return NPTParams(
            dtv=jnp.asarray(dt, dtype), dtf=jnp.asarray(0.5 * dt * ftm2v, dtype),
            mass_atom=jnp.asarray(mass_atom, dtype),
            t_target=jnp.asarray(t_target, dtype),
            p_target=p_target, t_freq=jnp.asarray(1.0 / t_period, dtype),
            p_freq=1.0 / p_period, p_freq_max=jnp.max(1.0 / p_period),
            natoms=jnp.asarray(float(natoms), dtype), dof=float(dof),
            boltz=boltz, mvv2e=mvv2e, nktv2p=nktv2p, tchain=tchain,
            pchain=pchain, mtk=mtk, tstat=tstat,
            p_flag=tuple(bool(b) for b in p_flag), iso=iso,
            t_stop=jnp.asarray(t_target if t_stop is None else t_stop,
                               dtype),
            p_stop=(p_target if p_stop is None
                    else jnp.broadcast_to(jnp.asarray(p_stop, dtype), (3,))),
            ramp_begin=jnp.zeros((), jnp.int32),
            ramp_end=jnp.zeros((), jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NPTState:
    eta: jax.Array          # (tchain,)
    eta_dot: jax.Array      # (tchain+1,) last stays 0
    eta_dotdot: jax.Array   # (tchain,)
    etap: jax.Array         # (pchain,)
    etap_dot: jax.Array     # (pchain+1,)
    etap_dotdot: jax.Array  # (pchain,)
    omega: jax.Array        # (3,)
    omega_dot: jax.Array    # (3,)
    mtk_term2: jax.Array    # scalar carried into nh_v_press
    rot_scale2: jax.Array = None   # cumulative thermostat scale^2 (sphere)


def init_state(sys, f, p: NPTParams):
    dtype = sys.v.dtype
    z = lambda n: jnp.zeros((n,), dtype)
    return sys, NPTState(
        eta=z(p.tchain), eta_dot=z(p.tchain + 1), eta_dotdot=z(p.tchain),
        etap=z(max(p.pchain, 1)), etap_dot=z(max(p.pchain, 1) + 1),
        etap_dotdot=z(max(p.pchain, 1)),
        omega=z(3), omega_dot=z(3), mtk_term2=jnp.zeros((), dtype),
        rot_scale2=jnp.ones((), dtype))


def _ke_tensor(sys, p, st=None):
    """Per-dim sum(m v_d^2)*mvv2e over real atoms (compute_temp vector),
    plus the (scale-tracked) sphere rotational diagonal when present."""
    m = jnp.where(sys.mask, p.mass_atom, 0.0)
    ke3 = p.mvv2e * jnp.sum(m[:, None] * sys.v * sys.v, axis=0)
    if p.rot_ke30 is not None and st is not None:
        ke3 = ke3 + p.rot_ke30 * st.rot_scale2
    return ke3


def _t_current(ke3, p):
    return jnp.sum(ke3) / (p.dof * p.boltz)


def _p_current(sys, res, ke3, p):
    """Coupled pressure per dim: (mvv_d + virial_d)/V*nktv2p, then couple()
    (fix_nh.cpp couple: ISO averages the coupled dims)."""
    vol = jnp.prod(sys.box.lengths)
    ptens = (ke3 + res.virial[:3]) / vol * p.nktv2p
    if p.iso:
        ptens = jnp.full((3,), jnp.mean(ptens))
    return ptens


def _nhc_temp(v, mask, t_current, st: NPTState, p: NPTParams):
    """nhc_temp_integrate (:1748) — one nc loop, updates (v, eta, eta_dot)."""
    dt4 = 0.5 * p.dtv / 2.0
    dt8 = dt4 / 2.0
    dthalf = 0.5 * p.dtv
    kT = p.boltz * p.t_target
    ke_target = p.dof * kT
    eta_mass = jnp.concatenate(
        [jnp.array([p.dof], v.dtype) * kT / p.t_freq**2,
         jnp.full((p.tchain - 1,), kT / p.t_freq**2, v.dtype)])
    kecurrent = p.dof * p.boltz * t_current
    eta_dot, eta, eta_dotdot = st.eta_dot, st.eta, st.eta_dotdot
    eta_dotdot = eta_dotdot.at[0].set((kecurrent - ke_target) / eta_mass[0])

    for ich in range(p.tchain - 1, 0, -1):
        expfac = jnp.exp(-dt8 * eta_dot[ich + 1])
        eta_dot = eta_dot.at[ich].set(
            (eta_dot[ich] * expfac + eta_dotdot[ich] * dt4) * expfac)
    expfac0 = jnp.exp(-dt8 * eta_dot[1])
    eta_dot = eta_dot.at[0].set(
        (eta_dot[0] * expfac0 + eta_dotdot[0] * dt4) * expfac0)

    factor_eta = jnp.exp(-dthalf * eta_dot[0])
    v = v * jnp.where(mask, factor_eta, 1.0)[:, None]
    if p.rot_ke30 is not None:
        # FixNHSphere::nh_v_temp scales omega by the same factor
        st = dataclasses.replace(
            st, rot_scale2=st.rot_scale2 * factor_eta * factor_eta)

    t_current = t_current * factor_eta * factor_eta
    kecurrent = p.dof * p.boltz * t_current
    eta_dotdot = eta_dotdot.at[0].set((kecurrent - ke_target) / eta_mass[0])
    eta = eta + dthalf * eta_dot[:p.tchain]
    eta_dot = eta_dot.at[0].set(
        (eta_dot[0] * expfac0 + eta_dotdot[0] * dt4) * expfac0)
    for ich in range(1, p.tchain):
        expfac = jnp.exp(-dt8 * eta_dot[ich + 1])
        dd = (eta_mass[ich - 1] * eta_dot[ich - 1]**2 - kT) / eta_mass[ich]
        eta_dotdot = eta_dotdot.at[ich].set(dd)
        eta_dot = eta_dot.at[ich].set(
            (eta_dot[ich] * expfac + dd * dt4) * expfac)
    return v, t_current, dataclasses.replace(
        st, eta=eta, eta_dot=eta_dot, eta_dotdot=eta_dotdot)


def _nhc_press(st: NPTState, p: NPTParams):
    """nhc_press_integrate (:1819) — updates etap chain, scales omega_dot."""
    if p.pchain == 0:
        return st
    dt4 = 0.5 * p.dtv / 2.0
    dt8 = dt4 / 2.0
    dthalf = 0.5 * p.dtv
    kT = p.boltz * p.t_target
    pflag = jnp.asarray(p.p_flag)
    etap_mass = jnp.full((p.pchain,), kT / p.p_freq_max**2)
    kec = jnp.sum(jnp.where(pflag, p.natoms * kT / p.p_freq**2
                            * st.omega_dot**2, 0.0))
    etap_dot, etap, etap_dotdot = st.etap_dot, st.etap, st.etap_dotdot
    etap_dotdot = etap_dotdot.at[0].set((kec - kT) / etap_mass[0])
    for ich in range(p.pchain - 1, 0, -1):
        expfac = jnp.exp(-dt8 * etap_dot[ich + 1])
        etap_dot = etap_dot.at[ich].set(
            (etap_dot[ich] * expfac + etap_dotdot[ich] * dt4) * expfac)
    expfac0 = jnp.exp(-dt8 * etap_dot[1]) if p.pchain > 1 else 1.0
    etap_dot = etap_dot.at[0].set(
        (etap_dot[0] * expfac0 + etap_dotdot[0] * dt4) * expfac0)
    etap = etap + dthalf * etap_dot[:p.pchain]
    factor_etap = jnp.exp(-dthalf * etap_dot[0])
    omega_dot = jnp.where(pflag, st.omega_dot * factor_etap, st.omega_dot)
    kec = jnp.sum(jnp.where(pflag, p.natoms * kT / p.p_freq**2
                            * omega_dot**2, 0.0))
    etap_dotdot = etap_dotdot.at[0].set((kec - kT) / etap_mass[0])
    etap_dot = etap_dot.at[0].set(
        (etap_dot[0] * expfac0 + etap_dotdot[0] * dt4) * expfac0)
    for ich in range(1, p.pchain):
        expfac = jnp.exp(-dt8 * etap_dot[ich + 1])
        dd = (etap_mass[ich - 1] * etap_dot[ich - 1]**2 - kT) / etap_mass[ich]
        etap_dotdot = etap_dotdot.at[ich].set(dd)
        etap_dot = etap_dot.at[ich].set(
            (etap_dot[ich] * expfac + dd * dt4) * expfac)
    return dataclasses.replace(st, etap=etap, etap_dot=etap_dot,
                               etap_dotdot=etap_dotdot, omega_dot=omega_dot)


def _nh_omega_dot(t_current, ke3, p_current, vol, st: NPTState, p: NPTParams):
    """(:2228) — updates omega_dot and the MTK terms."""
    dthalf = 0.5 * p.dtv
    pflag = jnp.asarray(p.p_flag)
    pdim = sum(p.p_flag)
    kT = p.boltz * p.t_target
    omega_mass = p.natoms * kT / p.p_freq**2
    p_hydro = jnp.sum(jnp.where(pflag, p.p_target, 0.0)) / max(pdim, 1)
    if p.mtk:
        if p.iso:
            mtk1 = p.dof * p.boltz * t_current / (pdim * p.natoms)
        else:
            mtk1 = jnp.sum(jnp.where(pflag, ke3, 0.0)) / (pdim * p.natoms)
    else:
        mtk1 = jnp.zeros(())
    f_omega = ((p_current - p_hydro) * vol / (omega_mass * p.nktv2p)
               + mtk1 / omega_mass)
    omega_dot = jnp.where(pflag, st.omega_dot + f_omega * dthalf,
                          st.omega_dot)
    mtk2 = (jnp.sum(jnp.where(pflag, omega_dot, 0.0)) / (pdim * p.natoms)
            if p.mtk else jnp.zeros(()))
    return dataclasses.replace(st, omega_dot=omega_dot, mtk_term2=mtk2)


def _nh_v_press(v, mask, st: NPTState, p: NPTParams):
    """(:1923) — v scaled twice by exp(-dt4*(omega_dot+mtk2)) per dim."""
    dt4 = 0.5 * p.dtv / 2.0
    pflag = jnp.asarray(p.p_flag)
    factor = jnp.where(pflag, jnp.exp(-dt4 * (st.omega_dot + st.mtk_term2)),
                       1.0)
    return v * (factor * factor)[None, :]   # padded atoms have v == 0


def _remap(sys: System, st: NPTState, p: NPTParams):
    """(:1058) — half-step box dilation about the box-center fixedpoint;
    atoms ride in fractional coords (x2lamda/lamda2x)."""
    dto = 0.5 * p.dtv
    pflag = jnp.asarray(p.p_flag)
    lo, hi = sys.box.lo, sys.box.hi
    fixed = 0.5 * (lo + hi)
    expfac = jnp.where(pflag, jnp.exp(dto * st.omega_dot), 1.0)
    lam = (sys.x - lo) / (hi - lo)
    lo2 = (lo - fixed) * expfac + fixed
    hi2 = (hi - fixed) * expfac + fixed
    x2 = lo2 + lam * (hi2 - lo2)
    box2 = dataclasses.replace(sys.box, lo=lo2.astype(lo.dtype),
                               hi=hi2.astype(hi.dtype))
    omega = st.omega + dto * st.omega_dot
    return (sys.replace(x=x2.astype(sys.x.dtype), box=box2),
            dataclasses.replace(st, omega=omega))


def initial_integrate(sys: System, res, p: NPTParams, st: NPTState):
    v, mask = sys.v, sys.mask
    st = _nhc_press(st, p)
    ke3 = _ke_tensor(sys.replace(v=v), p, st)
    t_cur = _t_current(ke3, p)
    if p.tstat:
        v, t_cur, st = _nhc_temp(v, mask, t_cur, st, p)
        ke3 = _ke_tensor(sys.replace(v=v), p, st)
    p_cur = _p_current(sys, res, ke3, p)
    vol = jnp.prod(sys.box.lengths)
    st = _nh_omega_dot(t_cur, ke3, p_cur, vol, st, p)
    v = _nh_v_press(v, mask, st, p)
    # nve_v + nve_x with half-step remaps around the drift
    dtfm = p.dtf / p.mass_atom
    v = v + dtfm[:, None] * res.f
    v = jnp.where(mask[:, None], v, 0.0)
    sys = sys.replace(v=v)
    sys, st = _remap(sys, st, p)
    sys = sys.replace(x=sys.x + p.dtv * sys.v)
    sys, st = _remap(sys, st, p)
    return sys, st


def final_integrate(sys: System, res, p: NPTParams, st: NPTState):
    v, mask = sys.v, sys.mask
    dtfm = p.dtf / p.mass_atom
    v = v + dtfm[:, None] * res.f
    v = jnp.where(mask[:, None], v, 0.0)
    v = _nh_v_press(v, mask, st, p)
    ke3 = _ke_tensor(sys.replace(v=v), p, st)
    t_cur = _t_current(ke3, p)
    p_cur = _p_current(sys.replace(v=v), res, ke3, p)
    vol = jnp.prod(sys.box.lengths)
    st = _nh_omega_dot(t_cur, ke3, p_cur, vol, st, p)
    if p.tstat:
        v, t_cur, st = _nhc_temp(v, mask, t_cur, st, p)
    st = _nhc_press(st, p)
    return sys.replace(v=v), st
