"""Run driver: the MD timestep as a jitted lax.scan.

TPU analog of Verlet::setup + Verlet::run (verlet.cpp:88,223): per step
  1. integrator initial_integrate (half-kick/drift or rigid-body update)
  2. neighbor decide/rebuild (fixed interval, `neigh_modify every N check no`
     semantics; dense mode skips lists entirely)
  3. force evaluation (pair + kspace + polarization)
  4. integrator final_integrate
Thermo sampling happens on the host between scan chunks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax

from lidp_tpu import box as box_mod
from lidp_tpu.forcefield import ForceField, compute_forces
from lidp_tpu.ops.neighbor import NeighborConfig, build_neighbor_list
from lidp_tpu.state import System


@dataclasses.dataclass(frozen=True)
class Integrator:
    """Bundle of pure functions + their (pytree) params/state.

    initial/final receive the full ForceResult (res) — barostats (fix npt)
    need the virial, not just res.f."""

    initial: Callable  # (sys, res, params, istate) -> (sys, istate)
    final: Callable    # (sys, res, params, istate) -> (sys, istate)
    params: Any
    # setup-time hook (Modify::setup): may adjust sys (e.g. rigid set_v)
    init_state: Callable = lambda sys, f, params: (sys, ())
    # variant receiving the full ForceResult (rigid/npt needs the setup
    # virial for its initial nh_epsilon_dot); wins over init_state when set
    init_state_res: Optional[Callable] = None


def nve_integrator(nve_params, compensated: bool = False) -> Integrator:
    from lidp_tpu.integrate import nve

    if compensated:
        # Kahan-compensated x/v updates: restores ~f64-grade energy
        # conservation on the f32 fast path (see nve.py)
        return Integrator(
            initial=lambda s, r, p, st: nve.kahan_initial_integrate(
                s, r.f, p, st),
            final=lambda s, r, p, st: nve.kahan_final_integrate(
                s, r.f, p, st),
            params=nve_params,
            init_state=nve.kahan_init_state,
        )
    return Integrator(
        initial=lambda s, r, p, st: (nve.initial_integrate(s, r.f, p), st),
        final=lambda s, r, p, st: (nve.final_integrate(s, r.f, p), st),
        params=nve_params,
    )


def rigid_nve_integrator(rigid_params, mass_atom) -> Integrator:
    from lidp_tpu.integrate import rigid

    if rigid_params.pstat:
        # rigid/npt + rigid/nph: the barostat needs the force virial each
        # step AND a setup-time nh_epsilon_dot kick (FixRigidNH::setup tail)
        def _init(s, res, p):
            s, st = rigid.init_rigid_state(s, res.f, p, mass_atom)
            return s, rigid.init_pstat(s, res.virial, p, st)

        return Integrator(
            initial=lambda s, r, p, st: rigid.initial_integrate(
                s, r.f, p, st),
            final=lambda s, r, p, st: rigid.final_integrate(
                s, r.f, p, st, res_virial=r.virial),
            params=rigid_params,
            init_state_res=_init,
        )
    return Integrator(
        initial=lambda s, r, p, st: rigid.initial_integrate(s, r.f, p, st),
        final=lambda s, r, p, st: rigid.final_integrate(s, r.f, p, st),
        params=rigid_params,
        init_state=lambda s, f, p: rigid.init_rigid_state(s, f, p, mass_atom),
    )


@dataclasses.dataclass
class Runner:
    """Owns the jitted step/scan functions for one simulation setup."""

    ff: ForceField
    integ: Integrator
    neighbor_cfg: Optional[NeighborConfig] = None
    rebuild_every: int = 1
    post_force: Optional[Callable] = None   # (sys, f) -> f  (e.g. fix langevin)
    end_of_step: Optional[Callable] = None  # (sys) -> sys (e.g. temp/rescale)
    # Modify::post_integrate (after the position update, before forces) —
    # fix wall/reflect lives here
    post_integrate: Optional[Callable] = None
    # setup-time variant: the first Verlet step's position prediction is a
    # HALF kick, so constraint fixes need dtfsq/2 there (FixShake::
    # shake_end_of_step, fix_shake.cpp:2734-2741)
    post_force_setup: Optional[Callable] = None
    # True when the integrator consumes per-step energies/virials (fix
    # npt/nph needs the virial every step); False runs the quiet force path
    # inside the scan and re-tallies energies once at the chunk end
    # (LAMMPS' ev_setup eflag/vflag gating, pair.cpp:752)
    every_step_ev: bool = False
    # shrink-wrapped boundaries: ShrinkSpec applied at setup + every rebuild
    # (Domain::reset_box, domain.cpp:358)
    shrink: Optional[Any] = None
    # neigh_modify check yes (dist_check): rebuild only when some atom moved
    # more than skin/2 since the last build (Neighbor::check_distance,
    # neighbor.cpp:1951); rebuild_every/delay gate how often the check runs
    check: bool = False
    skin: float = 0.0
    delay: int = 0
    # fix deform: DeformParams replaced per run (traced arg); remap static
    deform: Optional[Any] = None
    deform_remap: bool = dataclasses.field(default=True)
    # fix tmd (fix_tmd.cpp): holonomic rho-schedule constraint applied
    # right after the integrator's position update; needs the PRE-update
    # positions, so it gets its own hook (x_prev, image_prev, sys, res)
    tmd_hook: Optional[Callable] = None

    def __post_init__(self):
        self._scan = jax.jit(
            functools.partial(_run_chunk,
                              initial=self.integ.initial, final=self.integ.final,
                              neighbor_cfg=self.neighbor_cfg,
                              rebuild_every=self.rebuild_every,
                              post_force=self.post_force,
                              end_of_step=self.end_of_step,
                              every_step_ev=self.every_step_ev,
                              shrink=self.shrink,
                              check=self.check, skin=self.skin,
                              delay=self.delay,
                              deform_remap=self.deform_remap,
                              post_integrate=self.post_integrate,
                              tmd_hook=self.tmd_hook),
            static_argnames=("nsteps",),
        )
        self._force = jax.jit(
            functools.partial(_setup_forces,
                              post_force=(self.post_force_setup
                                          or self.post_force),
                              shrink=self.shrink),
            static_argnames=("neighbor_cfg",))

    def setup(self, sys: System):
        """Initial force evaluation (Verlet::setup). Returns (sys, res, nlist, istate)."""
        sys, res, nlist = self._force(sys, self.ff, neighbor_cfg=self.neighbor_cfg)
        if self.integ.init_state_res is not None:
            sys, istate = self.integ.init_state_res(sys, res,
                                                    self.integ.params)
        else:
            sys, istate = self.integ.init_state(sys, res.f,
                                                self.integ.params)
        return sys, res, nlist, istate

    def run(self, sys, res, nlist, istate, nsteps: int):
        """Advance nsteps inside one jitted scan; returns updated carry + last result."""
        return self._scan(sys, res, nlist, istate, self.ff, self.integ.params,
                          self.deform, nsteps=nsteps)


def _build_struct(sys, neighbor_cfg):
    from lidp_tpu.ops.cells import CellConfig, build_cells

    if isinstance(neighbor_cfg, CellConfig):
        return build_cells(sys.x, sys.mask, sys.box, neighbor_cfg)
    return build_neighbor_list(sys.x, sys.mask, sys.box, neighbor_cfg)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeformParams:
    """fix deform schedule (FixDeform::end_of_step, fix_deform.cpp):
    linear interpolation of box faces/tilts over the run window, with
    optional affine (lamda-preserving) coordinate remap.  Dims/tilts not
    being deformed carry their start values (targets == starts)."""

    window: Any        # (2,) int32 run begin/end
    lo0: Any           # (3,) captured at run start
    hi0: Any
    tilt0: Any         # (3,) or None
    lo_t: Any          # (3,) targets at run end
    hi_t: Any
    tilt_t: Any
    # remap v (deform_vremap): box deformation rate in LAMMPS Voigt order
    # [lx ly lz yz xz xy]; atoms crossing a periodic face get the face
    # velocity added (Domain::pbc, domain.cpp:542-612).  None = remap x|none
    h_rate: Any = None


def apply_deform(sys, dp: DeformParams, remap: bool):
    import jax.numpy as jnp

    from lidp_tpu import box as _box

    step = sys.step
    denom = jnp.maximum(dp.window[1] - dp.window[0], 1).astype(sys.x.dtype)
    delta = jnp.clip((step - dp.window[0]).astype(sys.x.dtype) / denom,
                     0.0, 1.0)
    lo = dp.lo0 + delta * (dp.lo_t - dp.lo0)
    hi = dp.hi0 + delta * (dp.hi_t - dp.hi0)
    old = sys.box
    tilt = None
    if dp.tilt0 is not None:
        tilt = dp.tilt0 + delta * (dp.tilt_t - dp.tilt0)
    new = _box.Box(lo=lo, hi=hi, periodic=old.periodic,
                   tilt=tilt, triclinic=old.triclinic)
    if remap:
        # lamda-preserving affine remap (FixDeform remap x)
        if old.triclinic:
            lam = (sys.x - old.lo) @ old.h_inv.T
            x = new.lo + lam @ new.h.T
        else:
            x = new.lo + (sys.x - old.lo) * (new.lengths / old.lengths)
        sys = sys.replace(x=x)
    return sys.replace(box=new)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborCarry:
    """Neighbor structure + rebuild-decision state (Neighbor::decide,
    neighbor.cpp:1923): positions at the last build and its step number."""

    nlist: Any
    x_ref: Any
    last_build: Any      # () int32

    @property
    def overflow(self):
        return self.nlist.overflow


def _make_carry(sys, nlist):
    return NeighborCarry(nlist=nlist, x_ref=sys.x, last_build=sys.step)


def _apply_post_force(sys, res, post_force):
    """post_force may return f or (f, extra_virial6) — constraint fixes
    (shake) tally a virial (Fix::v_tally) that pressure must include."""
    out = post_force(sys, res.f)
    if isinstance(out, tuple):
        f2, vir = out
        return dataclasses.replace(res, f=f2, virial=res.virial + vir)
    return dataclasses.replace(res, f=out)


def _setup_forces(sys, ff, *, neighbor_cfg, post_force=None, shrink=None):
    if shrink is not None:
        sys = sys.replace(box=box_mod.reset_box(
            sys.x, sys.mask, sys.box, shrink))
    if neighbor_cfg is not None:
        sys_x, image = box_mod.wrap(sys.x, sys.box, sys.image)
        sys = sys.replace(x=sys_x, image=image)
        nlist = _make_carry(sys, _build_struct(sys, neighbor_cfg))
    else:
        nlist = None
    res = compute_forces(sys, ff, nlist.nlist if nlist is not None else None)
    if post_force is not None:
        res = _apply_post_force(sys, res, post_force)
    sys = sys.replace(mu=res.mu)
    return sys, res, nlist


def _run_chunk(sys, res, nlist, istate, ff, iparams, deform=None, *,
               nsteps,
               initial, final, neighbor_cfg, rebuild_every, post_force=None,
               end_of_step=None, every_step_ev=True, shrink=None,
               check=False, skin=0.0, delay=0, deform_remap=True,
               post_integrate=None, tmd_hook=None):
    import jax.numpy as jnp

    def body(carry, _):
        sys, res, nlist, istate = carry
        x_prev, image_prev = sys.x, sys.image
        ip = iparams
        if (getattr(ip, "p_target", None) is not None
                and getattr(ip, "t_stop", None) is not None):
            # FixNH compute_temp_target/compute_press_target per-step ramps.
            # Verlet::run pre-increments ntimestep before initial_integrate
            # (verlet.cpp:243), so the step being PRODUCED sets the ramp
            # fraction — sys.step here is still the previous step
            from lidp_tpu.integrate.nvt import ramp_target

            ip = dataclasses.replace(
                ip,
                t_target=ramp_target(ip.t_target, ip.t_stop,
                                     ip.ramp_begin, ip.ramp_end,
                                     sys.step + 1),
                p_target=ramp_target(ip.p_target, ip.p_stop,
                                     ip.ramp_begin, ip.ramp_end,
                                     sys.step + 1))
        sys, istate = initial(sys, res, ip, istate)
        if tmd_hook is not None:
            sys = tmd_hook(x_prev, image_prev, sys, res)
        if post_integrate is not None:
            sys = post_integrate(sys)
        sys = sys.replace(step=sys.step + 1)

        if neighbor_cfg is not None:
            def rebuild(sys, nc):
                if shrink is not None:
                    sys = sys.replace(box=box_mod.reset_box(
                        sys.x, sys.mask, sys.box, shrink))
                x, image = box_mod.wrap(sys.x, sys.box, sys.image)
                if deform is not None and deform.h_rate is not None:
                    # fix deform remap v: each +hi (-lo) face crossing
                    # subtracts (adds) the face velocity — Δv = -Δimage·H_rate
                    # with H_rate upper-triangular (Domain::pbc)
                    di = (image - sys.image).astype(x.dtype)
                    hr = deform.h_rate
                    dv = jnp.stack([
                        di[:, 0] * hr[0] + di[:, 1] * hr[5]
                        + di[:, 2] * hr[4],
                        di[:, 1] * hr[1] + di[:, 2] * hr[3],
                        di[:, 2] * hr[2]], axis=1)
                    sys = sys.replace(v=sys.v - dv)
                sys = sys.replace(x=x, image=image)
                new = _build_struct(sys, neighbor_cfg)
                # sticky overflow: a capacity overrun at ANY rebuild inside
                # the scan must survive to the chunk boundary where the host
                # can see it (the per-rebuild flag would be overwritten)
                new = dataclasses.replace(
                    new, overflow=new.overflow | nc.nlist.overflow)
                return sys, _make_carry(sys, new)

            def keep(sys, nc):
                return sys, nc

            # Neighbor::decide (neighbor.cpp:1933): ago >= delay and
            # ago % every == 0; with dist_check, only when some atom moved
            # more than skin/2 since the last build
            ago = sys.step - nlist.last_build
            need = (ago >= jnp.maximum(delay, 1)) \
                & ((ago % rebuild_every) == 0)
            if check:
                disp2 = jnp.sum((sys.x - nlist.x_ref) ** 2, axis=1)
                disp2 = jnp.where(sys.mask, disp2, 0.0)
                need &= jnp.max(disp2) > (0.5 * skin) ** 2
            sys, nlist = jax.lax.cond(need, rebuild, keep, sys, nlist)

        res = compute_forces(sys, ff,
                             nlist.nlist if nlist is not None else None,
                             need_ev=every_step_ev)
        if post_force is not None:
            res = _apply_post_force(sys, res, post_force)
        sys = sys.replace(mu=res.mu)
        sys, istate = final(sys, res, ip, istate)
        if deform is not None:
            sys = apply_deform(sys, deform, deform_remap)
        if end_of_step is not None:
            sys = end_of_step(sys, res)
        return (sys, res, nlist, istate), None

    (sys, res, nlist, istate), _ = jax.lax.scan(
        body, (sys, res, nlist, istate), None, length=nsteps)
    if not every_step_ev:
        # one energy-bearing re-tally at the chunk boundary (forces at the
        # final positions are unchanged; thermo samples between chunks)
        res = compute_forces(sys, ff,
                             nlist.nlist if nlist is not None else None,
                             need_ev=True)
        if post_force is not None:
            res = _apply_post_force(sys, res, post_force)
    return sys, res, nlist, istate


@dataclasses.dataclass
class RespaRunner:
    """rRESPA multi-timescale velocity Verlet (Respa::recurse, respa.cpp).

    Levels are innermost-first: `loops[l]` iterations of level l per
    iteration of level l+1 (the outermost level runs once per timestep);
    `terms[l]` names the force categories evaluated at level l (the
    compute_forces `terms` filter).  dt_level[l] = dt_level[l+1]/loops[l];
    each level half-kicks with its own cached force around the inner
    recursion, the innermost level drifts positions."""

    ff: ForceField
    dt: float
    ftm2v: float
    mass_atom: Any
    loops: tuple                    # len L-1
    terms: tuple                    # len L, innermost first
    neighbor_cfg: Optional[NeighborConfig] = None
    rebuild_every: int = 1
    shrink: Optional[Any] = None
    every_step_ev: bool = False     # parity with Runner's interface

    def __post_init__(self):
        import jax.numpy as jnp

        L = len(self.terms)
        assert len(self.loops) == L - 1
        dts = [0.0] * L
        dts[L - 1] = self.dt
        for l in range(L - 2, -1, -1):
            dts[l] = dts[l + 1] / self.loops[l]
        self._dts = tuple(dts)
        m = jnp.asarray(self.mass_atom)
        self._minv = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
        self._scan = jax.jit(functools.partial(self._chunk),
                             static_argnames=("nsteps",))
        self._setup = jax.jit(self._setup_impl)

    # ---- level force evaluation -----------------------------------------
    def _flevel(self, sys, nlist, l, need_ev=False):
        res = compute_forces(sys, self.ff, nlist, need_ev=need_ev,
                             terms=self.terms[l])
        return res.f

    def _recurse(self, l, sys, flist, nlist):
        import jax.numpy as jnp

        dtf = 0.5 * self._dts[l] * self.ftm2v
        niter = self.loops[l] if l < len(self.terms) - 1 else 1
        for _ in range(niter):
            v = sys.v + dtf * self._minv[:, None] * flist[l]
            v = jnp.where(sys.mask[:, None], v, 0.0)
            sys = sys.replace(v=v)
            if l == 0:
                sys = sys.replace(x=sys.x + self._dts[0] * sys.v)
            else:
                sys, flist = self._recurse(l - 1, sys, flist, nlist)
            fl = self._flevel(sys, nlist, l)
            flist = flist[:l] + (fl,) + flist[l + 1:]
            v = sys.v + dtf * self._minv[:, None] * flist[l]
            v = jnp.where(sys.mask[:, None], v, 0.0)
            sys = sys.replace(v=v)
        return sys, flist

    # ---- driver interface (same shape as Runner) ------------------------
    def _setup_impl(self, sys):
        if self.shrink is not None:
            sys = sys.replace(box=box_mod.reset_box(
                sys.x, sys.mask, sys.box, self.shrink))
        nlist = None
        if self.neighbor_cfg is not None:
            x, image = box_mod.wrap(sys.x, sys.box, sys.image)
            sys = sys.replace(x=x, image=image)
            nlist = _build_struct(sys, self.neighbor_cfg)
        flist = tuple(self._flevel(sys, nlist, l)
                      for l in range(len(self.terms)))
        res = compute_forces(sys, self.ff, nlist, need_ev=True)
        return sys, res, nlist, flist

    def setup(self, sys):
        return self._setup(sys)

    def _chunk(self, sys, res, nlist, flist, *, nsteps):
        def body(carry, _):
            sys, nlist, flist = carry
            sys = sys.replace(step=sys.step + 1)
            if self.neighbor_cfg is not None:
                def rebuild(sys, nlist):
                    if self.shrink is not None:
                        sys = sys.replace(box=box_mod.reset_box(
                            sys.x, sys.mask, sys.box, self.shrink))
                    x, image = box_mod.wrap(sys.x, sys.box, sys.image)
                    sys = sys.replace(x=x, image=image)
                    new = _build_struct(sys, self.neighbor_cfg)
                    new = dataclasses.replace(
                        new, overflow=new.overflow | nlist.overflow)
                    return sys, new

                need = (sys.step % self.rebuild_every) == 0
                sys, nlist = jax.lax.cond(
                    need, rebuild, lambda s, n: (s, n), sys, nlist)
            sys, flist = self._recurse(len(self.terms) - 1, sys, flist,
                                       nlist)
            return (sys, nlist, flist), None

        (sys, nlist, flist), _ = jax.lax.scan(
            body, (sys, nlist, flist), None, length=nsteps)
        res = compute_forces(sys, self.ff, nlist, need_ev=True)
        return sys, res, nlist, flist

    def run(self, sys, res, nlist, flist, nsteps: int):
        return self._scan(sys, res, nlist, flist, nsteps=nsteps)
