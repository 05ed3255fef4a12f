"""Granular runner: velocity-Verlet for sphere atoms (translation +
rotation) with persistent contact-shear state threaded through the scan.

The generic Runner's force path is stateless (compute_forces(sys, ff));
granular contacts carry per-pair shear history and produce torques, so
this dedicated runner owns the scan: initial half-kick (v and omega,
fix_nve_sphere.cpp:110-140), Neighbor::decide-gated rebuild with shear
migration (ops/granular.py migrate_shear), contact forces + gravity, and
the final half-kick.  Duck-types Runner for Simulation.run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu import box as box_mod
from lidp_tpu.forcefield import ForceResult
from lidp_tpu.ops import granular as gran
from lidp_tpu.ops.cells import CellConfig, build_cells


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GranState:
    omega: Any        # (N,3)
    shear: Any        # (noff, bx,by,bz, cap, cap, 3)
    torque: Any       # (N,3) carried from the last force eval
    x_ref: Any        # (N,3) positions at last rebuild (dist check)
    last_build: Any   # () int32
    virial: Any       # (6,)
    eta_dot: Any      # (tchain,) NH chain (fix nvt/sphere); zeros if NVE
    shear_w: Any = None   # (T,N,3) fix wall/gran[/region] contact history


@dataclasses.dataclass(frozen=True)
class WallGranFix:
    """One fix wall/gran / wall/gran/region (fix_wall_gran.cpp grammar:
    pairstyle kn kt gamman gammat xmu dampflag wallstyle args
    [wiggle dim amp period | shear dim vshear]).  Host-static descriptor;
    contacts() yields (d (N,3), rwall (N,)|None, active (N,)) sources —
    one per wall face — evaluated inside the jitted step."""

    kind: str                 # hooke | hooke/history | hertz/history
    kn: float
    kt: float
    gamman: float
    gammat: float
    xmu: float
    gmask: Any                # (N,) bool
    wallstyle: str            # xplane|yplane|zplane|zcylinder|region
    lo: float = -1.0e30       # NULL -> +-inf (the reference's BIG)
    hi: float = 1.0e30
    cylradius: float = 0.0
    wiggle: bool = False
    wshear: bool = False
    axis: int = 0
    amplitude: float = 0.0
    omega_w: float = 0.0      # 2*pi/period
    vshear: float = 0.0
    time_origin: int = 0
    region_contacts: Any = None   # callable x -> [(rdist, dl, ok, rwall)]

    def n_contacts(self):
        if self.wallstyle == "region":
            import numpy as _np

            return len(self.region_contacts(_np.zeros((1, 3))))
        return 1

    def contact_sources(self, x, radius, step, dt):
        """Returns (vwall (3,) or (N,3), [(d, rwall, active), ...])."""
        wlo, whi = self.lo, self.hi
        vwall = jnp.zeros(3, x.dtype)
        if self.wiggle:
            arg = self.omega_w * (step - self.time_origin) * dt
            daxis = "xyz".find(self.wallstyle[0])
            if self.wallstyle != "zcylinder" and self.axis == daxis:
                off = self.amplitude - self.amplitude * jnp.cos(arg)
                wlo = self.lo + off
                whi = self.hi + off
            vwall = vwall.at[self.axis].set(
                self.amplitude * self.omega_w * jnp.sin(arg))
        elif self.wshear:
            vwall = vwall.at[self.axis].set(self.vshear)

        if self.wallstyle in ("xplane", "yplane", "zplane"):
            dim = "xyz".index(self.wallstyle[0])
            del1 = x[:, dim] - wlo
            del2 = whi - x[:, dim]
            dx = jnp.where(del1 < del2, del1, -del2)
            d = jnp.zeros_like(x).at[:, dim].set(dx)
            return vwall, [(d, None, jnp.ones(x.shape[0], bool))]
        if self.wallstyle == "zcylinder":
            delxy = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
            delxy_s = jnp.where(delxy > 0.0, delxy, 1.0)
            delr = self.cylradius - delxy
            inside = delr <= radius    # candidate contact (:392-404)
            scale = jnp.where(inside, -delr / delxy_s, 0.0)
            d = jnp.stack([scale * x[:, 0], scale * x[:, 1],
                           jnp.where(inside, 0.0, self.cylradius)],
                          axis=-1)
            rwall = jnp.where(delxy < self.cylradius,
                              -2.0 * self.cylradius,
                              2.0 * self.cylradius)
            if self.wshear and self.axis != 2:
                vwall = (jnp.zeros_like(x)
                         .at[:, 0].set(self.vshear * x[:, 1] / delxy_s)
                         .at[:, 1].set(-self.vshear * x[:, 0] / delxy_s))
            return vwall, [(d, rwall, jnp.ones(x.shape[0], bool))]
        # region: generators give (rdist from face, del wall->atom, ok,
        # rwall); the fix only sees contacts within the atom radius
        out = []
        for rdist, dl, ok, rw in self.region_contacts(x):
            out.append((dl, rw, ok & (rdist > 0.0)))
        return vwall, out


@dataclasses.dataclass
class GranRunner:
    gp: gran.GranParams
    neighbor_cfg: CellConfig
    dt: float
    ftm2v: float
    gmask: Any               # (N,) integrated (active) atoms
    grav: Any                # (3,) acceleration vector (fix gravity)
    skin: float = 0.1
    shrink: Optional[Any] = None
    rebuild_every: int = 1
    delay: int = 0
    check: bool = True
    # fix nvt/sphere (fix_nvt_sphere.cpp = FixNHSphere): NVTParams with
    # dof from compute temp/sphere (6/finite-radius atom in 3d); the NH
    # scale applies to BOTH v and omega (FixNHSphere::nh_v_temp)
    nvt: Optional[Any] = None
    # fix wall/gran + wall/gran/region descriptors (WallGranFix)
    walls: tuple = ()

    def __post_init__(self):
        self._scan = jax.jit(self._chunk, static_argnames=("nsteps",))
        self._setup = jax.jit(self._setup_impl)

    # ---- mechanics ----
    def _accel(self, f, gp):
        return (0.5 * self.dt * self.ftm2v
                / jnp.maximum(gp.rmass, 1e-300))[:, None] * f

    def _omega_kick(self, omega, torque, gp):
        # d omega/dt = torque / (0.4 m r^2)  (fix_nve_sphere.cpp:135)
        r = gp.radius
        inert = 0.4 * gp.rmass * r * r
        dti = jnp.where(inert > 0,
                        0.5 * self.dt * self.ftm2v
                        / jnp.where(inert > 0, inert, 1.0), 0.0)
        return omega + dti[:, None] * torque

    def _force(self, sys, nlist, st, gp, shear_update, need_ev):
        f, tq, shear, vir = gran.gran_cell_forces(
            sys.x, sys.v, st.omega, sys.mask, nlist, sys.box, gp,
            st.shear, shear_update=shear_update, need_ev=need_ev)
        # fix gravity (post_force): f += m * acc on all atoms
        f = f + gp.rmass[:, None] * jnp.asarray(self.grav, f.dtype)
        # fix wall/gran[/region] (post_force): per-atom wall contacts with
        # persistent per-contact shear history in st.shear_w
        shear_w = st.shear_w
        if self.walls:
            slot = 0
            sw_new = []
            for wf in self.walls:
                vwall, sources = wf.contact_sources(
                    sys.x, gp.radius, sys.step, self.dt)
                for d, rwall, ok in sources:
                    act = ok & sys.mask & wf.gmask
                    fw, tw, s_out = gran.wall_contact_force(
                        d, sys.v, st.omega, gp.radius, gp.rmass,
                        shear_w[slot], vwall, act,
                        wf.kn, wf.kt, wf.gamman, wf.gammat, wf.xmu,
                        self.dt, wf.kind, rwall=rwall,
                        shear_update=shear_update)
                    f = f + fw
                    tq = tq + tw
                    sw_new.append(s_out)
                    slot += 1
            shear_w = jnp.stack(sw_new)
        # fix freeze: zero force/torque on the frozen group
        fr = gp.frozen[:, None]
        f = jnp.where(fr, 0.0, f)
        tq = jnp.where(fr, 0.0, tq)
        return f, tq, shear, shear_w, vir

    # ---- public ----
    def _setup_impl(self, sys, omega0, gp):
        if self.shrink is not None:
            # Domain::reset_box at setup (Verlet::setup -> domain->reset_box)
            sys = sys.replace(box=box_mod.reset_box(
                sys.x, sys.mask, sys.box, self.shrink))
        nlist = build_cells(sys.x, sys.mask, sys.box, self.neighbor_cfg)
        shear0 = jnp.zeros(gran.shear_shape(nlist), sys.x.dtype)
        nchain = self.nvt.t_chain if self.nvt is not None else 1
        nwall = sum(wf.n_contacts() for wf in self.walls)
        st = GranState(omega=omega0, shear=shear0,
                       torque=jnp.zeros_like(sys.v), x_ref=sys.x,
                       last_build=sys.step.astype(jnp.int32)
                       if hasattr(sys.step, "astype")
                       else jnp.asarray(sys.step, jnp.int32),
                       virial=jnp.zeros(6, sys.x.dtype),
                       eta_dot=jnp.zeros(nchain, sys.x.dtype),
                       shear_w=jnp.zeros((nwall,) + sys.x.shape,
                                         sys.x.dtype))
        # setup force eval: shearupdate = 0 (update->setupflag)
        f, tq, shear, shear_w, vir = self._force(
            sys, nlist, st, gp, shear_update=False, need_ev=True)
        st = dataclasses.replace(st, torque=tq, shear=shear,
                                 shear_w=shear_w, virial=vir)
        res = self._mk_res(sys, f, vir)
        return sys, res, nlist, st

    def setup(self, sys):
        omega0 = getattr(self, "_omega0", None)
        if omega0 is None:
            omega0 = jnp.zeros_like(sys.v)
        return self._setup(sys, omega0, self.gp)

    def _mk_res(self, sys, f, vir):
        zero = jnp.zeros((), sys.x.dtype)
        return ForceResult(
            f=f, evdwl=zero, ecoul=zero, elong=zero, epol=zero,
            ebond=zero, virial=vir, mu=sys.mu,
            scf_iters=jnp.zeros((), jnp.int32),
            scf_diverged=jnp.zeros((), bool))

    def _sphere_ke2(self, sys, omega, gm, p, gp):
        """2*KE (trans + rot) of the thermostat group in energy units —
        compute_temp_sphere.cpp: sum m v^2 + INERTIA m r^2 w^2."""
        r = gp.radius
        ke2 = jnp.sum(jnp.where(
            gm, gp.rmass[:, None] * sys.v * sys.v, 0.0))
        ke2 += jnp.sum(jnp.where(
            gm, (0.4 * gp.rmass * r * r)[:, None] * omega * omega,
            0.0))
        return ke2 * p.mvv2e

    def _chunk(self, sys, res, nlist, st, nvt, gp, nsteps):
        gm = (self.gmask & sys.mask)[:, None]

        def body(carry, _):
            from lidp_tpu.integrate.nvt import _nhc

            sys, f, nlist, st = carry
            omega = st.omega
            if nvt is not None:
                # FixNH::initial_integrate: chain update + scale BOTH v
                # and omega (FixNHSphere::nh_v_temp), then the half kicks
                ke2 = self._sphere_ke2(sys, omega, gm, nvt, gp)
                eta_dot, scale = _nhc(st.eta_dot, ke2, nvt, sys.step)
                sys = sys.replace(v=jnp.where(gm, sys.v * scale, sys.v))
                omega = jnp.where(gm, omega * scale, omega)
                st = dataclasses.replace(st, eta_dot=eta_dot)
            v = jnp.where(gm, sys.v + self._accel(f, gp), sys.v)
            omega = jnp.where(gm, self._omega_kick(omega, st.torque, gp),
                              omega)
            x = jnp.where(gm, sys.x + self.dt * v, sys.x)
            sys = sys.replace(x=x, v=v, step=sys.step + 1)
            st = dataclasses.replace(st, omega=omega)

            def rebuild(sys, nlist, st):
                if self.shrink is not None:
                    sys = sys.replace(box=box_mod.reset_box(
                        sys.x, sys.mask, sys.box, self.shrink))
                x, image = box_mod.wrap(sys.x, sys.box, sys.image)
                sys = sys.replace(x=x, image=image)
                new = build_cells(sys.x, sys.mask, sys.box,
                                  self.neighbor_cfg)
                shear = gran.migrate_shear(st.shear, nlist, new)
                new = dataclasses.replace(
                    new, overflow=new.overflow | nlist.overflow)
                st = dataclasses.replace(
                    st, shear=shear, x_ref=sys.x,
                    last_build=sys.step.astype(jnp.int32))
                return sys, new, st

            def keep(sys, nlist, st):
                return sys, nlist, st

            ago = sys.step - st.last_build
            need = (ago >= jnp.maximum(self.delay, 1)) \
                & ((ago % self.rebuild_every) == 0)
            if self.check:
                disp2 = jnp.sum((sys.x - st.x_ref) ** 2, axis=1)
                disp2 = jnp.where(sys.mask, disp2, 0.0)
                need &= jnp.max(disp2) > (0.5 * self.skin) ** 2
            sys, nlist, st = jax.lax.cond(need, rebuild, keep,
                                          sys, nlist, st)

            f, tq, shear, shear_w, vir = self._force(sys, nlist, st, gp,
                                                     shear_update=True,
                                                     need_ev=False)
            st = dataclasses.replace(st, shear=shear, shear_w=shear_w,
                                     virial=vir)
            v = jnp.where(gm, sys.v + self._accel(f, gp), sys.v)
            omega = jnp.where(gm, self._omega_kick(st.omega, tq, gp),
                              st.omega)
            sys = sys.replace(v=v)
            if nvt is not None:
                # FixNH::final_integrate: kicks, then chain update + scale
                ke2 = self._sphere_ke2(sys, omega, gm, nvt, gp)
                eta_dot, scale = _nhc(st.eta_dot, ke2, nvt, sys.step)
                sys = sys.replace(v=jnp.where(gm, sys.v * scale, sys.v))
                omega = jnp.where(gm, omega * scale, omega)
                st = dataclasses.replace(st, eta_dot=eta_dot)
            st = dataclasses.replace(st, omega=omega, torque=tq)
            return (sys, f, nlist, st), None

        (sys, f, nlist, st), _ = jax.lax.scan(
            body, (sys, res.f, nlist, st), None, length=nsteps)
        res = self._mk_res(sys, f, st.virial)
        return sys, res, nlist, st

    def run(self, sys, res, nlist, st, nsteps: int):
        # nvt + gp ride as traced arguments so ramp-window updates and
        # fix pour insertions (new radii/masses) take effect without
        # retracing
        return self._scan(sys, res, nlist, st, self.nvt, self.gp,
                          nsteps=nsteps)
