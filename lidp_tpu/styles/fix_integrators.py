"""Time-integration fix styles (the reference's per-style
initial/final_integrate implementations dispatched through Modify).
Moved verbatim from Simulation.from_script in the round-3 registry
refactor; each builder sets ctx.integ.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from lidp_tpu.integrate import nve as nve_mod
from lidp_tpu.integrate import rigid as rigid_mod
from lidp_tpu.integrate.driver import (nve_integrator,
                                       rigid_nve_integrator)
from lidp_tpu.styles import fix_style


@fix_style("nve", "nve/limit", "nve/noforce", integrator=True)
def build_nve(ctx, spec):
    # sub-group nve: only the fix group integrates (atoms outside any
    # time-integration fix do not move).  nve/limit clamps per-atom |v|
    # to xlimit/dt after each half-kick (fix_nve_limit.cpp); nve/noforce
    # drifts positions without ever kicking (fix_nve_noforce.cpp).
    gmask = ctx.groups[spec.group]
    gmask_real = ctx.script.groups[spec.group]
    nvep = nve_mod.NVEParams.create(
        ctx.script.dt, ctx.u.ftm2v, ctx.mass_atom, dtype=ctx.dtype,
        gmask=None if gmask_real.all() else gmask,
        xlimit=(float(spec.args[0]) if spec.style == "nve/limit"
                else None),
        noforce=spec.style == "nve/noforce")
    ctx.integ = nve_integrator(nvep)
    # NOTE: atoms outside every integrator fix keep their dof in the
    # thermo temperature — verified against the rebuilt reference
    # (compute temp's dof is group count based, never integrator based;
    # the nve/noforce golden in tests/test_fix_breadth.py pins this)


def _sphere_rot(ctx):
    """(dof, rot_ke3 (3,)) for the */sphere NH fixes on the generic path
    (fix_nh_sphere.cpp + compute_temp_sphere.cpp ALL mode): 2*dim dof per
    finite-radius atom, dim per point atom, minus dim extra; rotational
    KE-tensor diagonal sum 0.4 m r^2 w_d^2 from the setup omegas.
    Central-force pair styles exert no torque, so omega only changes via
    the thermostat scale (tracked as a scalar in the integrator state);
    torque-producing (granular) systems use the GranRunner path instead."""
    script, dim_, n = ctx.script, ctx.dim, ctx.n
    r = np.asarray(script.radius, float)
    m = np.asarray(script.rmass, float)
    w = np.asarray(getattr(script, "omega", np.zeros((n, 3))), float)
    nfin = int((r > 0).sum())
    dof = (2 * dim_ * nfin + dim_ * (n - nfin)) - dim_
    inert = 0.4 * m * r * r
    rot_ke3 = (inert[:, None] * w * w).sum(0) * ctx.u.mvv2e
    return dof, rot_ke3


@fix_style("nvt", "nvt/sllod", "nvt/sphere", integrator=True)
def build_nvt(ctx, spec):
    from lidp_tpu.integrate import nvt as nvt_mod
    from lidp_tpu.integrate.driver import Integrator

    script, u, dtype = ctx.script, ctx.u, ctx.dtype
    gmask_real = script.groups[spec.group]
    a = spec.args
    sllod = spec.style == "nvt/sllod"
    # FixNVTSllod ctor: mtchain defaults to 1 (fix_nvt_sllod.cpp:47)
    kw = dict(t_chain=1 if sllod else 3)
    i = 0
    while i < len(a):
        if a[i] == "temp":
            t_start_, t_stop_, t_damp = (float(a[i + 1]), float(a[i + 2]),
                                         float(a[i + 3]))
            i += 4
        elif a[i] == "tchain":
            kw["t_chain"] = int(a[i + 1]); i += 2
        else:
            i += 1
    if not gmask_real.all():
        raise NotImplementedError("fix nvt on sub-group")
    dof = ctx.dim * ctx.n - ctx.dim
    rot_ke20 = None
    if spec.style == "nvt/sphere":
        dof, rot_ke3 = _sphere_rot(ctx)
        rot_ke20 = jnp.asarray(rot_ke3.sum(), dtype)
    nvtp = nvt_mod.NVTParams.create(
        script.dt, u.ftm2v, ctx.mass_atom, t_start_, t_damp,
        dof=dof, boltz=u.boltz, mvv2e=u.mvv2e,
        t_stop=t_stop_, dtype=dtype, **kw)
    if rot_ke20 is not None:
        nvtp = dataclasses.replace(nvtp, rot_ke20=rot_ke20)
    if sllod:
        # h_rate is replaced at run() time from the fix deform schedule
        # (fix_nvt_sllod.cpp requires a fix deform with remap v)
        nvtp = dataclasses.replace(
            nvtp, sllod=True, h_rate=jnp.zeros(6, dtype),
            h_ratelo=jnp.zeros(3, dtype))
    ctx.integ = Integrator(
        initial=lambda s_, r_, p_, st_: nvt_mod.initial_integrate(
            s_, r_.f, p_, st_),
        final=lambda s_, r_, p_, st_: nvt_mod.final_integrate(
            s_, r_.f, p_, st_),
        params=nvtp,
        init_state=lambda s_, f_, p_: nvt_mod.init_state(s_, f_, p_))


@fix_style("npt", "nph", "npt/sphere", "nph/sphere", integrator=True)
def build_npt(ctx, spec):
    from lidp_tpu.integrate import npt as npt_mod
    from lidp_tpu.integrate.driver import Integrator

    script, u, dtype = ctx.script, ctx.u, ctx.dtype
    dim_, n = ctx.dim, ctx.n
    gmask_real = script.groups[spec.group]
    # pppm under a barostat: grid size stays fixed (as the reference's
    # setup() does) and every box-dependent coefficient (Green's function,
    # ik factors, virial terms) is recomputed in-jit from the live box
    # each call (ops/pppm.py pppm_forces), matching fix_nh.cpp:877's
    # kspace->setup() on box change
    if not gmask_real.all():
        raise NotImplementedError("fix npt on sub-group")
    a = spec.args
    tgt = dict(t=None, tdamp=None, mtk=True, tchain=3, pchain=3,
               iso=False, p=[None] * 3, pdamp=[1000.0] * 3,
               t_stop=None, p_stop=[None] * 3)
    i = 0
    while i < len(a):
        k = a[i]
        if k == "temp":
            tgt["t"], tgt["tdamp"] = float(a[i + 1]), float(a[i + 3])
            tgt["t_stop"] = float(a[i + 2])
            i += 4
        elif k in ("iso", "aniso"):
            tgt["iso"] = k == "iso"
            tgt["p"] = [float(a[i + 1])] * 3
            tgt["p_stop"] = [float(a[i + 2])] * 3
            tgt["pdamp"] = [float(a[i + 3])] * 3
            i += 4
        elif k in ("x", "y", "z"):
            d = "xyz".index(k)
            tgt["p"][d] = float(a[i + 1])
            tgt["p_stop"][d] = float(a[i + 2])
            tgt["pdamp"][d] = float(a[i + 3])
            i += 4
        elif k == "mtk":
            tgt["mtk"] = a[i + 1] == "yes"; i += 2
        elif k == "tchain":
            tgt["tchain"] = int(a[i + 1]); i += 2
        elif k == "pchain":
            tgt["pchain"] = int(a[i + 1]); i += 2
        else:
            i += 2
    p_flag = tuple(v is not None for v in tgt["p"])
    if not any(p_flag):
        raise ValueError("fix npt needs a pressure keyword")
    dof = dim_ * n - dim_
    rot_ke30 = None
    if spec.style.endswith("/sphere"):
        dof, rot_ke3 = _sphere_rot(ctx)
        rot_ke30 = jnp.asarray(rot_ke3, dtype)
    had_temp = tgt["t"] is not None
    if tgt["t"] is None:
        # nph: barostat masses use t_target = t0, the current temperature,
        # floored at 1.0 (lj) / 300 (fix_nh.cpp setup t0 fallback)
        ke = float(np.sum(ctx.mass_atom * np.sum(
            np.asarray(script.v)**2, axis=1))) * u.mvv2e
        t0 = ke / ((dim_ * n - dim_) * u.boltz)
        tgt["t"] = t0 if t0 > 0 else (1.0 if u.name == "lj" else 300.0)
    nptp = npt_mod.NPTParams.create(
        script.dt, u.ftm2v, ctx.mass_atom,
        tgt["t"],
        tgt["tdamp"] if tgt["tdamp"] is not None else 1.0,
        [v if v is not None else 0.0 for v in tgt["p"]],
        tgt["pdamp"], natoms=n, dof=dof, boltz=u.boltz,
        mvv2e=u.mvv2e, nktv2p=u.nktv2p, tchain=tgt["tchain"],
        pchain=tgt["pchain"], mtk=tgt["mtk"],
        tstat=spec.style.startswith("npt") and had_temp,
        p_flag=p_flag, iso=tgt["iso"],
        t_stop=tgt["t_stop"],
        p_stop=[v if v is not None else 0.0 for v in tgt["p_stop"]]
        if any(v is not None for v in tgt["p_stop"]) else None,
        dtype=dtype)
    if rot_ke30 is not None:
        nptp = dataclasses.replace(nptp, rot_ke30=rot_ke30)
    ctx.integ = Integrator(
        initial=npt_mod.initial_integrate,
        final=npt_mod.final_integrate,
        params=nptp, init_state=npt_mod.init_state)


@fix_style("rigid", "rigid/nve", "rigid/nvt", "rigid/small",
           "rigid/nve/small", "rigid/nvt/small",
           "rigid/npt", "rigid/nph", "rigid/npt/small", "rigid/nph/small",
           integrator=True)
def build_rigid(ctx, spec):
    # the /small variants (fix_rigid_small.cpp) exist in the reference
    # for many-small-bodies scaling; our segment_sum-batched formulation
    # is already per-body parallel, so they alias their parents
    if spec.style.endswith("/small"):
        spec = dataclasses.replace(spec, style=spec.style[:-6])
    script, u, dtype = ctx.script, ctx.u, ctx.dtype
    gmask = ctx.groups[spec.group]
    x_unwrap = (ctx.padA(script.x)
                + ctx.padA(script.image, 0)
                * (script.box_hi - script.box_lo))
    rsetup = rigid_mod.setup_bodies(x_unwrap, ctx.mass_atom,
                                    ctx.padA(script.mol, 0), gmask)
    kw = {}
    if spec.style in ("rigid/nvt", "rigid/npt", "rigid/nph"):
        # keyword grammar of FixRigid (fix_rigid.cpp:418-530): temp /
        # iso / aniso / x|y|z / couple / tparam / pchain
        a = spec.args
        assert a[0] == "molecule"
        kw = dict(boltz=u.boltz, mvv2e=u.mvv2e)
        p_start = [0.0, 0.0, 0.0]
        p_stop = [0.0, 0.0, 0.0]
        p_period = [1.0, 1.0, 1.0]
        p_flag = [False, False, False]
        pcouple_xyz = False
        i = 1
        while i < len(a):
            if a[i] == "temp":
                kw["tstat"] = True
                kw["t_start"] = float(a[i + 1])
                kw["t_stop"] = float(a[i + 2])
                kw["t_period"] = float(a[i + 3])
                i += 4
            elif a[i] == "tparam":
                kw["t_chain"] = int(a[i + 1])
                kw["t_iter"] = int(a[i + 2])
                kw["t_order"] = int(a[i + 3])
                i += 4
            elif a[i] in ("iso", "aniso"):
                p_start = [float(a[i + 1])] * 3
                p_stop = [float(a[i + 2])] * 3
                p_period = [float(a[i + 3])] * 3
                p_flag = [True, True, True]
                pcouple_xyz = a[i] == "iso"
                i += 4
            elif a[i] in ("x", "y", "z"):
                d = "xyz".index(a[i])
                p_start[d] = float(a[i + 1])
                p_stop[d] = float(a[i + 2])
                p_period[d] = float(a[i + 3])
                p_flag[d] = True
                i += 4
            elif a[i] == "couple":
                pcouple_xyz = a[i + 1] == "xyz"
                i += 2
            elif a[i] == "pchain":
                kw["p_chain"] = int(a[i + 1])
                i += 2
            else:
                i += 1
        if spec.style in ("rigid/nvt", "rigid/npt") and not kw.get("tstat"):
            raise ValueError(f"fix {spec.style} requires the temp keyword "
                             "(fix_rigid_nvt.cpp:38/fix_rigid_npt.cpp:38)")
        if spec.style in ("rigid/npt", "rigid/nph"):
            if not any(p_flag):
                raise ValueError(f"fix {spec.style} needs a pressure "
                                 "keyword (fix_rigid_npt.cpp:47)")
            if spec.style == "rigid/nph" or "t_start" not in kw:
                # FixRigidNH::setup t0 fallback (:348-356): barostat masses
                # use the group temperature AFTER the setup set_v projection
                # onto rigid motion, i.e. body KE = sum M vcm^2 + L.omega
                import numpy as np
                v0 = np.asarray(script.v)
                x0 = np.asarray(script.x)
                m0 = np.asarray(ctx.mass_atom[:v0.shape[0]])
                akin = 0.0
                from lidp_tpu.integrate.rigid import q_to_matrix
                for b in range(rsetup.nbody):
                    idx = np.nonzero(
                        rsetup.body_of_atom[:v0.shape[0]] == b)[0]
                    M = rsetup.masstotal[b]
                    vcm0 = (m0[idx, None] * v0[idx]).sum(0) / M
                    akin += M * np.dot(vcm0, vcm0)
                    xc = (m0[idx, None] * x0[idx]).sum(0) / M
                    L0 = (m0[idx, None]
                          * np.cross(x0[idx] - xc, v0[idx])).sum(0)
                    R0 = np.asarray(q_to_matrix(
                        jnp.asarray(rsetup.quat0[b])))
                    mb = R0.T @ L0
                    I0 = rsetup.inertia[b]
                    akin += np.dot(mb, np.where(I0 > 0.0,
                                                mb / np.where(I0 > 0.0,
                                                              I0, 1.0),
                                                0.0))
                g0 = np.asarray(gmask)[:v0.shape[0]]
                dof0 = max(3.0 * int(g0.sum()) - 3.0 - rsetup.dof_removed,
                           1.0)
                t0 = float(akin) * u.mvv2e / (dof0 * u.boltz)
                if t0 <= 0.0:
                    t0 = 1.0 if u.name == "lj" else 300.0
                kw.setdefault("t_start", t0)
                kw.setdefault("t_stop", t0)
                kw.setdefault("t_period", 1.0)
            kw.update(pstat=True, p_start=tuple(p_start),
                      p_stop=tuple(p_stop), p_period=tuple(p_period),
                      p_flag=tuple(p_flag),
                      iso=pcouple_xyz, nktv2p=u.nktv2p)
    rp = rigid_mod.make_rigid_params(rsetup, script.dt, u.ftm2v,
                                     mass_atom=ctx.mass_atom,
                                     dtype=dtype, **kw)
    ctx.integ = rigid_nve_integrator(rp, jnp.asarray(ctx.mass_atom, dtype))
    ctx.dof_removed += rsetup.dof_removed
    ctx.dof_removals.append(("rigid", rsetup))
    ctx.rigid_groups.append((spec.group, rsetup))
