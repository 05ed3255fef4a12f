"""Modifier fix styles: constraint/post-force/end-of-step/post-integrate
hooks (the Modify fan-out families, modify.cpp:385-475).  Moved verbatim
from Simulation.from_script's per-style if-chain in the round-3 registry
refactor — each builder appends its hook(s) to the FixBuildCtx sinks.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from lidp_tpu.styles import fix_style


@fix_style("shake", "rattle")
def build_shake(ctx, spec):
    from lidp_tpu.ops import shake as shake_mod

    if ctx.shake_found is None:
        return
    script, u, dtype = ctx.script, ctx.u, ctx.dtype
    shakep = shake_mod.build_shake_params(
        ctx.npad, script.dt, u.ftm2v, ctx.mass_atom, ctx.shake_found,
        tolerance=ctx.shake_cfg[0], max_iter=ctx.shake_cfg[1],
        dtype=dtype)
    # setup variant: dtfsq/2 for the first (half-kick) step
    # (fix_shake.cpp:2734-2741)
    shakep_half = dataclasses.replace(shakep, dtfsq=shakep.dtfsq * 0.5)
    # correct_coordinates (:2769): project the data-file geometry onto the
    # constraint manifold once (v=f=0)
    sys = ctx.sys
    zsys = sys.replace(v=jnp.zeros_like(sys.v))
    fc, _ = shake_mod.shake_post_force(
        zsys, jnp.zeros_like(sys.x), shakep_half)
    dx = (np.asarray(shakep_half.dtfsq)
          * np.asarray(shakep_half.invmass)[:, None]
          * np.asarray(fc))
    ctx.sys = sys.replace(x=sys.x + jnp.asarray(dx, dtype))
    ctx.dof_removed += shakep.nconstraints
    ctx.shake_dof_removed = shakep.nconstraints
    _at = np.asarray(shakep.atoms)
    _cp = np.asarray(shakep.cpairs)
    _cm = np.asarray(shakep.cmask)
    _pa = np.take_along_axis(
        np.maximum(_at, 0), np.maximum(_cp[:, :, 0], 0), 1)
    _qa = np.take_along_axis(
        np.maximum(_at, 0), np.maximum(_cp[:, :, 1], 0), 1)
    ctx.dof_removals.append(("pairs", (_pa[_cm], _qa[_cm])))
    ctx.pf_hooks.append(
        lambda sys_, f_, _p=shakep:
        shake_mod.shake_post_force(sys_, f_, _p))
    ctx.pf_hooks_setup.append(
        lambda sys_, f_, _p=shakep_half:
        shake_mod.shake_post_force(sys_, f_, _p))
    if spec.style == "rattle":
        # velocity-stage constraint after final_integrate
        # (FixRattle::final_integrate -> vrattle*)
        ctx.rattle_params = shakep


@fix_style("setforce")
def build_setforce(ctx, spec):
    # fix_setforce.cpp: overwrite force components on the group each step
    # (NULL keeps the computed component)
    gm_sf = jnp.asarray(ctx.groups[spec.group])[:, None]
    vals = [None if t == "NULL" else float(t) for t in spec.args[:3]]
    keep = jnp.asarray([v is None for v in vals])
    tgt_f = jnp.asarray([0.0 if v is None else v for v in vals], ctx.dtype)

    def _setforce_pf(sys_, f_, _g=gm_sf, _k=keep, _t=tgt_f):
        f2 = jnp.where(_g & ~_k[None, :], _t[None, :], f_)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_setforce_pf)
    ctx.pf_hooks_setup.append(_setforce_pf)


@fix_style("enforce2d")
def build_enforce2d(ctx, spec):
    # fix_enforce2d.cpp: zero z force (z velocity stays 0)
    def _e2d_pf(sys_, f_):
        return (f_ * jnp.array([1.0, 1.0, 0.0], f_.dtype),
                jnp.zeros(6, f_.dtype))

    ctx.pf_hooks.append(_e2d_pf)
    ctx.pf_hooks_setup.append(_e2d_pf)


@fix_style("temp/rescale", "temp/berendsen")
def build_temp_fix(ctx, spec):
    # materialized after the whole fix loop (needs final dof bookkeeping)
    ctx.pending_temp_fix = spec


@fix_style("langevin")
def build_langevin(ctx, spec):
    # FixLangevin::post_force (fix_langevin.cpp): friction + noise
    u, dtype, script = ctx.u, ctx.dtype, ctx.script
    t_l, _t2, damp_l, seed_l = (float(spec.args[0]), float(spec.args[1]),
                                float(spec.args[2]), int(spec.args[3]))
    gmask_l = jnp.asarray(ctx.groups[spec.group])
    m_l = jnp.asarray(ctx.mass_atom, dtype)
    gamma1 = -m_l / damp_l / u.ftm2v
    gamma2 = jnp.sqrt(24.0 * u.boltz * t_l * m_l
                      / (damp_l * script.dt * u.mvv2e)) / u.ftm2v
    seed_arr = jnp.asarray(seed_l, jnp.uint32)

    def _langevin_pf(sys, f, _g1=gamma1, _g2=gamma2, _gm=gmask_l,
                     _seed=seed_arr):
        import jax as _jax

        key = _jax.random.fold_in(_jax.random.PRNGKey(_seed), sys.step)
        u01 = _jax.random.uniform(key, sys.v.shape, dtype=sys.v.dtype)
        fl = _g1[:, None] * sys.v + _g2[:, None] * (u01 - 0.5)
        f2 = f + jnp.where((_gm & sys.mask)[:, None], fl, 0.0)
        return f2, jnp.zeros(6, f.dtype)

    ctx.pf_hooks.append(_langevin_pf)
    ctx.pf_hooks_setup.append(_langevin_pf)


@fix_style("addforce")
def build_addforce(ctx, spec):
    # fix addforce (fix_addforce.cpp): constant extra force
    gm_af = jnp.asarray(ctx.groups[spec.group])[:, None]
    fadd = jnp.asarray([float(v) for v in spec.args[:3]], ctx.dtype)

    def _addforce_pf(sys_, f_, _g=gm_af, _fa=fadd):
        f2 = f_ + jnp.where(_g & sys_.mask[:, None], _fa[None, :], 0.0)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_addforce_pf)
    ctx.pf_hooks_setup.append(_addforce_pf)


@fix_style("aveforce")
def build_aveforce(ctx, spec):
    # fix aveforce (fix_aveforce.cpp): set each non-NULL component to the
    # group-average force plus the given value
    gm_av = jnp.asarray(ctx.groups[spec.group])
    vals_av = [None if t == "NULL" else float(t) for t in spec.args[:3]]
    keep_av = jnp.asarray([v is None for v in vals_av])
    add_av = jnp.asarray([0.0 if v is None else v for v in vals_av],
                         ctx.dtype)
    ng_av = jnp.asarray(
        max(1, int(np.count_nonzero(ctx.script.groups[spec.group]))),
        ctx.dtype)

    def _aveforce_pf(sys_, f_, _g=gm_av, _k=keep_av, _a=add_av, _n=ng_av):
        m = (_g & sys_.mask)[:, None]
        favg = jnp.sum(jnp.where(m, f_, 0.0), axis=0) / _n
        f2 = jnp.where(m & ~_k[None, :], (favg + _a)[None, :], f_)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_aveforce_pf)
    ctx.pf_hooks_setup.append(_aveforce_pf)


@fix_style("spring/self")
def build_spring_self(ctx, spec):
    # fix spring/self K: per-atom tether to the unwrapped position at fix
    # definition (fix_spring_self.cpp:151)
    script = ctx.script
    k_ss = float(spec.args[0])
    gm_ss = jnp.asarray(ctx.groups[spec.group])[:, None]
    x0_ss = jnp.asarray(
        ctx.padA(script.x + script.image
                 * (script.box_hi - script.box_lo)), ctx.dtype)

    def _springself_pf(sys_, f_, _g=gm_ss, _k=k_ss, _x0=x0_ss):
        from lidp_tpu.box import unwrap as _unwrap

        xu = _unwrap(sys_.x, sys_.box, sys_.image)
        f2 = f_ - jnp.where(_g & sys_.mask[:, None], _k * (xu - _x0), 0.0)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_springself_pf)
    ctx.pf_hooks_setup.append(_springself_pf)


@fix_style("viscous")
def build_viscous(ctx, spec):
    # fix viscous gamma: f -= gamma * v (fix_viscous.cpp)
    g_v = float(spec.args[0])
    gm_v = jnp.asarray(ctx.groups[spec.group])[:, None]

    def _viscous_pf(sys_, f_, _g=gm_v, _gam=g_v):
        f2 = f_ - jnp.where(_g & sys_.mask[:, None], _gam * sys_.v, 0.0)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_viscous_pf)
    ctx.pf_hooks_setup.append(_viscous_pf)


@fix_style("efield")
def build_efield(ctx, spec):
    # fix efield ex ey ez: f += qe2f * q * E (fix_efield.cpp)
    e_f = jnp.asarray([float(v) for v in spec.args[:3]], ctx.dtype)
    gm_e = jnp.asarray(ctx.groups[spec.group])[:, None]
    qe2f = jnp.asarray(ctx.u.qe2f, ctx.dtype)

    def _efield_pf(sys_, f_, _g=gm_e, _e=e_f, _c=qe2f):
        f2 = f_ + jnp.where(
            _g & sys_.mask[:, None],
            (_c * sys_.q)[:, None] * _e[None, :], 0.0)
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_efield_pf)
    ctx.pf_hooks_setup.append(_efield_pf)


@fix_style("momentum")
def build_momentum(ctx, spec):
    # fix momentum N linear x y z (fix_momentum.cpp:95): zero the selected
    # vcm components of the group every N steps
    nev_m = int(spec.args[0])
    dims_m = [1.0, 1.0, 1.0]
    if "linear" in spec.args:
        li = list(spec.args).index("linear")
        dims_m = [float(spec.args[li + 1 + d]) for d in range(3)]
    gm_m = jnp.asarray(ctx.groups[spec.group])
    m_m = jnp.asarray(ctx.mass_atom, ctx.dtype)
    dsel = jnp.asarray(dims_m, ctx.dtype)

    def _momentum_eos(sys_, _g=gm_m, _m=m_m, _d=dsel, _n=nev_m):
        sel = (_g & sys_.mask)
        msel = jnp.where(sel, _m, 0.0)
        vcm = jnp.sum(msel[:, None] * sys_.v, axis=0) / jnp.sum(msel)
        apply = (sys_.step % _n) == 0
        dv = jnp.where(apply, vcm * _d, 0.0)
        v2 = sys_.v - jnp.where(sel[:, None], dv[None, :], 0.0)
        return sys_.replace(v=v2)

    ctx.eos_hooks.append(_momentum_eos)


@fix_style("recenter")
def build_recenter(ctx, spec):
    # fix recenter x y z (fix_recenter.cpp): shift the group so its COM
    # returns to the target (INIT = COM at definition)
    script, dtype = ctx.script, ctx.dtype
    gm_r = script.groups[spec.group]
    m_r = np.asarray(ctx.mass_atom[:ctx.npad])
    xu0 = script.x + script.image * (script.box_hi - script.box_lo)
    com0 = ((m_r[:ctx.n][gm_r][:, None] * xu0[gm_r]).sum(0)
            / m_r[:ctx.n][gm_r].sum())
    tgt = []
    for d, tok in enumerate(spec.args[:3]):
        tgt.append(com0[d] if tok in ("INIT", "NULL") else float(tok))
    gm_rj = jnp.asarray(ctx.groups[spec.group])
    m_rj = jnp.asarray(ctx.mass_atom, dtype)
    tgt_j = jnp.asarray(tgt, dtype)
    keep_r = jnp.asarray([tok == "NULL" for tok in spec.args[:3]])

    def _recenter_eos(sys_, _g=gm_rj, _m=m_rj, _t=tgt_j, _k=keep_r):
        from lidp_tpu.box import unwrap as _unwrap

        sel = (_g & sys_.mask)
        msel = jnp.where(sel, _m, 0.0)
        xu = _unwrap(sys_.x, sys_.box, sys_.image)
        com = jnp.sum(msel[:, None] * xu, axis=0) / jnp.sum(msel)
        shift = jnp.where(_k, 0.0, _t - com)
        x2 = sys_.x + jnp.where(sel[:, None], shift[None, :], 0.0)
        return sys_.replace(x=x2)

    ctx.eos_hooks.append(_recenter_eos)


@fix_style("neb")
def build_neb(ctx, spec):
    pass   # consumed by the neb command (replica.neb_run)


@fix_style("adapt")
def build_adapt(ctx, spec):
    pass   # applied to the ForceField in from_script


@fix_style("deform")
def build_deform(ctx, spec):
    ctx.deform_fix = spec


@fix_style("wall/reflect")
def build_wall_reflect(ctx, spec):
    # FixWallReflect::post_integrate (:188): reflect positions across the
    # wall and flip the velocity component
    walls_r = []
    a_w = spec.args
    i_w = 0
    while i_w < len(a_w):
        face = a_w[i_w]
        if face in ("xlo", "xhi", "ylo", "yhi", "zlo", "zhi"):
            walls_r.append(("xyz".index(face[0]),
                            +1 if face.endswith("lo") else -1,
                            float(a_w[i_w + 1])))
            i_w += 2
        else:
            i_w += 1
    gm_w = jnp.asarray(ctx.groups[spec.group])

    def _wallreflect_pi(sys_, _w=tuple(walls_r), _g=gm_w):
        x_, v_ = sys_.x, sys_.v
        for d, sgn, coord in _w:
            past = ((x_[:, d] - coord) * sgn < 0) & _g & sys_.mask
            x_ = x_.at[:, d].set(
                jnp.where(past, 2.0 * coord - x_[:, d], x_[:, d]))
            v_ = v_.at[:, d].set(jnp.where(past, -v_[:, d], v_[:, d]))
        return sys_.replace(x=x_, v=v_)

    ctx.pi_hooks.append(_wallreflect_pi)


@fix_style("wall/lj93")
def build_wall_lj93(ctx, spec):
    # FixWallLJ93 (fix_wall_lj93.cpp:32-42 precompute + wall force):
    # E = eps(2/15 (s/d)^9 - (s/d)^3) - offset
    walls_l = []
    a_w = spec.args
    i_w = 0
    while i_w < len(a_w):
        face = a_w[i_w]
        if face in ("xlo", "xhi", "ylo", "yhi", "zlo", "zhi"):
            walls_l.append(("xyz".index(face[0]),
                            +1 if face.endswith("lo") else -1,
                            float(a_w[i_w + 1]), float(a_w[i_w + 2]),
                            float(a_w[i_w + 3]), float(a_w[i_w + 4])))
            i_w += 5
        else:
            i_w += 1
    gm_w2 = jnp.asarray(ctx.groups[spec.group])

    def _walllj_pf(sys_, f_, _w=tuple(walls_l), _g=gm_w2):
        for d, sgn, coord, epsw, sigw, cutw in _w:
            c1 = 6.0 / 5.0 * epsw * sigw**9
            c2 = 3.0 * epsw * sigw**3
            delta = (sys_.x[:, d] - coord) * sgn
            act = (_g & sys_.mask & (delta > 0) & (delta < cutw))
            dsafe = jnp.where(act, delta, 1.0)
            rinv = 1.0 / dsafe
            r4 = rinv**4
            r10 = r4 * r4 * rinv * rinv
            fw = jnp.where(act, c1 * r10 - c2 * r4, 0.0) * sgn
            f_ = f_.at[:, d].add(fw)
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_walllj_pf)
    ctx.pf_hooks_setup.append(_walllj_pf)


@fix_style("planeforce", "lineforce")
def build_projection(ctx, spec):
    # project forces onto a plane / line (fix_planeforce.cpp)
    nvec = np.array([float(v) for v in spec.args[:3]])
    nvec /= np.linalg.norm(nvec)
    nj = jnp.asarray(nvec, ctx.dtype)
    gm_p = jnp.asarray(ctx.groups[spec.group])[:, None]
    keepline = spec.style == "lineforce"

    def _proj_pf(sys_, f_, _n=nj, _g=gm_p, _line=keepline):
        fn = (f_ @ _n)[:, None] * _n[None, :]
        f2 = fn if _line else f_ - fn
        return jnp.where(_g & sys_.mask[:, None], f2, f_), \
            jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_proj_pf)
    ctx.pf_hooks_setup.append(_proj_pf)


@fix_style("print", "ave/time", "ave/chunk")
def build_host_side(ctx, spec):
    pass   # host-side, handled at chunk boundaries in run()


@fix_style("indent")
def build_indent(ctx, spec):
    # fix indent K sphere x y z R (fix_indent.cpp): repulsive
    # F = -K (r - R)^2 on atoms inside the indenter, pushing outward along
    # r-hat; coords/R in lattice units
    script, dtype = ctx.script, ctx.dtype
    a_i = spec.args
    k_ind = float(a_i[0])
    assert a_i[1] == "sphere", "fix indent supports sphere"
    s3_i = np.asarray(getattr(script, "lattice_spacing3",
                              np.full(3, script.lattice_spacing or 1.0)),
                      float)
    ctr_i = jnp.asarray(
        [float(a_i[2]) * s3_i[0], float(a_i[3]) * s3_i[1],
         float(a_i[4]) * s3_i[2]], dtype)
    rad_i = float(a_i[5]) * float(s3_i[0])
    gm_i = jnp.asarray(ctx.groups[spec.group])

    def _indent_pf(sys_, f_, _c=ctr_i, _R=rad_i, _k=k_ind, _g=gm_i):
        d = sys_.x - _c[None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        inside = (r < _R) & _g & sys_.mask & (r > 1e-10)
        dr = r - _R
        fmag = jnp.where(inside, -_k * dr * dr / jnp.where(
            r > 1e-10, r, 1.0), 0.0)
        # dr < 0 inside: force points along -dr * rhat = outward
        f2 = f_ - fmag[:, None] * d
        return f2, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_indent_pf)
    ctx.pf_hooks_setup.append(_indent_pf)


@fix_style("halt")
def build_halt(ctx, spec):
    # fix halt N attribute op value [error|break|continue] — host-side
    # conditional stop at chunk boundaries (fix_halt.cpp:146)
    ctx.halt_spec = (int(spec.args[0]), spec.args[1], spec.args[2],
                     float(spec.args[3]),
                     spec.args[4] if len(spec.args) > 4 else "break")
