"""Modifier fix styles: constraint/post-force/end-of-step/post-integrate
hooks (the Modify fan-out families, modify.cpp:385-475).  Moved verbatim
from Simulation.from_script's per-style if-chain in the round-3 registry
refactor — each builder appends its hook(s) to the FixBuildCtx sinks.
"""

from __future__ import annotations

import dataclasses

import jax
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


@fix_style("external")
def build_external(ctx, spec):
    """fix ID group external pf/callback ncall napply | pf/array napply
    (fix_external.cpp): per-atom forces supplied by the caller through
    the library API.  The force array lives on the script object
    (`lammps.fix_external_set_force` / set via `spec._fexternal`); edits
    invalidate the Simulation, so array updates take effect at the next
    run — the pf/array contract.  pf/callback invokes the registered
    Python callback (caller, step, nlocal, ids, x, fexternal) EVERY
    step on which ntimestep % ncall == 0, from inside the traced scan
    via an ordered io_callback (fix_external.cpp:150-156: callback
    refresh on the ncall grid, force applied on the napply grid;
    fexternal persists between refreshes)."""
    import numpy as _np

    gm_x = jnp.asarray(ctx.groups[spec.group])[:, None]
    mode = spec.args[0]
    if mode not in ("pf/callback", "pf/array"):
        raise NotImplementedError(f"fix external {mode}")
    fext = getattr(spec, "_fexternal", None)
    cb = getattr(spec, "_callback", None)
    if mode == "pf/callback" and cb is not None:
        n = ctx.n
        npad, dtype = ctx.npad, ctx.dtype
        ncall = int(spec.args[1])
        napply = int(spec.args[2])
        caller = getattr(spec, "_caller", None)
        state = {"fe": _np.zeros((n, 3))
                 if fext is None else _np.asarray(fext, float)}

        def _refresh(step, x_now):
            step = int(step)
            if step % ncall == 0:
                fe = _np.zeros((n, 3))
                cb(caller, step, n, _np.arange(1, n + 1),
                   _np.asarray(x_now[:n], float), fe)
                state["fe"] = fe
                spec._fexternal = fe
            out = _np.zeros((npad, 3))
            out[:n] = state["fe"]
            return out.astype(dtype)

        def _external_cb_pf(sys_, f_, _g=gm_x):
            from jax.experimental import io_callback

            fe = io_callback(
                _refresh, jax.ShapeDtypeStruct((npad, 3), dtype),
                sys_.step, sys_.x, ordered=True)
            on = (sys_.step % napply == 0)
            add = jnp.where(_g & sys_.mask[:, None], fe, 0.0)
            return f_ + jnp.where(on, add, 0.0), jnp.zeros(6, f_.dtype)

        ctx.pf_hooks.append(_external_cb_pf)
        ctx.pf_hooks_setup.append(_external_cb_pf)
        return

    fj = (jnp.zeros((ctx.npad, 3), ctx.dtype) if fext is None
          else jnp.asarray(ctx.padA(np.asarray(fext, float), 0.0),
                           ctx.dtype))

    def _external_pf(sys_, f_, _g=gm_x, _fe=fj):
        return f_ + jnp.where(_g & sys_.mask[:, None], _fe, 0.0), \
            jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_external_pf)
    ctx.pf_hooks_setup.append(_external_pf)


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

    def _momentum_eos(sys_, res_=None, _g=gm_m, _m=m_m, _d=dsel, _n=nev_m):
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

    def _recenter_eos(sys_, res_=None, _g=gm_rj, _m=m_rj, _t=tgt_j,
                      _k=keep_r):
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


@fix_style("wall/lj93", "wall/lj126", "wall/lj1043", "wall/harmonic")
def build_wall_flat(ctx, spec):
    # Flat analytic walls (fix_wall.cpp children):
    #   lj93      E = eps(2/15 (s/d)^9 - (s/d)^3)       fix_wall_lj93.cpp
    #   lj126     E = 4 eps((s/d)^12 - (s/d)^6)         fix_wall_lj126.cpp
    #   lj1043    E = 2 pi eps(2/5 (s/d)^10 - (s/d)^4
    #                 - sqrt(2)/3 (s/(d+0.61/sqrt(2) s))^3)
    #                                                   fix_wall_lj1043.cpp
    #   harmonic  E = eps (cut - d)^2                   fix_wall_harmonic.cpp
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
    kind = spec.style.split("/")[1]

    def _wall_pf(sys_, f_, _w=tuple(walls_l), _g=gm_w2, _k=kind):
        for d, sgn, coord, epsw, sigw, cutw in _w:
            delta = (sys_.x[:, d] - coord) * sgn
            act = (_g & sys_.mask & (delta > 0) & (delta < cutw))
            dsafe = jnp.where(act, delta, 1.0)
            rinv = 1.0 / dsafe
            if _k == "lj93":
                c1 = 6.0 / 5.0 * epsw * sigw**9
                c2 = 3.0 * epsw * sigw**3
                r4 = rinv**4
                fmag = c1 * r4 * r4 * rinv * rinv - c2 * r4
            elif _k == "lj126":
                # fwall = (48 eps s^12 r6inv - 24 eps s^6) r6inv rinv
                c1 = 48.0 * epsw * sigw**12
                c2 = 24.0 * epsw * sigw**6
                r6 = rinv**6
                fmag = (c1 * r6 - c2) * r6 * rinv
            elif _k == "lj1043":
                # fix_wall_lj1043.cpp precompute: c5 = 10 coeff1 =
                # 8 pi eps s^10, c6 = 4 coeff2 = 8 pi eps s^4,
                # c7 = 3 coeff3 = 2 pi sqrt(2) eps s^3,
                # d0 = 0.61 s / sqrt(2)
                c5 = 8.0 * np.pi * epsw * sigw**10
                c6 = 8.0 * np.pi * epsw * sigw**4
                c7 = 2.0 * np.pi * np.sqrt(2.0) * epsw * sigw**3
                d0 = 0.61 / np.sqrt(2.0) * sigw
                r4 = rinv**4
                r10 = r4 * r4 * rinv * rinv
                rs = 1.0 / (dsafe + d0)
                fmag = (c5 * r10 * rinv - c6 * r4 * rinv
                        - c7 * rs**4)
            else:   # harmonic: F = 2 eps (cut - d) toward the interior
                fmag = 2.0 * epsw * (cutw - dsafe)
            fw = jnp.where(act, fmag, 0.0) * sgn
            f_ = f_.at[:, d].add(fw)
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_wall_pf)
    ctx.pf_hooks_setup.append(_wall_pf)


@fix_style("tmd")
def build_tmd(ctx, spec):
    """fix ID group tmd rho_final target-file N [outfile]
    (fix_tmd.cpp): holonomic constraint driving the mass-weighted RMSD
    to the target structure linearly from rho_start (measured at run
    start) to rho_final over each run.  The Lagrange multiplier solves
    the same quadratic as FixTMD::initial_integrate; the correction
    applies to x and v right after the position update (driver
    tmd_hook).  Target file rows: id x y z (optionally + image flags)."""
    import os as _os

    script = ctx.script
    rho_stop = float(spec.args[0])
    path = _os.path.join(script.root, spec.args[1])
    n = ctx.n
    xf = np.zeros((n, 3))
    seen = np.zeros(n, bool)
    with open(path) as fh:
        for ln in fh:
            t = ln.split("#")[0].split()
            if len(t) in (4, 7):
                i = int(t[0]) - 1
                xf[i] = [float(v) for v in t[1:4]]
                seen[i] = True
    gm_host = np.asarray(ctx.script.groups[spec.group], bool)
    if not seen[gm_host].all():
        raise ValueError("fix tmd target file missing group atoms")
    mass = np.asarray(ctx.mass_atom[:n], float)
    mt = float(mass[gm_host].sum())
    xfj = jnp.asarray(ctx.padA(xf, 0.0), ctx.dtype)
    gmj = jnp.asarray(ctx.groups[spec.group])[:, None]
    mj = jnp.where(jnp.asarray(ctx.groups[spec.group]),
                   jnp.asarray(ctx.padA(mass, 0.0), ctx.dtype), 0.0)
    dtv = script.dt
    dtf = 0.5 * script.dt * ctx.u.ftm2v

    # fix ID group tmd rho_final target_file N [outfile]
    # (fix_tmd.cpp:48,72-84): N>0 opens the statistics file and writes a
    # row every N steps; work terms accumulate EVERY step.  The per-step
    # scalars leave the traced scan through an ordered io_callback.
    nfileevery = int(spec.args[2]) if len(spec.args) > 2 else 0
    stat = None
    if nfileevery:
        if len(spec.args) < 4:
            raise ValueError("Illegal fix tmd command")
        outpath = _os.path.join(script.root, spec.args[3])
        fh = open(outpath, "w")
        fh.write("# Step rho_target rho_old gamma_back "
                 "gamma_forward lambda work_lambda work_analytical\n")
        # dtv/dtf for the stats use the UNHALVED dtf (fix_tmd.cpp:166-167)
        stat = {"fh": fh, "work_lambda": 0.0, "work_analytical": 0.0,
                "previous_stat": 0, "dtv": dtv,
                "dtf": script.dt * ctx.u.ftm2v}
        ctx.script._tmd_stat = stat     # tests introspect/close via this

        def _stat_cb(step, rho_target, rho_old, gb, gf, fr, kt):
            step = int(step)
            rho_target, rho_old = float(rho_target), float(rho_old)
            gb, gf, fr, kt = float(gb), float(gf), float(fr), float(kt)
            d_, f_ = stat["dtv"], stat["dtf"]
            stat["work_analytical"] += (
                (-fr - kt / d_ / f_) * (rho_target - rho_old)
                / (rho_old if rho_old != 0.0 else 1.0))
            lam = gb * rho_old * mt / d_ / f_
            stat["work_lambda"] += lam * (rho_target - rho_old)
            if (step % nfileevery == 0
                    and stat["previous_stat"] != step):
                stat["fh"].write(
                    "%d %g %g %g %g %g %g %g\n"
                    % (step, rho_target, rho_old, gb, gf, lam,
                       stat["work_lambda"], stat["work_analytical"]))
                stat["fh"].flush()
                stat["previous_stat"] = step

    def make_hook(window, rho_start):
        begin, end = window

        def _tmd_hook(x_prev, image_prev, sys_, res_):
            from lidp_tpu.box import unwrap

            dtype = sys_.x.dtype
            xold = unwrap(x_prev, sys_.box, image_prev)
            xcur = unwrap(sys_.x, sys_.box, sys_.image)
            dxold = jnp.where(gmj, xold - xfj, 0.0)
            dx = jnp.where(gmj, xcur - xfj, 0.0)
            a = jnp.sum(mj[:, None] * dxold * dxold) / mt
            b = 2.0 * jnp.sum(mj[:, None] * dx * dxold) / mt
            e = jnp.sum(mj[:, None] * dx * dx) / mt
            # ntimestep inside initial_integrate = sys.step + 1 (the
            # driver bumps step after the hooks)
            tstep = (sys_.step + 1).astype(dtype)
            denom = jnp.maximum(end - begin, 1).astype(dtype)
            delta = jnp.clip((tstep - begin) / denom, 0.0, 1.0)
            rho_t = rho_start + delta * (rho_stop - rho_start)
            def _gamma(rho):
                c = e - rho * rho
                d = b * b - 4.0 * a * c
                d = jnp.maximum(d, 0.0)
                gmax = jnp.where(b >= 0, (-b - jnp.sqrt(d)),
                                 (-b + jnp.sqrt(d))) / (2.0 * a)
                return jnp.where(
                    a == 0.0, 0.0,
                    c / (a * jnp.where(gmax == 0.0, 1.0, gmax)))

            gfwd = _gamma(rho_t)
            if stat is not None:
                # statistics row scalars (fix_tmd.cpp:226-273): gamma_back
                # solves against LAST step's target rho_old; fr/kt feed the
                # work accumulators on the host via an ordered callback
                from jax.experimental import io_callback

                delta_o = jnp.clip((tstep - 1.0 - begin) / denom, 0.0, 1.0)
                rho_old = rho_start + delta_o * (rho_stop - rho_start)
                gback = _gamma(rho_old)
                xback = xcur + gback * dxold
                dxkt = xback - xold
                kt = jnp.sum(mj[:, None] * dxkt * dxkt)
                f_ = res_.f if res_ is not None else jnp.zeros_like(xcur)
                fr = jnp.sum(jnp.where(gmj, f_, 0.0) * dxold)
                io_callback(_stat_cb, None, sys_.step + 1, rho_t, rho_old,
                            gback, gfwd, fr, kt, ordered=True)
            x2 = sys_.x + gfwd * dxold
            v2 = sys_.v + (gfwd / dtv) * dxold
            return sys_.replace(x=x2, v=v2)

        return _tmd_hook

    ctx.tmd_factory = (make_hook, rho_stop, xf, gm_host, mass, mt)


@fix_style("wall/region")
def build_wall_region(ctx, spec):
    """fix ID group wall/region region-ID lj93|lj126|lj1043|harmonic eps
    sigma cutoff (fix_wall_region.cpp): wall forces from every region
    surface within cutoff of an interior atom (side in).  Contact
    distances/vectors mirror Region::surface_interior for block, sphere
    and cylinder regions; fwall/eng use the same coeff precomputes."""
    a = spec.args
    rname, kind = a[0], a[1]
    epsw, sigw, cutw = float(a[2]), float(a[3]), float(a[4])
    script = ctx.script
    reg = script.regions[rname]
    kw = getattr(script, "_region_kw", {}).get(rname, {})
    if kw.get("side", "in") != "in":
        raise NotImplementedError("wall/region side out")
    s3 = np.asarray(script._region_spacing(rname), float)
    gm_wr = jnp.asarray(ctx.groups[spec.group])

    def _fwall_eng(r):
        # kernels + cutoff offsets, fix_wall_region.cpp:135-176,338-380
        rinv = 1.0 / r
        if kind == "lj93":
            c1 = 6.0 / 5.0 * epsw * sigw**9
            c2 = 3.0 * epsw * sigw**3
            r4 = rinv**4
            return c1 * r4 * r4 * rinv * rinv - c2 * r4
        if kind == "lj126":
            c1 = 48.0 * epsw * sigw**12
            c2 = 24.0 * epsw * sigw**6
            r6 = rinv**6
            return r6 * (c1 * r6 - c2) * rinv
        if kind == "lj1043":
            c1 = 2.0 * np.pi * 0.4 * epsw * sigw**10
            c2 = 2.0 * np.pi * epsw * sigw**4
            c3 = 2.0 * np.pi * np.sqrt(2.0) / 3.0 * epsw * sigw**3
            c4 = 0.61 / np.sqrt(2.0) * sigw
            return (10.0 * c1 * rinv**10 * rinv - 4.0 * c2 * rinv**4
                    * rinv - 3.0 * c3 * (r + c4) ** -4.0)
        # harmonic
        return 2.0 * epsw * (cutw - r)

    # contact generators: x (N,3) -> list of (r (N,), del (N,3), active)
    if isinstance(reg, tuple) and reg and reg[0] == "sphere":
        c = np.asarray(reg[1:4], float) * s3
        rad = float(reg[4]) * s3[0]

        def _contacts(x):
            d = x - c
            dist = jnp.sqrt(jnp.sum(d * d, 1))
            r = rad - dist
            dl = d * (1.0 - rad / jnp.where(dist > 0, dist, 1.0))[:, None]
            return [(r, dl, dist > 0)]
    elif isinstance(reg, tuple) and reg and reg[0] == "cylinder":
        axis = "xyz".index(reg[1])
        o1, o2 = [d for d in range(3) if d != axis]
        c1v, c2v = float(reg[2]) * s3[o1], float(reg[3]) * s3[o2]
        rad = float(reg[4]) * s3[o1]
        lo_a = float(reg[5]) * s3[axis]
        hi_a = float(reg[6]) * s3[axis]

        def _contacts(x):
            d1 = x[:, o1] - c1v
            d2 = x[:, o2] - c2v
            dist = jnp.sqrt(d1 * d1 + d2 * d2)
            rrad = rad - dist
            scale = (1.0 - rad / jnp.where(dist > 0, dist, 1.0))
            dl = jnp.zeros_like(x).at[:, o1].set(d1 * scale).at[
                :, o2].set(d2 * scale)
            out = [(rrad, dl, dist > 0)]
            for coord, sgn in ((lo_a, +1.0), (hi_a, -1.0)):
                rf = (x[:, axis] - coord) * sgn
                dlf = jnp.zeros_like(x).at[:, axis].set(rf * sgn)
                out.append((rf, dlf, jnp.ones_like(rf, bool)))
            return out
    else:
        # block: legacy 6-tuple (INF faces -> no wall there)
        b = np.asarray(reg, float) * np.repeat(s3, 2)

        def _contacts(x):
            out = []
            for dim in range(3):
                for coord, sgn in ((b[2 * dim], +1.0),
                                   (b[2 * dim + 1], -1.0)):
                    if not np.isfinite(coord):
                        continue
                    rf = (x[:, dim] - coord) * sgn
                    dlf = jnp.zeros_like(x).at[:, dim].set(rf * sgn)
                    out.append((rf, dlf, jnp.ones_like(rf, bool)))
            return out

    def _wallregion_pf(sys_, f_):
        for r, dl, ok in _contacts(sys_.x):
            act = gm_wr & sys_.mask & ok & (r > 0) & (r < cutw)
            rsafe = jnp.where(act, r, 1.0)
            fw = jnp.where(act, _fwall_eng(rsafe), 0.0)
            f_ = f_ + fw[:, None] * dl / rsafe[:, None]
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_wallregion_pf)
    ctx.pf_hooks_setup.append(_wallregion_pf)


@fix_style("spring")
def build_spring(ctx, spec):
    # fix spring tether K x y z R0 | couple group2 K x y z R0
    # (fix_spring.cpp spring_tether/spring_couple): restoring force
    # k(r-R0) on the group COM (unwrapped), distributed mass-weighted
    a = list(spec.args)
    couple = a[0] == "couple"
    if couple:
        g2name = a[1]
        a = a[2:]
    else:
        assert a[0] == "tether"
        a = a[1:]
    k_s = float(a[0])
    tgt = [None if t == "NULL" else float(t) for t in a[1:4]]
    r0_s = float(a[4])
    gm = jnp.asarray(ctx.groups[spec.group])
    gm2 = jnp.asarray(ctx.groups[g2name]) if couple else None
    mass_j = jnp.asarray(ctx.mass_atom, ctx.dtype)
    flags = jnp.asarray([t is not None for t in tgt])
    tvals = jnp.asarray([0.0 if t is None else t for t in tgt], ctx.dtype)

    def _xcm(sys_, g):
        from lidp_tpu.box import unwrap

        m = jnp.where(g & sys_.mask, mass_j, 0.0)
        xu = unwrap(sys_.x, sys_.box, sys_.image)
        M = jnp.sum(m)
        return jnp.sum(m[:, None] * xu, axis=0) / M, M

    def _spring_pf(sys_, f_):
        com1, m1 = _xcm(sys_, gm)
        if couple:
            # dx = xcm2 - xcm1 - offset; group1 += k dx dr/r * m/M1,
            # group2 -= same /M2 (fix_spring.cpp spring_couple)
            com2, m2 = _xcm(sys_, gm2)
            dxv = com2 - com1 - tvals
        else:
            dxv = com1 - tvals
        dxv = jnp.where(flags, dxv, 0.0)
        r = jnp.sqrt(jnp.sum(dxv * dxv))
        rsafe = jnp.maximum(r, 1e-10)
        dr = r - r0_s
        fvec = k_s * dxv * dr / rsafe
        pa1 = jnp.where((gm & sys_.mask), mass_j, 0.0) / m1
        if couple:
            f_ = f_ + pa1[:, None] * fvec[None, :]
            pa2 = jnp.where((gm2 & sys_.mask), mass_j, 0.0) / m2
            f_ = f_ - pa2[:, None] * fvec[None, :]
        else:
            # tether: restoring force -k dx dr/r on the group
            f_ = f_ - pa1[:, None] * fvec[None, :]
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_spring_pf)
    ctx.pf_hooks_setup.append(_spring_pf)


@fix_style("spring/rg")
def build_spring_rg(ctx, spec):
    # fix spring/rg K RG0 (fix_spring_rg.cpp): f_i = -2K(1 - rg0/rg)
    # (xu_i - xcm) m_i/M; RG0 = NULL captures the first-step rg
    k_rg = float(spec.args[0])
    gm = jnp.asarray(ctx.groups[spec.group])
    mass_j = jnp.asarray(ctx.mass_atom, ctx.dtype)
    if spec.args[1] == "NULL":
        # NULL pins rg0 to the setup-time rg (FixSpringRG::init) —
        # computed on the host from the script arrays now
        gmh = ctx.script.groups[spec.group]
        mh = np.asarray(ctx.mass_atom)[:len(gmh)][gmh]
        xuh = (ctx.script.x + ctx.script.image
               * (ctx.script.box_hi - ctx.script.box_lo))[gmh]
        comh = (mh[:, None] * xuh).sum(0) / mh.sum()
        rg0_v = float(np.sqrt(
            (mh * ((xuh - comh) ** 2).sum(1)).sum() / mh.sum()))
    else:
        rg0_v = float(spec.args[1])

    def _rg(sys_):
        from lidp_tpu.box import unwrap

        m = jnp.where(gm & sys_.mask, mass_j, 0.0)
        xu = unwrap(sys_.x, sys_.box, sys_.image)
        M = jnp.sum(m)
        com = jnp.sum(m[:, None] * xu, axis=0) / M
        d = xu - com
        rg = jnp.sqrt(jnp.sum(m * jnp.sum(d * d, axis=1)) / M)
        return rg, com, xu, m, M

    def _spring_rg_pf(sys_, f_):
        rg, com, xu, m, M = _rg(sys_)
        term = 2.0 * k_rg * (1.0 - rg0_v / rg)
        f_ = f_ - term * (xu - com) * (m / M)[:, None]
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_spring_rg_pf)
    ctx.pf_hooks_setup.append(_spring_rg_pf)


@fix_style("drag")
def build_drag(ctx, spec):
    # fix drag x y z fmag delta (fix_drag.cpp): constant-magnitude force
    # toward the point for atoms farther than delta (min-imaged)
    from lidp_tpu.box import min_image_box

    tgt = [None if t == "NULL" else float(t) for t in spec.args[:3]]
    fmag = float(spec.args[3])
    delta = float(spec.args[4])
    gm = jnp.asarray(ctx.groups[spec.group])
    flags = jnp.asarray([t is not None for t in tgt])
    tvals = jnp.asarray([0.0 if t is None else t for t in tgt], ctx.dtype)

    def _drag_pf(sys_, f_):
        d = min_image_box(sys_.x - tvals, sys_.box)
        d = jnp.where(flags, d, 0.0)
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        act = gm & sys_.mask & (r > delta)
        pref = jnp.where(act, fmag / jnp.where(r > 0, r, 1.0), 0.0)
        f_ = f_ - pref[:, None] * d
        return f_, jnp.zeros(6, f_.dtype)

    ctx.pf_hooks.append(_drag_pf)
    ctx.pf_hooks_setup.append(_drag_pf)





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


@fix_style("print", "ave/time", "ave/chunk", "store/state", "ave/atom",
           "ave/histo", "ave/correlate", "vector", "controller")
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


@fix_style("move")
def build_move(ctx, spec):
    # fix move linear Vx Vy Vz | wiggle Ax Ay Az period
    # (fix_move.cpp initial_integrate LINEAR/WIGGLE branches): prescribed
    # kinematics overwrite x and v of the group each step; displacement
    # measured from the coords at fix creation (time_origin).  NULL
    # components (normally self-integrated by FixMove) are unsupported.
    a = list(spec.args)
    mode = a[0]
    if mode not in ("linear", "wiggle"):
        raise NotImplementedError(f"fix move {mode}")
    if any(t == "NULL" for t in a[1:4]):
        raise NotImplementedError("fix move with NULL components")
    vals = jnp.asarray([float(t) for t in a[1:4]], ctx.dtype)
    period = float(a[4]) if mode == "wiggle" else 1.0
    gm = jnp.asarray(ctx.groups[spec.group])[:, None]
    x0 = jnp.asarray(ctx.padA(
        ctx.script.x + ctx.script.image
        * (ctx.script.box_hi - ctx.script.box_lo)), ctx.dtype)
    t0 = int(ctx.script.step)
    dt = ctx.script.dt
    omega = 2.0 * np.pi / period

    def _move_pi(sys_):
        # post_integrate runs before the scan's step increment, while
        # FixMove::initial_integrate sees the already-advanced ntimestep
        delta = (sys_.step + 1 - t0) * dt
        if mode == "linear":
            xm = x0 + delta * vals[None, :]
            vm = jnp.broadcast_to(vals[None, :], sys_.v.shape)
        else:
            s, c = jnp.sin(omega * delta), jnp.cos(omega * delta)
            xm = x0 + vals[None, :] * s
            vm = jnp.broadcast_to(vals[None, :] * omega * c, sys_.v.shape)
        upd = gm & sys_.mask[:, None]
        return sys_.replace(x=jnp.where(upd, xm, sys_.x),
                            v=jnp.where(upd, vm, sys_.v))

    ctx.pi_hooks.append(_move_pi)


@fix_style("heat")
def build_heat(ctx, spec):
    # fix heat N flux (fix_heat.cpp end_of_step, constant style): every N
    # steps rescale group velocities to add flux*N*dt of kinetic energy
    # while conserving momentum: v' = s v - (s-1) vcm with
    # s = sqrt((ke + dE - kcm)/(ke - kcm)), all in raw 0.5 m v^2 units
    # (energy * ftm2v)
    nevery = int(spec.args[0])
    flux = float(spec.args[1])
    gm = jnp.asarray(ctx.groups[spec.group])
    mass_j = jnp.asarray(ctx.mass_atom, ctx.dtype)
    de_raw = flux * nevery * ctx.script.dt * ctx.u.ftm2v

    def _heat_eos(sys_, res_=None):
        on = (sys_.step % nevery) == 0
        m = jnp.where(gm & sys_.mask, mass_j, 0.0)
        M = jnp.sum(m)
        vcm = jnp.sum(m[:, None] * sys_.v, axis=0) / M
        ke = 0.5 * jnp.sum(m[:, None] * sys_.v ** 2)
        kcm = 0.5 * jnp.sum(vcm * vcm) * M
        s = jnp.sqrt((ke + de_raw - kcm) / (ke - kcm))
        s = jnp.where(on, s, 1.0)
        vnew = s * sys_.v - (s - 1.0) * vcm[None, :]
        return sys_.replace(v=jnp.where((gm & sys_.mask)[:, None],
                                        vnew, sys_.v))

    ctx.eos_hooks.append(_heat_eos)


def _traced_region_match(ctx, rname):
    """Build a traced Region::match analog for a static region: wraps a
    copy of x on periodic dims (Domain::remap, fix_ehex.cpp
    rescale_atom) then tests membership.  block + sphere supported.

    Honors the region's ``side out`` keyword and the INF lo-bound
    convention (a +inf lo bound means unbounded below, exactly as the
    host-side ``_region_mask`` treats it).  The box is read from the
    traced system each call (Domain::remap uses the CURRENT domain), so
    box-changing fixes (npt / fix deform) stay correct.
    """
    script = ctx.script
    r = script.regions[rname]
    s3 = np.asarray(script._region_spacing(rname), float)
    per = jnp.asarray(np.asarray(script.periodic, bool))
    kw = getattr(script, "_region_kw", {}).get(rname, {})
    side_out = kw.get("side", "in") == "out"

    def _remap(x, sys_):
        lo_b = sys_.box.lo.astype(x.dtype)
        L = (sys_.box.hi - sys_.box.lo).astype(x.dtype)
        w = lo_b[None, :] + jnp.mod(x - lo_b[None, :], L[None, :])
        return jnp.where(per[None, :], w, x)

    if not isinstance(r[0], str):
        lo_hi = np.asarray(r, float) * np.repeat(s3, 2)
        lo_np = lo_hi[0::2].copy()
        # INF keyword parses to +inf regardless of which bound it sits
        # on; a lo bound of +inf means "unbounded below" (_region_mask)
        lo_np[np.isinf(lo_np)] = -np.inf
        # keep the bounds finite inside the trace (inf*0 NaN hazards):
        # clamp to +-1e30, far outside any box
        lo = jnp.asarray(np.clip(lo_np, -1e30, 1e30), ctx.dtype)
        hi = jnp.asarray(np.clip(lo_hi[1::2], -1e30, 1e30), ctx.dtype)

        def match(x, sys_):
            xw = _remap(x, sys_)
            m = jnp.all((xw >= lo[None, :]) & (xw <= hi[None, :]),
                        axis=1)
            return ~m if side_out else m
    elif r[0] == "sphere":
        c = jnp.asarray(np.array(r[1:4]) * s3, ctx.dtype)
        rad2 = float(r[4] * s3[0]) ** 2

        def match(x, sys_):
            d = _remap(x, sys_) - c[None, :]
            m = jnp.sum(d * d, axis=1) <= rad2
            return ~m if side_out else m
    else:
        raise NotImplementedError(f"traced region style {r[0]}")
    return match


@fix_style("ehex")
def build_ehex(ctx, spec):
    # fix ehex nevery F [region R] [hex] (RIGID/fix_ehex.cpp, the eHEX/a
    # asymmetric enhanced heat exchange of Wirnsberger et al.,
    # arXiv:1507.07081): every nevery steps rescale the reservoir's
    # velocities about its COM by sqrt(1 + F*dt/Kr) (Kr = thermal KE in
    # the COM frame, F = heat*ftm2v*nevery) and — unless 'hex' — apply
    # the third-order coordinate correction x -= dt^3 * epsr (Eq. 20,
    # fix_ehex.cpp:283-300) that removes plain HEX's O(dt^3) energy
    # drift.  'constrain'/'com' (SHAKE-cluster post-correction via
    # shake_end_of_step) unsupported: constraints here run inside the
    # scan, the post-hoc re-projection path doesn't exist.
    a = list(spec.args)
    nevery = int(a[0])
    heat = float(a[1])
    rname, hex_only = None, False
    i = 2
    while i < len(a):
        if a[i] == "region":
            rname = a[i + 1]
            i += 2
        elif a[i] == "hex":
            hex_only = True
            i += 1
        elif a[i] in ("constrain", "com"):
            raise NotImplementedError("fix ehex constrain/com")
        else:
            raise ValueError(f"Illegal fix ehex keyword {a[i]}")
    gm = jnp.asarray(ctx.groups[spec.group])
    mass_j = jnp.asarray(ctx.mass_atom, ctx.dtype)
    F = heat * ctx.u.ftm2v * nevery
    dt = ctx.script.dt
    match = _traced_region_match(ctx, rname) if rname else None
    if rname is not None:
        # fix_ehex.cpp:269 errors when the reservoir has no atoms
        # (masstotal_region < 1e-14); catch the static-geometry case at
        # build time so an empty selection fails loudly, not as NaNs
        init_sel = (np.asarray(ctx.groups[spec.group], bool)
                    & np.asarray(ctx.script._region_mask(rname), bool))
        if not init_sel.any():
            raise ValueError(
                f"fix ehex: region {rname} selects no atoms of group "
                f"{spec.group} at setup")

    def _ehex_eos(sys_, res_=None):
        on = (sys_.step % nevery) == 0
        sel = gm & sys_.mask
        if match is not None:
            sel = sel & match(sys_.x, sys_)
        m = jnp.where(sel, mass_j, 0.0)
        mr = jnp.sum(m)
        # guard mr: if the reservoir empties mid-run (atoms drift out of
        # the region) skip the update instead of dividing by zero — the
        # reference errors out here (fix_ehex.cpp:269)
        on = on & (mr > 1e-14)
        mr_s = jnp.maximum(mr, 1e-300)
        vcm = jnp.sum(m[:, None] * sys_.v, axis=0) / mr_s
        ke = 0.5 * jnp.sum(m[:, None] * sys_.v ** 2)
        kr = jnp.maximum(ke - 0.5 * mr * jnp.sum(vcm * vcm), 1e-300)
        f_ = res_.f if res_ is not None else jnp.zeros_like(sys_.v)
        fsel = jnp.where(sel[:, None], f_, 0.0)
        sfr = jnp.sum(fsel, axis=0)
        sfvr = jnp.sum(fsel * sys_.v) - jnp.dot(vcm, sfr)
        # fix_ehex.cpp:274 errors when 1 + F*dt/Kr < 0 ("kinetic energy
        # went negative"): an over-cooled reservoir would give sqrt(<0).
        # Clamp to 0 (reservoir KE fully removed) so the failure mode is
        # a frozen reservoir, not NaN propagation.
        escale = jnp.maximum(1.0 + F * dt / kr, 0.0)
        scale = jnp.where(on, jnp.sqrt(escale), 1.0)
        vnew = scale * sys_.v - (scale - 1.0) * vcm[None, :]
        vnew = jnp.where(sel[:, None], vnew, sys_.v)
        if hex_only:
            xnew = sys_.x
        else:
            # epsr_ik, fix_ehex.cpp:283-300 (uses pre-rescale v)
            ftm2v = ctx.u.ftm2v
            eta = (mass_j[:, None] * F / (2.0 * kr)
                   * (sys_.v - vcm[None, :]))
            epsr = (eta / (mass_j[:, None] * kr)
                    * (F / 48.0 + sfvr / 6.0 * ftm2v)
                    - F / (12.0 * kr)
                    * (f_ / mass_j[:, None] - sfr[None, :] / mr) * ftm2v)
            corr = jnp.where(sel[:, None] & on, dt ** 3 * epsr, 0.0)
            xnew = sys_.x - corr
        return sys_.replace(x=xnew, v=vnew)

    ctx.eos_hooks.append(_ehex_eos)


@fix_style("temp/csvr", "temp/csld")
def build_temp_cs(ctx, spec):
    # fix temp/csvr (Bussi-Donadio-Parrinello stochastic velocity
    # rescale, fix_temp_csvr.cpp) and temp/csld (canonical sampling
    # langevin thermostat, fix_temp_csld.cpp).  Draw streams use a
    # counter-based key folded with the step (statistically equivalent
    # to the reference's RanMars stream, not bit-identical).
    u, script = ctx.u, ctx.script
    tstart, tstop, damp, seed = (float(spec.args[0]), float(spec.args[1]),
                                 float(spec.args[2]), int(spec.args[3]))
    gm = jnp.asarray(ctx.groups[spec.group])
    mass_j = jnp.asarray(ctx.mass_atom, ctx.dtype)
    ng = int(np.count_nonzero(ctx.script.groups[spec.group]))
    dof = ctx.dim * ng - ctx.dim
    boltz, mvv2e = u.boltz, u.mvv2e
    dt = script.dt
    csld = spec.style == "temp/csld"
    seed_arr = jnp.asarray(seed, jnp.uint32)

    def _cs_eos(sys_, res_=None):
        import jax as _jax

        key = _jax.random.fold_in(_jax.random.PRNGKey(seed_arr), sys_.step)
        t_tgt = tstart            # ramp handled as constant start value
        m = jnp.where(gm & sys_.mask, mass_j, 0.0)
        if csld:
            # v' = c1 v + c2 sqrt(kT/m) R  per component
            c1 = jnp.exp(-dt / damp)
            c2 = jnp.sqrt(1.0 - c1 * c1)
            sig = jnp.sqrt(boltz * t_tgt / jnp.maximum(mass_j, 1e-300)
                           / mvv2e)
            r = _jax.random.normal(key, sys_.v.shape, dtype=sys_.v.dtype)
            vnew = c1 * sys_.v + c2 * sig[:, None] * r
            return sys_.replace(v=jnp.where((gm & sys_.mask)[:, None],
                                            vnew, sys_.v))
        # csvr: resample the total kinetic energy (Bussi 2007 eq. A7)
        ke = 0.5 * mvv2e * jnp.sum(m[:, None] * sys_.v ** 2)
        ke_t = 0.5 * dof * boltz * t_tgt
        c = jnp.exp(-dt / damp)
        k1, k2 = _jax.random.split(key)
        r1 = _jax.random.normal(k1, (), dtype=sys_.v.dtype)
        # sum of (dof-1) squared gaussians ~ 2 Gamma((dof-1)/2)
        rr = 2.0 * _jax.random.gamma(k2, (dof - 1) / 2.0,
                                     dtype=sys_.v.dtype)
        ke_new = (ke + (1.0 - c) * (ke_t * (r1 * r1 + rr) / dof - ke)
                  + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * ke_t * ke / dof))
        s = jnp.sqrt(jnp.maximum(ke_new, 0.0) / ke)
        return sys_.replace(v=jnp.where((gm & sys_.mask)[:, None],
                                        s * sys_.v, sys_.v))

    ctx.eos_hooks.append(_cs_eos)


@fix_style("press/berendsen")
def build_press_berendsen(ctx, spec):
    # fix press/berendsen (fix_press_berendsen.cpp end_of_step): each
    # step rescale the box (about its center) and all atoms by
    # mu_d = (1 - dt/P_period (P_target - P_current)/bulkmodulus)^(1/3);
    # pressure from the live virial + full kinetic trace (the
    # temperature-compute dof cancels out of dof*kB*T = sum m v^2 mvv2e)
    a = list(spec.args)
    p_start = [None] * 3
    p_stop = [None] * 3
    p_period = [0.0] * 3
    iso = False
    bulkmod = 10.0
    i = 0
    while i < len(a):
        k = a[i]
        if k in ("iso", "aniso"):
            iso = k == "iso"
            p_start = [float(a[i + 1])] * 3
            p_stop = [float(a[i + 2])] * 3
            p_period = [float(a[i + 3])] * 3
            i += 4
        elif k in ("x", "y", "z"):
            d = "xyz".index(k)
            p_start[d] = float(a[i + 1])
            p_stop[d] = float(a[i + 2])
            p_period[d] = float(a[i + 3])
            i += 4
        elif k == "modulus":
            bulkmod = float(a[i + 1]); i += 2
        else:
            i += 2
    p_flag = [v is not None for v in p_start]
    if not any(p_flag):
        raise ValueError("fix press/berendsen needs a pressure keyword")
    u, dtype = ctx.u, ctx.dtype
    dt = ctx.script.dt
    mass_j = jnp.asarray(ctx.mass_atom, dtype)
    mvv2e, nktv2p = u.mvv2e, u.nktv2p
    dim = ctx.dim
    flags = jnp.asarray(p_flag)
    tgt = jnp.asarray([v if v is not None else 0.0 for v in p_start],
                      dtype)
    period = jnp.asarray([max(v, 1e-300) for v in p_period], dtype)

    def _pb_eos(sys_, res_):
        m = jnp.where(sys_.mask, mass_j, 0.0)
        v6 = res_.virial
        if iso:
            mvv = mvv2e * jnp.sum(m[:, None] * sys_.v ** 2)
            w = v6[0] + v6[1] + v6[2]
            p_cur = jnp.full(
                3, (mvv + w) / (dim * sys_.box.volume) * nktv2p)
        else:
            mvvd = mvv2e * jnp.sum(m[:, None] * sys_.v ** 2, axis=0)
            p_cur = (mvvd + v6[:3]) / sys_.box.volume * nktv2p
        mu = jnp.where(
            flags,
            (1.0 - dt / period * (tgt - p_cur) / bulkmod) ** (1.0 / 3.0),
            1.0)
        lo, hi = sys_.box.lo, sys_.box.hi
        c = 0.5 * (lo + hi)
        new_lo = (lo - c) * mu + c
        new_hi = (hi - c) * mu + c
        from lidp_tpu import box as _box

        new_box = _box.Box(lo=new_lo, hi=new_hi,
                           periodic=sys_.box.periodic,
                           tilt=sys_.box.tilt,
                           triclinic=sys_.box.triclinic)
        x = c + (sys_.x - c) * mu[None, :]
        return sys_.replace(x=x, box=new_box)

    ctx.eos_hooks.append(_pb_eos)


@fix_style("store/force")
def build_store_force(ctx, spec):
    # fix store/force (fix_store_force.cpp): per-atom snapshot of the
    # force before any post-force fix modified it.  Forces are a pure
    # function of positions here, so f_ID columns resolve by
    # recomputing pair+bonded+kspace forces at output time
    # (computes.peratom_column) — exact, no per-step storage needed.
    spec._store_force = True


@fix_style("dt/reset")
def build_dt_reset(ctx, spec):
    # fix dt/reset N tmin tmax xmax [units box|lattice]
    # (fix_dt_reset.cpp end_of_step): pick dt so no atom moves more
    # than xmax in one step; applied at run-chunk boundaries by
    # Simulation.run (the chunk size divides N)
    a = list(spec.args)
    xmax = float(a[3])
    scale = "lattice"
    if "units" in a:
        scale = a[a.index("units") + 1]
    if scale == "lattice":
        s3 = getattr(ctx.script, "lattice_spacing3", None)
        xmax *= (float(s3[0]) if s3 is not None
                 else float(ctx.script.lattice_spacing or 1.0))
    ctx.dtreset_cfg = dict(
        nevery=max(1, int(a[0])),
        tmin=None if a[1] == "NULL" else float(a[1]),
        tmax=None if a[2] == "NULL" else float(a[2]),
        xmax=xmax, group=np.asarray(ctx.groups[spec.group]))


@fix_style("spring/chunk")
def build_spring_chunk(ctx, spec):
    # fix spring/chunk K chunkID comID (fix_spring_chunk.cpp
    # post_force): per-chunk COM springs; f_i -= m_i * k * d_hat / M
    # with d = com - com0 captured at the first force evaluation.
    # Chunk assignment is static over the fix's lifetime (the reference
    # locks the chunk compute for exactly this reason).
    k_spring = float(spec.args[0])
    chunk_id = spec.args[1]
    ctx.spring_chunk_cfg = dict(k=k_spring, chunk=chunk_id,
                                group=spec.group)


@fix_style("ave/histo/weight")
def build_ave_histo_weight(ctx, spec):
    # handled by the ave/histo host path with weights (fix_ave_histo_weight.cpp)
    pass


@fix_style("restrain")
def build_restrain(ctx, spec):
    # fix restrain bond i j Kstart Kstop r0 | angle i j k Ks Kp theta0
    # | dihedral i j k l Ks Kp phi0  (fix_restrain.cpp): harmonic
    # bond/angle restraints + CHARMM-style dihedral restraint
    # E = K(1 + cos(phi - phi0)); K ramps linearly over each run.
    a = list(spec.args)
    bonds, angles, diheds = [], [], []
    i = 0
    while i < len(a):
        if a[i] == "bond":
            bonds.append((int(a[i + 1]) - 1, int(a[i + 2]) - 1,
                          float(a[i + 3]), float(a[i + 4]),
                          float(a[i + 5])))
            i += 6
        elif a[i] == "angle":
            angles.append((int(a[i + 1]) - 1, int(a[i + 2]) - 1,
                           int(a[i + 3]) - 1, float(a[i + 4]),
                           float(a[i + 5]),
                           float(a[i + 6]) * np.pi / 180.0))
            i += 7
        elif a[i] == "dihedral":
            diheds.append((int(a[i + 1]) - 1, int(a[i + 2]) - 1,
                           int(a[i + 3]) - 1, int(a[i + 4]) - 1,
                           float(a[i + 5]), float(a[i + 6]),
                           float(a[i + 7]) * np.pi / 180.0))
            i += 8
        else:
            i += 1
    dtype = ctx.dtype

    def make_hook(window):
        import jax

        from lidp_tpu.ops.bonded import _mi

        w0, w1 = window

        def _energy(x, box, step):
            delta = jnp.clip((step - w0) / max(w1 - w0, 1), 0.0, 1.0)
            e = jnp.zeros((), dtype)
            for (i1, i2, ks, kp, r0) in bonds:
                k = ks + delta * (kp - ks)
                d = _mi(x[i1] - x[i2], box)
                r = jnp.sqrt(jnp.sum(d * d))
                e = e + k * (r - r0) ** 2
            for (i1, i2, i3, ks, kp, t0) in angles:
                k = ks + delta * (kp - ks)
                d1 = _mi(x[i1] - x[i2], box)
                d2 = _mi(x[i3] - x[i2], box)
                c = jnp.sum(d1 * d2) / jnp.sqrt(
                    jnp.sum(d1 * d1) * jnp.sum(d2 * d2))
                c = jnp.clip(c, -1.0 + 1e-12, 1.0 - 1e-12)
                e = e + k * (jnp.arccos(c) - t0) ** 2
            for (i1, i2, i3, i4, ks, kp, p0) in diheds:
                k = ks + delta * (kp - ks)
                b1 = _mi(x[i2] - x[i1], box)
                b2 = _mi(x[i3] - x[i2], box)
                b3 = _mi(x[i4] - x[i3], box)
                n1 = jnp.cross(b1, b2)
                n2 = jnp.cross(b2, b3)
                phi = jnp.arctan2(
                    jnp.sqrt(jnp.sum(b2 * b2)) * jnp.sum(b1 * n2),
                    jnp.sum(n1 * n2))
                e = e + k * (1.0 + jnp.cos(phi - p0))
            return e

        def _restrain_pf(sys_, f_):
            g = jax.grad(lambda xx: _energy(xx, sys_.box, sys_.step))(
                sys_.x)
            return f_ - g, jnp.zeros(6, f_.dtype)

        return _restrain_pf

    hook = make_hook((0, 1))
    ctx.pf_hooks.append(hook)
    ctx.pf_hooks_setup.append(hook)
    ramped = any(t[2] != t[3] for t in bonds) or \
        any(t[3] != t[4] for t in angles) or \
        any(t[4] != t[5] for t in diheds)
    if ramped:
        ctx.restrain_factory = (make_hook, hook)


@fix_style("box/relax")
def build_box_relax(ctx, spec):
    # consumed by the minimize command (io/script.py _box_relax);
    # no per-timestep hooks — fix_box_relax.cpp only participates in
    # minimization (min_energy/min_step extra-dof protocol)
    pass


@fix_style("cmap")
def build_cmap(ctx, spec):
    """fix cmap CMAPFILE (fix_cmap.cpp): the crossterm force term is
    assembled into the ForceField (sim.from_script -> ops/cmap.py); the
    fix itself needs no integrator hooks."""
