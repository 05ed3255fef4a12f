"""Energy minimization (the reference's Min::run, min.cpp:406).

Implements three of the reference's min styles:
  * FIRE (min_fire.cpp) — the most TPU-friendly: pure vector updates under
    lax.while_loop, no data-dependent line searches;
  * cg (min_cg.cpp) — Polak-Ribiere conjugate gradient with a backtracking
    line search (min_linesearch.cpp::linemin_backtrack semantics);
  * sd (min_sd.cpp) — steepest descent (cg with beta = 0).
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


def cg_minimize(sys, compute, *, etol=0.0, ftol=1e-6, maxiter=1000,
                dmax=0.1, style="cg"):
    """Polak-Ribiere CG / steepest descent with backtracking line search.

    min_cg.cpp::iterate: search direction h = f + beta*h with
    beta = max(0, f_new.(f_new - f_old)/(f_old.f_old)) (PR+), reset to
    steepest descent when h.f <= 0.  Line search follows
    min_linesearch.cpp::linemin_backtrack: alpha capped so no atom moves
    more than dmax, halved until the energy satisfies the Armijo decrease
    test.  `style='sd'` forces beta = 0 (min_sd.cpp).

    Returns (sys, energy, iterations, converged).
    """
    dtype = sys.x.dtype
    ALPHA_RED = 0.5
    MAX_BACKTRACK = 40

    f0, e0 = compute(sys)

    def linemin(sys, h, f_cur, e_cur):
        """Backtracking + secant refinement (linemin_quadratic semantics:
        the force projection along h at the trial point gives a secant
        estimate of the 1-d minimum)."""
        hmax = jnp.max(jnp.abs(h)) + 1e-30
        alpha0 = jnp.minimum(jnp.asarray(1.0, dtype), dmax / hmax)
        fh0 = jnp.sum(f_cur * h)          # -dE/dalpha at alpha = 0 (> 0)

        def eval_at(alpha):
            sys_try = sys.replace(x=sys.x + alpha * h)
            f_try, e_try = compute(sys_try)
            return sys_try, f_try, e_try

        def cond(c):
            done, k = c[3], c[4]
            return (~done) & (k < MAX_BACKTRACK)

        def body(c):
            alpha, best_sys, best_e, done, k = c
            sys_t, f_t, e_t = eval_at(alpha)
            # secant on the directional derivative: the 1-d quadratic
            # through (0, fh0) and (alpha, fh_t) has its minimum at
            # alpha * fh0 / (fh0 - fh_t)
            fh_t = jnp.sum(f_t * h)
            denom = fh0 - fh_t
            alpha_q = jnp.where(denom > 1e-30 * jnp.abs(fh0),
                                alpha * fh0 / jnp.where(
                                    denom > 0, denom, 1.0), alpha)
            alpha_q = jnp.clip(alpha_q, 0.0, alpha)
            sys_q, f_q, e_q = eval_at(alpha_q)
            q_better = e_q < e_t
            sys_t = jax.tree.map(lambda a, b: jnp.where(q_better, a, b),
                                 sys_q, sys_t)
            e_t = jnp.where(q_better, e_q, e_t)
            ok = e_t < e_cur
            return (alpha * ALPHA_RED,
                    jax.tree.map(lambda a, b: jnp.where(ok, a, b),
                                 sys_t, best_sys),
                    jnp.where(ok, e_t, best_e),
                    done | ok, k + 1)

        alpha, sys2, e2, done, k = jax.lax.while_loop(
            cond, body, (alpha0, sys, e_cur, jnp.zeros((), bool),
                         jnp.zeros((), jnp.int32)))
        return sys2, e2, done

    def cond(c):
        sys, f, h, e_prev, e, it, stalled = c
        fsq = jnp.sum(f * f)
        de = jnp.abs(e - e_prev)
        e_ok = (etol > 0.0) & (de < etol * 0.5
                               * (jnp.abs(e) + jnp.abs(e_prev) + 1e-30))
        f_ok = (ftol > 0.0) & (fsq < ftol * ftol)
        return (~(e_ok | f_ok | stalled)) & (it < maxiter)

    def body(c):
        sys, f, h, e_prev, e, it, _ = c
        sys2, e2, moved = linemin(sys, h, f, e)
        f2, _ = compute(sys2)
        fsq_old = jnp.sum(f * f) + 1e-30
        if style == "sd":
            beta = jnp.zeros((), dtype)
        else:
            beta = jnp.maximum(
                0.0, jnp.sum(f2 * (f2 - f)) / fsq_old).astype(dtype)
        h2 = f2 + beta * h
        # restart from steepest descent if the new direction is uphill
        downhill = jnp.sum(h2 * f2) > 0
        h2 = jnp.where(downhill, h2, f2)
        return sys2, f2, h2, e, e2, it + 1, ~moved

    init = (sys, f0, f0, jnp.asarray(jnp.inf, dtype), e0,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    sys, f, h, e_prev, e, it, stalled = jax.lax.while_loop(cond, body, init)
    fnorm = jnp.sqrt(jnp.sum(f * f))
    return sys, e, it, (fnorm < ftol) | (it < maxiter)


def quickmin_minimize(sys, compute, mass_atom, *, etol=0.0, ftol=1e-6,
                      maxiter=1000, dt=0.005, dmax=0.1, ftm2v=1.0):
    """min_style quickmin (min_quickmin.cpp::iterate): project velocity
    onto the force (zeroing it when anti-parallel), limit the Euler step
    so no component moves more than dmax, then advance x and v.

    Returns (sys, energy, iterations, converged)."""
    dtype = sys.x.dtype
    minv = jnp.where(mass_atom > 0,
                     1.0 / jnp.where(mass_atom > 0, mass_atom, 1.0),
                     0.0)[:, None]
    f0, e0 = compute(sys)

    def cond(c):
        sys, f, e_prev, e, v, it = c
        fnorm = jnp.sqrt(jnp.sum(f * f))
        de = jnp.abs(e - e_prev)
        e_ok = (etol > 0.0) & (
            de < etol * 0.5 * (jnp.abs(e) + jnp.abs(e_prev) + 1e-30))
        f_ok = (ftol > 0.0) & (fnorm < ftol)
        return (~(e_ok | f_ok)) & (it < maxiter)

    def body(c):
        sys, f, e_prev, e, v, it = c
        vdotf = jnp.sum(v * f)
        fdotf = jnp.sum(f * f)
        scale = jnp.where(fdotf > 0, vdotf / jnp.where(fdotf > 0, fdotf,
                                                       1.0), 0.0)
        v = jnp.where(vdotf < 0, jnp.zeros_like(v), scale * f)
        # dtv capped so max per-component move <= dmax
        vmax = jnp.max(jnp.abs(v))
        dtv = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.where(vmax > 0, dmax / jnp.where(
                              vmax > 0, vmax, 1.0), dt))
        dtf = dtv * ftm2v
        x = sys.x + dtv * v
        v = v + dtf * minv * f
        sys2 = sys.replace(x=x)
        f2, e2 = compute(sys2)
        return sys2, f2, e, e2, v, it + 1

    init = (sys, f0, jnp.asarray(jnp.inf, dtype), e0,
            jnp.zeros_like(sys.x), jnp.zeros((), jnp.int32))
    sys, f, e_prev, e, v, it = jax.lax.while_loop(cond, body, init)
    fnorm = jnp.sqrt(jnp.sum(f * f))
    return sys, e, it, (fnorm < ftol) | (it < maxiter)


def hftn_minimize(sys, compute, *, etol=0.0, ftol=1e-6, maxiter=100,
                  dmax=0.1, cg_iters=20):
    """min_style hftn (min_hftn.cpp): Hessian-free truncated Newton.

    Each outer iteration solves H p = f approximately with CG, using
    exact Hessian-vector products from forward-over-reverse autodiff of
    the energy (the TPU-native analog of min_hftn.cpp's finite-difference
    Hvp, evalDhd) inside a trust region of radius dmax*sqrt(N); negative
    curvature directions terminate the inner solve at the region edge as
    in the reference's CG_PR inner loop.  Returns
    (sys, energy, iterations, converged)."""
    dtype = sys.x.dtype

    def energy(x):
        _, e = compute(sys.replace(x=x))
        return e

    def grad_e(x):
        f, _ = compute(sys.replace(x=x))
        return -f      # dE/dx

    def hvp(x, p):
        return jax.jvp(grad_e, (x,), (p,))[1]

    f0, e0 = compute(sys)
    n3 = sys.x.size
    radius = dmax * jnp.sqrt(jnp.asarray(float(n3), dtype))

    def cg_solve(x, g):
        # CG on H p = -g, truncated at negative curvature / trust radius
        def body(c):
            p, r, d, rho, k, done = c
            hd = hvp(x, d)
            dhd = jnp.sum(d * hd)
            neg = dhd <= 0
            alpha = jnp.where(neg, 0.0, rho / jnp.where(dhd == 0, 1.0,
                                                        dhd))
            p_new = p + alpha * d
            over = jnp.sqrt(jnp.sum(p_new * p_new)) > radius
            p_new = jnp.where(over | neg, p, p_new)
            r_new = r - alpha * hd
            rho_new = jnp.sum(r_new * r_new)
            beta = rho_new / jnp.where(rho == 0, 1.0, rho)
            d_new = r_new + beta * d
            done = done | neg | over | (jnp.sqrt(rho_new)
                                        < 1e-10 * jnp.sqrt(rho0))
            return p_new, r_new, d_new, rho_new, k + 1, done

        def cond(c):
            *_, k, done = c
            return (~done) & (k < cg_iters)

        r0 = -g
        rho0 = jnp.sum(r0 * r0)
        init = (jnp.zeros_like(g), r0, r0, rho0,
                jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        p, *_ = jax.lax.while_loop(cond, body, init)
        # fall back to steepest descent when CG made no progress
        pnorm = jnp.sqrt(jnp.sum(p * p))
        return jnp.where(pnorm > 0, p, -g)

    def outer_cond(c):
        sys, f, e_prev, e, it = c
        fnorm = jnp.sqrt(jnp.sum(f * f))
        de = jnp.abs(e - e_prev)
        e_ok = (etol > 0.0) & (
            de < etol * 0.5 * (jnp.abs(e) + jnp.abs(e_prev) + 1e-30))
        f_ok = (ftol > 0.0) & (fnorm < ftol)
        return (~(e_ok | f_ok)) & (it < maxiter)

    def outer_body(c):
        sys, f, e_prev, e, it = c
        g = -f
        p = cg_solve(sys.x, g)
        # backtracking on the Newton step (min_hftn.cpp's step-length
        # safeguards collapse to this under exact Hvp)
        def bt_body(c2):
            step, _, k = c2
            e_try = energy(sys.x + step * p)
            ok = e_try <= e + 1e-4 * step * jnp.sum(g * p)
            return jnp.where(ok, step, step * 0.5), ok, k + 1

        def bt_cond(c2):
            step, ok, k = c2
            return (~ok) & (k < 20)

        step, _, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.asarray(1.0, dtype), jnp.zeros((), bool),
             jnp.zeros((), jnp.int32)))
        sys2 = sys.replace(x=sys.x + step * p)
        f2, e2 = compute(sys2)
        return sys2, f2, e, e2, it + 1

    init = (sys, f0, jnp.asarray(jnp.inf, dtype), e0,
            jnp.zeros((), jnp.int32))
    sys, f, e_prev, e, it = jax.lax.while_loop(outer_cond, outer_body,
                                               init)
    fnorm = jnp.sqrt(jnp.sum(f * f))
    return sys, e, it, (fnorm < ftol) | (it < maxiter)
