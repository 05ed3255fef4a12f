"""Multi-replica parallel tempering — the REPLICA package's ensemble axis.

The reference runs one replica per MPI partition (`-partition R`, universe.cpp)
and swaps thermostat temperatures between partition roots with point-to-point
MPI (REPLICA/temper.cpp:236-340).  TPU-native: ALL replicas live in one jit
program as a leading batch axis — `jax.vmap` of the single-replica chunk
runner (one compilation, R× the arithmetic feeding the same kernels, which is
exactly what the MXU wants at small N) — and the swap phase is O(R) host
bookkeeping between chunks.  On a multi-chip mesh the replica axis shards
trivially (each chip owns R/ndev replicas; swaps exchange scalars only).

Exact reference semantics preserved (temper.cpp):
  - nswaps = nsteps/nevery chunks of `nevery` MD steps (:221)
  - swap parity alternates (`which = iswap % 2`, :250) or is drawn from
    RanPark(seed_swap) when seed_swap != 0 (:251-252)
  - adjacent set-temps pair up; the LOWER world index decides (:286-290):
    boltz = (pe_me - pe_partner) * (1/kT_me - 1/kT_partner), accept if
    boltz >= 0 or uniform < exp(boltz), drawn from that world's
    RanPark(seed_boltz + world) stream warmed with 100 draws (:170-171)
  - on acceptance both replicas scale velocities by sqrt(T_new/T_old)
    ("a la Sugita", :352-360) and retarget their thermostat (:318-320)
  - per-swap status line: the set-temp index of each world (print_status)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.rng import RanPark


@dataclasses.dataclass
class TemperResult:
    sys: object            # stacked (R, ...) system pytree after the run
    world2temp: np.ndarray  # final set-temp index of each replica
    pe_trace: np.ndarray    # (nswaps, R) potential energies at swap points
    status: list            # per-swap world2temp snapshots
    accept: int             # accepted swaps
    attempt: int            # attempted swaps


def _stack(tree, r):
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (r,) + jnp.shape(a)) if a is not None
        else None, tree)


def temper_run(sim, temps, nsteps: int, nevery: int,
               seed_swap: int, seed_boltz: int, log=print):
    """Parallel tempering over len(temps) replicas of `sim` (a Simulation
    whose integrator is NVT — Temper::command demands a thermostatted fix,
    temper.cpp:120-128).  Replica r starts from the same configuration with
    velocities scaled to temps[r] from the base temperature."""
    from lidp_tpu.integrate.nvt import NVTParams

    runner = sim.runner
    if not isinstance(runner.integ.params, NVTParams):
        raise ValueError("temper requires an NVT-thermostatted simulation "
                         "(fix nvt) — temper.cpp:120")
    R = len(temps)
    temps = np.asarray(temps, float)
    boltz = sim.thermo_params.boltz

    sys0, res0, nlist0, istate0 = runner.setup(sim.sys)
    t_base = float(runner.integ.params.t_target)

    # ---- stack the replica axis ----
    sysR = _stack(sys0, R)
    resR = _stack(res0, R)
    nlistR = _stack(nlist0, R) if nlist0 is not None else None
    istateR = _stack(istate0, R)
    scale0 = jnp.sqrt(jnp.asarray(temps) / t_base)[:, None, None]
    sysR = sysR.replace(v=sysR.v * scale0.astype(sysR.v.dtype))
    ipR = _stack(runner.integ.params, R)
    ipR = dataclasses.replace(
        ipR, t_target=jnp.asarray(temps, ipR.t_target.dtype))

    chunk = functools.partial(
        _vchunk, initial=runner.integ.initial, final=runner.integ.final,
        neighbor_cfg=runner.neighbor_cfg, rebuild_every=runner.rebuild_every,
        post_force=runner.post_force, ff=runner.ff, nsteps=nevery)
    vrun = jax.jit(jax.vmap(chunk))

    rescale = jax.jit(lambda v, s: v * s[:, None, None].astype(v.dtype))

    # ---- reference RNG streams ----
    ranswap = RanPark(seed_swap) if seed_swap else None
    ranboltz = [RanPark(seed_boltz + w) for w in range(R)]
    for rb in ranboltz:
        for _ in range(100):
            rb.uniform()

    world2temp = np.arange(R)                 # my_set_temp per world
    temp2world = np.arange(R)
    nswaps = nsteps // nevery
    pe_trace = np.zeros((nswaps, R))
    status = [world2temp.copy()]
    log("Step " + " ".join(f"T{w}" for w in range(R)))
    log(f"{int(sys0.step)} " + " ".join(str(t) for t in world2temp))
    accept = attempt = 0

    for iswap in range(nswaps):
        sysR, resR, nlistR, istateR = vrun(sysR, resR, nlistR, istateR, ipR)
        pe = np.asarray(resR.pe, np.float64)       # (R,) extensive
        pe_trace[iswap] = pe

        if ranswap is None:
            which = iswap % 2
        else:
            which = 0 if ranswap.uniform() < 0.5 else 1

        scale = np.ones(R)
        new_w2t = world2temp.copy()
        for t in range(which, R - 1, 2):
            a, b = temp2world[t], temp2world[t + 1]
            lo, hi = (a, b) if a < b else (b, a)   # lower world index decides
            t_lo, t_hi = world2temp[lo], world2temp[hi]
            attempt += 1
            bf = (pe[lo] - pe[hi]) * (1.0 / (boltz * temps[t_lo])
                                      - 1.0 / (boltz * temps[t_hi]))
            swap = bf >= 0.0 or ranboltz[lo].uniform() < np.exp(bf)
            if swap:
                accept += 1
                scale[a] = np.sqrt(temps[t + 1] / temps[t])
                scale[b] = np.sqrt(temps[t] / temps[t + 1])
                new_w2t[a], new_w2t[b] = t + 1, t
        world2temp = new_w2t
        temp2world = np.argsort(world2temp)
        if not np.all(scale == 1.0):
            sysR = sysR.replace(v=rescale(sysR.v, jnp.asarray(scale)))
            ipR = dataclasses.replace(
                ipR, t_target=jnp.asarray(temps[world2temp],
                                          ipR.t_target.dtype))
        status.append(world2temp.copy())
        log(f"{int(np.asarray(sysR.step)[0])} "
            + " ".join(str(t) for t in world2temp))

    return TemperResult(sys=sysR, world2temp=world2temp, pe_trace=pe_trace,
                        status=status, accept=accept, attempt=attempt)


def _vchunk(sys, res, nlist, istate, iparams, *, ff, nsteps, initial, final,
            neighbor_cfg, rebuild_every, post_force):
    from lidp_tpu.integrate.driver import _run_chunk

    return _run_chunk(sys, res, nlist, istate, ff, iparams, nsteps=nsteps,
                      initial=initial, final=final, neighbor_cfg=neighbor_cfg,
                      rebuild_every=rebuild_every, post_force=post_force)


# ---------------------------------------------------------------------------
# NEB — nudged elastic band (REPLICA/neb.cpp + fix_neb.cpp)


def neb_run(sim, x_final, nreplicas: int, kspring: float,
            etol: float, ftol: float, n1: int, n2: int, log=print,
            gmask=None):
    """Minimum-energy path between the current configuration and x_final.

    The reference runs one replica per partition with inter-replica springs
    (fix_neb.cpp) and climbs the top image in phase 2 (neb.cpp run);
    here the whole band is one (M, N, 3) batch relaxed jointly with FIRE:

      * improved tangent (Henkelman-Jonsson; fix_neb.cpp tangent logic):
        forward/backward difference picked by the neighbor energies, energy-
        weighted mix at extrema;
      * interior replicas: F = F_perp + kspring (|d+| - |d-|) tau;
      * endpoints relax freely (they sit in their basins);
      * phase 2 (n2 iterations): the highest-energy replica switches to the
        climbing force F - 2 (F . tau) tau.

    Returns (X (M,N,3), energies (M,), barrier)."""
    import jax
    import jax.numpy as jnp

    from lidp_tpu.forcefield import compute_forces

    ff = sim.runner.ff
    sys0 = sim.sys
    M = nreplicas
    lam = jnp.linspace(0.0, 1.0, M)
    xf = jnp.asarray(x_final, sys0.x.dtype)
    X = sys0.x[None] + lam[:, None, None] * (xf - sys0.x)[None]

    gm = (jnp.asarray(gmask, bool)[:, None] if gmask is not None
          else None)

    def fe(x):
        res = compute_forces(sys0.replace(x=x), ff)
        f = res.f
        if gm is not None:
            # atoms outside the neb group are held (the reference pins the
            # frame with fix setforce; the band only moves the group)
            f = jnp.where(gm, f, 0.0)
        return f, res.pe

    v_fe = jax.vmap(fe)

    def neb_forces(X, climbing):
        F, E = v_fe(X)
        dp = X[2:] - X[1:-1]          # (M-2,N,3) forward diffs for interior
        dm = X[1:-1] - X[:-2]
        Eh, Ei, El = E[2:], E[1:-1], E[:-2]
        up = (Eh > Ei) & (Ei > El)
        dn = (Eh < Ei) & (Ei < El)
        demax = jnp.maximum(jnp.abs(Eh - Ei), jnp.abs(El - Ei))
        demin = jnp.minimum(jnp.abs(Eh - Ei), jnp.abs(El - Ei))
        wmix_p = jnp.where(Eh > El, demax, demin)
        wmix_m = jnp.where(Eh > El, demin, demax)
        tau = jnp.where(up[:, None, None], dp,
                        jnp.where(dn[:, None, None], dm,
                                  dp * wmix_p[:, None, None]
                                  + dm * wmix_m[:, None, None]))
        tnorm = jnp.sqrt(jnp.sum(tau * tau, axis=(1, 2)))[:, None, None]
        tau = tau / jnp.where(tnorm > 0, tnorm, 1.0)
        Fint = F[1:-1]
        fdott = jnp.sum(Fint * tau, axis=(1, 2))[:, None, None]
        dplen = jnp.sqrt(jnp.sum(dp * dp, axis=(1, 2)))
        dmlen = jnp.sqrt(jnp.sum(dm * dm, axis=(1, 2)))
        fneb = (Fint - fdott * tau
                + (kspring * (dplen - dmlen))[:, None, None] * tau)
        # climbing image: highest-energy interior replica inverts the
        # parallel component (neb.cpp phase 2)
        top = jnp.argmax(Ei)
        fclimb = Fint - 2.0 * fdott * tau
        sel = (jnp.arange(M - 2) == top)[:, None, None] & climbing
        fneb = jnp.where(sel, fclimb, fneb)
        Fout = jnp.concatenate([F[:1], fneb, F[-1:]], axis=0)
        return Fout, E

    def fire_phase(X, climbing, maxiter):
        dt0, dtmax, alpha0 = 0.02, 0.2, 0.1

        def cond(c):
            X, V, F, E, e_prev, dt, alpha, npos, it = c
            fmax = jnp.max(jnp.abs(F))
            de = jnp.abs(jnp.sum(E) - e_prev)
            f_ok = (ftol > 0) & (fmax < ftol)
            e_ok = (etol > 0) & (de < etol * (jnp.abs(jnp.sum(E)) + 1e-30))
            return (~(f_ok | e_ok)) & (it < maxiter)

        def body(c):
            X, V, F, E, e_prev, dt, alpha, npos, it = c
            p = jnp.sum(F * V)
            fn = jnp.sqrt(jnp.sum(F * F)) + 1e-30
            vn = jnp.sqrt(jnp.sum(V * V))
            V = jnp.where(p > 0, (1 - alpha) * V + alpha * F / fn * vn,
                          jnp.zeros_like(V))
            grow = (p > 0) & (npos > 5)
            dt = jnp.where(grow, jnp.minimum(dt * 1.1, dtmax),
                           jnp.where(p <= 0, dt * 0.5, dt))
            alpha = jnp.where(grow, alpha * 0.99,
                              jnp.where(p <= 0, alpha0, alpha))
            npos = jnp.where(p <= 0, 0, npos + 1)
            V = V + dt * F
            X2 = X + dt * V
            F2, E2 = neb_forces(X2, climbing)
            return (X2, V, F2, E2, jnp.sum(E), dt, alpha, npos, it + 1)

        F0, E0 = neb_forces(X, climbing)
        init = (X, jnp.zeros_like(X), F0, E0,
                jnp.asarray(jnp.inf, X.dtype), jnp.asarray(dt0, X.dtype),
                jnp.asarray(alpha0, X.dtype), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))
        X, V, F, E, e_prev, dt, alpha, npos, it = jax.lax.while_loop(
            cond, body, init)
        return X, E, it

    phase = jax.jit(fire_phase, static_argnames=())
    X, E, it1 = phase(X, jnp.asarray(False), n1)
    X, E, it2 = phase(X, jnp.asarray(True), n2)
    E = jax.device_get(E)
    barrier = float(E.max() - E[0])
    log(f"# NEB: {int(it1)}+{int(it2)} iterations, "
        f"barrier = {barrier:.8g}")
    log("# NEB MEP energies: " + " ".join(f"{e:.8g}" for e in E))
    return X, E, barrier


# ---------------------------------------------------------------------------
# PRD — parallel replica dynamics (REPLICA/prd.cpp)


def prd_run(sim, nreplicas: int, nsegments: int, t_event: int,
            t_dephase: int, temp: float, threshold: float, seed: int,
            gmask=None, log=print, quench_iters: int = 200):
    """Rare-event dynamics over a replica batch (REPLICA/prd.cpp).

    Each segment: (1) dephase — every replica draws fresh Maxwell
    velocities and runs t_dephase NVE steps; (2) run t_event NVE steps;
    (3) quench each replica (FIRE) and compare against the quenched
    reference minimum (the `compute event/displace` criterion,
    compute_event_displace.cpp): an event is any atom displaced more than
    `threshold`.  On an event, the first event replica becomes the new
    state and the reference minimum is re-quenched.  The hyper-time clock
    advances nreplicas * t_event per segment — the PRD boost.

    Simplifications vs prd.cpp: the clock adds full segments (the
    reference bisects to the first event step) and there is no correlated
    -event re-run; both affect time resolution, not the event sequence.

    Returns dict(events, hyper_steps, md_steps, boost)."""
    import jax
    import jax.numpy as jnp

    from lidp_tpu.forcefield import compute_forces

    ff = sim.runner.ff
    sys0 = sim.sys
    M = nreplicas
    dtype = sys0.x.dtype
    mass = jnp.asarray(sim.thermo_params.mass_atom, dtype)
    dt = jnp.asarray(sim.script.dt, dtype)
    u = sim.script.units
    gm = (jnp.asarray(gmask, bool) if gmask is not None
          else jnp.ones(sys0.x.shape[0], bool))

    def force(x):
        f = compute_forces(sys0.replace(x=x), ff).f
        return jnp.where(gm[:, None], f, 0.0)

    def pe(x):
        return compute_forces(sys0.replace(x=x), ff).pe

    minv = jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0),
                     0.0)[:, None]

    def nve_steps(x, v, n):
        def body(c, _):
            x, v, f = c
            v = v + 0.5 * dt * minv * f
            x = x + dt * v
            f2 = force(x)
            v = v + 0.5 * dt * minv * f2
            return (x, v, f2), None

        (x, v, f), _ = jax.lax.scan(body, (x, v, force(x)), None, length=n)
        return x, v

    def quench(x):
        # damped-dynamics minimization (the reference quenches with
        # min_style quickmin); fixed iteration budget keeps it jittable
        def body(c, _):
            x, v, f = c
            p = jnp.sum(f * v)
            v = jnp.where(p > 0, v, jnp.zeros_like(v))
            v = v + 0.02 * f * minv
            x = x + 0.02 * v
            return (x, v, force(x)), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), force(x)), None,
            length=quench_iters)
        return x

    v_nve = jax.jit(jax.vmap(nve_steps, in_axes=(0, 0, None)),
                    static_argnums=(2,))
    v_quench = jax.jit(jax.vmap(quench))

    def maxwell(key):
        sigma = jnp.sqrt(u.boltz * temp / (mass * u.mvv2e))[:, None]
        v = sigma * jax.random.normal(key, sys0.x.shape, dtype)
        return jnp.where(gm[:, None], v, 0.0)

    x_min = jax.jit(quench)(sys0.x)
    X = jnp.broadcast_to(sys0.x, (M,) + sys0.x.shape)
    key = jax.random.PRNGKey(seed)

    events = []
    md_steps = 0
    hyper = 0
    for seg in range(nsegments):
        key, *ks = jax.random.split(key, M + 1)
        V = jnp.stack([maxwell(k) for k in ks])
        X, V = v_nve(X, V, t_dephase)
        X, V = v_nve(X, V, t_event)
        md_steps += M * (t_dephase + t_event)
        hyper += M * t_event
        Q = v_quench(X)
        disp = jnp.sqrt(jnp.max(jnp.sum((Q - x_min[None]) ** 2, axis=-1),
                                axis=-1))
        ev = np.asarray(disp > threshold)
        if ev.any():
            w = int(np.argmax(ev))
            events.append(dict(segment=seg, replica=w,
                               hyper_steps=hyper,
                               displacement=float(disp[w])))
            log(f"# PRD event: segment {seg} replica {w} "
                f"disp {float(disp[w]):.4g} hyper t = {hyper}")
            x_new = X[w]
            x_min = Q[w]
            X = jnp.broadcast_to(x_new, (M,) + x_new.shape)
    boost = hyper / max(1, md_steps // M)
    return dict(events=events, hyper_steps=hyper, md_steps=md_steps,
                boost=boost)


# ---------------------------------------------------------------------------
# TAD — temperature-accelerated dynamics (REPLICA/tad.cpp)


def tad_run(sim, nsegments: int, t_event: int, t_dephase: int,
            t_hi: float, t_lo: float, delta: float, threshold: float,
            seed: int, gmask=None, log=print, neb_replicas: int = 8,
            kspring: float = 1.0):
    """High-temperature MD with Arrhenius extrapolation (REPLICA/tad.cpp).

    One trajectory runs at T_hi; every detected event (quenched
    displacement > threshold, as in PRD) gets its barrier E_b from an NEB
    between the quenched basins, and its waiting time extrapolates to the
    low temperature as  t_lo = t_hi_event * exp(E_b (1/kT_lo - 1/kT_hi)).
    The accepted transition is the one with the SHORTEST extrapolated
    low-T time once the stopping criterion t_hi_elapsed >
    (t_lo_min * (T_lo/T_hi))**(T_hi/T_lo) * delta is met (the reference's
    confidence bound with delta folding in ln(1/uncertainty)).

    Simplification vs tad.cpp: events beyond the first per segment are
    ignored and the dynamics continues from the event state (no basin
    re-entry enforcement).

    Returns dict(events=[{segment, barrier, t_hi, t_lo}], accepted)."""
    import jax
    import jax.numpy as jnp

    from lidp_tpu.forcefield import compute_forces

    u = sim.script.units
    beta_lo = 1.0 / (u.boltz * t_lo)
    beta_hi = 1.0 / (u.boltz * t_hi)

    # reuse the PRD machinery with a single replica at T_hi
    sys0 = sim.sys
    gm = (jnp.asarray(gmask, bool) if gmask is not None
          else jnp.ones(sys0.x.shape[0], bool))
    ff = sim.runner.ff
    mass = jnp.asarray(sim.thermo_params.mass_atom, sys0.x.dtype)
    dt = jnp.asarray(sim.script.dt, sys0.x.dtype)
    minv = jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0),
                     0.0)[:, None]

    def force(x):
        f = compute_forces(sys0.replace(x=x), ff).f
        return jnp.where(gm[:, None], f, 0.0)

    def pe(x):
        return compute_forces(sys0.replace(x=x), ff).pe

    def nve_steps(x, v, n):
        def body(c, _):
            x, v, f = c
            v = v + 0.5 * dt * minv * f
            x = x + dt * v
            f2 = force(x)
            v = v + 0.5 * dt * minv * f2
            return (x, v, f2), None

        (x, v, f), _ = jax.lax.scan(body, (x, v, force(x)), None, length=n)
        return x, v

    def quench(x, iters=300):
        def body(c, _):
            x, v, f = c
            p = jnp.sum(f * v)
            v = jnp.where(p > 0, v, jnp.zeros_like(v))
            v = v + 0.02 * f * minv
            x = x + 0.02 * v
            return (x, v, force(x)), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), force(x)), None, length=iters)
        return x

    j_nve = jax.jit(nve_steps, static_argnums=(2,))
    j_quench = jax.jit(quench)

    def maxwell(key):
        sigma = jnp.sqrt(u.boltz * t_hi / (mass * u.mvv2e))[:, None]
        v = sigma * jax.random.normal(key, sys0.x.shape, sys0.x.dtype)
        return jnp.where(gm[:, None], v, 0.0)

    x = sys0.x
    x_min = j_quench(x)
    e_min = float(pe(x_min))
    key = jax.random.PRNGKey(seed)
    events = []
    t_hi_elapsed = 0
    accepted = None
    for seg in range(nsegments):
        key, k1 = jax.random.split(key)
        x, v = j_nve(x, maxwell(k1), t_dephase)
        x, v = j_nve(x, v, t_event)
        t_hi_elapsed += t_event
        q = j_quench(x)
        disp = float(jnp.sqrt(jnp.max(jnp.sum((q - x_min) ** 2, -1))))
        if disp > threshold:
            # barrier via NEB between the two quenched basins
            saved_x = sim.sys.x
            sim.sys = sim.sys.replace(x=x_min)
            _, E, barrier = neb_run(sim, q, neb_replicas, kspring,
                                    0.0, 1e-5, 1000, 1000,
                                    log=lambda *a: None,
                                    gmask=None if gm.all() else gm)
            sim.sys = sim.sys.replace(x=saved_x)
            t_lo_ev = t_hi_elapsed * float(
                np.exp(barrier * (beta_lo - beta_hi)))
            events.append(dict(segment=seg, barrier=float(barrier),
                               t_hi=t_hi_elapsed, t_lo=t_lo_ev,
                               displacement=disp))
            log(f"# TAD event: seg {seg} barrier {barrier:.4g} "
                f"t_hi {t_hi_elapsed} -> t_lo {t_lo_ev:.4g}")
            x_min = q
            e_min = float(pe(q))
        if events:
            t_lo_min = min(ev["t_lo"] for ev in events)
            t_stop = t_lo_min * (t_lo / t_hi) * delta
            if t_hi_elapsed >= t_stop:
                accepted = min(events, key=lambda ev: ev["t_lo"])
                break
    return dict(events=events, accepted=accepted,
                t_hi_elapsed=t_hi_elapsed)
