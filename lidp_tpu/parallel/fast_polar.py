"""Production fast path for the polarizable pair style at scale.

The script engine's generic polarization path materializes the dense
(N,3,N,3) dipole interaction tensor (ops/polarization.py
dipole_field_tensor) — fine up to the few-thousand-atom examples the
reference ships, impossible at the 100k-atom production sizes
(BASELINE.json config 5).  This module routes the SAME script-driven
simulation (fix rigid/nve + thermo + dump all intact) through the
matrix-free panel engine of parallel/shard.py:

  * f32 (speed mode) and CPU parity runs: the whole MD chunk is ONE
    jitted lax.scan — integrator (nve or rigid/nve), Pallas/column-chunk
    O(N^2) panels, device CG SCF — mirroring integrate/driver.py
    _run_chunk with the panel force evaluation in place of
    forcefield.compute_forces.
  * f64 on a real TPU (the reference's own `polar_precision 1e-11`
    regime): host-driven phase dispatches (the axon tunnel enforces a
    per-dispatch execution deadline, and Mosaic has no native f64), with
    the df32 double-float kernels (ops/pallas_panel.py *_df) for the
    O(N^2) passes and mixed-precision iterative-refinement CG — the same
    math as models/polar_bench.py host_cg_step, now productized and
    composed with the integrator fixes.

Reference behavior being replicated: the polarization examples all run
`fix rigid/nve` through Verlet::run with the pair style's SCF each step
(pair_lj_cut_coul_long_polarization.cpp:125-645 compute;
RIGID/fix_rigid.cpp:891,1011 initial/final integrate).  The reference is
O(N^2)-serial and single-rank-only there; this engine is the TPU-native
replacement.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

DENSE_PATH_MAX_ATOMS = 4096     # mirror of sim.DENSE_PATH_MAX_ATOMS
_COL_CHUNK = 4096


def _env_mode() -> str:
    """LIDP_FAST_POLAR: "0" disables, "1" forces (any size), unset = auto."""
    return os.environ.get("LIDP_FAST_POLAR", "")


def prescan(script, n: int) -> bool:
    """Cheap eligibility check usable BEFORE from_script builds anything —
    decides whether the atom axis should be padded to the panel alignment.
    Conservative: every condition the force/integrator composition needs
    that is visible on the raw script."""
    if _env_mode() == "0":
        return False
    p = getattr(script, "pair", None)
    if p is None or not str(getattr(p, "name", "")).endswith(
            "/polarization"):
        return False
    if not (n > DENSE_PATH_MAX_ATOMS or _env_mode() == "1"):
        return False
    ks = getattr(script, "kspace", None)
    if ks is not None and not str(ks[0]).startswith("ewald"):
        return False
    tilt = getattr(script, "box_tilt", None)
    if tilt is not None and np.any(np.asarray(tilt) != 0.0):
        return False
    if not all(getattr(script, "periodic", (True, True, True))):
        return False
    # integration fixes the panel engine composes with; anything else
    # (thermostats, constraints, walls, ...) falls back to the dense path
    for f in getattr(script, "fixes", {}).values():
        if f.style not in ("nve", "rigid/nve", "rigid/nve/small"):
            return False
    # bonded force terms are outside the panel engine (special-bond pair
    # exclusions ARE handled, via the sparse correction pass)
    if getattr(script, "bond_style", None) not in (None, "zero"):
        return False
    for attr in ("angle_style", "dihedral_style", "improper_style"):
        if getattr(script, attr, None) not in (None, "zero"):
            return False
    if getattr(script, "neigh_exclude_types", None):
        return False
    if int(getattr(script, "n_shard_devices", 0) or 0) > 1:
        return False        # GSPMD script sharding keeps its own padding
    return True


def aligned_npad(n: int) -> int:
    from lidp_tpu.parallel.shard import _pad_and_chunk

    npad, _, _ = _pad_and_chunk(n, 1, _COL_CHUNK)
    return npad


# --------------------------------------------------------------------------
# host-driven force + SCF evaluation (shared with models/polar_bench.py)
# --------------------------------------------------------------------------


class HostPolarForces:
    """Host-driven per-phase force evaluation with build-once jitted
    closures (a fresh jax.jit per MD step would re-trace the inner-CG
    program every step).

    phases: dict from shard.build_sharded_polar_step make.host_phases().
    Returns (f, mu, energies) per call; energies carries evdwl/ecoul/
    elong/epol/virial/scf_iters like shard._forces.
    """

    def __init__(self, phases: dict, settings, natoms: int, *,
                 mixed: bool = False, use_df: Optional[bool] = None,
                 timing: bool = False):
        import jax
        import jax.numpy as jnp

        self.ph = phases
        self.s = settings
        self.natoms = natoms
        self.mixed = mixed
        self.timing = timing or bool(
            int(os.environ.get("LIDP_PHASE_TIMING", "0")))
        if use_df is None:
            use_df = (jax.default_backend() in ("tpu", "axon")
                      and "pair_df" in phases
                      and not int(os.environ.get("LIDP_NO_DF", "0")))
        self.use_df = use_df
        self._jnp = jnp
        self._jax = jax
        self._build_inner_cg()

    # -- build-once jitted helpers ---------------------------------------
    def _build_inner_cg(self):
        jax = self._jax
        jnp = self._jnp
        ph = self.ph
        if not (self.mixed and "eind32_full" in ph):
            self._inner_cg_device = None
            return
        eind32 = ph["eind32_full"]

        @jax.jit
        def inner_cg_device(r064, x32, alpha32, mask_, sa32):
            """Whole inner f32 CG as ONE dispatch (lax.while_loop around the
            Pallas panel matvec); see models/polar_bench.py host_cg_step."""
            r0 = r064.astype(jnp.float32)

            def B32j(y_):
                out = eind32(x32, alpha32, mask_, sa32 * y_)
                return y_ + sa32 * (-out)

            rs0 = jnp.sum(r0 * r0)

            def cond(c):
                _, rr, _, rs_, k, alive = c
                return alive & (k < 60) & (rs_ > 1e-12 * (rs0 + 1e-30))

            def body(c):
                d, rr, pp, rs_, k, alive = c
                Bp = B32j(pp)
                den = jnp.sum(pp * Bp)
                al = rs_ / jnp.where(den != 0, den, 1.0)
                d2 = d + al * pp
                rr2 = rr - al * Bp
                rs2_ = jnp.sum(rr2 * rr2)
                ok = jnp.isfinite(rs2_) & (rs2_ < 0.999 * rs_)
                pp2 = rr2 + (rs2_ / jnp.where(rs_ != 0, rs_, 1.0)) * pp
                return (d2, rr2, pp2, jnp.where(ok, rs2_, rs_),
                        k + 1, alive & ok)

            d, rr, pp, rs_, k, alive = jax.lax.while_loop(
                cond, body,
                (jnp.zeros_like(r0), r0, r0, rs0,
                 jnp.zeros((), jnp.int32), jnp.asarray(True)))
            return d.astype(r064.dtype), k

        self._inner_cg_device = inner_cg_device

    # -- phase helpers ----------------------------------------------------
    def _striped(self, fn, *args):
        jax, jnp = self._jax, self._jnp
        S = self.ph.get("strips", 1)
        if S == 1:
            return fn(*args)
        npad = int(args[0].shape[0])
        ns = npad // S
        outs = []
        for si in range(S):
            o = fn(jnp.asarray(si * ns, jnp.int32), *args)
            jax.block_until_ready(o)    # one strip per dispatch
            outs.append(o)
        if not isinstance(outs[0], tuple):
            return jnp.concatenate(outs, axis=0)
        merged = []
        for leaf in zip(*outs):
            if leaf[0].ndim and leaf[0].shape[0] == ns:
                merged.append(jnp.concatenate(leaf, axis=0))
            else:
                merged.append(sum(leaf[1:], leaf[0]))
        return tuple(merged)

    def _tick_factory(self):
        import time as _time
        if not self.timing:
            return lambda label, *sync: None
        jax = self._jax
        t = {"last": _time.perf_counter()}

        def _tick(label, *sync):
            for o in sync:
                jax.block_until_ready(o)
            now = _time.perf_counter()
            print(f"  phase {label:12s} {now - t['last']:7.2f} s",
                  flush=True)
            t["last"] = now
        return _tick

    # -- the evaluation ---------------------------------------------------
    def __call__(self, x, q, typ, mol, alpha, mu_prev, mask):
        """One full force + SCF evaluation at positions x.  Mirrors
        shard._forces, host-driven per phase."""
        jnp = self._jnp
        jax = self._jax
        ph = self.ph
        s = self.s
        use_df = self.use_df
        _tick = self._tick_factory()

        e0 = None
        if "ewald_kblock" in ph:
            if use_df and "pair_wolf_df" in ph:
                # fused pair + Wolf field: one df32 geometry pass serves
                # both pre-SCF O(N^2) phases
                f, evdwl, ecoul, elong, vir, e0 = ph["pair_wolf_df"](
                    x, q, typ, mol, mask)
            elif use_df:
                f, evdwl, ecoul, elong, vir = ph["pair_df"](x, q, typ, mask)
            else:
                f, evdwl, ecoul, elong, vir = self._striped(
                    ph["pair_real"], x, q, typ, mask)
            _tick("pair_real", f)
            hv, kc, kv = ph["ewald_tables"]
            Kk = hv.shape[0]
            kb = max(128, min(Kk, 13_000_000 // max(int(x.shape[0]), 1)))
            kb = -(-kb // 128) * 128
            e_k = jnp.zeros((), x.dtype)
            vk = jnp.zeros((6,), x.dtype)
            for k0 in range(0, Kk, kb):
                blk = slice(k0, min(k0 + kb, Kk))
                hvb = np.zeros((kb, 3)); hvb[:blk.stop - k0] = hv[blk]
                kcb = np.zeros((kb,)); kcb[:blk.stop - k0] = kc[blk]
                kvb = np.zeros((kb, 6)); kvb[:blk.stop - k0] = kv[blk]
                fb, eb, vb = ph["ewald_kblock"](
                    x, q, jnp.asarray(hvb, x.dtype),
                    jnp.asarray(kcb, x.dtype), jnp.asarray(kvb, x.dtype))
                jax.block_until_ready(fb)
                f = f + fb
                e_k = e_k + eb
                vk = vk + vb
            elong = e_k - ph["ewald_eself"]()
            vir = vir + vk
            _tick("ewald_k", f)
        else:
            f, evdwl, ecoul, elong, vir = ph["nonpolar"](x, q, typ, mask)
            _tick("nonpolar", f)
        if e0 is None:
            e0 = self._striped(ph["wolf"], x, q, mol, mask)
            _tick("wolf", e0)

        # --- host-driven CG (ops/polarization.py scf_solve_cg math) ---
        sa = jnp.sqrt(alpha)[:, None]
        eind = ph["eind"]

        if use_df and "eind_df" in ph:
            def B(y):
                return y + sa * (-ph["eind_df"](x, alpha, mask, sa * y))
        else:
            def B(y):
                return y + sa * (-self._striped(eind, x, alpha, mask,
                                                sa * y))

        b = sa * e0
        if s.use_previous:
            y = jnp.where(sa > 0, mu_prev / jnp.where(sa > 0, sa, 1.0), 0.0)
        else:
            y = s.polar_gamma * sa * e0
        prec2 = float(s.polar_precision) ** 2
        n3 = 3.0 * self.natoms
        if self._inner_cg_device is not None:
            x32 = x.astype(jnp.float32)
            alpha32 = alpha.astype(jnp.float32)
            sa32 = sa.astype(jnp.float32)
            it = 0
            change = float("inf")
            outer = 0
            while outer < 8 and not (change <= prec2):
                r = b - B(y)           # ONE f64 panel pass per refinement
                _tick("eind_f64", r)
                outer += 1
                it += 1
                d, k = self._inner_cg_device(r, x32, alpha32, mask, sa32)
                _tick("inner_cg", d)
                it += int(k) + 1
                change = float(jnp.sum((d * sa) ** 2)) / n3
                y = y + d
            converged = change <= prec2
        else:
            r = b - B(y)
            p = r
            rs = float(jnp.sum(r * r))
            rs0 = float(jnp.sum(b * b)) + 1e-30
            change = float("inf")
            it = 0
            while not (change <= prec2) and it < s.iterations_max:
                Bp = B(p)
                denom = float(jnp.sum(p * Bp))
                alpha_cg = rs / (denom if denom != 0 else 1.0)
                y = y + alpha_cg * p
                r = r - alpha_cg * Bp
                rs2 = float(jnp.sum(r * r))
                beta = rs2 / (rs if rs != 0 else 1.0)
                change = float(jnp.sum((alpha_cg * p * sa) ** 2)) / n3
                p = r + beta * p
                rs = rs2
                it += 1
            converged = (change <= prec2) or (rs <= 1e-5 * rs0)
        mu = sa * y
        if not converged:
            mu = alpha[:, None] * e0     # reference divergence fallback
        _tick("cg_rest", mu)
        if use_df and "dipole_df" in ph:
            fpol, epol, vir_pol = ph["dipole_df"](x, q, mol, alpha, mu,
                                                  mask)
        else:
            fpol, epol, vir_pol = self._striped(
                ph["dipole"], x, q, mol, alpha, mu, mask)
        _tick("dipole", fpol)
        f = f + fpol
        en = dict(evdwl=evdwl, ecoul=ecoul, elong=elong, epol=epol,
                  virial=vir + vir_pol,
                  scf_iters=self._jnp.asarray(it, np.int32),
                  scf_converged=converged)
        return f, mu, en


# --------------------------------------------------------------------------
# the runner
# --------------------------------------------------------------------------


class FastPolarRunner:
    """Drop-in Runner replacement (same setup/run interface as
    integrate/driver.py Runner) that evaluates forces through the panel
    engine.  Composes with the script's integrator fixes (nve /
    rigid/nve) and leaves every host-side subsystem — thermo, dumps,
    computes, restart — untouched."""

    def __init__(self, inner, *, ff, pol, n: int, npad: int, dt: float,
                 ftm2v: float, box_lo, box_lengths, sp_lists=None,
                 dtype=None, log=None):
        import jax
        import jax.numpy as jnp

        from lidp_tpu.parallel import shard as pshard

        self._inner = inner
        self.ff = ff
        self.natoms = n
        self._log = log or (lambda *a: None)
        if dtype is None:
            dtype = jnp.float32

        uniform_cut = self._uniform_cutoff(ff.pair)
        panel = "auto" if uniform_cut else "scan"
        make, bind_box, npad_built, bind_special = \
            pshard.build_sharded_polar_step(
                None, ff, pol, n=n, dt=dt, ftm2v=ftm2v,
                col_chunk=_COL_CHUNK, dtype=dtype, panel=panel)
        if npad_built != npad:
            raise ValueError(
                f"fast-polar padding mismatch: sim npad {npad} != panel "
                f"npad {npad_built}")
        # frozen stored-coordinate shift for the polar fdotr virial (the
        # reference's wrap-at-read_data convention; sim.py polar_xshift)
        xsh = getattr(ff, "polar_xshift", None)
        bind_box(box_lengths,
                 xshift=None if xsh is None else np.asarray(xsh))
        if sp_lists is not None:
            bind_special(*sp_lists)
        self._forces_raw = make.forces
        self._lo = jnp.asarray(box_lo, dtype)

        backend = jax.default_backend()
        self.mode = ("host" if (dtype == jnp.float64
                                and backend in ("tpu", "axon"))
                     else "fused")
        mode_env = os.environ.get("LIDP_FAST_POLAR_MODE", "")
        if mode_env in ("host", "fused"):
            self.mode = mode_env
        if self.mode == "host":
            # strip count: keep each O(N^2) fallback phase dispatch under
            # the axon execution deadline (df kernels are full-row)
            strips = 1
            if npad > 32768:
                strips = 8
            while npad % strips:
                strips //= 2
            phases = make.host_phases(strips=max(1, strips))
            self._hpf = HostPolarForces(phases, pol, n, mixed=True)
            self._pre = jax.jit(self._pre_impl)
            self._post = jax.jit(self._post_impl)
        else:
            self._scan = jax.jit(self._chunk, static_argnames=("nsteps",))
        self._setup_jit = jax.jit(self._setup_impl)

    @staticmethod
    def _uniform_cutoff(pair) -> bool:
        cq = np.asarray(pair.cutsq)[1:, 1:]
        return bool(np.all((cq == cq.max()) | (cq == 0.0)))

    # everything the fast path doesn't own is served by the inner Runner
    def __getattr__(self, name):
        return getattr(self._inner, name)

    # -- force evaluation -------------------------------------------------
    def _fast_res(self, sys):
        import jax.numpy as jnp

        from lidp_tpu.forcefield import ForceResult

        f, mu, en = self._forces_raw(
            sys.x - self._lo, sys.q, sys.type, sys.mol, sys.alpha,
            sys.mu, sys.mask)
        zero = jnp.zeros((), sys.x.dtype)
        return ForceResult(
            f=f, evdwl=en["evdwl"], ecoul=en["ecoul"], elong=en["elong"],
            epol=en["epol"], ebond=zero, virial=en["virial"], mu=mu,
            scf_iters=en["scf_iters"],
            scf_diverged=jnp.zeros((), bool))

    def _host_res(self, sys):
        import jax.numpy as jnp

        from lidp_tpu.forcefield import ForceResult

        x = sys.x - self._lo
        f, mu, en = self._hpf(x, sys.q, sys.type, sys.mol, sys.alpha,
                              sys.mu, sys.mask)
        zero = jnp.zeros((), sys.x.dtype)
        return ForceResult(
            f=f, evdwl=en["evdwl"], ecoul=en["ecoul"], elong=en["elong"],
            epol=en["epol"], ebond=zero, virial=en["virial"], mu=mu,
            scf_iters=en["scf_iters"],
            scf_diverged=jnp.asarray(not en["scf_converged"]))

    # -- fused-mode chunk --------------------------------------------------
    def _chunk(self, sys, res, istate, iparams, *, nsteps):
        import jax

        initial = self._inner.integ.initial
        final = self._inner.integ.final

        def body(carry, _):
            sys, res, istate = carry
            sys, istate = initial(sys, res, iparams, istate)
            sys = sys.replace(step=sys.step + 1)
            res = self._fast_res(sys)
            sys = sys.replace(mu=res.mu)
            sys, istate = final(sys, res, iparams, istate)
            return (sys, res, istate), None

        (sys, res, istate), _ = jax.lax.scan(
            body, (sys, res, istate), None, length=nsteps)
        return sys, res, istate

    # -- host-mode single step --------------------------------------------
    def _pre_impl(self, sys, res, iparams, istate):
        sys, istate = self._inner.integ.initial(sys, res, iparams, istate)
        return sys.replace(step=sys.step + 1), istate

    def _post_impl(self, sys, res, iparams, istate):
        sys = sys.replace(mu=res.mu)
        return self._inner.integ.final(sys, res, iparams, istate)

    # -- Runner interface --------------------------------------------------
    def setup(self, sys):
        res = (self._host_res(sys) if self.mode == "host"
               else self._setup_jit(sys))
        sys = sys.replace(mu=res.mu)
        integ = self._inner.integ
        if integ.init_state_res is not None:
            sys, istate = integ.init_state_res(sys, res, integ.params)
        else:
            sys, istate = integ.init_state(sys, res.f, integ.params)
        return sys, res, None, istate

    def _setup_impl(self, sys):
        return self._fast_res(sys)

    # dipole-history extrapolation coefficients for the SCF initial guess
    # (Lagrange through the last p converged dipole sets; rows sum to 1 so
    # a cold replicated history reduces to plain warm start).  CG still
    # iterates to the UNCHANGED convergence criterion — the predictor only
    # moves the starting point (cf. Kolafa ASPC, J Comput Chem 25:335).
    _PREDICT_COEF = {1: (1.0,), 2: (2.0, -1.0), 3: (3.0, -3.0, 1.0)}

    def run(self, sys, res, nlist, istate, nsteps: int):
        ip = self._inner.integ.params
        if self.mode == "host":
            order = int(os.environ.get("LIDP_PREDICT", "2"))
            coef = self._PREDICT_COEF.get(order, (1.0,))
            hist = getattr(self, "_mu_hist", None)
            for _ in range(nsteps):
                sys, istate = self._pre(sys, res, ip, istate)
                if hist is not None and len(hist) == len(coef):
                    guess = sum(c * h for c, h in zip(coef, hist))
                    sys = sys.replace(mu=guess)
                res = self._host_res(sys)
                sys = sys.replace(mu=res.mu)
                hist = ([res.mu] + (hist or [res.mu] * len(coef)))[
                    :len(coef)]
                sys, istate = self._post(sys, res, ip, istate)
            self._mu_hist = hist
            return sys, res, None, istate
        sys, res, istate = self._scan(sys, res, istate, ip, nsteps=nsteps)
        return sys, res, None, istate


def maybe_attach(runner, *, script, ff, pol, sys, n, npad, dt, ftm2v,
                 dtype, sp_lists=None, log=None):
    """Final eligibility gate (runs after from_script assembled the real
    Runner).  Returns a FastPolarRunner or None."""
    if pol is None or not prescan(script, n):
        return None
    # composition limits: the panel engine owns the whole force evaluation
    if (runner.post_force is not None or runner.post_integrate is not None
            or runner.end_of_step is not None or runner.shrink is not None
            or getattr(runner, "tmd_hook", None) is not None):
        return None
    for attr in ("pppm", "msm", "ewald6", "pppm_disp", "eam", "tip4p",
                 "dpd", "cmap", "adapt", "bond", "angle", "dihedral",
                 "improper"):
        if getattr(ff, attr, None) is not None:
            return None
    if getattr(ff, "hbond", ()) or getattr(ff, "extra_pairs", ()):
        return None
    if ff.pair is None or not ff.pair.coul:
        return None
    if sys.box.triclinic:
        return None
    box_lo = np.asarray(sys.box.lo)
    box_len = np.asarray(sys.box.hi) - box_lo
    try:
        fr = FastPolarRunner(
            runner, ff=ff, pol=pol, n=n, npad=npad, dt=dt, ftm2v=ftm2v,
            box_lo=box_lo, box_lengths=box_len, sp_lists=sp_lists,
            dtype=dtype, log=log)
    except Exception as e:  # noqa: BLE001 — fall back to the dense path
        if log:
            log(f"fast-polar engine unavailable ({e}); dense path")
        return None
    if log:
        log(f"fast-polar engine: {fr.mode} mode, {n} atoms "
            f"(padded {npad})")
    return fr
