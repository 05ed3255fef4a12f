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
