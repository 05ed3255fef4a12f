"""Per-phase wall timers + LAMMPS-style end-of-run breakdown.

The analog of Timer::stamp categories {PAIR, KSPACE, NEIGH, COMM, MODIFY,
OUTPUT} (reference timer.h:25-28) and the Finish::end report (finish.cpp:64,
e.g. "Pair time (%) = 5.47743 (99.7331)" in MOF5+Methane/log.lammps).

The production step is one fused jit program, so phases are timed in profile
mode: each force term is evaluated in its own jit with block_until_ready
between stamps.  Use `profile_forces` for the breakdown; steady-state
throughput comes from the fused path.
"""

from __future__ import annotations

import time
from collections import OrderedDict

import jax


class Timer:
    def __init__(self):
        self.t = OrderedDict()
        self._mark = None

    def start(self):
        self._mark = time.perf_counter()

    def stamp(self, category: str, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.t[category] = self.t.get(category, 0.0) + (now - self._mark)
        self._mark = now

    def report(self, total: float | None = None, log=print):
        tot = total if total is not None else sum(self.t.values())
        for k, v in self.t.items():
            pct = 100.0 * v / tot if tot else 0.0
            log(f"{k:<6s}time (%) = {v:.6g} ({pct:.4g})")
        if total is not None:
            other = tot - sum(self.t.values())
            log(f"Other time (%) = {other:.6g} ({100.0*other/tot:.4g})")


def profile_forces(sys, ff, nlist=None, repeats: int = 3, log=print):
    """Evaluate each force term separately and report the phase breakdown."""
    nlist = getattr(nlist, "nlist", nlist)   # unwrap NeighborCarry
    import dataclasses

    from lidp_tpu.forcefield import compute_forces

    bonded_off = dict(bond=None, angle=None, dihedral=None, improper=None)
    variants = OrderedDict()
    if ff.pair is not None or ff.eam is not None:
        variants["Pair"] = dataclasses.replace(
            ff, ewald=None, pppm=None, polar=None, **bonded_off)
    if ff.ewald is not None or ff.pppm is not None:
        variants["Kspce"] = dataclasses.replace(
            ff, pair=None, eam=None, polar=None, **bonded_off)
    if any(getattr(ff, k) is not None for k in bonded_off):
        variants["Bond"] = dataclasses.replace(
            ff, pair=None, eam=None, ewald=None, pppm=None, polar=None)
    if ff.polar is not None:
        variants["Polar"] = ff  # includes everything; subtract below

    timer = Timer()
    fns = {k: jax.jit(lambda s_, f_=f_: compute_forces(s_, f_, nlist))
           for k, f_ in variants.items()}
    for k, fn in fns.items():
        jax.block_until_ready(fn(sys).f)      # compile
    timer.start()
    for k, fn in fns.items():
        for _ in range(repeats):
            r = fn(sys)
        timer.stamp(k, r.f)
    for k in timer.t:
        timer.t[k] /= repeats
    if "Polar" in timer.t:
        timer.t["Polar"] -= (timer.t.get("Pair", 0.0)
                             + timer.t.get("Kspce", 0.0)
                             + timer.t.get("Bond", 0.0))
    timer.report(log=log)
    return timer
