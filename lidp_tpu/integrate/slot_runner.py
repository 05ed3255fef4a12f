"""Slot-space LJ/NVE runner — the zero-gather hot path for bench/in.lj.

The generic Runner keeps state in atom order and pays two per-step HBM
taxes on TPU: the slotify gather x[atom_of_slot] (~1.7 ms at 32k atoms;
TPU gathers run at ~1 element/cycle) and the j-side roll-back copies
(~0.9 ms of tile-padded rolls).  Between neighbor rebuilds the integrator
is pure elementwise math, so atom ORDER is irrelevant: this runner keeps
positions/velocities/forces in the cell-slot layout itself (the TPU
conclusion of LAMMPS' Atom::sort locality idea, atom.cpp:1783) and calls
the v3 Pallas kernel (ops/pallas_pair.py slot_lj_forces), which assembles
neighbors from VMEM views and writes j-side partials home through rolled
output index maps.  Per step NOTHING is gathered; the one slot-order
re-gather happens at rebuild (every `rebuild_every` steps, LAMMPS
`neigh_modify every N check no` semantics, neighbor.cpp:1933) and is
amortized 20x.

Scope: single LJ type, NVE, orthogonal periodic box, f32 — exactly the
bench/in.lj configuration.  Everything else uses the generic Runner.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.forcefield import ForceResult
from lidp_tpu.ops.cells import CellConfig, build_cells
from lidp_tpu.ops.pallas_pair import slot_lj_forces


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlotCarry:
    x: Any          # (nbx,nby,nbz,cap,3) f32 slot positions (sentinel empties)
    v: Any          # (nbx,nby,nbz,cap,3)
    f: Any          # force carry (same shape)
    invm: Any       # (nbx,nby,nbz,cap) 0 for empty slots
    aid: Any        # (nbx,nby,nbz,cap) int32 atom id, == n for empty
    step: Any       # () int32
    overflow: Any   # () bool (sticky across rebuilds)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlotNeighbor:
    """Duck-types the overflow attribute the bench checks."""
    overflow: Any


@dataclasses.dataclass
class SlotRunner:
    ff: Any
    neighbor_cfg: CellConfig
    dt: float
    ftm2v: float
    n: int
    rebuild_every: int = 20

    def __post_init__(self):
        self._run = jax.jit(self._run_impl, static_argnames=("nsteps",))
        self._setup = jax.jit(self._setup_impl)

    # ---- helpers ----
    def _sentinels(self, box):
        cfg = self.neighbor_cfg
        nbx, nby, nbz = cfg.nbins
        cap = cfg.cap
        L = box.lengths.astype(jnp.float32)
        p = self.ff.pair
        cutf = jnp.sqrt(p.cut_ljsq[1, 1]).astype(jnp.float32)
        spacing = 2.0 * cutf + jnp.max(L) + 1.0
        corner = jnp.maximum(jnp.max(jnp.abs(box.lo.astype(jnp.float32))),
                             jnp.max(jnp.abs(box.lo.astype(jnp.float32) + L)))
        base = corner + 2.0 * cutf + spacing
        lin = jnp.arange(nbx * nby * nbz * cap, dtype=jnp.float32
                         ).reshape(nbx, nby, nbz, cap)
        return base + spacing * lin

    def _slotify(self, x_flat, v_flat, invm_flat, aid_flat, mask_flat, box):
        """Gather flat (M,) arrays into the (nbx,nby,nbz,cap) slot layout.
        Paid once per rebuild, not per step."""
        cells = build_cells(x_flat, mask_flat, box, self.neighbor_cfg)
        aos = cells.atom_of_slot
        m = x_flat.shape[0]
        amax = jnp.minimum(aos, m - 1)
        valid = aos < m
        sent = self._sentinels(box)
        xs = jnp.where(valid[..., None], x_flat[amax],
                       jnp.stack([sent, jnp.zeros_like(sent),
                                  jnp.zeros_like(sent)], axis=-1))
        vs = jnp.where(valid[..., None], v_flat[amax], 0.0)
        im = jnp.where(valid, invm_flat[amax], 0.0)
        aid = jnp.where(valid, aid_flat[amax], self.n)
        return xs, vs, im, aid, cells.overflow

    def _force(self, carry, box, need_ev):
        grids = [carry.x[..., d] for d in range(3)]
        fg, evdwl, vir = slot_lj_forces(grids, box, self.ff.pair,
                                        need_ev=need_ev)
        return jnp.stack(fg, axis=-1), evdwl, vir

    def _vv_step(self, carry, box, rebuild):
        dtf = jnp.float32(0.5 * self.dt * self.ftm2v)
        dtv = jnp.float32(self.dt)
        a = (dtf * carry.invm)[..., None]
        v = carry.v + a * carry.f
        x = carry.x + dtv * v
        step = carry.step + 1
        if rebuild:
            # wrap + re-bin from the (arbitrary-order) flat slot view;
            # identity flows through aid
            flat = lambda g: g.reshape(-1, *g.shape[4:]) \
                if g.ndim == 5 else g.reshape(-1)
            xf = flat(x)
            maskf = flat(carry.aid) < self.n
            L = box.lengths.astype(jnp.float32)
            lo = box.lo.astype(jnp.float32)
            xf = jnp.where(maskf[:, None],
                           xf - jnp.floor((xf - lo) / L) * L, xf)
            xs, vs, im, aid, ovf = self._slotify(
                xf, flat(v), flat(carry.invm), flat(carry.aid), maskf, box)
            carry = SlotCarry(x=xs, v=vs, f=carry.f, invm=im, aid=aid,
                              step=step, overflow=carry.overflow | ovf)
        else:
            carry = dataclasses.replace(carry, x=x, v=v, step=step)
        f, _, _ = self._force(carry, box, need_ev=False)
        v = carry.v + (dtf * carry.invm)[..., None] * f
        return dataclasses.replace(carry, v=v, f=f)

    # ---- public interface (duck-types Runner) ----
    def _setup_impl(self, sys):
        invm = jnp.ones((self.n,), jnp.float32)   # in.lj: mass 1
        aid = jnp.arange(self.n, dtype=jnp.int32)
        xs, vs, im, aidg, ovf = self._slotify(
            sys.x.astype(jnp.float32), sys.v.astype(jnp.float32),
            invm, aid, sys.mask, sys.box)
        carry = SlotCarry(
            x=xs, v=vs, f=jnp.zeros_like(xs), invm=im, aid=aidg,
            step=sys.step.astype(jnp.int32) if hasattr(sys.step, "astype")
            else jnp.asarray(sys.step, jnp.int32),
            overflow=ovf)
        f, evdwl, vir = self._force(carry, sys.box, need_ev=True)
        carry = dataclasses.replace(carry, f=f)
        sys2, res = self._reconstruct(sys, carry, evdwl, vir)
        return sys2, res, SlotNeighbor(overflow=carry.overflow), carry

    def setup(self, sys):
        return self._setup(sys)

    def _reconstruct(self, sys, carry, evdwl, vir):
        """Scatter slot state back to atom order (once per chunk)."""
        aidf = carry.aid.reshape(-1)
        ok = aidf < self.n
        tgt = jnp.where(ok, aidf, self.n)
        def scat(g):
            gf = g.reshape(-1, 3)
            out = jnp.zeros((self.n + 1, 3), jnp.float32)
            return out.at[tgt].set(gf, mode="drop")[:self.n]
        dtype = sys.x.dtype
        sys2 = sys.replace(x=scat(carry.x).astype(dtype),
                           v=scat(carry.v).astype(dtype),
                           step=carry.step)
        zero = jnp.zeros((), dtype)
        res = ForceResult(
            f=scat(carry.f).astype(dtype), evdwl=evdwl.astype(dtype),
            ecoul=zero, elong=zero, epol=zero, ebond=zero,
            virial=vir.astype(dtype), mu=sys.mu,
            scf_iters=jnp.zeros((), jnp.int32),
            scf_diverged=jnp.zeros((), bool))
        return sys2, res

    def _run_impl(self, sys, carry, nsteps):
        every = self.rebuild_every
        nblocks, rem = divmod(nsteps, every)
        box = sys.box

        def quiet_step(c, _):
            return self._vv_step(c, box, rebuild=False), None

        def block(c, _):
            c, _ = jax.lax.scan(quiet_step, c, None, length=every - 1)
            c = self._vv_step(c, box, rebuild=True)
            return c, None

        carry, _ = jax.lax.scan(block, carry, None, length=nblocks)
        if rem:
            carry, _ = jax.lax.scan(quiet_step, carry, None, length=rem)
        f, evdwl, vir = self._force(carry, box, need_ev=True)
        carry = dataclasses.replace(carry, f=f)
        sys2, res = self._reconstruct(sys, carry, evdwl, vir)
        return sys2, res, SlotNeighbor(overflow=carry.overflow), carry

    def run(self, sys, res, nlist, istate, nsteps: int):
        return self._run(sys, istate, nsteps=nsteps)
