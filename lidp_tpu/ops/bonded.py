"""Bonded interactions: bond styles harmonic and fene.

The reference's bonded layer (bond_harmonic.cpp, bond_fene.cpp from the
MOLECULE package) as gather/scatter tensor ops over the (NB,2) bond list —
NB ~ N, so sparse index ops are cheap here (unlike the pair loops).

fene: E = -0.5 K R0^2 ln(1-(r/R0)^2) + LJ(r<2^(1/6) sigma) + epsilon
harmonic: E = K (r - r0)^2   (LAMMPS convention: K includes the 1/2)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, minimum_image


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BondParams:
    idx: jax.Array       # (NB,2) int32 0-based atom indices
    btype: jax.Array     # (NB,) int32 1-based bond types
    # per-type coefficient tables, row 0 unused
    k: jax.Array         # (T+1,)
    r0: jax.Array        # (T+1,)  (fene: R0)
    eps: jax.Array       # (T+1,)  (fene only)
    sigma: jax.Array     # (T+1,)  (fene only)
    style: str = dataclasses.field(metadata=dict(static=True), default="harmonic")


def bond_forces(x, box: Box, p: BondParams):
    """Returns (f (N,3), ebond, virial6)."""
    n = x.shape[0]
    i = p.idx[:, 0]
    j = p.idx[:, 1]
    d = minimum_image(x[i] - x[j], box.lengths)      # (NB,3) — NB small
    rsq = jnp.sum(d * d, axis=1)
    k = p.k[p.btype]
    r0 = p.r0[p.btype]

    if p.style == "harmonic":
        r = jnp.sqrt(rsq)
        dr = r - r0
        rk = k * dr
        fbond = jnp.where(r > 0, -2.0 * rk / jnp.where(r > 0, r, 1.0), 0.0)
        ebond = jnp.sum(k * dr * dr)
    elif p.style == "fene":
        # bond_fene.cpp:60-95
        r0sq = r0 * r0
        rlogarg = 1.0 - rsq / r0sq
        rlogarg = jnp.maximum(rlogarg, 0.1)   # the reference warns & clamps at 0.1
        fbond = -k / rlogarg
        ebond = -0.5 * jnp.sum(k * r0sq * jnp.log(rlogarg))
        eps = p.eps[p.btype]
        sig = p.sigma[p.btype]
        sr2 = jnp.where(rsq > 0, sig * sig / jnp.where(rsq > 0, rsq, 1.0), 0.0)
        sr6 = sr2 * sr2 * sr2
        inside = rsq < jnp.power(2.0, 1.0 / 3.0) * sig * sig
        fbond = fbond + jnp.where(inside, 48.0 * eps * sr6 * (sr6 - 0.5) / rsq, 0.0)
        ebond = ebond + jnp.sum(jnp.where(
            inside, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0))
    else:
        raise ValueError(p.style)

    fvec = fbond[:, None] * d
    f = jnp.zeros_like(x).at[i].add(fvec).at[j].add(-fvec)
    virial = jnp.stack([
        jnp.sum(fbond * d[:, 0] * d[:, 0]), jnp.sum(fbond * d[:, 1] * d[:, 1]),
        jnp.sum(fbond * d[:, 2] * d[:, 2]), jnp.sum(fbond * d[:, 0] * d[:, 1]),
        jnp.sum(fbond * d[:, 0] * d[:, 2]), jnp.sum(fbond * d[:, 1] * d[:, 2]),
    ])
    return f, ebond, virial


def special_correction_sparse(x, q, type_, sp_idx, sp_lvl, mask, box: Box, p):
    """Sparse special-bond correction for list-free pair paths (cells).

    The dense main pass treats every pair at factor 1.0; this subtracts the
    over-count for the O(N*S) special pairs.  Mirrors the shard-path
    correction; p is a PairParams.  Returns (f_corr, devdwl, decoul, dvir6).
    """
    from lidp_tpu.ops.pair import EWALD_F, EWALD_P, A1, A2, A3, A4, A5

    n = x.shape[0]
    L = box.lengths
    jvalid = sp_idx < n
    jc = jnp.minimum(sp_idx, n - 1)
    dx = minimum_image(x[:, 0:1] - x[:, 0][jc], L[0])
    dy = minimum_image(x[:, 1:2] - x[:, 1][jc], L[1])
    dz = minimum_image(x[:, 2:3] - x[:, 2][jc], L[2])
    rsq = dx * dx + dy * dy + dz * dz
    rsq = jnp.where(jvalid, rsq, 1.0)
    r2inv = 1.0 / rsq
    ti = type_[:, None]
    tj = type_[jc]
    flj = p.special_lj[sp_lvl]
    fcl = p.special_coul[sp_lvl]
    in_rng = jvalid & (rsq < p.cutsq[ti, tj]) & mask[:, None]
    lj_m = in_rng & (rsq < p.cut_ljsq[ti, tj])
    r6inv = r2inv * r2inv * r2inv
    forcelj = r6inv * (p.lj1[ti, tj] * r6inv - p.lj2[ti, tj])
    evdwl_full = (r6inv * (p.lj3[ti, tj] * r6inv - p.lj4[ti, tj])
                  - p.offset[ti, tj])
    dflj = jnp.where(lj_m, (flj - 1.0) * forcelj, 0.0)
    devd = jnp.where(lj_m, (flj - 1.0) * evdwl_full, 0.0)
    if p.coul:
        cm = in_rng & (rsq < p.cut_coulsq)
        rr = jnp.sqrt(rsq)
        prefac = p.qqrd2e * q[:, None] * q[jc] / rr
        dfc = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
        dec = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
    else:
        dfc = jnp.zeros_like(dflj)
        dec = jnp.zeros_like(devd)
    fpair_c = (dflj + dfc) * r2inv
    f = jnp.stack([jnp.sum(fpair_c * dx, axis=1),
                   jnp.sum(fpair_c * dy, axis=1),
                   jnp.sum(fpair_c * dz, axis=1)], axis=-1)
    w = 0.5 * fpair_c
    vir = jnp.stack([
        jnp.sum(w * dx * dx), jnp.sum(w * dy * dy), jnp.sum(w * dz * dz),
        jnp.sum(w * dx * dy), jnp.sum(w * dx * dz), jnp.sum(w * dy * dz)])
    return f, 0.5 * jnp.sum(devd), 0.5 * jnp.sum(dec), vir
