"""pair hbond/dreiding/lj + hbond/dreiding/morse — DREIDING directional
hydrogen bonds (pair_hbond_dreiding_lj.cpp::compute :79-297,
pair_hbond_dreiding_morse.cpp :54-230).

The reference iterates donors x full-neighbor acceptors x hydrogens from
the donor's 1-2 special list.  TPU formulation: the (donor, hydrogen)
rows are a static (M,2) table built from the bond topology at setup; the
kernel is one dense [M, N] pass — every DH row against every atom as a
candidate acceptor — with the (itype, jtype, ktype) -> param lookup as a
gathered int table.  The 12-10 LJ / Morse radial kernels, cos^ap(theta)
angle gate (theta = D-H...A via delr1 = x_D - x_H, delr2 = x_A - x_H),
LAMMPS switching function between cut_inner and cut_outer, and the
ev_tally3 third-body virial convention are transcribed exactly.

Special-bond factors: factor_hb = special_lj[level(D, A)] gathered from
the dense topology code matrix (the sbmask factor of :137)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import Box, minimum_image


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HbondParams:
    dh: jax.Array           # (M,2) int32 donor/hydrogen atom rows
    dh_valid: jax.Array     # (M,) bool
    type2param: jax.Array   # (T+1,T+1,T+1) int32 param row or -1
    # stacked per-param rows; LJ: [lj1,lj2,lj3,lj4], Morse: [d0,alpha,r0,m1]
    pcoef: jax.Array        # (P,4)
    p_ap: jax.Array         # (P,) float (integer-valued)
    p_cut_innersq: jax.Array
    p_cut_outersq: jax.Array
    p_cut_angle: jax.Array  # radians
    p_denom_vdw: jax.Array
    sp_factor: jax.Array    # (M,N) special_lj factor for (D, acceptor)
    type_idx: jax.Array     # (N,) int32 atom types
    morse: bool = dataclasses.field(metadata=dict(static=True),
                                    default=False)


def make_hbond_params(coeff_rows, ntypes, ap_global, cut_inner_global,
                      cut_outer_global, cut_angle_global_deg,
                      bonds, natoms, npad, type_arr, special_lj,
                      special_code=None, dtype=jnp.float64,
                      morse=False) -> HbondParams:
    """coeff_rows: list of raw pair_coeff token lists
    [i, j, k, 'i'|'j', eps|D0, sigma|alpha, (r0,) [ap [inner outer
    [angle]]]] (PairHbondDreidingLJ::coeff :317-384).  bonds: (NB,2)
    1-based.  special_code: optional dense (n,n) level matrix."""
    T = ntypes
    t2p = np.full((T + 1, T + 1, T + 1), -1, np.int32)
    rows = []
    nrad = 3 if morse else 2    # Morse rows carry D0 alpha r0
    for toks in coeff_rows:
        def rng(tok):
            if tok == "*":
                return range(1, T + 1)
            if "*" in tok:
                lo, _, hi = tok.partition("*")
                return range(int(lo) if lo else 1,
                             (int(hi) if hi else T) + 1)
            return [int(tok)]
        ilo, jlo, klo = rng(toks[0]), rng(toks[1]), rng(toks[2])
        donor_flag = toks[3]
        vals = [float(v) for v in toks[4:4 + nrad]]
        rest = toks[4 + nrad:]
        ap = int(rest[0]) if len(rest) > 0 else ap_global
        ci = float(rest[1]) if len(rest) > 2 else cut_inner_global
        co = float(rest[2]) if len(rest) > 2 else cut_outer_global
        ang = (float(rest[3]) if len(rest) > 3
               else cut_angle_global_deg) * np.pi / 180.0
        if ci > co:
            raise ValueError("Pair inner cutoff >= Pair outer cutoff")
        m = len(rows)
        if morse:
            d0, alpha, r0 = vals
            pc = [d0, alpha, r0, 2.0 * d0 * alpha]
        else:
            eps, sig = vals
            pc = [60.0 * eps * sig ** 12, 60.0 * eps * sig ** 10,
                  5.0 * eps * sig ** 12, 6.0 * eps * sig ** 10]
        rows.append((pc, float(ap), ci * ci, co * co, ang,
                     (co * co - ci * ci) ** 3))
        for i in ilo:
            for j in jlo:
                if j < i:
                    continue
                for k in klo:
                    if donor_flag == "i":
                        t2p[i, j, k] = m
                    else:
                        t2p[j, i, k] = m

    # donor/hydrogen rows from the bond topology: for each atom of a
    # donor type, each 1-2 neighbor is a candidate hydrogen (the k loop
    # over special[i][0..nspecial[i][0]], :119-124; non-matching ktypes
    # fall out through type2param == -1)
    donor_types = set()
    for i in range(1, T + 1):
        for j in range(1, T + 1):
            for k in range(1, T + 1):
                if t2p[i, j, k] >= 0:
                    donor_types.add(i)
    adj = [[] for _ in range(natoms)]
    for a, b in np.asarray(bonds, int):
        adj[a - 1].append(b - 1)
        adj[b - 1].append(a - 1)
    dh = []
    for i in range(natoms):
        if int(type_arr[i]) in donor_types:
            for k in adj[i]:
                dh.append((i, k))
    M = max(len(dh), 1)
    dh_arr = np.full((M, 2), 0, np.int32)
    dh_valid = np.zeros(M, bool)
    for m_, (d, h) in enumerate(dh):
        dh_arr[m_] = (d, h)
        dh_valid[m_] = True

    # (M, Npad) special factor for (D, acceptor)
    spf = np.ones((M, npad))
    if special_code is not None and len(dh):
        lj_tab = np.asarray([1.0] + list(special_lj[1:4]))
        spf[:, :natoms] = lj_tab[
            np.asarray(special_code)[dh_arr[:, 0], :natoms]]
    spf[:, natoms:] = 0.0

    tpad = np.zeros(npad, np.int32)
    tpad[:len(type_arr)] = np.asarray(type_arr, np.int32)
    P = max(len(rows), 1)
    pcoef = np.zeros((P, 4))
    p_ap = np.zeros(P)
    p_ci = np.zeros(P)
    p_co = np.zeros(P)
    p_ang = np.zeros(P)
    p_den = np.ones(P)
    for m_, (pc, ap, ci2, co2, ang, den) in enumerate(rows):
        pcoef[m_] = pc
        p_ap[m_] = ap
        p_ci[m_] = ci2
        p_co[m_] = co2
        p_ang[m_] = ang
        p_den[m_] = den
    return HbondParams(
        dh=jnp.asarray(dh_arr), dh_valid=jnp.asarray(dh_valid),
        type2param=jnp.asarray(t2p),
        pcoef=jnp.asarray(pcoef, dtype), p_ap=jnp.asarray(p_ap, dtype),
        p_cut_innersq=jnp.asarray(p_ci, dtype),
        p_cut_outersq=jnp.asarray(p_co, dtype),
        p_cut_angle=jnp.asarray(p_ang, dtype),
        p_denom_vdw=jnp.asarray(p_den, dtype),
        sp_factor=jnp.asarray(spf, dtype),
        type_idx=jnp.asarray(tpad), morse=morse)


def hbond_forces(x, mask, box: Box, p: HbondParams, need_ev=True):
    """Returns (f (N,3), evdwl, virial6).  One [M,N] dense pass."""
    n = x.shape[0]
    dtype = x.dtype
    L = box.img_lengths
    D = p.dh[:, 0]
    H = p.dh[:, 1]
    xD = x[D]                       # (M,3)
    xH = x[H]
    tD = p.type_idx[D]
    tH = p.type_idx[H]

    # param row per (D row, acceptor atom)
    pm = p.type2param[tD[:, None], p.type_idx[None, :],
                      tH[:, None]]                        # (M,N)
    valid = (p.dh_valid[:, None] & (pm >= 0) & mask[None, :]
             & (jnp.arange(n)[None, :] != D[:, None])
             & (jnp.arange(n)[None, :] != H[:, None]))
    pm_s = jnp.maximum(pm, 0)

    delx = minimum_image(xD[:, None, :] - x[None, :, :], L)  # (M,N,3)
    rsq = jnp.sum(delx * delx, axis=-1)
    co2 = p.p_cut_outersq[pm_s]
    valid = valid & (rsq < co2)
    rsq = jnp.where(valid, rsq, 1.0)

    delr1 = minimum_image(xD - xH, L)                        # (M,3)
    rsq1 = jnp.sum(delr1 * delr1, axis=-1)
    rsq1 = jnp.where(rsq1 > 0, rsq1, 1.0)
    r1 = jnp.sqrt(rsq1)
    delr2 = minimum_image(x[None, :, :] - xH[:, None, :], L)  # (M,N,3)
    rsq2 = jnp.sum(delr2 * delr2, axis=-1)
    rsq2 = jnp.where(valid, rsq2, 1.0)
    r2 = jnp.sqrt(rsq2)

    c = jnp.sum(delr1[:, None, :] * delr2, axis=-1) / (r1[:, None] * r2)
    c = jnp.clip(c, -1.0, 1.0)
    ac = jnp.arccos(c)
    cut_ang = p.p_cut_angle[pm_s]
    valid = valid & (ac > cut_ang) & (ac < 2.0 * jnp.pi - cut_ang)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    s = jnp.maximum(s, 0.001)                                # SMALL (:40)

    # powint(c, ap) with integer ap carried as float
    apf = p.p_ap[pm_s]
    absc = jnp.abs(c)
    powc = jnp.power(absc, apf) * jnp.where(
        (jnp.round(apf) % 2.0 == 0.0) | (c >= 0.0), 1.0, -1.0)
    powc1 = jnp.power(absc, apf - 1.0) * jnp.where(
        (jnp.round(apf - 1.0) % 2.0 == 0.0) | (c >= 0.0), 1.0, -1.0)

    r2inv = 1.0 / rsq
    cf = p.pcoef[pm_s]                                       # (M,N,4)
    if p.morse:
        r = jnp.sqrt(rsq)
        dr = r - cf[..., 2]
        dexp = jnp.exp(-cf[..., 1] * dr)
        eng_rad = cf[..., 0] * (dexp * dexp - 2.0 * dexp)
        force_kernel = (cf[..., 3] * (dexp * dexp - dexp) / r) * powc
    else:
        r10inv = r2inv * r2inv * r2inv * r2inv * r2inv
        eng_rad = r10inv * (cf[..., 2] * r2inv - cf[..., 3])
        force_kernel = (r10inv * (cf[..., 0] * r2inv - cf[..., 1])
                        * r2inv) * powc
    force_angle = apf * eng_rad * powc1 * s

    ci2 = p.p_cut_innersq[pm_s]
    den = p.p_denom_vdw[pm_s]
    in_switch = rsq > ci2
    switch1 = (co2 - rsq) ** 2 * (co2 + 2.0 * rsq - 3.0 * ci2) / den
    switch2 = 12.0 * rsq * (co2 - rsq) * (rsq - ci2) / den
    force_switch = jnp.where(in_switch, eng_rad * switch2 / rsq, 0.0)
    force_kernel = jnp.where(in_switch, force_kernel * switch1,
                             force_kernel)
    force_angle = jnp.where(in_switch, force_angle * switch1, force_angle)
    eng_rad = jnp.where(in_switch, eng_rad * switch1, eng_rad)

    fac = p.sp_factor
    vm = valid.astype(dtype)
    evdwl_mn = eng_rad * powc * fac * vm
    a = fac * force_angle / s * vm
    b = fac * force_kernel * vm
    d = fac * force_switch * vm

    a11 = a * c / rsq1[:, None]
    a12 = -a / (r1[:, None] * r2)
    a22 = a * c / rsq2

    v1 = a11[..., None] * delr1[:, None, :] + a12[..., None] * delr2
    v2 = a22[..., None] * delr2 + a12[..., None] * delr1[:, None, :]
    bd = (b + d)[..., None] * delx
    fi = v1 + bd                                             # on D
    fj = v2 - bd                                             # on A
    fk = -(v1 + v2)                                          # on H

    f = jnp.zeros_like(x)
    f = f.at[D].add(jnp.sum(fi, axis=1))
    f = f.at[H].add(jnp.sum(fk, axis=1))
    f = f + jnp.sum(fj, axis=0)
    evdwl = jnp.sum(evdwl_mn)
    if need_ev:
        # ev_tally3 with k as the reference body (:256)
        vir = jnp.stack([
            jnp.sum(delr1[:, None, 0] * fi[..., 0] + delr2[..., 0]
                    * fj[..., 0]),
            jnp.sum(delr1[:, None, 1] * fi[..., 1] + delr2[..., 1]
                    * fj[..., 1]),
            jnp.sum(delr1[:, None, 2] * fi[..., 2] + delr2[..., 2]
                    * fj[..., 2]),
            jnp.sum(delr1[:, None, 0] * fi[..., 1] + delr2[..., 0]
                    * fj[..., 1]),
            jnp.sum(delr1[:, None, 0] * fi[..., 2] + delr2[..., 0]
                    * fj[..., 2]),
            jnp.sum(delr1[:, None, 1] * fi[..., 2] + delr2[..., 1]
                    * fj[..., 2]),
        ])
    else:
        vir = jnp.zeros(6, dtype)
    return f, evdwl, vir
