"""Per-atom and reduced compute styles (the compute_*_atom.cpp /
compute_reduce.cpp family) on the host-driven observability path.

Per-atom quantities are evaluated on demand — at thermo/dump sample
times, never inside the integration scan — with the same row-blocked
dense pair enumeration the pair/local dumps use (dump.py
_pair_local_rows).  That keeps the hot path free of per-atom tally
traffic, the TPU-first analog of the reference's eflag_atom/vflag_atom
conditional tallies (pair.cpp ev_setup).

Covered styles:
  ke/atom (compute_ke_atom.cpp), pe/atom (compute_pe_atom.cpp: pair +
  equal-share bonded terms; kspace/fix shares are not tallied — the
  polarization workload samples pe globally), stress/atom
  (compute_stress_atom.cpp: kinetic + pairwise + equal-share bonded,
  in pressure*volume units), coord/atom (compute_coord_atom.cpp),
  cluster/atom (compute_cluster_atom.cpp), displace/atom
  (compute_displace_atom.cpp), property/atom (compute_property_atom.cpp),
  reduce / reduce/region (compute_reduce.cpp).
"""

from __future__ import annotations

import numpy as np


def _min_image(d, L):
    return d - L * np.round(d / L)


def _current_x(sys, n):
    """Current RAW positions — what Region::match sees: the reference
    wraps atom->x only at reneighbor steps (Domain::pbc from
    Verlet::run), so between rebuilds region membership tests the
    unwrapped drift (verified against the rebuilt binary: a wrapped
    test overcounts the boundary planes)."""
    return np.asarray(sys.x)[:n]


def _pair_blocks(sys, script, pair, sp_code, natoms, extra_cut=None):
    """Yield (gi, jj, rsq, dvec, spl, spc) for all i<j candidate pairs
    inside the force cutoff (or extra_cut)."""
    n = natoms
    x = np.asarray(sys.x)[:n]
    ty = np.asarray(sys.type)[:n]
    L = np.asarray(sys.box.lengths)
    per = np.asarray(sys.box.periodic, bool)
    cutsq = np.asarray(pair.cutsq) if pair is not None else None
    if extra_cut is not None:
        cmax2 = extra_cut ** 2
    spl = np.asarray(pair.special_lj) if pair is not None else np.ones(4)
    spc = np.asarray(pair.special_coul) if pair is not None else np.ones(4)
    sp = (np.asarray(sp_code)[:n, :n] if sp_code is not None
          else np.zeros((n, n), np.int8))
    B = 1024
    for i0 in range(0, n, B):
        i1 = min(i0 + B, n)
        d = x[i0:i1, None, :] - x[None, :, :]
        for dim in range(3):
            if per[dim]:
                d[..., dim] = _min_image(d[..., dim], L[dim])
        rsq = np.sum(d * d, axis=-1)
        within = (rsq < cmax2) if extra_cut is not None else (
            rsq < cutsq[ty[i0:i1, None], ty[None, :]])
        sel = ((np.arange(i0, i1)[:, None] < np.arange(n)[None, :])
               & within)
        if extra_cut is None:
            # zero-weighted special pairs are absent from the reference's
            # neighbor list entirely (neighbor.cpp exclusions)
            sel &= ~((spl[sp[i0:i1]] == 0.0) & (spc[sp[i0:i1]] == 0.0))
        ii, jj = np.nonzero(sel)
        if not len(ii):
            continue
        yield (ii + i0, jj, rsq[ii, jj], d[ii, jj],
               spl[sp[ii + i0, jj]], spc[sp[ii + i0, jj]])


def peratom_pair_pe_stress(sim, want_stress=False):
    """(pe_atom (N,), stress_atom (N,6)) — pairwise halves + equal-share
    bonded terms.  stress rows are the virial tally convention
    (compute_stress_atom.cpp): - (m v v + 0.5 sum r x f) * nktv2p later
    applied by the caller; here raw sums."""
    import jax.numpy as jnp

    from lidp_tpu.ops.pair import pair_single

    n = sim.natoms
    sys = sim.sys
    pe = np.zeros(n)
    st = np.zeros((n, 6))
    pair = sim.runner.ff.pair
    q = np.asarray(sys.q)[:n]
    ty = np.asarray(sys.type)[:n]
    if pair is not None:
        for gi, jj, rsq, dv, fl, fc in _pair_blocks(
                sys, sim.script, pair, sim.runner.ff.sp_code, n):
            eng, fpair = pair_single(
                jnp.asarray(rsq), jnp.asarray(ty[gi]), jnp.asarray(ty[jj]),
                jnp.asarray(q[gi]), jnp.asarray(q[jj]), pair,
                factor_coul=jnp.asarray(fc), factor_lj=jnp.asarray(fl))
            eng = np.asarray(eng)
            fpair = np.asarray(fpair)
            np.add.at(pe, gi, 0.5 * eng)
            np.add.at(pe, jj, 0.5 * eng)
            if want_stress:
                w = 0.5 * fpair
                v6 = np.stack([w * dv[:, 0] * dv[:, 0],
                               w * dv[:, 1] * dv[:, 1],
                               w * dv[:, 2] * dv[:, 2],
                               w * dv[:, 0] * dv[:, 1],
                               w * dv[:, 0] * dv[:, 2],
                               w * dv[:, 1] * dv[:, 2]], axis=1)
                np.add.at(st, gi, v6)
                np.add.at(st, jj, v6)
    # bonded terms: per-term energy/virial split equally over the term's
    # atoms (ev_tally with newton on distributes exactly this way for the
    # energy; the virial per-atom split matches ev_tally's halves)
    pe_b, st_b = _bonded_peratom(sim, want_stress)
    return pe + pe_b, st + st_b


def _bonded_peratom(sim, want_stress):
    """Per-atom halves of the 2-body bonded energies (ev_tally splits a
    bond's energy 0.5/0.5 between its atoms).  Angle/dihedral/improper
    per-atom shares and bonded per-atom virials are not tallied — pe/atom
    and stress/atom cover pair-dominated systems (the reference workload
    samples bonded energies globally via thermo emol)."""
    n = sim.natoms
    ff = sim.runner.ff
    pe = np.zeros(n)
    st = np.zeros((n, 6))
    sys = sim.sys

    from lidp_tpu.ops import bonded as B

    for bp in (ff.bond if isinstance(ff.bond, tuple)
               else (ff.bond,) if ff.bond is not None else ()):
        i, j = bp.idx[:, 0], bp.idx[:, 1]
        d = np.asarray(B._mi(sys.x[i] - sys.x[j], sys.box))
        rsq = (d * d).sum(1)
        e_term = _bond_energy_terms(bp, rsq)
        if e_term is not None:
            idx = np.asarray(bp.idx)
            np.add.at(pe, idx[:, 0], 0.5 * e_term)
            np.add.at(pe, idx[:, 1], 0.5 * e_term)
    return pe, st


def _bond_energy_terms(bp, rsq):
    """Per-bond energies for the closed-form styles (None -> skip)."""
    t = np.asarray(bp.btype)
    k = np.asarray(bp.k)[t]
    r0 = np.asarray(bp.r0)[t]
    r = np.sqrt(rsq)
    if bp.style == "harmonic":
        return k * (r - r0) ** 2
    if bp.style == "gromos":
        return k * (rsq - r0 * r0) ** 2
    if bp.style == "morse":
        al = r0
        rr0 = np.asarray(bp.eps)[t]
        ral = np.exp(-al * (r - rr0))
        return k * (1 - ral) ** 2
    if bp.style == "zero":
        return np.zeros_like(r)
    return None


def coord_atom(sim, cutoff, gmask):
    """compute coord/atom cutoff: neighbor count within cutoff, both
    atoms' counts incremented (compute_coord_atom.cpp)."""
    n = sim.natoms
    out = np.zeros(n)
    gm = np.asarray(gmask)[:n]
    for gi, jj, rsq, dv, fl, fc in _pair_blocks(
            sim.sys, sim.script, sim.runner.ff.pair,
            sim.runner.ff.sp_code, n, extra_cut=cutoff):
        np.add.at(out, gi, 1.0)
        np.add.at(out, jj, 1.0)
    out[~gm] = 0.0
    return out


def cluster_atom(sim, cutoff, gmask):
    """compute cluster/atom cutoff: connected-component label = smallest
    atom ID in the cluster (compute_cluster_atom.cpp iterates ID
    minimization to convergence; union-find gives the identical fixed
    point in one pass)."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for gi, jj, rsq, dv, fl, fc in _pair_blocks(
            sim.sys, sim.script, sim.runner.ff.pair,
            sim.runner.ff.sp_code, n, extra_cut=cutoff):
        for a, b in zip(gi, jj):
            if gm[a] and gm[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    lab = np.array([find(a) + 1.0 for a in range(n)])
    lab[~gm] = 0.0
    return lab


def _neighbor_lists(sim, cutoff):
    """Per-atom full neighbor lists within cutoff (min-image): returns
    (nbrs, vecs) where nbrs[i] = neighbor indices of i and vecs[i][k] =
    min-imaged displacement x_nbr - x_i.  Valid while every pair has a
    single image inside the cutoff (box > 2*cutoff, the reference's own
    operating regime)."""
    n = sim.natoms
    nbrs = [[] for _ in range(n)]
    vecs = [[] for _ in range(n)]
    for gi, jj, rsq, dv, fl, fc in _pair_blocks(
            sim.sys, sim.script, sim.runner.ff.pair,
            sim.runner.ff.sp_code, n, extra_cut=cutoff):
        # dv = x[i] - x[j]; vector i->j is -dv
        for a, b, d in zip(gi, jj, dv):
            nbrs[a].append(b)
            vecs[a].append(-d)
            nbrs[b].append(a)
            vecs[b].append(d)
    return nbrs, vecs


def centro_atom(sim, nnn, gmask):
    """compute centro/atom fcc|bcc|N (compute_centro_atom.cpp): for each
    atom take the nnn nearest neighbors inside the pair force cutoff,
    form all R = r_j + r_k pair sums (vectors from the central atom) and
    return the sum of the nnn/2 smallest |R|^2 — 0 for atoms with fewer
    than nnn neighbors or outside the group."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    pair = sim.runner.ff.pair
    cutforce = float(np.sqrt(np.max(np.asarray(pair.cutsq)))
                     if pair is not None
                     else np.asarray(sim.runner.ff.eam.cut))
    nbrs, vecs = _neighbor_lists(sim, cutforce)
    nhalf = nnn // 2
    out = np.zeros(n)
    for i in range(n):
        if not gm[i] or len(nbrs[i]) < nnn:
            continue
        vv = np.asarray(vecs[i])
        order = np.argsort((vv * vv).sum(1), kind="stable")[:nnn]
        sel = vv[order]
        R = sel[:, None, :] + sel[None, :, :]
        iu = np.triu_indices(nnn, 1)
        p2 = (R[iu] ** 2).sum(1)
        p2.sort()
        out[i] = p2[:nhalf].sum()
    return out


def _assoc_legendre(l, m, x):
    """Associated Legendre P_l^m via the reference's upward recurrence
    (compute_orientorder_atom.cpp:524-544); x is an array."""
    x = np.asarray(x, float)
    if l < m:
        return np.zeros_like(x)
    p = np.ones_like(x)
    if m != 0:
        sqx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
        for i in range(1, m + 1):
            p = p * ((2 * i - 1) * sqx)
    pm1 = np.zeros_like(x)
    for i in range(m + 1, l + 1):
        pm2 = pm1
        pm1 = p
        p = ((2 * i - 1) * x * pm1 - (i + m - 1) * pm2) / (i - m)
    return p


def _polar_prefactor(l, m, costheta):
    """compute_orientorder_atom.cpp:504-521."""
    import math

    mabs = abs(m)
    pref = 1.0
    for i in range(l - mabs + 1, l + mabs + 1):
        pref *= float(i)
    pref = math.sqrt((2 * l + 1) / (4.0 * math.pi * pref))
    out = pref * _assoc_legendre(l, mabs, costheta)
    if m < 0 and m % 2:
        out = -out
    return out


def orientorder_atom(sim, spec, gmask):
    """compute orientorder/atom (compute_orientorder_atom.cpp): Steinhardt
    bond-orientational order Q_l over the nnn nearest neighbors inside
    the cutoff; one column per requested degree (default 4 6 8 10 12),
    plus 2*(2*l+1) normalized qlm components when `components l` was
    given."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    nnn = spec.get("nnn", 12)
    qlist = spec.get("degrees", [4, 6, 8, 10, 12])
    comp_l = spec.get("components")
    pair = sim.runner.ff.pair
    cutoff = spec.get("cutoff") or float(
        np.sqrt(np.max(np.asarray(pair.cutsq))))
    nbrs, vecs = _neighbor_lists(sim, cutoff)
    ncol = len(qlist) + (2 * (2 * comp_l + 1) if comp_l else 0)
    out = np.zeros((n, ncol))
    cutsq = cutoff * cutoff
    for i in range(n):
        if not gm[i] or not len(nbrs[i]):
            continue
        vv = np.asarray(vecs[i])
        d2 = (vv * vv).sum(1)
        sel = d2 < cutsq
        vv, d2 = vv[sel], d2[sel]
        if len(vv) < max(nnn, 1):
            continue
        if nnn > 0:
            order = np.argsort(d2, kind="stable")[:nnn]
            vv = vv[order]
        rmag = np.sqrt((vv * vv).sum(1))
        cth = vv[:, 2] / rmag
        rxy = np.sqrt(vv[:, 0] ** 2 + vv[:, 1] ** 2)
        safe = rxy > 1e-300
        ephi = np.where(safe, (vv[:, 0] + 1j * vv[:, 1])
                        / np.where(safe, rxy, 1.0), 1.0 + 0.0j)
        nc = len(vv)
        fac = np.sqrt(4.0 * np.pi) / nc
        col = 0
        for lq in qlist:
            qlm = np.zeros(2 * lq + 1, complex)
            qlm[lq] = _polar_prefactor(lq, 0, cth).sum()
            ephim = ephi.copy()
            for m in range(1, lq + 1):
                c = _polar_prefactor(lq, m, cth) * ephim
                qlm[m + lq] += c.sum()
                # (-1)^m conjugate relation (calc_boop:447-455)
                cc = c.sum()
                if m & 1:
                    qlm[-m + lq] += -cc.real + 1j * cc.imag
                else:
                    qlm[-m + lq] += cc.real - 1j * cc.imag
                ephim = ephim * ephi
            qm_sum = float((qlm.real ** 2 + qlm.imag ** 2).sum())
            out[i, col] = fac * np.sqrt(qm_sum / (2 * lq + 1))
            col += 1
            if comp_l == lq:
                normfac = 1.0 / np.sqrt(qm_sum) if qm_sum > 0 else 0.0
                for m in range(2 * lq + 1):
                    out[i, len(qlist) + 2 * m] = qlm[m].real * normfac
                    out[i, len(qlist) + 2 * m + 1] = qlm[m].imag * normfac
    return out


def hexorder_atom(sim, spec, gmask):
    """compute hexorder/atom (compute_hexorder_atom.cpp): 2-d q_n =
    (1/nnn) sum_j exp(i n theta_ij) over the nnn nearest neighbors;
    columns (Re, Im)."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    nnn = spec.get("nnn", 6)
    deg = spec.get("degree", 6)
    pair = sim.runner.ff.pair
    cutoff = spec.get("cutoff") or float(
        np.sqrt(np.max(np.asarray(pair.cutsq))))
    nbrs, vecs = _neighbor_lists(sim, cutoff)
    out = np.zeros((n, 2))
    cutsq = cutoff * cutoff
    for i in range(n):
        if not gm[i] or not len(nbrs[i]):
            continue
        vv = np.asarray(vecs[i])
        d2 = (vv * vv).sum(1)
        sel = d2 < cutsq
        vv, d2 = vv[sel], d2[sel]
        if len(vv) < max(nnn, 1):
            continue
        if nnn > 0:
            order = np.argsort(d2, kind="stable")[:nnn]
            vv = vv[order]
        rinv = 1.0 / np.sqrt(vv[:, 0] ** 2 + vv[:, 1] ** 2)
        z = (vv[:, 0] + 1j * vv[:, 1]) * rinv
        zn = z ** deg
        denom = nnn if nnn > 0 else len(vv)
        out[i, 0] = zn.real.sum() / denom
        out[i, 1] = zn.imag.sum() / denom
    return out


def cna_atom(sim, cutoff, gmask):
    """compute cna/atom cutoff (compute_cna_atom.cpp): common neighbor
    analysis.  Per-atom pattern code: 0 unknown (outside group), 1 fcc,
    2 hcp, 3 bcc, 4 icosahedral, 5 other.  Classification only attempted
    for atoms with exactly 12 or 14 neighbors inside the cutoff; CNA
    signature per neighbor = (ncommon, nbonds among common, max bond
    count, min bond count)."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    nbrs, _ = _neighbor_lists(sim, cutoff)
    sets = [set(v) for v in nbrs]
    out = np.zeros(n)
    for i in range(n):
        if not gm[i]:
            continue
        ni = nbrs[i]
        if len(ni) not in (12, 14):
            out[i] = 5.0
            continue
        sigs = []
        for j in ni:
            common = [k for k in ni if k in sets[j]]
            nc = len(common)
            bonds = np.zeros(nc, int)
            nb = 0
            for a in range(nc - 1):
                for b in range(a + 1, nc):
                    if common[b] in sets[common[a]]:
                        nb += 1
                        bonds[a] += 1
                        bonds[b] += 1
            sigs.append((nc, nb, int(bonds.max()) if nc else 0,
                         int(bonds.min()) if nc else 0))
        if len(ni) == 12:
            nfcc = sum(s == (4, 2, 1, 1) for s in sigs)
            nhcp = sum(s == (4, 2, 2, 0) for s in sigs)
            nico = sum(s == (5, 5, 2, 2) for s in sigs)
            if nfcc == 12:
                out[i] = 1.0
            elif nfcc == 6 and nhcp == 6:
                out[i] = 2.0
            elif nico == 12:
                out[i] = 4.0
            else:
                out[i] = 5.0
        else:
            nb4 = sum(s == (4, 4, 2, 2) for s in sigs)
            nb6 = sum(s == (6, 6, 2, 2) for s in sigs)
            out[i] = 3.0 if (nb4 == 6 and nb6 == 8) else 5.0
    return out


def fragment_aggregate_atom(sim, gmask, cutoff=None):
    """compute fragment/atom (bond connectivity) and aggregate/atom
    (bond connectivity + distance cutoff) labels = smallest atom ID in
    the connected component (compute_fragment_atom.cpp,
    compute_aggregate_atom.cpp)."""
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    def union(a, b):
        if gm[a] and gm[b]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    bonds = np.asarray(sim.script._bonds, np.int64) - 1
    btyp = np.asarray(sim.script._bond_types, np.int64)
    for (a, b), t in zip(bonds, btyp):
        if t != 0:
            union(int(a), int(b))
    if cutoff is not None:
        for gi, jj, rsq, dv, fl, fc in _pair_blocks(
                sim.sys, sim.script, sim.runner.ff.pair,
                sim.runner.ff.sp_code, n, extra_cut=cutoff):
            for a, b in zip(gi, jj):
                union(a, b)
    lab = np.array([find(a) + 1.0 for a in range(n)])
    lab[~gm] = 0.0
    return lab


def eval_heat_flux(sim, cid):
    """compute heat/flux ke-ID pe-ID stress-ID
    (ComputeHeatFlux::compute_vector): J = sum (pe+ke) v  (convective)
    - S.v / nktv2p (virial); returns the 6-vector [Jx Jy Jz Jcx Jcy Jcz]
    (volume normalization left to the user, as in the reference)."""
    gmask, ids = sim.hf_computes[cid]
    n = sim.natoms
    gm = np.asarray(gmask)[:n]
    ke = np.asarray(eval_peratom(sim, ids[0]))
    pe = np.asarray(eval_peratom(sim, ids[1]))
    st = np.asarray(eval_peratom(sim, ids[2]))
    v = np.asarray(sim.sys.v)[:n]
    eng = np.where(gm, pe + ke, 0.0)
    jc = (eng[:, None] * v).sum(0)
    sel = gm[:, None]
    jv = -np.stack([
        (st[:, 0] * v[:, 0] + st[:, 3] * v[:, 1] + st[:, 4] * v[:, 2]),
        (st[:, 3] * v[:, 0] + st[:, 1] * v[:, 1] + st[:, 5] * v[:, 2]),
        (st[:, 4] * v[:, 0] + st[:, 5] * v[:, 1] + st[:, 2] * v[:, 2]),
    ], axis=1)
    jv = np.where(sel, jv, 0.0).sum(0) / float(sim.thermo_params.nktv2p)
    return np.concatenate([jc + jv, jc])


def eval_peratom(sim, cid):
    """Evaluate a registered per-atom compute -> (N,) or (N,K) array."""
    if cid not in sim.peratom_computes and cid in getattr(
            sim, "chunk_computes", {}):
        # chunk/atom referenced as a per-atom input (its peratom output
        # IS the 1..nchunk id, compute_chunk_atom.cpp)
        return np.asarray(sim._chunk_ids(cid)[0], float)
    gmask, style, spec = sim.peratom_computes[cid]
    n = sim.natoms
    sys = sim.sys
    gm = np.asarray(gmask)[:n]
    if style == "ke/atom":
        v = np.asarray(sys.v)[:n]
        m = np.asarray(sim.thermo_params.mass_atom)[:n]
        out = 0.5 * sim.thermo_params.mvv2e * m * (v * v).sum(1)
        out[~gm] = 0.0
        return out
    if style == "pe/atom":
        pe, _ = peratom_pair_pe_stress(sim, want_stress=False)
        pe[~gm] = 0.0
        return pe
    if style == "stress/atom":
        # compute_stress_atom.cpp: -(m v v + pair virial share) * nktv2p
        _, st = peratom_pair_pe_stress(sim, want_stress=True)
        v = np.asarray(sys.v)[:n]
        m = np.asarray(sim.thermo_params.mass_atom)[:n]
        mvv2e = sim.thermo_params.mvv2e
        kin = np.stack([m * v[:, 0] * v[:, 0], m * v[:, 1] * v[:, 1],
                        m * v[:, 2] * v[:, 2], m * v[:, 0] * v[:, 1],
                        m * v[:, 0] * v[:, 2], m * v[:, 1] * v[:, 2]],
                       axis=1) * mvv2e
        out = -(kin + st) * float(sim.thermo_params.nktv2p)
        out[~gm] = 0.0
        return out
    if style == "coord/atom":
        return coord_atom(sim, float(spec["cutoff"]), gmask)
    if style == "cluster/atom":
        return cluster_atom(sim, float(spec["cutoff"]), gmask)
    if style == "centro/atom":
        nnn = {"fcc": 12, "bcc": 8}.get(spec["arg"])
        return centro_atom(sim, nnn if nnn else int(spec["arg"]), gmask)
    if style == "cna/atom":
        return cna_atom(sim, float(spec["arg"]), gmask)
    if style == "erotate/sphere/atom":
        # 0.5*INERTIA*m r^2 w^2 per atom (compute_erotate_sphere_atom.cpp)
        w = np.asarray(sim.istate.omega)[:n]
        r_ = np.asarray(sim.gran_radius)[:n]
        m = np.asarray(sim.gran_rmass)[:n]
        out = 0.5 * 0.4 * sim.thermo_params.mvv2e * m * r_ * r_ \
            * (w * w).sum(1)
        out[~gm | (r_ <= 0)] = 0.0
        return out
    if style == "contact/atom":
        # contacts = pairs with r < radi+radj (compute_contact_atom.cpp)
        x = np.asarray(sys.x)[:n]
        r_ = np.asarray(sim.gran_radius)[:n]
        L = np.asarray(sys.box.lengths)
        per = np.asarray(sys.box.periodic, bool)
        out = np.zeros(n)
        B = 512
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            d = x[i0:i1, None, :] - x[None, :, :]
            for dim_ in range(3):
                if per[dim_]:
                    d[..., dim_] -= np.round(d[..., dim_] / L[dim_]) \
                        * L[dim_]
            rsq = (d * d).sum(-1)
            radsum = r_[i0:i1, None] + r_[None, :]
            hit = ((rsq < radsum * radsum)
                   & (np.arange(i0, i1)[:, None] < np.arange(n)[None, :]))
            ii, jj = np.nonzero(hit)
            np.add.at(out, ii + i0, 1.0)
            np.add.at(out, jj, 1.0)
        out[~gm] = 0.0
        return out
    if style == "global/atom":
        # per-atom index (rounded down, 1-based) into global vectors
        # (compute_global_atom.cpp:336-420); out-of-range -> 0
        idx = np.floor(peratom_column(sim, spec["ref"])).astype(int) - 1
        cols = []
        for tok in spec["inputs"]:
            vec = np.asarray(sim._global_array(tok), float).ravel()
            col = np.where((idx >= 0) & (idx < len(vec)),
                           vec[np.clip(idx, 0, len(vec) - 1)], 0.0)
            col[~gm] = 0.0
            cols.append(col)
        return cols[0] if len(cols) == 1 else np.stack(cols, 1)
    if style == "orientorder/atom":
        return orientorder_atom(sim, spec["arg"], gmask)
    if style == "hexorder/atom":
        return hexorder_atom(sim, spec["arg"], gmask)
    if style == "fragment/atom":
        return fragment_aggregate_atom(sim, gmask)
    if style == "aggregate/atom":
        return fragment_aggregate_atom(sim, gmask,
                                       cutoff=float(spec["cutoff"]))
    if style == "displace/atom":
        from lidp_tpu.box import unwrap
        xu = np.asarray(unwrap(sys.x, sys.box, sys.image))[:n]
        d = xu - spec["x0"]
        d[~gm] = 0.0
        return np.concatenate(
            [d, np.sqrt((d * d).sum(1))[:, None]], axis=1)
    if style == "property/atom":
        cols = []
        v = np.asarray(sys.v)[:n]
        x = np.asarray(sys.x)[:n]
        f = np.asarray(sim.res.f)[:n] if sim.res is not None else (
            np.zeros((n, 3)))
        src = {"x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
               "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
               "fx": f[:, 0], "fy": f[:, 1], "fz": f[:, 2],
               "q": np.asarray(sys.q)[:n],
               "type": np.asarray(sim.script.type)[:n].astype(float),
               "mol": np.asarray(sim.script.mol)[:n].astype(float),
               "mass": np.asarray(sim.thermo_params.mass_atom)[:n],
               "id": np.arange(1.0, n + 1)}
        for w in spec["fields"]:
            col = src[w].copy()
            col[~gm] = 0.0
            cols.append(col)
        return cols[0] if len(cols) == 1 else np.stack(cols, axis=1)
    raise ValueError(f"per-atom compute style {style}")


def peratom_column(sim, tok):
    """Resolve a per-atom input token (x/y/z, vx.., fx.., q, type, mol,
    c_ID[/col], f_ID[/col]) to an (N,) array — the shared input grammar
    of compute reduce, fix ave/atom, fix ave/histo, fix store/state."""
    n = sim.natoms
    sys = sim.sys
    if tok.startswith(("c_", "f_")):
        name = tok[2:]
        col = None
        if name.endswith("]"):
            name, idx = name[:-1].split("[")
            col = int(idx) - 1
        if tok.startswith("c_"):
            arr = np.asarray(eval_peratom(sim, name))
        elif sim.script.fixes[name].style == "store/force":
            # fix store/force (fix_store_force.cpp): the force before any
            # post-force fix modified it — recomputed exactly from the
            # current positions (forces are pure functions of x here)
            from lidp_tpu.forcefield import compute_forces

            res = compute_forces(
                sim.sys, sim.runner.ff,
                sim.nlist.nlist if sim.nlist is not None else None)
            arr = np.asarray(res.f)[:n]
            gm_sf = np.asarray(
                sim.script.groups[sim.script.fixes[name].group])[:n]
            arr = np.where(gm_sf[:, None], arr, 0.0)
        else:
            arr = np.asarray(sim.script.fixes[name]._peratom_store)
        return arr if arr.ndim == 1 else arr[:, col if col is not None
                                             else 0]
    v = np.asarray(sys.v)[:n]
    x = np.asarray(sys.x)[:n]
    f = np.asarray(sim.res.f)[:n] if sim.res is not None else (
        np.zeros((n, 3)))
    src = {"x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
           "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
           "fx": f[:, 0], "fy": f[:, 1], "fz": f[:, 2],
           "q": np.asarray(sys.q)[:n],
           "type": np.asarray(sim.script.type)[:n].astype(float),
           "mol": np.asarray(sim.script.mol)[:n].astype(float),
           "mass": np.asarray(sim.thermo_params.mass_atom)[:n],
           "id": np.arange(1.0, n + 1)}
    return src[tok]


def eval_reduce(sim, cid):
    """compute reduce / reduce/region (compute_reduce.cpp): scalar or
    vector of reduced per-atom inputs."""
    gmask, spec = sim.reduce_computes[cid]
    n = sim.natoms
    mode = spec["mode"]
    gm = np.asarray(gmask)[:n].copy()
    sys = sim.sys
    if spec.get("region") is not None:
        gm &= np.asarray(sim.script._region_mask(
            spec["region"], x=_current_x(sys, n)))[:n]
    v = np.asarray(sys.v)[:n]
    x = np.asarray(sys.x)[:n]
    f = np.asarray(sim.res.f)[:n] if sim.res is not None else (
        np.zeros((n, 3)))
    outs = []
    for tok in spec["inputs"]:
        arr = peratom_column(sim, tok)
        sel = arr[gm]
        if mode == "sum":
            outs.append(sel.sum())
        elif mode == "min":
            outs.append(sel.min() if len(sel) else 0.0)
        elif mode == "max":
            outs.append(sel.max() if len(sel) else 0.0)
        elif mode == "ave":
            outs.append(sel.mean() if len(sel) else 0.0)
        else:
            raise ValueError(f"reduce mode {mode}")
    return outs[0] if len(outs) == 1 else outs


def eval_chunk_agg(sim, cid):
    """The */chunk aggregate family (compute_com_chunk.cpp,
    compute_vcm_chunk.cpp, compute_gyration_chunk.cpp,
    compute_angmom_chunk.cpp, compute_torque_chunk.cpp,
    compute_inertia_chunk.cpp, compute_omega_chunk.cpp,
    compute_dipole_chunk.cpp, compute_msd_chunk.cpp,
    compute_property_chunk.cpp, compute_temp_chunk.cpp): per-chunk
    reductions over the chunk/atom assignment, all on unwrapped
    coordinates (domain->unmap).  Returns an (nchunk, ncols) array;
    temp/chunk with no value keywords returns a float scalar."""
    from lidp_tpu.box import unwrap as _unwrap

    gmask, style, chunkid, extra = sim.chunkagg_computes[cid]
    ids, nchunk, ccoord = sim._chunk_ids(chunkid)
    n = sim.natoms
    # the aggregate compute's own group gates atoms on top of the
    # chunk compute's (ichunk>0 && mask&groupbit in every compute_array)
    ids = np.where(np.asarray(gmask)[:n], ids, 0)
    sel = ids > 0
    m = np.asarray(sim.thermo_params.mass_atom)[:n]
    sys = sim.sys
    xu = np.asarray(_unwrap(sys.x, sys.box, sys.image))[:n]
    v = np.asarray(sys.v)[:n]

    def _sum(w):
        return np.bincount(ids, weights=np.where(sel, w, 0.0),
                           minlength=nchunk + 1)[1:]

    def _sum3(w3):
        return np.stack([_sum(w3[:, d]) for d in range(3)], axis=1)

    M = _sum(m)
    ok = M > 0.0
    Ms = np.maximum(M, 1e-300)
    com = _sum3(m[:, None] * xu) / Ms[:, None]
    com[~ok] = 0.0
    d = xu - com[np.maximum(ids - 1, 0)]      # per-atom offset from chunk com

    if style == "com/chunk":
        return com
    if style == "vcm/chunk":
        vcm = _sum3(m[:, None] * v) / Ms[:, None]
        vcm[~ok] = 0.0
        return vcm
    if style == "gyration/chunk":
        if "tensor" in extra:
            # xx yy zz xy xz yz / masstotal (compute_gyration_chunk.cpp
            # compute_array)
            cols = [d[:, 0] * d[:, 0], d[:, 1] * d[:, 1],
                    d[:, 2] * d[:, 2], d[:, 0] * d[:, 1],
                    d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]]
            out = np.stack([_sum(m * c) for c in cols], 1) / Ms[:, None]
            out[~ok] = 0.0
            return out
        rg = np.sqrt(_sum(m * (d * d).sum(1)) / Ms)
        rg[~ok] = 0.0
        return rg[:, None]
    if style == "angmom/chunk":
        return _sum3(m[:, None] * np.cross(d, v))
    if style == "torque/chunk":
        f = np.asarray(sim.res.f)[:n]
        return _sum3(np.cross(d, f))
    if style in ("inertia/chunk", "omega/chunk"):
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        ine = np.stack([_sum(m * (dy * dy + dz * dz)),
                        _sum(m * (dx * dx + dz * dz)),
                        _sum(m * (dx * dx + dy * dy)),
                        -_sum(m * dx * dy),
                        -_sum(m * dy * dz),
                        -_sum(m * dx * dz)], axis=1)
        if style == "inertia/chunk":
            return ine
        L = _sum3(m[:, None] * np.cross(d, v))
        out = np.zeros((nchunk, 3))
        EPS = 1.0e-6        # compute_omega_chunk.cpp:27
        for k in range(nchunk):
            I = np.array([[ine[k, 0], ine[k, 3], ine[k, 5]],
                          [ine[k, 3], ine[k, 1], ine[k, 4]],
                          [ine[k, 5], ine[k, 4], ine[k, 2]]])
            det = np.linalg.det(I)
            if det > EPS:
                out[k] = np.linalg.solve(I, L[k])
            else:
                # (nearly) singular: diagonalize, zero tiny moments,
                # project L on principal axes (angmom_to_omega)
                w, E = np.linalg.eigh(I)
                if np.dot(np.cross(E[:, 0], E[:, 1]), E[:, 2]) < 0:
                    E[:, 2] = -E[:, 2]
                w = np.where(w < EPS * w.max(), 0.0, w)
                lam = E.T @ L[k]
                wbody = np.where(w > 0, lam / np.maximum(w, 1e-300), 0.0)
                out[k] = E @ wbody
        return out
    if style == "dipole/chunk":
        geom = any(e.startswith("geom") for e in extra)
        q = np.asarray(sys.q)[:n]
        if geom:
            cnt = _sum(np.ones(n))
            ctr = _sum3(xu) / np.maximum(cnt, 1e-300)[:, None]
            ctr[cnt <= 0] = 0.0
        else:
            ctr = com
        Q = _sum(q)
        mu = _sum3(q[:, None] * xu) - Q[:, None] * ctr
        return np.concatenate(
            [mu, np.sqrt((mu * mu).sum(1))[:, None]], axis=1)
    if style == "msd/chunk":
        ref = getattr(sim, "_msdchunk_ref", {}).get(cid)
        if ref is None:
            # first invocation = run setup (ComputeMSDChunk::setup)
            sim._msdchunk_ref = getattr(sim, "_msdchunk_ref", {})
            sim._msdchunk_ref[cid] = com.copy()
            return np.zeros((nchunk, 4))
        dd = com - ref
        return np.concatenate(
            [dd * dd, (dd * dd).sum(1)[:, None]], axis=1)
    if style == "property/chunk":
        cols = []
        cnt = _sum(np.ones(n))
        for tok in extra:
            if tok == "count":
                cols.append(cnt)
            elif tok.startswith("coord"):
                j = int(tok[5:]) - 1
                cc = np.asarray(ccoord)
                cols.append(cc if cc.ndim == 1 else cc[:, j])
            elif tok == "id":
                cols.append(np.arange(1.0, nchunk + 1))
            else:
                raise ValueError(f"property/chunk field {tok}")
        return np.stack(cols, axis=1)
    if style == "temp/chunk":
        # scalar temperature over chunked atoms; keywords com yes
        # (remove per-chunk vcm), adof/cdof (compute_temp_chunk.cpp)
        comflag = False
        adof, cdof = float(sim.thermo_params.dim), 0.0
        vals = []
        i = 0
        while i < len(extra):
            if extra[i] == "com":
                comflag = extra[i + 1] == "yes"; i += 2
            elif extra[i] == "adof":
                adof = float(extra[i + 1]); i += 2
            elif extra[i] == "cdof":
                cdof = float(extra[i + 1]); i += 2
            else:
                vals.append(extra[i]); i += 1
        vv = v.copy()
        if comflag:
            vcm = _sum3(m[:, None] * v) / Ms[:, None]
            vcm[~ok] = 0.0
            vv = v - vcm[np.maximum(ids - 1, 0)]
        mvv2e = sim.thermo_params.mvv2e
        boltz = sim.thermo_params.boltz
        if not vals:
            t = mvv2e * float(
                np.sum(np.where(sel, m * (vv * vv).sum(1), 0.0)))
            dof = nchunk * cdof + adof * float(sel.sum())
            return t / (dof * boltz) if dof > 0 else 0.0
        # per-chunk columns: temp / kecom / internal
        # (ComputeTempChunk::compute_array)
        cols = []
        cnt = _sum(np.ones(n))
        for tok in vals:
            if tok == "temp":
                t = _sum(m * (vv * vv).sum(1)) * mvv2e
                dof = cdof + adof * cnt
                cols.append(np.where(dof > 0, t / np.maximum(
                    dof, 1e-300) / boltz, 0.0))
            elif tok == "kecom":
                vcm = _sum3(m[:, None] * v) / Ms[:, None]
                vcm[~ok] = 0.0
                cols.append(0.5 * mvv2e * M * (vcm * vcm).sum(1))
            elif tok == "internal":
                vcm = _sum3(m[:, None] * v) / Ms[:, None]
                vcm[~ok] = 0.0
                dv = v - vcm[np.maximum(ids - 1, 0)]
                cols.append(0.5 * mvv2e * _sum(m * (dv * dv).sum(1)))
            else:
                raise ValueError(f"temp/chunk value {tok}")
        return np.stack(cols, axis=1)
    raise ValueError(style)
