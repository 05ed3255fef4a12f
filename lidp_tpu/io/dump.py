"""Trajectory dump writers: ``dump custom``/``atom``/``xyz`` text formats
plus the CHARMM/NAMD binary ``dcd`` format (dump_dcd.cpp).

Matches the reference Dump::write (dump.cpp:302) / DumpCustom text layout used
by the examples (columns like ``x y z type mol``), with ``dump_modify sort id``
ordering (our arrays are already id-ordered).
"""

from __future__ import annotations

import numpy as np


_INT_COLS = {"id", "type", "mol"}


def write_dump_frame(spec, sys, script, gmask, f=None):
    x = np.asarray(sys.x)
    v = np.asarray(sys.v)
    mu = np.asarray(sys.mu)
    fv = np.asarray(f) if f is not None else np.zeros_like(x)
    # wrap into the box for output (the engine may keep rigid coords
    # unwrapped) — but only on periodic dims: the reference never remaps
    # f/s/m boundaries (Dump::write, dump.cpp)
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    xw = np.where(per, x - np.floor((x - lo) / L) * L, x)
    ids = np.nonzero(gmask)[0]
    colvec = {
        "id": ids + 1,
        "x": xw[ids, 0], "y": xw[ids, 1], "z": xw[ids, 2],
        # scaled coords (dump atom default)
        "xs": (xw[ids, 0] - lo[0]) / L[0],
        "ys": (xw[ids, 1] - lo[1]) / L[1],
        "zs": (xw[ids, 2] - lo[2]) / L[2],
        "xu": x[ids, 0], "yu": x[ids, 1], "zu": x[ids, 2],
        "type": np.asarray(script.type)[ids],
        "mol": np.asarray(script.mol)[ids],
        "vx": v[ids, 0], "vy": v[ids, 1], "vz": v[ids, 2],
        "q": np.asarray(sys.q)[ids],
        "fx": fv[ids, 0], "fy": fv[ids, 1], "fz": fv[ids, 2],
        "mux": mu[ids, 0], "muy": mu[ids, 1], "muz": mu[ids, 2],
    }
    # per-atom compute/fix references (dump_custom.cpp c_ID / c_ID[n] and
    # f_ID / f_ID[n] columns — the latter from store/state / ave/atom)
    for c in spec.columns:
        if c.startswith(("c_", "f_")) and c not in colvec:
            sim = getattr(script, "_sim", None)
            name = c[2:]
            col = None
            if name.endswith("]"):
                name, idx = name[:-1].split("[")
                col = int(idx) - 1
            if c.startswith("c_"):
                from lidp_tpu.computes import eval_peratom

                arr = np.asarray(eval_peratom(sim, name))
            else:
                # a window-average fix that has not produced output yet
                # dumps zeros (its Nfreq hasn't elapsed)
                arr = np.asarray(getattr(script.fixes[name],
                                         "_peratom_store", np.zeros(1)))
            arr = arr if arr.ndim == 1 else arr[:, col or 0]
            full = np.zeros(len(gmask))
            full[:len(arr)] = arr
            colvec[c] = full[ids]

    mode = "a" if getattr(spec, "_started", False) else "w"
    if spec.style == "xyz":
        # dump_xyz.cpp: natoms line, comment, then 'TYPE x y z' rows
        # (element symbol = type number without a dump_modify element map)
        with open(spec.path, mode) as fh:
            fh.write("%d\n" % len(ids))
            fh.write("Atoms. Timestep: %d\n" % int(sys.step))
            for i in ids:
                fh.write("%d %g %g %g\n" % (int(script.type[i]),
                                             xw[i, 0], xw[i, 1], xw[i, 2]))
        spec._started = True
        return
    with open(spec.path, mode) as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % int(sys.step))
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(ids))
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            fh.write("%-1.16e %-1.16e\n" % (lo[d], hi[d]))
        fh.write("ITEM: ATOMS " + " ".join(spec.columns) + "\n")
        vals = np.stack([np.asarray(colvec[c], np.float64)
                         for c in spec.columns], axis=1)
        flags = np.array([c in _INT_COLS for c in spec.columns], np.uint8)
        ffmt = getattr(spec, "float_fmt", "%g")
        from lidp_tpu import native

        blob = (native.format_dump_rows(vals, flags)
                if ffmt == "%g" else None)
        if blob is not None:
            fh.write(blob.decode())
        else:   # custom float format (dump_modify format float) or no
            # compiler: pure-Python row formatter
            for r in range(vals.shape[0]):
                fh.write(" ".join(
                    str(int(vals[r, c])) if flags[c] else ffmt % vals[r, c]
                    for c in range(vals.shape[1])) + "\n")
    spec._started = True


def write_cfg_frame(spec, sys, script, gmask):
    """Extended CFG format (dump_cfg.cpp / AtomEye): H0 cell matrix,
    .NO_VELOCITY., per-atom mass + type label + scaled coords + any
    auxiliary columns after the mandatory `mass type xs ys zs` prefix."""
    ids = np.nonzero(gmask)[0]
    x = np.asarray(sys.x)
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    xw = np.where(per, x - np.floor((x - lo) / L) * L, x)
    xs = (xw - lo) / L
    cols = list(spec.columns)
    if cols[:5] != ["mass", "type", "xs", "ys", "zs"]:
        raise ValueError(
            "dump cfg requires 'mass type xs ys zs' leading columns")
    aux = cols[5:]
    v = np.asarray(sys.v)
    auxsrc = {"vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
              "q": np.asarray(sys.q), "id": np.arange(1, len(x) + 1)}
    typ = np.asarray(script.type)
    mass = np.asarray(script.mass_type)[typ]
    mode = "a" if getattr(spec, "_started", False) else "w"
    with open(spec.path, mode) as fh:
        fh.write("Number of particles = %d\n" % len(ids))
        fh.write("A = 1.0 Angstrom (basic length-scale)\n")
        for r in range(3):
            for c in range(3):
                fh.write("H0(%d,%d) = %.10g A\n"
                         % (r + 1, c + 1, L[r] if r == c else 0.0))
        fh.write(".NO_VELOCITY.\n")
        fh.write("entry_count = %d\n" % (3 + len(aux)))
        for k, a in enumerate(aux):
            fh.write("auxiliary[%d] = %s\n" % (k, a))
        last_t = None
        for i in ids:
            if typ[i] != last_t:
                fh.write("%.10g\n%d\n" % (mass[i], int(typ[i])))
                last_t = typ[i]
            row = list(xs[i]) + [auxsrc[a][i] for a in aux]
            fh.write(" ".join("%.10g" % val for val in row) + "\n")
    spec._started = True


def _fortran_rec(fh, payload: bytes):
    import struct

    fh.write(struct.pack("<i", len(payload)))
    fh.write(payload)
    fh.write(struct.pack("<i", len(payload)))


def write_dcd_frame(spec, sys, script, gmask):
    """CHARMM-format binary DCD frame (dump_dcd.cpp): 84-byte CORD header +
    title + natoms records once, then per frame a 6-double unit cell record
    and three float32 coordinate records."""
    import struct

    ids = np.nonzero(gmask)[0]
    x = np.asarray(sys.x)
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    xw = np.where(per, x - np.floor((x - lo) / L) * L, x)

    mode = "ab" if getattr(spec, "_started", False) else "wb"
    with open(spec.path, mode) as fh:
        if not getattr(spec, "_started", False):
            # CORD + 9 ints + delta + cell flag + 8 zeros + version = 84 B
            hdr = b"CORD" + struct.pack(
                "<9if9ii", 0, int(sys.step), spec.every, 0, 0, 0, 0, 0, 0,
                float(script.dt), 1, 0, 0, 0, 0, 0, 0, 0, 0, 24)
            _fortran_rec(fh, hdr)
            title = b"Created by lidp_tpu (dump_dcd.cpp format)".ljust(80)
            _fortran_rec(fh, struct.pack("<i", 1) + title)
            _fortran_rec(fh, struct.pack("<i", len(ids)))
        # unit cell: [a, cos(gamma), b, cos(beta), cos(alpha), c]
        cell = struct.pack("<6d", L[0], 0.0, L[1], 0.0, 0.0, L[2])
        _fortran_rec(fh, cell)
        for d in range(3):
            _fortran_rec(fh, xw[ids, d].astype("<f4").tobytes())
    spec._started = True


def _min_image(d, L):
    return d - np.round(d / L) * L


def _pair_local_rows(script, sys, gmask, values, pair, sp_code):
    """compute pair/local rows (compute_pair_local.cpp compute_pairs):
    every i<j pair inside the force cutoff with both atoms in the group;
    eng/force from the Pair::single analog.  Dense O(N^2) in row blocks
    (observability path, host-driven)."""
    import jax.numpy as jnp

    from lidp_tpu.ops.pair import pair_single

    n = int(np.count_nonzero(np.asarray(sys.mask)))
    x = np.asarray(sys.x)[:n]
    q = np.asarray(sys.q)[:n]
    ty = np.asarray(sys.type)[:n]
    L = np.asarray(sys.box.lengths)
    gm = np.asarray(gmask)[:n]
    cutsq = np.asarray(pair.cutsq)
    spl = np.asarray(pair.special_lj)
    spc = np.asarray(pair.special_coul)
    sp = (np.asarray(sp_code)[:n, :n] if sp_code is not None
          else np.zeros((n, n), np.int8))

    cols = {v: [] for v in values}
    B = 1024
    for i0 in range(0, n, B):
        i1 = min(i0 + B, n)
        d = x[i0:i1, None, :] - x[None, :, :]
        for dim in range(3):
            if sys.box.periodic[dim]:
                d[..., dim] = _min_image(d[..., dim], L[dim])
        rsq = np.sum(d * d, axis=-1)
        ii, jj = np.nonzero(
            (np.arange(i0, i1)[:, None] < np.arange(n)[None, :])
            & gm[i0:i1, None] & gm[None, :]
            & (rsq < cutsq[ty[i0:i1, None], ty[None, :]])
            # special pairs with both weights zero are not in the
            # reference's neighbor list at all (neighbor.cpp exclusions)
            & ~((spl[sp[i0:i1]] == 0.0) & (spc[sp[i0:i1]] == 0.0)))
        if len(ii) == 0:
            continue
        gi = ii + i0
        rs = rsq[ii, jj]
        eng, fpair = pair_single(
            jnp.asarray(rs), jnp.asarray(ty[gi]), jnp.asarray(ty[jj]),
            jnp.asarray(q[gi]), jnp.asarray(q[jj]), pair,
            factor_coul=jnp.asarray(spc[sp[gi, jj]]),
            factor_lj=jnp.asarray(spl[sp[gi, jj]]))
        eng = np.asarray(eng)
        fpair = np.asarray(fpair)
        dv = d[ii, jj]
        for v in values:
            if v == "dist":
                cols[v].append(np.sqrt(rs))
            elif v == "eng":
                cols[v].append(eng)
            elif v == "force":
                cols[v].append(np.sqrt(rs) * fpair)
            elif v in ("fx", "fy", "fz"):
                cols[v].append(dv[:, "xyz".index(v[1])] * fpair)
            elif v in ("p1", "p2"):
                cols[v].append((gi if v == "p1" else jj) + 1.0)
            else:
                raise ValueError(f"pair/local value {v}")
    return [np.concatenate(cols[v]) if cols[v] else np.zeros(0)
            for v in values]


def _bond_local_rows(script, sys, gmask, values):
    """compute bond/local rows (compute_bond_local.cpp): dist/engpot/force
    per bond with both atoms in the group, harmonic + fene styles."""
    bonds = np.asarray(script._bonds, np.int64) - 1
    btyp = np.asarray(script._bond_types, np.int64)
    n = int(np.count_nonzero(np.asarray(sys.mask)))
    x = np.asarray(sys.x)[:n]
    L = np.asarray(sys.box.lengths)
    gm = np.asarray(gmask)[:n]
    keep = gm[bonds[:, 0]] & gm[bonds[:, 1]]
    bonds, btyp = bonds[keep], btyp[keep]
    d = x[bonds[:, 0]] - x[bonds[:, 1]]
    for dim in range(3):
        if sys.box.periodic[dim]:
            d[:, dim] = _min_image(d[:, dim], L[dim])
    r = np.sqrt(np.sum(d * d, axis=-1))
    k = np.array([script.bond_coeffs[int(t)][0] for t in btyp])
    if script.bond_style == "harmonic":
        r0 = np.array([script.bond_coeffs[int(t)][1] for t in btyp])
        dr = r - r0
        epot = k * dr * dr
        fbond = -2.0 * k * dr / np.where(r > 0, r, 1.0)
    else:   # fene (bond_fene.cpp)
        R0 = np.array([script.bond_coeffs[int(t)][1] for t in btyp])
        eps = np.array([script.bond_coeffs[int(t)][2] for t in btyp])
        sig = np.array([script.bond_coeffs[int(t)][3] for t in btyp])
        rlogarg = 1.0 - (r / R0) ** 2
        epot = -0.5 * k * R0 * R0 * np.log(rlogarg)
        sr6 = (sig / np.where(r > 0, r, 1.0)) ** 6
        inside = r < sig * 2.0 ** (1.0 / 6.0)
        epot = epot + np.where(inside, 4.0 * (sr6 * sr6 - sr6) + 1.0, 0.0)
        fbond = -k / rlogarg + np.where(
            inside, 24.0 * (2.0 * sr6 * sr6 - sr6) / (r * r), 0.0)
    out = []
    for v in values:
        if v == "dist":
            out.append(r)
        elif v == "engpot":
            out.append(epot)
        elif v == "force":
            out.append(fbond * r)
        else:
            raise ValueError(f"bond/local value {v}")
    return out




def _property_local_rows(script, sys, gmask, values, pair, sp_code):
    """compute property/local (compute_property_local.cpp): per-pair
    (patom1/patom2/ptype1/ptype2 — force-cutoff pairs, natom* — neighbor
    pairs incl. skin) or per-bond (batom1/batom2/btype) index columns,
    enumerated in the same order as pair/local / bond/local so mixed
    dump-local column sets line up row-for-row."""
    kinds = {v[0] for v in values}
    if kinds <= {"p", "n"}:
        n = int(np.count_nonzero(np.asarray(sys.mask)))
        x = np.asarray(sys.x)[:n]
        ty = np.asarray(sys.type)[:n]
        L = np.asarray(sys.box.lengths)
        gm = np.asarray(gmask)[:n]
        cutsq = np.asarray(pair.cutsq)
        if any(v.startswith("n") for v in values):
            cutsq = (np.sqrt(cutsq) + script.skin) ** 2
        spl = np.asarray(pair.special_lj)
        spc = np.asarray(pair.special_coul)
        sp = (np.asarray(sp_code)[:n, :n] if sp_code is not None
              else np.zeros((n, n), np.int8))
        cols = {v: [] for v in values}
        B = 1024
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            d = x[i0:i1, None, :] - x[None, :, :]
            for dim in range(3):
                if sys.box.periodic[dim]:
                    d[..., dim] = _min_image(d[..., dim], L[dim])
            rsq = np.sum(d * d, axis=-1)
            ii, jj = np.nonzero(
                (np.arange(i0, i1)[:, None] < np.arange(n)[None, :])
                & gm[i0:i1, None] & gm[None, :]
                & (rsq < cutsq[ty[i0:i1, None], ty[None, :]])
                & ~((spl[sp[i0:i1]] == 0.0) & (spc[sp[i0:i1]] == 0.0)))
            gi = ii + i0
            for v in values:
                if v in ("patom1", "natom1"):
                    cols[v].append(gi + 1.0)
                elif v in ("patom2", "natom2"):
                    cols[v].append(jj + 1.0)
                elif v in ("ptype1", "ntype1"):
                    cols[v].append(ty[gi].astype(float))
                elif v in ("ptype2", "ntype2"):
                    cols[v].append(ty[jj].astype(float))
                else:
                    raise ValueError(f"property/local value {v}")
        return [np.concatenate(cols[v]) if cols[v] else np.zeros(0)
                for v in values]
    if kinds <= {"b"}:
        bonds = np.asarray(script._bonds, np.int64)
        btyp = np.asarray(script._bond_types, np.int64)
        n = int(np.count_nonzero(np.asarray(sys.mask)))
        gm = np.asarray(gmask)[:n]
        keep = gm[bonds[:, 0] - 1] & gm[bonds[:, 1] - 1] & (btyp != 0)
        out = []
        for v in values:
            if v == "batom1":
                out.append(bonds[keep, 0].astype(float))
            elif v == "batom2":
                out.append(bonds[keep, 1].astype(float))
            elif v == "btype":
                out.append(btyp[keep].astype(float))
            else:
                raise ValueError(f"property/local value {v}")
        return out
    raise ValueError(
        "property/local: mixed pair/bond value kinds in one compute")


def _angle_geometry(script, sys, idx):
    n = int(np.count_nonzero(np.asarray(sys.mask)))
    x = np.asarray(sys.x)[:n]
    L = np.asarray(sys.box.lengths)

    def mi(d):
        for dim in range(3):
            if sys.box.periodic[dim]:
                d[:, dim] = _min_image(d[:, dim], L[dim])
        return d

    return x, mi


def _angle_local_rows(script, sys, gmask, values):
    """compute angle/local (compute_angle_local.cpp): theta (degrees)
    and eng per angle with all three atoms in the group."""
    angles = np.asarray(script._angles, np.int64) - 1
    atyp = np.asarray(script._angle_types, np.int64)
    x, mi = _angle_geometry(script, sys, angles)
    gm = np.asarray(gmask)[:len(np.asarray(sys.mask))]
    keep = (gm[angles[:, 0]] & gm[angles[:, 1]] & gm[angles[:, 2]])
    angles, atyp = angles[keep], atyp[keep]
    d1 = mi(x[angles[:, 0]] - x[angles[:, 1]])
    d2 = mi(x[angles[:, 2]] - x[angles[:, 1]])
    c = (d1 * d2).sum(1) / (np.linalg.norm(d1, axis=1)
                            * np.linalg.norm(d2, axis=1))
    theta = np.arccos(np.clip(c, -1.0, 1.0))
    out = []
    for v in values:
        if v == "theta":
            out.append(np.rad2deg(theta))
        elif v == "eng":
            co = script.angle_coeffs
            k = np.array([co[int(t)][0] for t in atyp])
            style = script.angle_style
            if style in ("harmonic", "charmm"):
                t0 = np.deg2rad([co[int(t)][1] for t in atyp])
                e = k * (theta - t0) ** 2
                if style == "charmm":
                    kub = np.array([co[int(t)][2] for t in atyp])
                    rub = np.array([co[int(t)][3] for t in atyp])
                    r13 = np.linalg.norm(d2 - d1, axis=1)
                    e = e + kub * (r13 - rub) ** 2
            elif style == "cosine":
                e = k * (1.0 + np.cos(theta))
            elif style == "cosine/squared":
                t0 = np.deg2rad([co[int(t)][1] for t in atyp])
                e = k * (np.cos(theta) - np.cos(t0)) ** 2
            else:
                raise ValueError(
                    f"angle/local eng unsupported for {style}")
            out.append(e)
        else:
            raise ValueError(f"angle/local value {v}")
    return out


def _torsion_angles(script, sys, quads):
    x, mi = _angle_geometry(script, sys, quads)
    b1 = mi(x[quads[:, 1]] - x[quads[:, 0]])
    b2 = mi(x[quads[:, 2]] - x[quads[:, 1]])
    b3 = mi(x[quads[:, 3]] - x[quads[:, 2]])
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    nn = np.maximum(np.linalg.norm(n1, axis=1)
                    * np.linalg.norm(n2, axis=1), 1e-30)
    cphi = np.clip((n1 * n2).sum(1) / nn, -1.0, 1.0)
    sphi = (np.cross(n1, n2) * b2).sum(1) / (
        nn * np.linalg.norm(b2, axis=1))
    return np.arctan2(sphi, cphi)


def _dihedral_local_rows(script, sys, gmask, values):
    """compute dihedral/local (compute_dihedral_local.cpp): phi only."""
    quads = np.asarray(script._dihedrals, np.int64) - 1
    gm = np.asarray(gmask)
    keep = gm[quads].all(axis=1)
    phi = _torsion_angles(script, sys, quads[keep])
    out = []
    for v in values:
        if v != "phi":
            raise ValueError(f"dihedral/local value {v}")
        out.append(np.rad2deg(phi))
    return out


def _improper_local_rows(script, sys, gmask, values):
    """compute improper/local (compute_improper_local.cpp): chi only."""
    quads = np.asarray(script._impropers, np.int64) - 1
    gm = np.asarray(gmask)
    keep = gm[quads].all(axis=1)
    chi = _torsion_angles(script, sys, quads[keep])
    out = []
    for v in values:
        if v != "chi":
            raise ValueError(f"improper/local value {v}")
        out.append(np.rad2deg(chi))
    return out


def _rigid_local_rows(values, rigid, sys, script):
    """compute rigid/local (compute_rigid_local.cpp:61-96, pack columns
    :150-260): one row per rigid body.  `rigid` = (RigidParams, RigidState)
    from the live integrator.  id/mol use the body's lowest atom tag /
    molecule id (the reference packs tag[ilocal]/molecule[ilocal] of the
    rank-local owning atom, which is decomposition-dependent)."""
    from lidp_tpu.integrate.rigid import q_to_matrix

    p, st = rigid
    nb = p.nbody
    body = np.asarray(p.body)
    xcm = np.asarray(st.xcm)[:nb]
    vcm = np.asarray(st.vcm)[:nb]
    fcm = np.asarray(st.fcm)[:nb]
    tq = np.asarray(st.torque)[:nb]
    L = np.asarray(st.angmom)[:nb]
    quat = np.asarray(st.quat)[:nb]
    inertia = np.asarray(p.inertia)[:nb]
    R = np.asarray(q_to_matrix(st.quat))[:nb]
    mbody = np.einsum("bij,bi->bj", R, L)
    wbody = np.where(inertia > 0.0,
                     mbody / np.where(inertia > 0.0, inertia, 1.0), 0.0)
    omega = np.einsum("bij,bj->bi", R, wbody)
    lo = np.asarray(sys.box.lo)
    lens = np.asarray(sys.box.hi) - lo
    img = np.floor((xcm - lo) / lens).astype(int)
    xwrap = xcm - img * lens
    first = np.full(nb, -1, int)
    for i in range(len(body) - 1, -1, -1):
        if body[i] < nb:
            first[body[i]] = i
    cols = {
        "id": first + 1.0,
        "mol": np.asarray(script.mol, float)[first] if getattr(
            script, "mol", None) is not None else first + 1.0,
        "mass": np.asarray(p.masstotal)[:nb],
    }
    for d, ax in enumerate("xyz"):
        cols[ax] = xwrap[:, d]
        cols[ax + "u"] = xcm[:, d]
        cols["i" + ax] = img[:, d].astype(float)
        cols["v" + ax] = vcm[:, d]
        cols["f" + ax] = fcm[:, d]
        cols["tq" + ax] = tq[:, d]
        cols["omega" + ax] = omega[:, d]
        cols["angmom" + ax] = L[:, d]
        cols["inertia" + ax] = inertia[:, d]
    for k, d in zip("wijk", range(4)):
        cols["quat" + k] = quat[:, d]
    out = []
    for v in values:
        if v not in cols:
            raise ValueError(f"rigid/local value {v}")
        out.append(cols[v])
    return out


def write_local_frame(spec, sys, script, gmask, pair=None, sp_code=None,
                      rigid=None):
    """dump local (dump_local.cpp): per-entry rows from compute
    pair/local / bond/local references; columns are `index` or
    `c_ID[n]`/`c_ID` tokens and the ENTRIES header echoes them."""
    cache = {}

    def compute_rows(cid):
        if cid not in cache:
            grp, style, vals = script.computes[cid]
            cgm = np.asarray(script.groups[grp])
            if style == "pair/local":
                cache[cid] = _pair_local_rows(script, sys, cgm, vals,
                                              pair, sp_code)
            elif style == "bond/local":
                cache[cid] = _bond_local_rows(script, sys, cgm, vals)
            elif style == "angle/local":
                cache[cid] = _angle_local_rows(script, sys, cgm, vals)
            elif style == "dihedral/local":
                cache[cid] = _dihedral_local_rows(script, sys, cgm, vals)
            elif style == "improper/local":
                cache[cid] = _improper_local_rows(script, sys, cgm, vals)
            elif style == "property/local":
                cache[cid] = _property_local_rows(script, sys, cgm, vals,
                                                  pair, sp_code)
            elif style == "rigid/local":
                if rigid is None:
                    raise ValueError(
                        "compute rigid/local requires a rigid fix")
                cache[cid] = _rigid_local_rows(vals["values"], rigid,
                                               sys, script)
            else:
                raise ValueError(f"dump local needs a local compute, "
                                 f"got {style}")
        return cache[cid]

    cols = []
    nrows = 0
    for tok in spec.columns:
        if tok == "index":
            cols.append(("index", None))
            continue
        assert tok.startswith("c_"), tok
        if "[" in tok:
            cid, idx = tok[2:].rstrip("]").split("[")
            vals = compute_rows(cid)
            col = vals[int(idx) - 1]
        else:
            cid = tok[2:]
            col = compute_rows(cid)[0]
        nrows = max(nrows, len(col))
        cols.append((tok, col))

    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    mode = "a" if getattr(spec, "_started", False) else "w"
    with open(spec.path, mode) as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % int(sys.step))
        fh.write("ITEM: NUMBER OF ENTRIES\n%d\n" % nrows)
        bflags = " ".join("pp" if p else "ff"
                          for p in np.asarray(sys.box.periodic))
        fh.write(f"ITEM: BOX BOUNDS {bflags}\n")
        for dd in range(3):
            fh.write(f"{lo[dd]:.16e} {hi[dd]:.16e}\n")
        fh.write("ITEM: ENTRIES %s\n" % " ".join(t for t, _ in cols))
        for m in range(nrows):
            fh.write(" ".join(
                str(m + 1) if c is None else f"{c[m]:.8g}"
                for _, c in cols) + "\n")
    spec._started = True


# default dump_image type palette (dump_image.cpp default color cycle)
_IMAGE_COLORS = np.array([
    [1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [0.0, 1.0, 1.0],
    [1.0, 0.0, 1.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.65, 0.0],
])


def write_image_frame(spec, sys, script, gmask):
    """dump image (dump_image.cpp re-imagined small): an orthographic
    software rasterizer — atoms as depth-sorted diffuse-shaded spheres,
    colored by type — written as binary PPM (the reference's -DLAMMPS_JPEG
    fallback format).  Supported keywords: size, zoom, adiam, view."""
    kw = {"size": (512, 512), "zoom": 1.0, "adiam": None,
          "view": (60.0, 30.0)}
    toks = list(spec.columns[2:])   # after the color/diameter attrs
    i = 0
    while i < len(toks):
        if toks[i] == "size":
            kw["size"] = (int(toks[i + 1]), int(toks[i + 2])); i += 3
        elif toks[i] == "zoom":
            kw["zoom"] = float(toks[i + 1]); i += 2
        elif toks[i] == "adiam":
            kw["adiam"] = float(toks[i + 1]); i += 2
        elif toks[i] == "view":
            kw["view"] = (float(toks[i + 1]), float(toks[i + 2])); i += 3
        else:
            i += 1
    W, H = kw["size"]

    n = int(np.count_nonzero(np.asarray(sys.mask)))
    sel = np.asarray(gmask)[:n]
    x = np.asarray(sys.x)[:n][sel]
    ty = np.asarray(sys.type)[:n][sel]
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    x = np.where(per, x - np.floor((x - lo) / L) * L, x)

    th, ph = np.radians(kw["view"][0]), np.radians(kw["view"][1])
    # camera basis: right/up/depth from polar theta, azimuth phi
    dirv = np.array([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                     np.cos(th)])
    up0 = np.array([0.0, 0.0, 1.0]) if abs(dirv[2]) < 0.99 \
        else np.array([0.0, 1.0, 0.0])
    right = np.cross(up0, dirv)
    right /= np.linalg.norm(right)
    up = np.cross(dirv, right)
    ctr = 0.5 * (lo + hi)
    rel = x - ctr
    u = rel @ right
    v = rel @ up
    w = rel @ dirv
    ext = max(float(np.max(np.abs(L))) * 0.75, 1e-6)
    scale = min(W, H) / (2.0 * ext) * kw["zoom"]
    diam = (kw["adiam"] if kw["adiam"] is not None
            else 0.5 * float(np.min(L)) / max(len(x) ** (1.0 / 3.0), 1.0))
    rad_px = np.full(len(x), max(0.5 * diam * scale, 1.0))

    img = np.zeros((H, W, 3), np.float64)
    zbuf = np.full((H, W), -np.inf)
    px = (W / 2.0 + u * scale)
    py = (H / 2.0 - v * scale)
    light = np.array([-0.4, 0.4, 0.8])
    light /= np.linalg.norm(light)
    order = np.argsort(w)           # back-to-front (painter + zbuffer)
    for k in order:
        r = rad_px[k]
        x0, x1 = int(max(px[k] - r, 0)), int(min(px[k] + r + 1, W))
        y0, y1 = int(max(py[k] - r, 0)), int(min(py[k] + r + 1, H))
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        dx = (xx - px[k]) / r
        dy = (yy - py[k]) / r
        d2 = dx * dx + dy * dy
        inside = d2 <= 1.0
        nz = np.sqrt(np.clip(1.0 - d2, 0.0, 1.0))
        zhere = w[k] + nz
        shade = np.clip(-dx * light[0] + dy * light[1] + nz * light[2],
                        0.15, 1.0)
        color = _IMAGE_COLORS[(int(ty[k]) - 1) % len(_IMAGE_COLORS)]
        m = inside & (zhere > zbuf[y0:y1, x0:x1])
        for c in range(3):
            ch = img[y0:y1, x0:x1, c]
            ch[m] = color[c] * shade[m]
        zbuf[y0:y1, x0:x1][m] = zhere[m]
    path = spec.path.replace("*", str(int(sys.step)))
    with open(path, "wb") as fh:
        fh.write(b"P6\n%d %d\n255\n" % (W, H))
        fh.write((img * 255.0 + 0.5).astype(np.uint8).tobytes())


def read_dump_frames(path):
    """Parse a native text dump (the dump_custom.cpp format;
    reader_native.cpp analog) into a list of frames
    ``(step, lo, hi, tilt, colnames, data[n, ncol])``.

    Triclinic frames carry BOX BOUNDS xy xz yz with the bound-extended
    extents (domain.cpp:1600-1618); the true lo/hi are recovered by
    subtracting the min/max tilt combinations."""
    frames = []
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].startswith("ITEM: TIMESTEP"):
            i += 1
            continue
        step = int(lines[i + 1])
        i += 2
        if not lines[i].startswith("ITEM: NUMBER OF ATOMS"):
            raise ValueError("malformed dump: expected NUMBER OF ATOMS")
        n = int(lines[i + 1])
        i += 2
        hdr = lines[i]
        if not hdr.startswith("ITEM: BOX BOUNDS"):
            raise ValueError("malformed dump: expected BOX BOUNDS")
        has_tilt = " xy " in hdr + " " or "xy xz yz" in hdr
        lo = np.zeros(3)
        hi = np.zeros(3)
        tilt = np.zeros(3)
        for d in range(3):
            t = lines[i + 1 + d].split()
            lo[d], hi[d] = float(t[0]), float(t[1])
            if has_tilt:
                tilt[d] = float(t[2])
        if has_tilt:
            xy, xz, yz = tilt
            lo[0] -= min(0.0, xy, xz, xy + xz)
            hi[0] -= max(0.0, xy, xz, xy + xz)
            lo[1] -= min(0.0, yz)
            hi[1] -= max(0.0, yz)
        i += 4
        cols = lines[i].split()[2:]
        data = np.asarray(
            [[float(v) for v in lines[i + 1 + k].split()]
             for k in range(n)])
        i += 1 + n
        frames.append((step, lo, hi, tilt, cols, data))
    return frames
