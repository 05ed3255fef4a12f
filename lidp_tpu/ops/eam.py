"""EAM (embedded atom method) pair style — funcfl single-element variant.

The reference's MANYBODY/pair_eam.cpp as a TPU-native two-pass cell kernel:

  pass 1: rho_i = sum_j rho(r_ij)          (density accumulation)
  embed:  F'(rho_i), E_embed = F(rho_i)    (per-atom spline)
  pass 2: fpair = -(F'_i rho'(r) + F'_j rho'(r) + phi'(r))/r, evdwl = phi(r)

Tabulated functions are built exactly like the reference: funcfl reading
(read_file, pair_eam.cpp:480-510), z2r = 27.2*0.529*Z_i(r)*Z_j(r) (:683), and
the same finite-difference cubic spline (interpolate(), :720-750).  On
device, per-pair table lookups would be scalar gathers (the TPU-killer, see
parallel/shard.py); instead the splined r-functions are refit to K uniform
segments of degree-7 polynomials evaluated via one-hot MXU matmuls (fit
residual ~1e-9 of scale, far below the reference's own spline error).  The
per-atom embedding keeps the exact reference spline (N gathers, cheap).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import Box, minimum_image
from lidp_tpu.ops.cells import _OFFSETS, Cells


def read_funcfl(path: str):
    with open(path) as fh:
        fh.readline()                       # comment
        parts = fh.readline().split()
        mass = float(parts[1])
        nums = []
        for line in fh:
            nums.extend(float(v) for v in line.split())
    it = iter(nums)
    nrho = int(next(it)); drho = next(it)
    nr = int(next(it)); dr = next(it); cut = next(it)
    rest = list(it)
    frho = np.array(rest[:nrho])
    zr = np.array(rest[nrho:nrho + nr])
    rhor = np.array(rest[nrho + nr:nrho + 2 * nr])
    return dict(nrho=nrho, drho=drho, nr=nr, dr=dr, cut=cut,
                frho=frho, zr=zr, rhor=rhor, mass=mass)


def read_setfl(path: str, fs: bool = False):
    """Parse a setfl (eam/alloy) file — pair_eam_alloy.cpp::read_file.

    Layout: 3 comment lines; `Nelem name1..nameN`; `nrho drho nr dr cut`;
    per element: header (atomic number, mass, lattice const, structure),
    nrho F(rho) values, nr rho(r) values; then nr r*phi values for each
    element pair i>=j (lower triangle, row-major).

    fs=True parses the Finnis-Sinclair variant
    (pair_eam_fs.cpp::read_file:195-206): each element block carries
    nelem density arrays rhor[i][j] — the density function of element i
    toward element j; rhor is then a flat list of nelem*nelem arrays
    indexed i*nelem + j."""
    with open(path) as fh:
        for _ in range(3):
            fh.readline()
        parts = fh.readline().split()
        nelem = int(parts[0])
        names = parts[1:1 + nelem]
        toks = fh.read().split()
    it = iter(toks)
    nrho = int(next(it)); drho = float(next(it))
    nr = int(next(it)); dr = float(next(it)); cut = float(next(it))
    mass, frho, rhor = [], [], []
    for _ in range(nelem):
        next(it)                       # atomic number
        mass.append(float(next(it)))
        next(it); next(it)             # lattice constant, structure
        frho.append(np.array([float(next(it)) for _ in range(nrho)]))
        for _j in range(nelem if fs else 1):
            rhor.append(np.array([float(next(it)) for _ in range(nr)]))
    z2r = {}
    for i in range(nelem):
        for j in range(i + 1):
            z2r[(i, j)] = np.array([float(next(it)) for _ in range(nr)])
    return dict(nelem=nelem, names=names, nrho=nrho, drho=drho, nr=nr, dr=dr,
                cut=cut, mass=mass, frho=frho, rhor=rhor, z2r=z2r)


def lammps_spline(f: np.ndarray, delta: float) -> np.ndarray:
    """Exact PairEAM::interpolate coefficients; returns (n+1, 7), 1-indexed."""
    n = len(f)
    sp = np.zeros((n + 1, 7))
    sp[1:, 6] = f
    sp[1, 5] = sp[2, 6] - sp[1, 6]
    sp[2, 5] = 0.5 * (sp[3, 6] - sp[1, 6])
    sp[n - 1, 5] = 0.5 * (sp[n, 6] - sp[n - 2, 6])
    sp[n, 5] = sp[n, 6] - sp[n - 1, 6]
    for m in range(3, n - 1):
        sp[m, 5] = ((sp[m - 2, 6] - sp[m + 2, 6])
                    + 8.0 * (sp[m + 1, 6] - sp[m - 1, 6])) / 12.0
    for m in range(1, n):
        sp[m, 4] = 3.0 * (sp[m + 1, 6] - sp[m, 6]) - 2.0 * sp[m, 5] - sp[m + 1, 5]
        sp[m, 3] = sp[m, 5] + sp[m + 1, 5] - 2.0 * (sp[m + 1, 6] - sp[m, 6])
    sp[n, 4] = 0.0
    sp[n, 3] = 0.0
    sp[:, 2] = sp[:, 5] / delta
    sp[:, 1] = 2.0 * sp[:, 4] / delta
    sp[:, 0] = 3.0 * sp[:, 3] / delta
    return sp


def spline_value(sp: np.ndarray, delta: float, x: np.ndarray):
    """Evaluate value exactly like the reference kernel (p = x/delta + 1)."""
    n = sp.shape[0] - 1
    p = x / delta + 1.0
    m = np.minimum(np.maximum(p.astype(int), 1), n - 1)
    p = np.minimum(p - m, 1.0)
    c = sp[m]
    return ((c[:, 3] * p + c[:, 4]) * p + c[:, 5]) * p + c[:, 6]


def spline_deriv(sp: np.ndarray, delta: float, x: np.ndarray):
    n = sp.shape[0] - 1
    p = x / delta + 1.0
    m = np.minimum(np.maximum(p.astype(int), 1), n - 1)
    p = np.minimum(p - m, 1.0)
    c = sp[m]
    return (c[:, 0] * p + c[:, 1]) * p + c[:, 2]


def _fit_segments(xs, ys, nseg, deg, xmax):
    """Least-squares degree-`deg` polynomials per uniform segment of [0,xmax]."""
    coeffs = np.zeros((nseg, deg + 1))
    seg = np.minimum((xs / xmax * nseg).astype(int), nseg - 1)
    for s in range(nseg):
        m = seg == s
        xi = xs[m] / xmax * nseg - s          # [0,1)
        V = np.vander(xi, deg + 1, increasing=True)
        coeffs[s] = np.linalg.lstsq(V, ys[m], rcond=None)[0]
    return coeffs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EAMParams:
    # per-pair r-functions as segment polynomials over [0, cut]
    seg_coeffs: jax.Array    # (K, 4*(D+1)): rho, rhop, z2, z2p stacked
    frho_spline: jax.Array   # (nrho+1, 7) exact embedding spline
    cut: jax.Array
    cutsq: jax.Array
    drho: jax.Array
    rhomax: jax.Array
    nseg: int = dataclasses.field(metadata=dict(static=True), default=64)
    deg: int = dataclasses.field(metadata=dict(static=True), default=7)
    nrho: int = dataclasses.field(metadata=dict(static=True), default=500)


def build_eam_params(path: str, dtype=jnp.float32, nseg=64, deg=7) -> EAMParams:
    d = read_funcfl(path)
    z2r = 27.2 * 0.529 * d["zr"] * d["zr"]
    sp_rho = lammps_spline(d["rhor"], d["dr"])
    sp_z2 = lammps_spline(z2r, d["dr"])
    sp_f = lammps_spline(d["frho"], d["drho"])

    cut = d["cut"]
    xs = np.linspace(0.0, cut, 20000, endpoint=False) + cut / 40000.0
    funcs = [spline_value(sp_rho, d["dr"], xs), spline_deriv(sp_rho, d["dr"], xs),
             spline_value(sp_z2, d["dr"], xs), spline_deriv(sp_z2, d["dr"], xs)]
    coeffs = np.concatenate(
        [_fit_segments(xs, f, nseg, deg, cut) for f in funcs], axis=1)
    return EAMParams(
        seg_coeffs=jnp.asarray(coeffs, dtype),
        frho_spline=jnp.asarray(sp_f, dtype),
        cut=jnp.asarray(cut, dtype), cutsq=jnp.asarray(cut * cut, dtype),
        drho=jnp.asarray(d["drho"], dtype),
        rhomax=jnp.asarray((d["nrho"] - 1) * d["drho"], dtype),
        nseg=nseg, deg=deg, nrho=d["nrho"],
    ), d["mass"]


def _segment_onehot(r, cut, nseg):
    dtype = r.dtype
    s = jnp.clip((r / cut * nseg).astype(jnp.int32), 0, nseg - 1)
    xi = r / cut * nseg - s.astype(dtype)
    oh = (s[..., None] == jnp.arange(nseg)).astype(dtype)
    return oh.reshape(-1, nseg), xi


def _horner(c, xi, deg, nfun):
    out = []
    for k in range(nfun):
        ck = c[..., k * (deg + 1):(k + 1) * (deg + 1)]
        acc = ck[..., deg]
        for j in range(deg - 1, -1, -1):
            acc = acc * xi + ck[..., j]
        out.append(acc)
    return out


def _eval_segments(r, p: EAMParams):
    """Evaluate (rho, rhop, z2, z2p) at r via one-hot matmul (no gathers)."""
    flat, xi = _segment_onehot(r, p.cut, p.nseg)
    c = jnp.dot(flat, p.seg_coeffs, preferred_element_type=r.dtype,
                precision=jax.lax.Precision.HIGHEST)
    c = c.reshape(r.shape + (4 * (p.deg + 1),))
    return _horner(c, xi, p.deg, 4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EAMAlloyParams:
    """setfl (eam/alloy) tables — pair_eam_alloy.cpp.

    Per-element rho/rho' and per-element-pair z2/z2' segment polynomials;
    per-element embedding splines; LAMMPS-type -> element map from the
    `pair_coeff * * file El1 El2 ... [NULL]` grammar (coeff(), setfl files
    are NOT mixed — z2r is tabulated per pair, unlike funcfl's sqrt rule)."""
    seg_rho: jax.Array       # (nelem, K, 2*(D+1)): rho, rhop
    seg_z2: jax.Array        # (npair, K, 2*(D+1)): z2, z2p; idx i*(i+1)/2+j
    frho_spline: jax.Array   # (nelem, nrho+1, 7)
    type2elem: jax.Array     # (ntypes+1,) int32
    cut: jax.Array
    cutsq: jax.Array
    drho: jax.Array
    rhomax: jax.Array
    nseg: int = dataclasses.field(metadata=dict(static=True), default=64)
    deg: int = dataclasses.field(metadata=dict(static=True), default=7)
    nrho: int = dataclasses.field(metadata=dict(static=True), default=500)
    nelem: int = dataclasses.field(metadata=dict(static=True), default=1)
    # Finnis-Sinclair (pair_eam_fs.cpp): seg_rho holds nelem*nelem tables
    # flat-indexed src*nelem + dst; density at atom i due to neighbor j
    # reads [ej*nelem + ei] (type2rhor[jtype][itype], pair_eam.cpp:205)
    fs: bool = dataclasses.field(metadata=dict(static=True), default=False)


def build_eam_alloy_params(path: str, elem_for_type, dtype=jnp.float32,
                           nseg=64, deg=7, fs=False):
    """elem_for_type: list of element names (or None for NULL), one per
    LAMMPS type 1..ntypes.  Returns (EAMAlloyParams, mass_per_type[T+1])."""
    d = read_setfl(path, fs=fs)
    cut, dr = d["cut"], d["dr"]
    xs = np.linspace(0.0, cut, 20000, endpoint=False) + cut / 40000.0

    seg_rho, frho = [], []
    for e in range(d["nelem"] ** 2 if fs else d["nelem"]):
        sp_rho = lammps_spline(d["rhor"][e], dr)
        fr = [spline_value(sp_rho, dr, xs), spline_deriv(sp_rho, dr, xs)]
        seg_rho.append(np.concatenate(
            [_fit_segments(xs, f, nseg, deg, cut) for f in fr], axis=1))
    for e in range(d["nelem"]):
        frho.append(lammps_spline(d["frho"][e], d["drho"]))
    seg_z2 = []
    for i in range(d["nelem"]):
        for j in range(i + 1):
            sp_z2 = lammps_spline(d["z2r"][(i, j)], dr)
            fz = [spline_value(sp_z2, dr, xs), spline_deriv(sp_z2, dr, xs)]
            seg_z2.append(np.concatenate(
                [_fit_segments(xs, f, nseg, deg, cut) for f in fz], axis=1))

    t2e = np.zeros(len(elem_for_type) + 1, np.int32)
    mass_t = np.zeros(len(elem_for_type) + 1)
    for t, name in enumerate(elem_for_type, start=1):
        if name is None or name == "NULL":
            t2e[t] = 0
            continue
        if name not in d["names"]:
            raise ValueError(f"element {name} not in {path}: {d['names']}")
        e = d["names"].index(name)
        t2e[t] = e
        mass_t[t] = d["mass"][e]
    return EAMAlloyParams(
        seg_rho=jnp.asarray(np.stack(seg_rho), dtype),
        seg_z2=jnp.asarray(np.stack(seg_z2), dtype),
        frho_spline=jnp.asarray(np.stack(frho), dtype),
        type2elem=jnp.asarray(t2e),
        cut=jnp.asarray(cut, dtype), cutsq=jnp.asarray(cut * cut, dtype),
        drho=jnp.asarray(d["drho"], dtype),
        rhomax=jnp.asarray((d["nrho"] - 1) * d["drho"], dtype),
        nseg=nseg, deg=deg, nrho=d["nrho"], nelem=d["nelem"], fs=fs,
    ), mass_t


def eam_cell_forces(x, mask, cells: Cells, box: Box, p: EAMParams,
                    need_ev: bool = True):
    """Two-pass EAM via the rolled cell grid with Newton half-stencil
    (npair_half_bin_newton.cpp analog): densities and pair forces are
    symmetric for the single-element funcfl case, so each stencil pair is
    evaluated once — the j-side contribution rolls back to its home cell.
    need_ev=False skips the pair-energy/virial sums (the embedding energy
    is a free by-product of pass 1 and is always returned).
    Returns (f, evdwl, virial6)."""
    n = x.shape[0]
    dtype = x.dtype
    aos = cells.atom_of_slot
    cap = aos.shape[-1]
    L = box.img_lengths
    amax = jnp.minimum(aos, n - 1)
    valid = aos < n

    def slotify(a):
        return jnp.where(valid, a[amax], 0.0)

    xs = [slotify(x[:, d_]) for d_ in range(3)]

    def ctr(a):
        return a[..., :, None]

    def _roll(a, off, sign=-1):
        for ax, sh in enumerate(off):
            if sh:
                a = jnp.roll(a, sign * sh, axis=ax)
        return a

    def nbr(a, off):
        return _roll(a, off, -1)[..., None, :]

    from lidp_tpu.ops.cells import half_offsets

    all_offs = [(0, 0, 0)] + half_offsets(aos.shape[:3])
    group_size = max(1, min(len(all_offs), 512 // cap))
    groups = [all_offs[i:i + group_size]
              for i in range(0, len(all_offs), group_size)]

    def nbr_group(a, offs):
        return jnp.concatenate([nbr(a, o) for o in offs], axis=-1)

    tri = jnp.arange(cap)[:, None] < jnp.arange(cap)[None, :]

    def pair_geometry(offs):
        dx = minimum_image(ctr(xs[0]) - nbr_group(xs[0], offs), L[0])
        dy = minimum_image(ctr(xs[1]) - nbr_group(xs[1], offs), L[1])
        dz = minimum_image(ctr(xs[2]) - nbr_group(xs[2], offs), L[2])
        rsq = dx * dx + dy * dy + dz * dz
        ok = ctr(valid) & nbr_group(valid, offs)
        if (0, 0, 0) in offs:
            gi = offs.index((0, 0, 0))
            tri_blk = jnp.pad(
                tri, ((0, 0), (gi * cap, (len(offs) - gi - 1) * cap)),
                constant_values=True)
            ok = ok & tri_blk
        ok = ok & (rsq < p.cutsq)
        rsq = jnp.where(ok, rsq, 1.0)
        return dx, dy, dz, rsq, ok

    def scatter_back(px, offs):
        """Roll per-offset neighbor-side partial sums home: (cells, G*cap)
        -> accumulated (cells, cap) in home order."""
        out = jnp.zeros(aos.shape, dtype)
        sx = jnp.sum(px, axis=-2)
        for g, o in enumerate(offs):
            out += _roll(sx[..., g * cap:(g + 1) * cap], o, +1)
        return out

    # ---- pass 1: densities (Newton: both sides per half pair) ----
    rho_slots = jnp.zeros(aos.shape, dtype)
    for offs in groups:
        dx, dy, dz, rsq, ok = pair_geometry(offs)
        r = jnp.sqrt(rsq)
        rho_r, _, _, _ = _eval_segments(r, p)
        rho_r = jnp.where(ok, rho_r, 0.0)
        rho_slots += jnp.sum(rho_r, axis=-1)
        rho_slots += scatter_back(rho_r, offs)

    rho_atom = rho_slots.reshape(-1)[cells.slot_of_atom]

    # ---- embedding (exact reference spline, per-atom gathers) ----
    pr = rho_atom / p.drho + 1.0
    m = jnp.clip(pr.astype(jnp.int32), 1, p.nrho - 1)
    frac = jnp.minimum(pr - m.astype(dtype), 1.0)
    c = p.frho_spline[m]
    fp_atom = (c[:, 0] * frac + c[:, 1]) * frac + c[:, 2]
    phi_embed = ((c[:, 3] * frac + c[:, 4]) * frac + c[:, 5]) * frac + c[:, 6]
    phi_embed = phi_embed + jnp.where(rho_atom > p.rhomax,
                                      fp_atom * (rho_atom - p.rhomax), 0.0)
    e_embed = jnp.sum(jnp.where(mask, phi_embed, 0.0))

    fp_slots = jnp.where(valid, fp_atom[amax], 0.0)

    # ---- pass 2: forces + pair energy (Newton half sum) ----
    fx = jnp.zeros(aos.shape, dtype)
    fy = jnp.zeros_like(fx)
    fz = jnp.zeros_like(fx)
    evdwl = jnp.zeros((), dtype)
    vir = [jnp.zeros((), dtype) for _ in range(6)]
    for offs in groups:
        dx, dy, dz, rsq, ok = pair_geometry(offs)
        r = jnp.sqrt(rsq)
        _, rhop, z2, z2p = _eval_segments(r, p)
        recip = 1.0 / r
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        psip = (ctr(fp_slots) + nbr_group(fp_slots, offs)) * rhop + phip
        fpair = jnp.where(ok, -psip * recip, 0.0)
        px = fpair * dx
        py = fpair * dy
        pz = fpair * dz
        fx += jnp.sum(px, axis=-1)
        fy += jnp.sum(py, axis=-1)
        fz += jnp.sum(pz, axis=-1)
        fx -= scatter_back(px, offs)
        fy -= scatter_back(py, offs)
        fz -= scatter_back(pz, offs)
        if need_ev:
            evdwl += jnp.sum(jnp.where(ok, phi, 0.0))
            vir[0] += jnp.sum(fpair * dx * dx)
            vir[1] += jnp.sum(fpair * dy * dy)
            vir[2] += jnp.sum(fpair * dz * dz)
            vir[3] += jnp.sum(fpair * dx * dy)
            vir[4] += jnp.sum(fpair * dx * dz)
            vir[5] += jnp.sum(fpair * dy * dz)

    f = jnp.stack([fx.reshape(-1)[cells.slot_of_atom],
                   fy.reshape(-1)[cells.slot_of_atom],
                   fz.reshape(-1)[cells.slot_of_atom]], axis=-1)
    f = jnp.where(mask[:, None], f, 0.0)
    return f, evdwl + e_embed, jnp.stack(vir)


def eam_alloy_cell_forces(x, type_, mask, cells: Cells, box: Box,
                          p: EAMAlloyParams, need_ev: bool = True):
    """Multi-element setfl EAM via the rolled cell grid, Newton half-stencil.

    Element dependence is handled by evaluating each element's (and element-
    pair's) segment polynomials on the SHARED segment one-hot and masking by
    slot element — nelem static Python loops, no per-pair gathers
    (pair_eam_alloy.cpp's type2rhor/type2z2r indirection becomes select
    masks).  Newton halving: the i side accumulates rho of j's element while
    rho of i's element rolls back to j (densities are element-asymmetric,
    forces are symmetric)."""
    n = x.shape[0]
    dtype = x.dtype
    aos = cells.atom_of_slot
    cap = aos.shape[-1]
    L = box.img_lengths
    amax = jnp.minimum(aos, n - 1)
    valid = aos < n

    elem_atom = p.type2elem[type_]

    def slotify(a, fill=0.0):
        return jnp.where(valid, a[amax], fill)

    xs = [slotify(x[:, d_]) for d_ in range(3)]
    esl = slotify(elem_atom, 0)

    def ctr(a):
        return a[..., :, None]

    def _roll(a, off, sign=-1):
        for ax, sh in enumerate(off):
            if sh:
                a = jnp.roll(a, sign * sh, axis=ax)
        return a

    def nbr(a, off):
        return _roll(a, off, -1)[..., None, :]

    from lidp_tpu.ops.cells import half_offsets

    all_offs = [(0, 0, 0)] + half_offsets(aos.shape[:3])
    group_size = max(1, min(len(all_offs), 512 // cap))
    groups = [all_offs[i:i + group_size]
              for i in range(0, len(all_offs), group_size)]

    def nbr_group(a, offs):
        return jnp.concatenate([nbr(a, o) for o in offs], axis=-1)

    tri = jnp.arange(cap)[:, None] < jnp.arange(cap)[None, :]

    def pair_geometry(offs):
        dx = minimum_image(ctr(xs[0]) - nbr_group(xs[0], offs), L[0])
        dy = minimum_image(ctr(xs[1]) - nbr_group(xs[1], offs), L[1])
        dz = minimum_image(ctr(xs[2]) - nbr_group(xs[2], offs), L[2])
        rsq = dx * dx + dy * dy + dz * dz
        ok = ctr(valid) & nbr_group(valid, offs)
        if (0, 0, 0) in offs:
            gi = offs.index((0, 0, 0))
            tri_blk = jnp.pad(
                tri, ((0, 0), (gi * cap, (len(offs) - gi - 1) * cap)),
                constant_values=True)
            ok = ok & tri_blk
        ok = ok & (rsq < p.cutsq)
        rsq = jnp.where(ok, rsq, 1.0)
        return dx, dy, dz, rsq, ok

    def scatter_back(px, offs):
        out = jnp.zeros(aos.shape, dtype)
        sx = jnp.sum(px, axis=-2)
        for g, o in enumerate(offs):
            out += _roll(sx[..., g * cap:(g + 1) * cap], o, +1)
        return out

    def eval_tables(r, ei, ej, want_z2, want_rho_i=False):
        flat, xi = _segment_onehot(r, p.cut, p.nseg)

        def ev(coeffs):
            c = jnp.dot(flat, coeffs, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
            return _horner(c.reshape(r.shape + (-1,)), xi, p.deg, 2)

        zero = jnp.zeros_like(r)
        rho_j = rhop_j = rhop_i = rho_i = zero
        if p.fs:
            # Finnis-Sinclair: density i<-j reads table [ej*ne+ei],
            # density j<-i reads [ei*ne+ej] (pair_eam.cpp:205-208,288-291)
            for a in range(p.nelem):
                for b in range(p.nelem):
                    sel = (ei == a) & (ej == b)
                    rj_, rjp_ = ev(p.seg_rho[b * p.nelem + a])
                    rho_j = rho_j + jnp.where(sel, rj_, 0.0)
                    rhop_j = rhop_j + jnp.where(sel, rjp_, 0.0)
                    ri_, rip_ = ev(p.seg_rho[a * p.nelem + b])
                    rhop_i = rhop_i + jnp.where(sel, rip_, 0.0)
                    if want_rho_i:
                        rho_i = rho_i + jnp.where(sel, ri_, 0.0)
        else:
            for e in range(p.nelem):
                re_, rpe = ev(p.seg_rho[e])
                sj = ej == e
                si = ei == e
                rho_j = rho_j + jnp.where(sj, re_, 0.0)
                rhop_j = rhop_j + jnp.where(sj, rpe, 0.0)
                rhop_i = rhop_i + jnp.where(si, rpe, 0.0)
                if want_rho_i:
                    rho_i = rho_i + jnp.where(si, re_, 0.0)
        z2 = z2p = zero
        if want_z2:
            for a in range(p.nelem):
                for b in range(a + 1):
                    z, zp = ev(p.seg_z2[a * (a + 1) // 2 + b])
                    sel = ((ei == a) & (ej == b)) | ((ei == b) & (ej == a))
                    z2 = z2 + jnp.where(sel, z, 0.0)
                    z2p = z2p + jnp.where(sel, zp, 0.0)
        return rho_j, rhop_j, rhop_i, rho_i, z2, z2p

    # ---- pass 1: densities (i gains rho(ej), j gains rho(ei)) ----
    rho_slots = jnp.zeros(aos.shape, dtype)
    for offs in groups:
        dx, dy, dz, rsq, ok = pair_geometry(offs)
        r = jnp.sqrt(rsq)
        rho_j, _, _, rho_i, _, _ = eval_tables(
            r, ctr(esl), nbr_group(esl, offs), want_z2=False,
            want_rho_i=True)
        rho_slots += jnp.sum(jnp.where(ok, rho_j, 0.0), axis=-1)
        rho_slots += scatter_back(jnp.where(ok, rho_i, 0.0), offs)

    rho_atom = rho_slots.reshape(-1)[cells.slot_of_atom]

    # ---- embedding: per-element spline (2-level gather, N rows) ----
    pr = rho_atom / p.drho + 1.0
    m = jnp.clip(pr.astype(jnp.int32), 1, p.nrho - 1)
    frac = jnp.minimum(pr - m.astype(dtype), 1.0)
    c = p.frho_spline[elem_atom, m]
    fp_atom = (c[:, 0] * frac + c[:, 1]) * frac + c[:, 2]
    phi_embed = ((c[:, 3] * frac + c[:, 4]) * frac + c[:, 5]) * frac + c[:, 6]
    phi_embed = phi_embed + jnp.where(rho_atom > p.rhomax,
                                      fp_atom * (rho_atom - p.rhomax), 0.0)
    e_embed = jnp.sum(jnp.where(mask, phi_embed, 0.0))

    fp_slots = slotify(fp_atom)

    # ---- pass 2: forces + pair energy (Newton half sum) ----
    fx = jnp.zeros(aos.shape, dtype)
    fy = jnp.zeros_like(fx)
    fz = jnp.zeros_like(fx)
    evdwl = jnp.zeros((), dtype)
    vir = [jnp.zeros((), dtype) for _ in range(6)]
    for offs in groups:
        dx, dy, dz, rsq, ok = pair_geometry(offs)
        r = jnp.sqrt(rsq)
        ei, ej = ctr(esl), nbr_group(esl, offs)
        _, rhop_j, rhop_i, _, z2, z2p = eval_tables(r, ei, ej, want_z2=True)
        recip = 1.0 / r
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        # pair_eam.cpp:286-292: psip = fp_i*rhop_j + fp_j*rhop_i + phip
        psip = (ctr(fp_slots) * rhop_j + nbr_group(fp_slots, offs) * rhop_i
                + phip)
        fpair = jnp.where(ok, -psip * recip, 0.0)
        px = fpair * dx
        py = fpair * dy
        pz = fpair * dz
        fx += jnp.sum(px, axis=-1)
        fy += jnp.sum(py, axis=-1)
        fz += jnp.sum(pz, axis=-1)
        fx -= scatter_back(px, offs)
        fy -= scatter_back(py, offs)
        fz -= scatter_back(pz, offs)
        if need_ev:
            evdwl += jnp.sum(jnp.where(ok, phi, 0.0))
            vir[0] += jnp.sum(fpair * dx * dx)
            vir[1] += jnp.sum(fpair * dy * dy)
            vir[2] += jnp.sum(fpair * dz * dz)
            vir[3] += jnp.sum(fpair * dx * dy)
            vir[4] += jnp.sum(fpair * dx * dz)
            vir[5] += jnp.sum(fpair * dy * dz)

    f = jnp.stack([fx.reshape(-1)[cells.slot_of_atom],
                   fy.reshape(-1)[cells.slot_of_atom],
                   fz.reshape(-1)[cells.slot_of_atom]], axis=-1)
    f = jnp.where(mask[:, None], f, 0.0)
    return f, evdwl + e_embed, jnp.stack(vir)
