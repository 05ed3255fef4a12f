"""Reciprocal-space Ewald summation (charge function).

Behavioral parity with the reference ``ewald/disp`` style
(KSPACE/ewald_disp.cpp) for point charges in orthogonal periodic boxes:

  * g_ewald estimate: ewald_disp.cpp:188-203 (charge branch);
  * per-dimension kmax from the RMS error bound (EwaldDisp::setup,
    ewald_disp.cpp:255-280) with ``rms`` (ewald_disp.cpp:300-331);
  * half-space k enumeration order and gsqmx cut (reallocate,
    ewald_disp.cpp:333-355);
  * energy coefficients exp(-h^2/4g^2)/h^2, prefactor 4*pi*qscale/V and the
    self/background corrections (coefficients :443-461, init_self :575-586,
    compute_energy :941-985).

Instead of the reference's per-atom cos/sin recursion + MPI_Allreduce
(compute_ek, ewald_disp.cpp:721-795), the structure factor
S(k) = sum_i q_i e^{ik.r_i} is computed as dense [N,K] matmuls — MXU-native
and shardable over the atom axis with a psum.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

MY_PIS = math.sqrt(math.pi)


@dataclasses.dataclass(frozen=True)
class EwaldSetup:
    """Host-side (static) k-space configuration."""

    g_ewald: float
    accuracy: float
    nbox: int
    hvecs: np.ndarray    # (K,3) wave vectors (2*pi*k_int/L), half space
    kcoeff: np.ndarray   # (K,) exp(-h^2/(4g^2))/h^2
    kvirial: np.ndarray  # (K,6) virial coefficients (xx yy zz xy xz yz)
    qsum: float
    qsqsum: float
    volume: float
    kints: np.ndarray = None   # (K,3) integer wave indices (NPT rescaling)


def estimate_g_ewald(accuracy_rel: float, qqrd2e: float, qsqsum: float,
                     natoms: int, cutoff: float, volume: float) -> float:
    """Charge-function g_ewald (ewald_disp.cpp:188-203; identical in ewald.cpp:152-161)."""
    two_charge_force = qqrd2e  # qelectron=1, angstrom=1 in lj/real/metal units
    accuracy = accuracy_rel * two_charge_force
    q2 = qsqsum * qqrd2e
    if q2 == 0.0:
        raise ValueError("Must use kspace_modify gewald for uncharged system")
    g = accuracy * math.sqrt(natoms * cutoff * volume) / (2.0 * q2)
    if g >= 1.0:
        return (1.35 - 0.15 * math.log(accuracy)) / cutoff
    return math.sqrt(-math.log(g)) / cutoff


def _rms_charge(km: int, prd: float, natoms: int, q2: float, g_ewald: float) -> float:
    g2 = g_ewald * g_ewald
    return (2.0 * q2 * g_ewald / prd
            * math.sqrt(1.0 / (math.pi * km * natoms))
            * math.exp(-math.pi**2 * km * km / (g2 * prd * prd)))


def setup_ewald_disp(
    *, accuracy_rel: float, qqrd2e: float, q: np.ndarray, natoms: int,
    cutoff: float, box_lengths, g_ewald: float | None = None,
    tilt=None,
) -> EwaldSetup:
    """K-space setup.  Orthogonal boxes follow EwaldDisp exactly; with
    `tilt` = (xy, xz, yz) the enumeration follows Ewald::setup +
    Ewald::coeffs_triclinic (ewald.cpp:274-291, :760-860): per-dim kmax from
    the orthogonal RMS bound scaled by lamda2xT, wave vectors
    k = 2*pi*h^-T (i,j,k), pruned by the orthogonal gsqmx.  (The reference's
    ewald/disp itself rejects triclinic; this extends the charge function to
    tilted cells the way plain ewald does.)"""
    Lx, Ly, Lz = (float(v) for v in box_lengths)
    volume = Lx * Ly * Lz
    qsum = float(np.sum(q))
    qsqsum = float(np.sum(np.asarray(q) ** 2))
    accuracy = accuracy_rel * qqrd2e
    q2 = qsqsum * qqrd2e
    if g_ewald is None:
        g_ewald = estimate_g_ewald(accuracy_rel, qqrd2e, qsqsum, natoms, cutoff, volume)

    kmax = []
    for prd in (Lx, Ly, Lz):
        km = 1
        while _rms_charge(km, prd, natoms, q2, g_ewald) > accuracy:
            km += 1
        kmax.append(km)
    nbox = max(kmax)

    unit = 2.0 * math.pi / np.array([Lx, Ly, Lz])
    gsqmx = max(
        unit[0] ** 2 * kmax[0] ** 2,
        unit[1] ** 2 * kmax[1] ** 2,
        unit[2] ** 2 * kmax[2] ** 2,
    ) * 1.00001

    triclinic = tilt is not None and any(float(v) != 0.0 for v in tilt)
    if triclinic:
        xy, xz, yz = (float(v) for v in tilt)
        h = np.array([[Lx, xy, xz], [0.0, Ly, yz], [0.0, 0.0, Lz]])
        h_invT = np.linalg.inv(h).T
        # lamda2xT scaling of the per-dim kmax (ewald.cpp:276-287)
        tmp = h.T @ np.array([kmax[0] / Lx, kmax[1] / Ly, kmax[2] / Lz])
        kmax = [max(1, int(abs(tmp[d]))) for d in range(3)]
        nbox = max(kmax)

    # half-space enumeration, same order/symmetry rules as reallocate()
    # (coeffs_triclinic uses per-dim kmax bounds; orthogonal uses nbox cubes)
    hvecs = []
    kints = []
    bx = kmax[0] if triclinic else nbox
    by = kmax[1] if triclinic else nbox
    bz = kmax[2] if triclinic else nbox
    for ix in range(0, bx + 1):
        for iy in range(-by, by + 1):
            for iz in range(-bz, bz + 1):
                if ix == 0 and iy == 0 and iz == 0:
                    continue
                if ix == 0 and iy < 0:
                    continue
                if ix == 0 and iy == 0 and iz < 0:
                    continue
                if triclinic:
                    kv = 2.0 * math.pi * (h_invT @ np.array(
                        [ix, iy, iz], np.float64))
                    h_ = (kv[0], kv[1], kv[2])
                else:
                    h_ = (unit[0] * ix, unit[1] * iy, unit[2] * iz)
                if h_[0] ** 2 + h_[1] ** 2 + h_[2] ** 2 <= gsqmx:
                    hvecs.append(h_)
                    kints.append((ix, iy, iz))
    hvecs = np.array(hvecs, np.float64).reshape(-1, 3)
    kints = np.array(kints, np.int32).reshape(-1, 3)

    eta2 = 0.25 / (g_ewald * g_ewald)
    h2 = np.sum(hvecs**2, axis=1)
    b2 = h2 * eta2
    expb2 = np.exp(-b2)
    c1 = expb2 / h2
    c2 = 2.0 * c1 * (1.0 + b2) / h2
    kvirial = np.stack([
        c1 - c2 * hvecs[:, 0] * hvecs[:, 0],
        c1 - c2 * hvecs[:, 1] * hvecs[:, 1],
        c1 - c2 * hvecs[:, 2] * hvecs[:, 2],
        -c2 * hvecs[:, 1] * hvecs[:, 0],
        -c2 * hvecs[:, 2] * hvecs[:, 0],
        -c2 * hvecs[:, 2] * hvecs[:, 1],
    ], axis=1)

    return EwaldSetup(
        g_ewald=float(g_ewald), accuracy=accuracy, nbox=nbox,
        hvecs=hvecs, kcoeff=c1, kvirial=kvirial,
        qsum=qsum, qsqsum=qsqsum, volume=volume, kints=kints,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EwaldParams:
    """Device-side k-space parameters."""

    hvecs: jax.Array    # (K,3)
    kcoeff: jax.Array   # (K,)
    kvirial: jax.Array  # (K,6)
    g_ewald: jax.Array  # ()
    qscale: jax.Array   # () qqrd2e * scale
    qsum: jax.Array
    qsqsum: jax.Array
    kints: jax.Array = None   # (K,3) integer indices for in-jit rescaling

    @staticmethod
    def from_setup(s: EwaldSetup, qqrd2e: float, dtype=jnp.float64) -> "EwaldParams":
        return EwaldParams(
            hvecs=jnp.asarray(s.hvecs, dtype),
            kcoeff=jnp.asarray(s.kcoeff, dtype),
            kvirial=jnp.asarray(s.kvirial, dtype),
            g_ewald=jnp.asarray(s.g_ewald, dtype),
            qscale=jnp.asarray(qqrd2e, dtype),
            qsum=jnp.asarray(s.qsum, dtype),
            qsqsum=jnp.asarray(s.qsqsum, dtype),
            kints=(jnp.asarray(s.kints) if s.kints is not None else None),
        )


def rescale_coeffs(p: EwaldParams, box_lengths):
    """Recompute box-dependent k-space tables in-jit (the analog of
    force->kspace->setup() after a barostat box change, fix_nh.cpp:877).
    The integer k-SET stays the one enumerated at setup — exact for modest
    volume changes (the reference re-prunes on large ones)."""
    dtype = p.hvecs.dtype
    unit = (2.0 * jnp.pi / jnp.asarray(box_lengths, dtype))
    hvecs = p.kints.astype(dtype) * unit[None, :]
    eta2 = 0.25 / (p.g_ewald * p.g_ewald)
    h2 = jnp.sum(hvecs * hvecs, axis=1)
    b2 = h2 * eta2
    c1 = jnp.exp(-b2) / h2
    c2 = 2.0 * c1 * (1.0 + b2) / h2
    kvirial = jnp.stack([
        c1 - c2 * hvecs[:, 0] * hvecs[:, 0],
        c1 - c2 * hvecs[:, 1] * hvecs[:, 1],
        c1 - c2 * hvecs[:, 2] * hvecs[:, 2],
        -c2 * hvecs[:, 1] * hvecs[:, 0],
        -c2 * hvecs[:, 2] * hvecs[:, 0],
        -c2 * hvecs[:, 2] * hvecs[:, 1],
    ], axis=1)
    return dataclasses.replace(p, hvecs=hvecs, kcoeff=c1, kvirial=kvirial)


def _ewald_kblock(x, q, hvecs, kcoeff, kvirial, c0):
    """Per-k-block structure factors + forces; per-k terms are independent,
    so blocks accumulate without a separate structure-factor pass."""
    phases = x @ hvecs.T                          # (N,Kb)
    c = jnp.cos(phases)
    s = jnp.sin(phases)
    sre = q @ c                                   # (Kb,)
    sim = q @ s
    sk2 = sre * sre + sim * sim
    e = c0 * jnp.sum(kcoeff * sk2)
    # f_i = 2*c0 * q_i * sum_k ke_k (sin(ph_ik) Sre_k - cos(ph_ik) Sim_k) h_k
    w = kcoeff * sre * 2.0 * c0
    w2 = kcoeff * sim * 2.0 * c0
    coef = s * w[None, :] - c * w2[None, :]       # (N,Kb)
    f = (coef @ hvecs) * q[:, None]
    # reference ewald.cpp:466-474 tallies only the per-k terms into the
    # global virial — no self/background contribution (even for non-neutral
    # systems); match it so Ewald and PPPM pressures agree
    virial = c0 * (sk2 @ kvirial)
    return f, e, virial


# past this (N,K) working set the per-k arrays are chunked through a scan:
# at 100k f64 atoms K ~ 1e4 and the f64-emulated [N,K] matmul materializes
# an (8,N,K) f32 intermediate (~36 GB, OOM on one v5e chip)
_EWALD_CHUNK_ELEMS = 64_000_000


def ewald_forces(x, q, volume, p: EwaldParams):
    """Reciprocal-space energy/forces/virial.

    Returns (f (N,3), elong (), virial6). All compute is [N,K] matmul-shaped;
    large N*K runs block the k axis via lax.scan to bound memory.
    """
    c0 = 4.0 * jnp.pi * p.qscale / volume
    energy_self = (p.qsqsum * p.qscale * p.g_ewald / MY_PIS
                   + 0.5 * jnp.pi * p.qscale / (p.g_ewald**2 * volume)
                   * p.qsum * p.qsum)
    n = x.shape[0]
    K = p.hvecs.shape[0]
    if n * K <= _EWALD_CHUNK_ELEMS:
        f, e, virial = _ewald_kblock(x, q, p.hvecs, p.kcoeff, p.kvirial, c0)
        return f, e - energy_self, virial

    kb = max(128, _EWALD_CHUNK_ELEMS // max(n, 1))
    nc = -(-K // kb)
    pad = nc * kb - K
    hv = jnp.pad(p.hvecs, ((0, pad), (0, 0))).reshape(nc, kb, 3)
    kc = jnp.pad(p.kcoeff, (0, pad)).reshape(nc, kb)      # pad -> 0 coeff
    kv = jnp.pad(p.kvirial, ((0, pad), (0, 0))).reshape(nc, kb, 6)

    def body(acc, blk):
        f, e, v = acc
        hb, cb, vb = blk
        fb, eb, vb6 = _ewald_kblock(x, q, hb, cb, vb, c0)
        return (f + fb, e + eb, v + vb6), None

    (f, e, virial), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(x), jnp.zeros((), x.dtype), jnp.zeros((6,), x.dtype)),
        (hv, kc, kv))
    return f, e - energy_self, virial


# --------------------- dispersion (geometric 1/r^6) -------------------------
#
# EwaldDisp function[1] — long-range Lennard-Jones dispersion with geometric
# mixing (KSPACE/ewald_disp.cpp).  Per-atom coefficient B_i = sqrt(B_ii) with
# B_ij = 4 eps_ij sigma_ij^6 (init_coeffs, ewald_disp.cpp:497): geometric
# mixing makes B_ij == B_i*B_j exactly, so S6(k) = sum_i B_i e^{ik.r} carries
# the full pair structure.


@dataclasses.dataclass(frozen=True)
class Ewald6Setup:
    g6: float
    nbox: int
    hvecs: np.ndarray     # (K,3)
    kcoeff6: np.ndarray   # (K,)
    kvirial6: np.ndarray  # (K,6)
    bsum: float           # sum_i B_i
    bsbsum: float         # sum_i B_i^2
    volume: float


def newton_g6(accuracy: float, bsbsum: float, natoms: int, cutoff: float,
              volume: float) -> float:
    """g_ewald_6 Newton solve (EwaldDisp::NewtonSolve + f, :1459-1504)."""
    x = (1.35 - 0.15 * math.log(accuracy)) / cutoff   # initial guess

    def f(xv):
        a = cutoff * xv
        return (4.0 * math.pi * bsbsum * xv**4 / volume
                / math.sqrt(float(natoms)) * math.erfc(a)
                * (6.0 * a**-5 + 6.0 * a**-3 + 3.0 / a + a) - accuracy)

    g = x
    for _ in range(10000):
        h = 1.0e-6
        df = (f(g + h) - f(g)) / h
        dx = f(g) / df
        g = g - dx
        if abs(dx) < 1.0e-5:
            return g
        if g < 0 or g != g:
            break
    return x   # solver failed: old-method guess (ewald_disp.cpp:216-221)


def _rms_lj(km: int, prd: float, natoms: int, b2: float, g6: float) -> float:
    """LJ term of EwaldDisp::rms (ewald_disp.cpp)."""
    g2 = g6 * g6
    g7 = g2 * g2 * g2 * g6
    return (4.0 * b2 * g7 / 3.0
            * math.sqrt(1.0 / (math.pi * natoms))
            * math.exp(-math.pi**2 * km * km / (g2 * prd * prd))
            * (math.pi * km / (g6 * prd) + 1.0))


def setup_dispersion(*, accuracy_rel: float, qqrd2e: float, b_atom,
                     natoms: int, cutoff: float, box_lengths,
                     g6: float | None = None) -> Ewald6Setup:
    """K-space setup for the geometric-dispersion function.

    b_atom: per-atom B_i = sqrt(4 eps_ii sigma_ii^6)."""
    Lx, Ly, Lz = (float(v) for v in box_lengths)
    volume = Lx * Ly * Lz
    b_atom = np.asarray(b_atom, float)
    bsum = float(np.sum(b_atom))
    bsbsum = float(np.sum(b_atom**2))
    accuracy = accuracy_rel * qqrd2e   # two_charge_force (kspace.cpp)
    if g6 is None:
        g6 = newton_g6(accuracy, bsbsum, natoms, cutoff, volume)

    kmax = []
    for prd in (Lx, Ly, Lz):
        km = 1
        while _rms_lj(km, prd, natoms, bsbsum, g6) > accuracy:
            km += 1
        kmax.append(km)
    nbox = max(kmax)

    unit = 2.0 * math.pi / np.array([Lx, Ly, Lz])
    gsqmx = max(unit[d] ** 2 * kmax[d] ** 2 for d in range(3)) * 1.00001
    hvecs = []
    for ix in range(0, nbox + 1):
        for iy in range(-nbox, nbox + 1):
            for iz in range(-nbox, nbox + 1):
                if ix == 0 and iy == 0 and iz == 0:
                    continue
                if ix == 0 and iy < 0:
                    continue
                if ix == 0 and iy == 0 and iz < 0:
                    continue
                h = (unit[0] * ix, unit[1] * iy, unit[2] * iz)
                if h[0] ** 2 + h[1] ** 2 + h[2] ** 2 <= gsqmx:
                    hvecs.append(h)
    hvecs = np.array(hvecs, np.float64).reshape(-1, 3)

    # coefficients() func12 branch (ewald_disp.cpp:469-478)
    h2 = np.sum(hvecs**2, axis=1)
    h1 = np.sqrt(h2)
    eta2 = 0.25 / (g6 * g6)
    b2k = h2 * eta2
    b1 = np.sqrt(b2k)
    expb2 = np.exp(-b2k)
    erfcb = np.array([math.erfc(v) for v in b1])
    c2e = MY_PIS * erfcb
    ke6 = -h1 * h2 * (c2e + (0.5 / b2k - 1.0) * expb2 / b1)
    c2v = 3.0 * h1 * (c2e - expb2 / b1)
    kvirial6 = np.stack([
        ke6 - c2v * hvecs[:, 0] * hvecs[:, 0],
        ke6 - c2v * hvecs[:, 1] * hvecs[:, 1],
        ke6 - c2v * hvecs[:, 2] * hvecs[:, 2],
        -c2v * hvecs[:, 1] * hvecs[:, 0],
        -c2v * hvecs[:, 2] * hvecs[:, 0],
        -c2v * hvecs[:, 2] * hvecs[:, 1],
    ], axis=1)
    return Ewald6Setup(g6=float(g6), nbox=nbox, hvecs=hvecs, kcoeff6=ke6,
                       kvirial6=kvirial6, bsum=bsum, bsbsum=bsbsum,
                       volume=volume)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ewald6Params:
    """Jit-friendly pytree mirror of Ewald6Setup (same attribute names, so
    ewald6_forces accepts either)."""
    hvecs: jax.Array
    kcoeff6: jax.Array
    kvirial6: jax.Array
    g6: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    bsum: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    bsbsum: float = dataclasses.field(metadata=dict(static=True),
                                      default=0.0)

    @staticmethod
    def from_setup(s: Ewald6Setup, dtype=jnp.float64) -> "Ewald6Params":
        return Ewald6Params(
            hvecs=jnp.asarray(s.hvecs, dtype),
            kcoeff6=jnp.asarray(s.kcoeff6, dtype),
            kvirial6=jnp.asarray(s.kvirial6, dtype),
            g6=float(s.g6), bsum=float(s.bsum), bsbsum=float(s.bsbsum))


def ewald6_forces(x, b_atom, volume, s: Ewald6Setup):
    """Reciprocal-space dispersion energy/forces/virial (geometric mixing).

    Mirrors compute_energy/compute_force/compute_virial func[1]
    (ewald_disp.cpp:964,840-884,1100-1109) with [N,K] matmul structure
    factors.  Returns (f (N,3), edisp (), virial6)."""
    dtype = x.dtype
    hv = jnp.asarray(s.hvecs, dtype)
    ke6 = jnp.asarray(s.kcoeff6, dtype)
    kv6 = jnp.asarray(s.kvirial6, dtype)
    b = jnp.asarray(b_atom, dtype)
    phases = x @ hv.T
    c = jnp.cos(phases)
    sn = jnp.sin(phases)
    sre = b @ c
    sim = b @ sn
    sk2 = sre * sre + sim * sim

    g3 = s.g6 ** 3
    c_e = 2.0 * jnp.pi * MY_PIS / (24.0 * volume)
    c_f = 2.0 * jnp.pi * MY_PIS / (12.0 * volume)
    virial_self = jnp.pi * MY_PIS * g3 / (6.0 * volume) * s.bsum * s.bsum
    energy_self = -s.bsbsum * g3 * g3 / 12.0 + virial_self
    edisp = c_e * jnp.sum(ke6 * sk2) - energy_self

    w = ke6 * sre * c_f
    w2 = ke6 * sim * c_f
    coef = sn * w[None, :] - c * w2[None, :]
    f = (coef @ hv) * b[:, None]

    virial = c_e * (sk2 @ kv6)
    virial = virial - virial_self * jnp.asarray(
        [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], dtype)
    return f, edisp, virial


def dispersion_real(rsq, bij, g6: float):
    """Real-space damped dispersion complement (pair_lj_long_coul_long.cpp
    :525-533): energy and force/r^2-factor of -B_ij r^-6 with the k-space
    part removed.  Returns (e, fpair_over_r2... i.e. force*r)."""
    g2 = g6 * g6
    gg6 = g2 * g2 * g2
    g8 = gg6 * g2
    x2 = g2 * rsq
    a2 = 1.0 / x2
    x2e = a2 * jnp.exp(-x2) * bij
    e = -gg6 * ((a2 + 1.0) * a2 + 0.5) * x2e
    force = -g8 * (((6.0 * a2 + 6.0) * a2 + 3.0) * a2 + 1.0) * x2e * rsq
    return e, force


# ------------------------- point-dipole function ---------------------------
#
# EwaldDisp function[3] (ewald_disp.cpp): reciprocal-space sum for point
# dipoles.  S_mu(k) = sum_i (mu_i . k) e^{ik.r_i}; energy coefficients are
# the charge-function e^{-k^2/4g^2}/k^2 (coefficients() func3 branch,
# :479-487), self energy = 2 g^3/(3 sqrt(pi)) sum |mu|^2 (:597-599).


def ewald_dipole_forces(x, mu, volume, s: "EwaldSetup", scale=1.0):
    """Reciprocal-space dipole energy/forces as [N,K] matmuls.

    Uses the charge-function k set/coefficients of `s` (the reference
    shares one k enumeration across functions).  `scale` is mumurd2e.
    Returns (f (N,3), edipole ())."""
    dtype = x.dtype
    hv = jnp.asarray(s.hvecs, dtype)
    ke = jnp.asarray(s.kcoeff, dtype)
    phases = x @ hv.T                    # (N,K)
    c = jnp.cos(phases)
    sn = jnp.sin(phases)
    P = mu @ hv.T                        # (N,K) mu_i . k
    sre = jnp.sum(P * c, axis=0)         # (K,)
    sim = jnp.sum(P * sn, axis=0)
    sk2 = sre * sre + sim * sim

    g = s.g_ewald
    c0 = 4.0 * jnp.pi * scale / volume
    e_self = (2.0 * g**3 / (3.0 * MY_PIS) * scale
              * jnp.sum(mu * mu))
    edip = c0 * jnp.sum(ke * sk2) - e_self

    w = ke * sre * 2.0 * c0
    w2 = ke * sim * 2.0 * c0
    coef = (sn * w[None, :] - c * w2[None, :]) * P   # (N,K)
    f = coef @ hv
    return f, edip


def dipole_real(rvec, mui, muj, g: float):
    """Real-space erfc-damped dipole-dipole pair energy (standard Ewald
    dipole kernel; the complement of ewald_dipole_forces):
    E = B(r) mu_i.mu_j - C(r) (mu_i.r)(mu_j.r)."""
    import math

    r2 = jnp.sum(rvec * rvec, axis=-1)
    r = jnp.sqrt(r2)
    gr = g * r
    erfc_gr = jax.scipy.special.erfc(gr)
    pref = 2.0 * gr / jnp.sqrt(jnp.pi) * jnp.exp(-gr * gr)
    B = (erfc_gr + pref) / (r2 * r)
    C = (3.0 * erfc_gr + pref * (3.0 + 2.0 * gr * gr)) / (r2 * r2 * r)
    pdotp = jnp.sum(mui * muj, axis=-1)
    pir = jnp.sum(mui * rvec, axis=-1)
    pjr = jnp.sum(muj * rvec, axis=-1)
    return B * pdotp - C * pir * pjr
