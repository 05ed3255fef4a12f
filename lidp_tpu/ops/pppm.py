"""PPPM (particle-particle particle-mesh) long-range electrostatics.

The mesh analog of the reference's KSPACE/pppm.cpp: order-P polynomial charge
assignment (compute_rho1d, pppm.cpp:2844), 3D FFT of the charge grid
(jnp.fft — single-device; the reference uses pencil-decomposed fft3d.cpp),
ik-differentiation Green's-function convolution (compute_gf_ik,
pppm.cpp:1549), force interpolation back to atoms.

TPU design note: charge spreading/interpolation are scatter/gather ops
(N * P^3 updates), which cost far more per element than MXU flops on TPU.
For N up to ~1M the dense [N,K] matmul Ewald (ops/ewald.py) is faster on this
hardware and is the default; pppm is provided for API completeness and very
large N.  Validated against the Ewald module (same tinfoil limit) rather than
bitwise against the reference mesh.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PPPMSetup:
    g_ewald: float
    grid: tuple[int, int, int]
    order: int


# charge-assignment error constants, Deserno & Holm JCP 109, 7698 (1998)
# (pppm.cpp compute_acons); index [order][m]
_ACONS = {
    1: [2.0 / 3.0],
    2: [1.0 / 50.0, 5.0 / 294.0],
    3: [1.0 / 588.0, 7.0 / 1440.0, 21.0 / 3872.0],
    4: [1.0 / 4320.0, 3.0 / 1936.0, 7601.0 / 2271360.0, 143.0 / 28800.0],
    5: [1.0 / 23232.0, 7601.0 / 13628160.0, 143.0 / 69120.0,
        517231.0 / 106536960.0, 106640677.0 / 11737571328.0],
    6: [691.0 / 68140800.0, 13.0 / 57600.0, 47021.0 / 35512320.0,
        9694607.0 / 2095994880.0, 733191589.0 / 59609088000.0,
        326190917.0 / 11700633600.0],
    7: [1.0 / 345600.0, 3617.0 / 35512320.0, 745739.0 / 838397952.0,
        56399353.0 / 12773376000.0, 25091609.0 / 1560084480.0,
        1755948832039.0 / 36229939200000.0, 4887769399.0 / 37838389248.0],
}


def _ik_error(h, prd, natoms, g, order, q2):
    """estimate_ik_error (pppm.cpp): per-dim ik-differentiation RMS error."""
    s = sum(_ACONS[order][m] * (h * g) ** (2 * m) for m in range(order))
    return (q2 * (h * g) ** order
            * math.sqrt(g * prd * math.sqrt(2.0 * math.pi) * s / natoms)
            / (prd * prd))


def _factorable(n):
    for f in (2, 3, 5):
        while n % f == 0:
            n //= f
    return n == 1


def setup_pppm(*, accuracy_rel: float, qqrd2e: float, q, natoms: int,
               cutoff: float, box_lengths, order: int = 5,
               g_ewald: float | None = None) -> PPPMSetup:
    """Grid + g_ewald selection exactly as PPPM::set_grid_global +
    adjust_gewald (pppm.cpp:985,1287, ik-differentiation path): initial
    g from the Ewald formula, per-dim grid grown until the ik error bound
    meets the accuracy (including the reference's one-extra-step loop
    semantics), grid boosted to 2/3/5-factorable sizes, then Newton-solve
    g so real-space and k-space RMS errors balance."""
    L = np.asarray(box_lengths, float)
    qsqsum = float(np.sum(np.asarray(q) ** 2))
    accuracy = accuracy_rel * qqrd2e      # two_charge_force (kspace.cpp)
    q2 = qsqsum * qqrd2e
    vol = float(np.prod(L))

    if g_ewald is None:
        g0 = accuracy * math.sqrt(natoms * cutoff * vol) / (2.0 * q2)
        if g0 >= 1.0:
            g = (1.35 - 0.15 * math.log(accuracy)) / cutoff
        else:
            g = math.sqrt(-math.log(g0)) / cutoff
    else:
        g = float(g_ewald)

    grid = []
    hs = []
    for prd in L:
        h = 1.0 / g                       # first error uses h = 1/g verbatim
        n = int(prd / h) + 1
        err = _ik_error(h, prd, natoms, g, order, q2)
        while err > accuracy:
            err = _ik_error(h, prd, natoms, g, order, q2)
            n += 1
            h = prd / n
        while not _factorable(n):
            n += 1
        grid.append(n)
        hs.append(prd / n)

    if g_ewald is None:
        # adjust_gewald: balance df_rspace(g) == df_kspace(g) by Newton
        def f_of(gv):
            df_r = (2.0 * q2 * math.exp(-gv * gv * cutoff * cutoff)
                    / math.sqrt(natoms * cutoff * L[0] * L[1] * L[2]))
            lpr = [_ik_error(hs[d], L[d], natoms, gv, order, q2)
                   for d in range(3)]
            df_k = math.sqrt(sum(v * v for v in lpr)) / math.sqrt(3.0)
            return df_r - df_k

        for _ in range(80):
            dg = g * 1e-6
            deriv = (f_of(g + dg) - f_of(g)) / dg
            g -= f_of(g) / deriv
            if abs(f_of(g)) < 1e-5:
                break

    return PPPMSetup(g_ewald=float(g), grid=tuple(grid), order=order)


def _assignment_weights(frac, order):
    """Order-P charge assignment weights per dimension.

    Uses the centered B-spline recursion (equivalent to the reference's
    polynomial coefficients from compute_rho_coeff, pppm.cpp:3108)."""
    # frac in [0,1): distance to the nearest lower grid point pattern depends
    # on parity; use standard M_n B-spline evaluated at shifted points.
    def bspline(x, n):
        # M_n(x) on support [0, n], evaluated recursively
        if n == 1:
            return jnp.where((x >= 0) & (x < 1), 1.0, 0.0)
        m = bspline(x, n - 1)
        m_shift = bspline(x - 1.0, n - 1)
        return (x * m + (n - x) * m_shift) / (n - 1)

    # grid offsets k = 0..order-1 relative to the base point
    offs = jnp.arange(order, dtype=frac.dtype)
    # weight for offset k: M_order(frac - k + order - 1)... standard spreading
    xx = frac[..., None] + (order - 1.0) - offs
    return bspline(xx, order)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPPMParams:
    g_ewald: jax.Array
    qqrd2e: jax.Array
    qsqsum: jax.Array
    qsum: jax.Array
    grid: tuple = dataclasses.field(metadata=dict(static=True), default=(8, 8, 8))
    order: int = dataclasses.field(metadata=dict(static=True), default=5)
    # pppm/stagger (pppm_stagger.cpp): evaluate the mesh twice, the second
    # pass with atoms shifted by half a grid spacing in every dimension, and
    # average — the leading odd-order ik-differentiation error cancels
    # between the two interleaved grids
    stagger: bool = dataclasses.field(metadata=dict(static=True),
                                      default=False)

    @staticmethod
    def from_setup(s: PPPMSetup, qqrd2e, qsqsum, qsum, dtype=jnp.float64,
                   stagger=False):
        return PPPMParams(
            g_ewald=jnp.asarray(s.g_ewald, dtype),
            qqrd2e=jnp.asarray(qqrd2e, dtype),
            qsqsum=jnp.asarray(qsqsum, dtype), qsum=jnp.asarray(qsum, dtype),
            grid=s.grid, order=s.order, stagger=stagger)


def pppm_forces_params(x, q, box_lengths, p: PPPMParams):
    """Jit-friendly entry taking the registered PPPMParams pytree."""
    setup = PPPMSetup(g_ewald=p.g_ewald, grid=p.grid, order=p.order)
    if p.stagger:
        # two interleaved grids, averaged (pppm_stagger.cpp compute():
        # nstagger=2, particle_map with shift 0 then h/2)
        L = jnp.asarray(box_lengths, x.dtype)
        h = L / jnp.asarray(p.grid, x.dtype)
        out0 = pppm_forces(x, q, box_lengths, setup, p.qqrd2e, p.qsqsum,
                           p.qsum)
        out1 = pppm_forces(x + 0.5 * h[None, :], q, box_lengths, setup,
                           p.qqrd2e, p.qsqsum, p.qsum)
        return jax.tree_util.tree_map(lambda a, b: 0.5 * (a + b), out0, out1)
    return pppm_forces(x, q, box_lengths, setup, p.qqrd2e, p.qsqsum, p.qsum)


def pppm_forces(x, q, box_lengths, setup: PPPMSetup, qqrd2e, qsqsum, qsum):
    """Returns (f (N,3), elong, virial6_diag_only).

    Single-device jnp implementation; f64/f32 follows x.dtype."""
    dtype = x.dtype
    nx, ny, nz = setup.grid
    L = jnp.asarray(box_lengths, dtype)
    n = x.shape[0]
    order = setup.order
    g = setup.g_ewald

    # --- charge assignment (scatter) ---
    h = L / jnp.asarray([nx, ny, nz], dtype)
    s = x / h[None, :]
    base = jnp.floor(s - (order - 1) / 2.0).astype(jnp.int32)
    frac = s - base.astype(dtype) - (order - 1) / 2.0   # in [0,1)
    wx = _assignment_weights(frac[:, 0], order)          # (N,P)
    wy = _assignment_weights(frac[:, 1], order)
    wz = _assignment_weights(frac[:, 2], order)

    offs = jnp.arange(order)
    gx = (base[:, 0, None] + offs[None, :]) % nx         # (N,P)
    gy = (base[:, 1, None] + offs[None, :]) % ny
    gz = (base[:, 2, None] + offs[None, :]) % nz

    w3 = (wx[:, :, None, None] * wy[:, None, :, None]
          * wz[:, None, None, :])                        # (N,P,P,P)
    lin = ((gx[:, :, None, None] * ny + gy[:, None, :, None]) * nz
           + gz[:, None, None, :])                       # (N,P,P,P)
    rho = jnp.zeros((nx * ny * nz,), dtype).at[lin.reshape(-1)].add(
        (w3 * q[:, None, None, None]).reshape(-1))
    rho = rho.reshape(nx, ny, nz)

    # --- reciprocal convolution ---
    kx = 2 * jnp.pi * jnp.fft.fftfreq(nx, d=float(1) / nx) / L[0]
    ky = 2 * jnp.pi * jnp.fft.fftfreq(ny, d=float(1) / ny) / L[1]
    kz = 2 * jnp.pi * jnp.fft.fftfreq(nz, d=float(1) / nz) / L[2]
    KX, KY, KZ = jnp.meshgrid(kx, ky, kz, indexing="ij")
    k2 = KX**2 + KY**2 + KZ**2
    k2 = k2.at[0, 0, 0].set(1.0)
    green = jnp.exp(-k2 / (4 * g * g)) / k2
    green = green.at[0, 0, 0].set(0.0)

    # B-spline deconvolution: assignment and interpolation each smear by the
    # spreading transform W(k) = prod_d sinc(pi m_d / n_d)^order, so the
    # effective Green's function carries 1/W(k)^2 (the reference's optimal
    # influence function denominators, pppm.cpp compute_gf_ik)
    def sinc(m, nn):
        u = jnp.pi * m / nn
        return jnp.where(m == 0, 1.0, jnp.sin(u) / jnp.where(m == 0, 1.0, u))

    mx = jnp.fft.fftfreq(nx) * nx
    my = jnp.fft.fftfreq(ny) * ny
    mz = jnp.fft.fftfreq(nz) * nz
    MX, MY, MZ = jnp.meshgrid(mx, my, mz, indexing="ij")
    wk = (sinc(MX, nx) * sinc(MY, ny) * sinc(MZ, nz)) ** order
    wk2 = jnp.maximum(wk * wk, 1e-12)

    rho_k = jnp.fft.fftn(rho)
    vol = L[0] * L[1] * L[2]
    # ifftn carries 1/Ngrid; fold Ngrid into phi_k so the real-space fields
    # come out in physical units
    phi_k = 4 * jnp.pi * green * rho_k / (vol * wk2) * (nx * ny * nz)
    # energy
    elong = (2 * jnp.pi / vol) * jnp.sum(green * jnp.abs(rho_k) ** 2 / wk2)
    elong = elong * qqrd2e
    elong = elong - qqrd2e * (qsqsum * g / jnp.sqrt(jnp.pi)
                              + jnp.pi / (2 * g * g * vol) * qsum * qsum)

    # fields via ik differentiation
    ex = jnp.real(jnp.fft.ifftn(-1j * KX * phi_k))
    ey = jnp.real(jnp.fft.ifftn(-1j * KY * phi_k))
    ez = jnp.real(jnp.fft.ifftn(-1j * KZ * phi_k))

    def interp(field):
        vals = field.reshape(-1)[lin.reshape(-1)].reshape(n, order, order, order)
        return jnp.sum(vals * w3, axis=(1, 2, 3))

    f = qqrd2e * q[:, None] * jnp.stack(
        [interp(ex), interp(ey), interp(ez)], axis=-1)

    # mesh virial (pppm.cpp vg coefficients + poisson_ik virial branch):
    # per-mode energy density e_k = (2pi/V) G|rho_k|^2/W^2, tensor weight
    # v_ab = delta_ab - 2 k_a k_b (1/k^2 + 1/(4g^2))
    ek = (2 * jnp.pi / vol) * green * jnp.abs(rho_k) ** 2 / wk2
    vfac = 2.0 * (1.0 / k2 + 1.0 / (4.0 * g * g))

    # per-mode terms only — the reference's global virial carries no
    # self/background correction (pppm.cpp poisson_ik / ewald.cpp:466-474)
    def vcomp(ka, kb, diag):
        w = (1.0 if diag else 0.0) - vfac * ka * kb
        return qqrd2e * jnp.sum(ek * w)
    virial = jnp.stack([
        vcomp(KX, KX, True), vcomp(KY, KY, True), vcomp(KZ, KZ, True),
        vcomp(KX, KY, False), vcomp(KX, KZ, False), vcomp(KY, KZ, False)])
    return f, elong, virial


# --------------------------- pppm/disp -------------------------------------
#
# Dispersion mesh: the PPPM analog of the geometric-mixing 1/r^6 Ewald
# function (ops/ewald.py setup_dispersion / ewald6_forces), i.e. the
# reference's KSPACE/pppm_disp.cpp geometric-mixing branch
# (compute_gf_6 + poisson_ik for the dispersion grid).  Same mesh machinery
# as the charge path above — spread per-atom B_i, FFT, multiply by the
# dispersion Green's function with B-spline deconvolution, ik-differentiate —
# with the per-mode coefficients of ewald_disp.cpp's func[1] branch
# (:469-478) evaluated on the full FFT mode lattice instead of a half-space
# k list.  Validated against ewald6_forces (tests/test_pppm_disp.py) rather
# than bitwise against the reference mesh.


@dataclasses.dataclass(frozen=True)
class PPPMDispSetup:
    g6: float
    grid: tuple[int, int, int]
    order: int
    bsum: float
    bsbsum: float


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPPMDispParams:
    """Pytree mirror of PPPMDispSetup (all-static: scalars baked into the
    compiled program; pppm_disp_forces accepts either)."""
    g6: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    grid: tuple = dataclasses.field(metadata=dict(static=True),
                                    default=(8, 8, 8))
    order: int = dataclasses.field(metadata=dict(static=True), default=7)
    bsum: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    bsbsum: float = dataclasses.field(metadata=dict(static=True),
                                      default=0.0)

    @staticmethod
    def from_setup(s: PPPMDispSetup) -> "PPPMDispParams":
        return PPPMDispParams(g6=s.g6, grid=s.grid, order=s.order,
                              bsum=s.bsum, bsbsum=s.bsbsum)


def setup_pppm_disp(*, accuracy_rel: float, qqrd2e: float, b_atom,
                    natoms: int, cutoff: float, box_lengths,
                    order: int = 7, g6: float | None = None,
                    h_per_g: float = 0.2) -> PPPMDispSetup:
    """Dispersion-grid setup.

    g6 comes from the shared Newton solve (ewald.newton_g6 — the
    EwaldDisp::NewtonSolve parity path); the mesh is sized by a fixed
    h*g6 <= h_per_g spacing rule boosted to 2/3/5-factorable sizes.  The
    reference sizes its dispersion grid from its own acons error series
    (pppm_disp.cpp set_grid_6); we instead pick the spacing that meets the
    1e-6 agreement bar against the exact-k ewald6 sum (test-enforced),
    which is the operative accuracy contract here.  The dispersion mode
    coefficient decays as e^{-(k/2g6)^2}, so the truncation error at the
    mesh Nyquist k_max = pi/h is ~e^{-(pi/(2 h g6))^2}; the residual is
    B-spline aliasing, which the measured convergence sweep puts at
    3.6e-6 (order 5) vs 5.9e-8 (order 7) relative force error at
    h*g6 = 0.2 — hence the order-7 default.
    """
    from lidp_tpu.ops.ewald import newton_g6

    L = np.asarray(box_lengths, float)
    b_atom = np.asarray(b_atom, float)
    bsum = float(np.sum(b_atom))
    bsbsum = float(np.sum(b_atom ** 2))
    if g6 is None:
        accuracy = accuracy_rel * qqrd2e
        g6 = newton_g6(accuracy, bsbsum, natoms, cutoff, float(np.prod(L)))
    grid = []
    for prd in L:
        n = max(2, int(math.ceil(prd * g6 / h_per_g)))
        while not _factorable(n):
            n += 1
        grid.append(n)
    return PPPMDispSetup(g6=float(g6), grid=tuple(grid), order=order,
                         bsum=bsum, bsbsum=bsbsum)


def pppm_disp_forces(x, b_atom, box_lengths, s: PPPMDispSetup):
    """Returns (f (N,3), edisp, virial6) — mesh geometric dispersion.

    Per-mode energy coefficient (ewald_disp.cpp coefficients() func[1]):
        ke6(k) = -|k|^3 (sqrt(pi) erfc(b) + (0.5/b^2 - 1) e^{-b^2} / b),
        b = |k| / (2 g6)
    with E = (c_e/2) sum_{k != 0, full lattice} ke6 |S(k)|^2 - self,
    c_e = 2 pi^{3/2} / (24 V) (the ewald6_forces half-space constant; the
    full FFT lattice double-counts +-k, hence the 1/2)."""
    dtype = x.dtype
    nx, ny, nz = s.grid
    L = jnp.asarray(box_lengths, dtype)
    n = x.shape[0]
    order = s.order
    g = s.g6

    # --- B-coefficient assignment (same spreading as the charge path) ---
    h = L / jnp.asarray([nx, ny, nz], dtype)
    sfrac = x / h[None, :]
    base = jnp.floor(sfrac - (order - 1) / 2.0).astype(jnp.int32)
    frac = sfrac - base.astype(dtype) - (order - 1) / 2.0
    wx = _assignment_weights(frac[:, 0], order)
    wy = _assignment_weights(frac[:, 1], order)
    wz = _assignment_weights(frac[:, 2], order)
    offs = jnp.arange(order)
    gx = (base[:, 0, None] + offs[None, :]) % nx
    gy = (base[:, 1, None] + offs[None, :]) % ny
    gz = (base[:, 2, None] + offs[None, :]) % nz
    w3 = (wx[:, :, None, None] * wy[:, None, :, None]
          * wz[:, None, None, :])
    lin = ((gx[:, :, None, None] * ny + gy[:, None, :, None]) * nz
           + gz[:, None, None, :])
    b = jnp.asarray(b_atom, dtype)
    rho = jnp.zeros((nx * ny * nz,), dtype).at[lin.reshape(-1)].add(
        (w3 * b[:, None, None, None]).reshape(-1))
    rho_k = jnp.fft.fftn(rho.reshape(nx, ny, nz))

    # --- dispersion Green's function on the mode lattice ---
    kx = 2 * jnp.pi * jnp.fft.fftfreq(nx, d=float(1) / nx) / L[0]
    ky = 2 * jnp.pi * jnp.fft.fftfreq(ny, d=float(1) / ny) / L[1]
    kz = 2 * jnp.pi * jnp.fft.fftfreq(nz, d=float(1) / nz) / L[2]
    KX, KY, KZ = jnp.meshgrid(kx, ky, kz, indexing="ij")
    k2 = KX ** 2 + KY ** 2 + KZ ** 2
    k2safe = k2.at[0, 0, 0].set(1.0)
    h1 = jnp.sqrt(k2safe)
    b1 = h1 / (2.0 * g)
    b2 = b1 * b1
    expb2 = jnp.exp(-b2)
    erfcb = jax.scipy.special.erfc(b1)
    pis = jnp.sqrt(jnp.asarray(jnp.pi, dtype))
    ke6 = -h1 * k2safe * (pis * erfcb + (0.5 / b2 - 1.0) * expb2 / b1)
    ke6 = ke6.at[0, 0, 0].set(0.0)
    # virial tensor factor c2v (ewald_disp.cpp compute_virial func[1])
    c2v = 3.0 * h1 * (pis * erfcb - expb2 / b1)
    c2v = c2v.at[0, 0, 0].set(0.0)

    def sinc(m, nn):
        u = jnp.pi * m / nn
        return jnp.where(m == 0, 1.0, jnp.sin(u) / jnp.where(m == 0, 1.0, u))

    mx = jnp.fft.fftfreq(nx) * nx
    my = jnp.fft.fftfreq(ny) * ny
    mz = jnp.fft.fftfreq(nz) * nz
    MX, MY, MZ = jnp.meshgrid(mx, my, mz, indexing="ij")
    wk = (sinc(MX, nx) * sinc(MY, ny) * sinc(MZ, nz)) ** order
    wk2 = jnp.maximum(wk * wk, 1e-12)

    vol = L[0] * L[1] * L[2]
    c_e = 2.0 * jnp.pi * pis / (24.0 * vol)
    sk2 = jnp.abs(rho_k) ** 2 / wk2

    g3 = g ** 3
    virial_self = jnp.pi * pis * g3 / (6.0 * vol) * s.bsum * s.bsum
    energy_self = -s.bsbsum * g3 * g3 / 12.0 + virial_self
    edisp = 0.5 * c_e * jnp.sum(ke6 * sk2) - energy_self

    # forces: phi6_k = c_e * ke6 * rho_k / wk2 * Ngrid (the 0.5 from the
    # full-lattice energy and the 2 from d|S|^2 cancel); f_i = b_i E6(r_i)
    ngrid = nx * ny * nz
    phi_k = c_e * ke6 * rho_k / wk2 * ngrid
    ex = jnp.real(jnp.fft.ifftn(-1j * KX * phi_k))
    ey = jnp.real(jnp.fft.ifftn(-1j * KY * phi_k))
    ez = jnp.real(jnp.fft.ifftn(-1j * KZ * phi_k))

    def interp(field):
        vals = field.reshape(-1)[lin.reshape(-1)].reshape(
            n, order, order, order)
        return jnp.sum(vals * w3, axis=(1, 2, 3))

    f = b[:, None] * jnp.stack([interp(ex), interp(ey), interp(ez)], axis=-1)

    def vcomp(ka, kb, diag):
        w = (ke6 if diag else 0.0) - c2v * ka * kb
        return 0.5 * c_e * jnp.sum(sk2 * w)

    virial = jnp.stack([
        vcomp(KX, KX, True), vcomp(KY, KY, True), vcomp(KZ, KZ, True),
        vcomp(KX, KY, False), vcomp(KX, KZ, False), vcomp(KY, KZ, False)])
    virial = virial - virial_self * jnp.asarray(
        [1.0, 1.0, 1.0, 0.0, 0.0, 0.0], dtype)
    return f, edisp, virial
