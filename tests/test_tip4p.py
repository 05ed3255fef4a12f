"""TIP4P off-site charge: pair lj/cut/tip4p/long + M-site kspace.

Reference semantics: /root/reference/src/KSPACE/pair_lj_cut_tip4p_long.cpp
(charge site xM = xO + alpha/2 ((xH1-xO)+(xH2-xO)), LJ on true positions,
Coulomb on charge sites, force redistribution fO=(1-alpha)fM, fH=alpha/2 fM)
and pppm_tip4p.cpp (recip sum at M sites).  No committed reference log
exists for TIP4P, so validation is:

  * real-space ecoul against a brute-force numpy erfc sum over M sites;
  * analytic forces against finite differences of the TOTAL energy (the
    strongest check: any error in the charge-site map, the redistribution,
    or the M-site k-space chain breaks force/energy consistency);
  * ewald vs pppm/tip4p cross-check on the same box.
"""

import math

import numpy as np
import pytest

QO, QH = -1.1128, 0.5564         # TIP4P/2005-like charges
R0, THETA0 = 0.9572, 104.52
QDIST = 0.1546
EPS_OO, SIG_OO = 0.1852, 3.1589


def _water_data(tmp, nside=2, L=16.0, seed=3):
    """nside^3 water molecules on a jittered grid in an L^3 box."""
    rng = np.random.RandomState(seed)
    th = math.radians(THETA0)
    # O at origin, H's in a canonical frame
    h1 = np.array([R0 * math.sin(th / 2), R0 * math.cos(th / 2), 0.0])
    h2 = np.array([-R0 * math.sin(th / 2), R0 * math.cos(th / 2), 0.0])
    atoms, bonds, angles = [], [], []
    aid = 0
    for mi in range(nside ** 3):
        i, j, k = mi % nside, (mi // nside) % nside, mi // nside ** 2
        o = (np.array([i, j, k]) + 0.5) * (L / nside) \
            + rng.uniform(-0.5, 0.5, 3)
        # random rotation
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        atoms.append((aid + 1, mi + 1, 1, QO, o))
        atoms.append((aid + 2, mi + 1, 2, QH, o + R @ h1))
        atoms.append((aid + 3, mi + 1, 2, QH, o + R @ h2))
        bonds.append((aid + 1, aid + 2))
        bonds.append((aid + 1, aid + 3))
        angles.append((aid + 2, aid + 1, aid + 3))
        aid += 3
    lines = [f"tip4p water\n\n{len(atoms)} atoms\n{len(bonds)} bonds\n"
             f"{len(angles)} angles\n2 atom types\n1 bond types\n"
             f"1 angle types\n",
             f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n",
             "\nMasses\n\n1 15.9994\n2 1.008\n", "\nAtoms\n\n"]
    for i, mol, t, q, p in atoms:
        lines.append(f"{i} {mol} {t} {q} {p[0]:.10f} {p[1]:.10f} "
                     f"{p[2]:.10f}\n")
    lines.append("\nBonds\n\n")
    for bi, (i, j) in enumerate(bonds):
        lines.append(f"{bi+1} 1 {i} {j}\n")
    lines.append("\nAngles\n\n")
    for ai, (i, j, k) in enumerate(angles):
        lines.append(f"{ai+1} 1 {i} {j} {k}\n")
    (tmp / "tip4p.data").write_text("".join(lines))


def _run(tmp, kspace="ewald 1.0e-6", shake=True):
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = str(tmp)
    fixline = ("fix 1 all shake 0.0001 20 0 b 1 a 1\nfix 2 all nve"
               if shake else "fix 1 all nve")
    s.execute(f"""
units real
atom_style full
bond_style harmonic
angle_style harmonic
pair_style lj/cut/tip4p/long 1 2 1 1 {QDIST} 7.0
read_data tip4p.data
bond_coeff 1 450.0 {R0}
angle_coeff 1 55.0 {THETA0}
pair_coeff 1 1 {EPS_OO} {SIG_OO}
pair_coeff 2 2 0.0 0.0
kspace_style {kspace}
special_bonds lj/coul 0.0 0.0 0.0
{fixline}
run 0
""".strip().splitlines())
    return s


@pytest.fixture(scope="module")
def wbox(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tip4p")
    _water_data(tmp)
    return tmp


def _msites(x, alpha):
    """Charge sites from the canonical O,H1,H2 atom ordering."""
    xs = x.copy()
    for o in range(0, len(x), 3):
        xs[o] = x[o] + alpha * 0.5 * ((x[o + 1] - x[o]) + (x[o + 2] - x[o]))
    return xs


def test_tip4p_realspace_vs_brute(wbox):
    """Real-space erfc Coulomb on M sites matches a numpy brute sum,
    including the kspace-present (1-factor) subtraction for the
    intramolecular O-H / H-H pairs."""
    from scipy.special import erfc

    s = _run(wbox)
    sim = s._sim
    ff = sim.runner.ff
    n = 3 * 8
    x = np.asarray(sim.sys.x)[:n]
    q = np.asarray(sim.sys.q)[:n]
    g = float(np.asarray(ff.pair.g_ewald))
    qqrd2e = ff.qqrd2e
    L = float(np.asarray(sim.sys.box.lengths)[0])
    alpha = QDIST / (math.cos(math.radians(THETA0) / 2) * R0)
    xs = _msites(x, alpha)
    rc = 7.0

    e = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = xs[i] - xs[j]
            d -= L * np.round(d / L)
            r = np.linalg.norm(d)
            if r < rc:
                pre = qqrd2e * q[i] * q[j] / r
                ec = pre * erfc(g * r)
                if i // 3 == j // 3:      # same molecule: factor 0.0
                    ec -= pre
                e += ec
    row = s.thermo_rows[0]
    assert abs(row["ecoul"] - e) < 1e-6 * max(1.0, abs(e)), (row["ecoul"], e)


def test_tip4p_forces_match_fd(wbox):
    """Analytic forces == -dE/dx through the whole TIP4P chain (LJ on
    atoms, erfc + Ewald on M sites, affine redistribution)."""
    import jax.numpy as jnp

    from lidp_tpu.forcefield import compute_forces

    s = _run(wbox, shake=False)
    sim = s._sim
    ff = sim.runner.ff
    sys0 = sim.sys

    res = compute_forces(sys0, ff)
    f = np.asarray(res.f)

    def pe(xnew):
        r = compute_forces(sys0.replace(x=jnp.asarray(xnew)), ff)
        return float(r.evdwl + r.ecoul + r.elong)

    x0 = np.asarray(sys0.x).copy()
    h = 1e-5
    rng = np.random.RandomState(0)
    for idx in rng.choice(24, size=6, replace=False):
        for d in range(3):
            xp = x0.copy(); xp[idx, d] += h
            xm = x0.copy(); xm[idx, d] -= h
            fd = -(pe(xp) - pe(xm)) / (2 * h)
            assert abs(fd - f[idx, d]) < 2e-4 * max(1.0, abs(fd)), (
                idx, d, fd, f[idx, d])


def test_tip4p_pppm_matches_ewald(wbox):
    """kspace_style pppm/tip4p reproduces the ewald M-site total.

    pppm selects its own g_ewald (adjust_gewald), so ecoul/elong
    individually differ between the two styles; only the g-invariant total
    E_pair is comparable (the standard Ewald identity)."""
    s_e = _run(wbox, kspace="ewald 1.0e-6")
    s_p = _run(wbox, kspace="pppm/tip4p 1.0e-5")
    re_, rp = s_e.thermo_rows[0], s_p.thermo_rows[0]
    ep_e = re_["evdwl"] + re_["ecoul"] + re_["elong"]
    ep_p = rp["evdwl"] + rp["ecoul"] + rp["elong"]
    # E_pair is a small residual of +-|elong|-scale cancellations; the
    # meaningful tolerance is pppm's accuracy times that component scale
    assert abs(ep_e - ep_p) < 5e-5 * abs(re_["elong"]), (ep_e, ep_p)


def test_tip4p_shake_dynamics_conserve(wbox):
    """50 NVE steps with SHAKE-rigid waters: energy drift bounded."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = str(wbox)
    s.execute(f"""
units real
atom_style full
bond_style harmonic
angle_style harmonic
pair_style lj/cut/tip4p/long 1 2 1 1 {QDIST} 7.0
read_data tip4p.data
bond_coeff 1 450.0 {R0}
angle_coeff 1 55.0 {THETA0}
pair_coeff 1 1 {EPS_OO} {SIG_OO}
pair_coeff 2 2 0.0 0.0
kspace_style ewald 1.0e-6
special_bonds lj/coul 0.0 0.0 0.0
velocity all create 50.0 4928459 dist gaussian
fix 1 all shake 0.0001 20 0 b 1 a 1
fix 2 all nve
timestep 1.0
thermo 5
run 50
""".strip().splitlines())
    rows = {int(r["step"]): r for r in s.thermo_rows}
    # step 0 -> 10 includes SHAKE's one-time projection of the
    # velocity-create velocities onto the constraint manifold (KE drops);
    # conservation is judged on the constrained trajectory after that
    e0, e1 = rows[10]["etotal"], rows[50]["etotal"]
    assert np.isfinite(e1)
    assert abs(e1 - e0) < 5e-3 * max(1.0, abs(e0)), (e0, e1)
