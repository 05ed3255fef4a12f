"""pair lj/long/coul/long: cut r^-12 repulsion + FULL periodic r^-6
dispersion via the geometric-mixing Ewald split (pair_lj_long_coul_long.cpp
:520-533 real-space complement, ewald_disp.cpp func[1] k-space).

Validated end-to-end through the script engine against a converged direct
lattice sum, plus finite-difference force checks of the real-space kind.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _melt(n=32, L=7.0, seed=5):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, L, (n, 3))
    from scipy.spatial import cKDTree

    for _ in range(300):
        t = cKDTree(x, boxsize=L)
        pairs = t.query_pairs(0.95, output_type="ndarray")
        if not len(pairs):
            break
        x[pairs[:, 0]] = rng.uniform(0, L, (len(pairs[:, 0]), 3))
    return x


def _build(x, L, cut=3.0, acc=1e-6):
    from lidp_tpu.io.script import LammpsScript

    n = len(x)
    s = LammpsScript()
    s.execute(f"""
units lj
atom_style full
boundary p p p
region box block 0 {L} 0 {L} 0 {L} units box
create_box 1 box
pair_style lj/long/coul/long long long {cut}
pair_coeff 1 1 1.0 1.0
kspace_style ewald/disp {acc}
""".strip().splitlines())
    s.x = x.copy()
    s.v = np.zeros((n, 3))
    s.q = np.zeros(n)
    s.type = np.ones(n, np.int32)
    s.mol = np.zeros(n, np.int32)
    s.image = np.zeros((n, 3), np.int32)
    s._bonds = np.zeros((0, 2), np.int64)
    s.groups["all"] = np.ones(n, bool)
    s.mass_type = np.array([0.0, 1.0])
    s.one("fix 1 all nve")
    s.one("run 0")
    return s


def _direct_full_lj(x, L, cut, nimg=6):
    """Cut (unshifted) 4/r^12 within minimum-image cutoff + absolutely
    convergent full lattice sum of -4/r^6 (eps = sig = 1)."""
    n = len(x)
    d = x[:, None, :] - x[None, :, :]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, axis=-1)
    iu = np.triu_indices(n, 1)
    r2u = r2[iu]
    sel = r2u < cut * cut
    e12 = np.sum(4.0 / r2u[sel] ** 6)
    e6 = 0.0
    for i in range(-nimg, nimg + 1):
        for j in range(-nimg, nimg + 1):
            for k in range(-nimg, nimg + 1):
                dd = x[:, None, :] - x[None, :, :] + np.array([i, j, k]) * L
                rr = np.sum(dd * dd, axis=-1)
                if i == j == k == 0:
                    np.fill_diagonal(rr, np.inf)
                e6 += -0.5 * np.sum(4.0 / rr**3)
    return e12 + e6


def test_total_energy_vs_direct_sum():
    L = 7.0
    x = _melt(L=L)
    s = _build(x, L)
    row = s.thermo_rows[-1]
    n = len(x)
    # lj units normalize per atom; epair = evdwl + ecoul + elong
    total = row["epair"] * n
    direct = _direct_full_lj(x, L, cut=3.0)
    assert abs(total - direct) < 2e-4 * abs(direct), (total, direct)
    # uncharged: every coulomb channel must be exactly zero
    assert row["ecoul"] == 0.0


def test_gewald6_split_invariance():
    """The epair total must not depend on the real/k split: changing the
    requested accuracy (hence g6 and the k count) moves energy between
    evdwl and elong but the sum is invariant to the tighter accuracy."""
    L = 7.0
    x = _melt(L=L, seed=9)
    n = len(x)
    e1 = _build(x, L, acc=1e-4).thermo_rows[-1]
    e2 = _build(x, L, acc=1e-7).thermo_rows[-1]
    assert abs(e1["elong"]) > 0.0
    assert abs(e1["epair"] - e2["epair"]) * n < 5e-4 * abs(
        e2["epair"] * n)
    assert abs(e1["elong"] - e2["elong"]) > 0.0   # the split itself moved


def test_forces_fd_through_script():
    """Net script force on one atom == -d(total pe)/dx by central
    differences of the full stack (real kind + k-space dispersion)."""
    L = 7.0
    x = _melt(n=20, L=L, seed=3)
    s = _build(x, L)
    n = len(x)
    f = np.asarray(s._sim.res.f)[:n]
    h = 1e-5
    for i, d in ((0, 0), (7, 2)):
        xp = x.copy(); xp[i, d] += h
        xm = x.copy(); xm[i, d] -= h
        ep = _build(xp, L).thermo_rows[-1]["pe"] * n
        em = _build(xm, L).thermo_rows[-1]["pe"] * n
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[i, d]) < 2e-4 * max(1.0, abs(fd)), (fd, f[i, d])


def test_charged_coul_long_still_works():
    """With charges on, the coulomb ewald path and the dispersion path share
    elong; check against an independent lj/cut/coul/long run with the same
    charges: the COULOMB part (ecoul + elong_coul) must match."""
    from lidp_tpu.io.script import LammpsScript

    L = 7.0
    x = _melt(n=24, L=L, seed=13)
    n = len(x)
    q = np.tile([0.25, -0.25], n // 2)

    def run(style_lines, charged=True):
        s = LammpsScript()
        s.execute(f"""
units lj
atom_style full
boundary p p p
region box block 0 {L} 0 {L} 0 {L} units box
create_box 1 box
""".strip().splitlines() + style_lines.strip().splitlines())
        s.x = x.copy()
        s.v = np.zeros((n, 3))
        s.q = q.copy() if charged else np.zeros(n)
        s.type = np.ones(n, np.int32)
        s.mol = np.zeros(n, np.int32)
        s.image = np.zeros((n, 3), np.int32)
        s._bonds = np.zeros((0, 2), np.int64)
        s.groups["all"] = np.ones(n, bool)
        s.mass_type = np.array([0.0, 1.0])
        s.one("fix 1 all nve")
        s.one("run 0")
        return s.thermo_rows[-1]

    # g pinned everywhere: EwaldDisp forces g_ewald_6 = g_ewald
    # (ewald_disp.cpp:230), so isolating the dispersion elong with an
    # uncharged run needs all three runs on the same damping parameter
    r_long = run("pair_style lj/long/coul/long long long 3.0\n"
                 "pair_coeff 1 1 1.0 1.0\nkspace_style ewald/disp 1e-6\n"
                 "kspace_modify gewald 1.1")
    r_cut = run("pair_style lj/cut/coul/long 3.0\n"
                "pair_coeff 1 1 1.0 1.0\nkspace_style ewald 1e-6\n"
                "kspace_modify gewald 1.1")
    # ecoul (real) matches exactly: same g_ewald estimator inputs
    assert abs(r_long["ecoul"] - r_cut["ecoul"]) < 1e-8 * max(
        1.0, abs(r_cut["ecoul"]))
    # elong differs by exactly the dispersion part; the uncharged run of the
    # same geometry isolates it (gewald pin applies to g6 when uncharged,
    # mirroring the reference's required kspace_modify gewald there)
    e6 = run("pair_style lj/long/coul/long long long 3.0\n"
             "pair_coeff 1 1 1.0 1.0\nkspace_style ewald/disp 1e-6\n"
             "kspace_modify gewald 1.1", charged=False)["elong"]
    assert abs((r_long["elong"] - e6) - r_cut["elong"]) < 1e-6 * max(
        1.0, abs(r_cut["elong"]))
