"""MSM (multilevel summation, msm.cpp analog in ops/msm.py).

Validation: total Coulomb (real-space msm-kernel pair part + grid
hierarchy) against the exact-k Ewald total on the same periodic box, FD
force consistency, and the pair_coul_msm real-space kernel identities.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def box():
    rs = np.random.RandomState(11)
    L, n = 10.0, 64
    x = rs.uniform(0, L, (n, 3))
    q = rs.normal(size=n)
    q -= q.mean()
    return x, q, L


def _msm_total(x, q, L, cutoff, order=10, acc=1e-4):
    """Real-space msm pair part + grid part (the full 1/r sum)."""
    from lidp_tpu.ops.msm import dgamma, gamma, msm_forces, setup_msm

    n = len(q)
    s = setup_msm(accuracy_rel=acc, qqrd2e=1.0, q=q, natoms=n,
                  cutoff=cutoff, box_lengths=[L, L, L], order=order,
                  cutoff_adjust=False)   # validate at the given split
    # real-space part: sum over min-image pairs within cutoff of
    # (q_i q_j / r) * egamma  (pair_coul_msm.cpp:115)
    d = x[:, None, :] - x[None, :, :]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, axis=-1)
    iu = np.triu_indices(n, 1)
    r = np.sqrt(r2[iu])
    qq = (q[:, None] * q[None, :])[iu]
    m = r < cutoff
    egamma = 1.0 - (r[m] / cutoff) * gamma(r[m] / cutoff, order)
    e_real = float(np.sum(qq[m] / r[m] * egamma))
    fg, eg, _ = msm_forces(jnp.asarray(x), jnp.asarray(q), [L, L, L], s)
    # real-space forces for the FD test
    fgam = 1.0 + (r[m] ** 2 / cutoff ** 2) * dgamma(r[m] / cutoff, order)
    fr = np.zeros_like(x)
    pi, pj = iu[0][m], iu[1][m]
    fpair = (qq[m] / r[m]) * fgam / r[m] ** 2
    fv = fpair[:, None] * d[pi, pj]
    np.add.at(fr, pi, fv)
    np.add.at(fr, pj, -fv)
    return e_real + float(eg), fr + np.asarray(fg), s


def _ewald_total(x, q, L, cutoff=4.9):
    from lidp_tpu.ops.ewald import (EwaldParams, ewald_forces,
                                    setup_ewald_disp)
    from scipy.special import erfc

    n = len(q)
    es = setup_ewald_disp(accuracy_rel=1e-8, qqrd2e=1.0, q=q, natoms=n,
                          cutoff=cutoff, box_lengths=[L, L, L])
    ew = EwaldParams.from_setup(es, 1.0)
    fk, ek, _ = ewald_forces(jnp.asarray(x), jnp.asarray(q),
                             jnp.asarray(L**3), ew)
    d = x[:, None, :] - x[None, :, :]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, axis=-1)
    iu = np.triu_indices(n, 1)
    r = np.sqrt(r2[iu])
    qq = (q[:, None] * q[None, :])[iu]
    m = r < cutoff
    e_real = float(np.sum(qq[m] * erfc(es.g_ewald * r[m]) / r[m]))
    return e_real + float(ek)


def test_msm_energy_vs_ewald(box):
    x, q, L = box
    e_ref = _ewald_total(x, q, L)
    e_msm, _, s = _msm_total(x, q, L, cutoff=4.0)
    assert s.levels >= 2
    assert e_msm == pytest.approx(e_ref, rel=2e-4), (e_msm, e_ref)


@pytest.mark.slow
def test_msm_forces_fd(box):
    """Total MSM force (pair + grid) = -dE/dx by central differences."""
    x, q, L = box
    _, f, _ = _msm_total(x, q, L, cutoff=4.0)
    h = 2e-5
    for i, dcomp in ((0, 0), (17, 1), (40, 2)):
        xp = x.copy(); xp[i, dcomp] += h
        xm = x.copy(); xm[i, dcomp] -= h
        ep, _, _ = _msm_total(xp, q, L, cutoff=4.0)
        em, _, _ = _msm_total(xm, q, L, cutoff=4.0)
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[i, dcomp]) < 2e-4 * max(1.0, abs(fd)), (
            i, dcomp, fd, f[i, dcomp])


@pytest.mark.slow
def test_msm_all_orders_meet_accuracy(box):
    """Every supported order meets the requested accuracy class on its own
    estimator-chosen grid (the grids differ per order by design)."""
    x, q, L = box
    e_ref = _ewald_total(x, q, L)
    for order in (4, 6, 8):
        e, _, _ = _msm_total(x, q, L, cutoff=4.0, order=order, acc=1e-4)
        assert abs(e - e_ref) / abs(e_ref) < 1e-3, (order, e, e_ref)


def test_gamma_matches_reference_identities():
    """gamma/dgamma: continuity at rho=1 (C^{order/2} smoothness implies at
    least value+derivative continuity), gamma(rho>=1)=1/rho, and dgamma is
    the true derivative."""
    from lidp_tpu.ops.msm import dgamma, gamma

    for order in (4, 6, 8, 10, 12):
        g1m = gamma(1.0 - 1e-9, order)
        assert g1m == pytest.approx(1.0, abs=1e-6)
        assert float(gamma(2.0, order)) == pytest.approx(0.5)
        for rho in (0.3, 0.7, 0.95):
            h = 1e-6
            fd = (gamma(rho + h, order) - gamma(rho - h, order)) / (2 * h)
            assert float(dgamma(rho, order)) == pytest.approx(
                float(fd), rel=1e-5)


def test_msm_script_vs_ewald():
    """pair lj/cut/coul/msm + kspace_style msm through the script engine
    tracks the lj/cut/coul/long + ewald run at MSM grid accuracy."""
    from lidp_tpu.io.script import LammpsScript

    rs = np.random.RandomState(3)
    L, n = 10.0, 48
    x = rs.uniform(0, L, (n, 3))
    from scipy.spatial import cKDTree

    for _ in range(300):
        t = cKDTree(x, boxsize=L)
        pairs = t.query_pairs(0.95, output_type="ndarray")
        if not len(pairs):
            break
        x[pairs[:, 0]] = rs.uniform(0, L, (len(pairs[:, 0]), 3))
    q = np.tile([0.4, -0.4], n // 2)

    def run(lines):
        s = LammpsScript(dtype=jnp.float64)
        s.execute(f"""
units lj
atom_style full
boundary p p p
region box block 0 {L} 0 {L} 0 {L} units box
create_box 1 box
""".strip().splitlines() + lines.strip().splitlines())
        s.x = x.copy()
        s.v = np.zeros((n, 3))
        s.q = q.copy()
        s.type = np.ones(n, np.int32)
        s.mol = np.zeros(n, np.int32)
        s.image = np.zeros((n, 3), np.int32)
        s._bonds = np.zeros((0, 2), np.int64)
        s.groups["all"] = np.ones(n, bool)
        s.mass_type = np.array([0.0, 1.0])
        s.one("fix 1 all nve")
        s.one("run 0")
        return s.thermo_rows[-1], np.asarray(s._sim.res.f)[:n]

    r_msm, f_msm = run("pair_style lj/cut/coul/msm 3.0 4.0\n"
                       "pair_coeff 1 1 1.0 1.0\nkspace_style msm 1e-4\n"
                       "kspace_modify cutoff/adjust no")
    r_ew, f_ew = run("pair_style lj/cut/coul/long 3.0 4.0\n"
                     "pair_coeff 1 1 1.0 1.0\nkspace_style ewald 1e-7")
    # total coulomb (ecoul + elong) and epair must agree at grid accuracy
    c_msm = r_msm["ecoul"] + r_msm["elong"]
    c_ew = r_ew["ecoul"] + r_ew["elong"]
    assert c_msm == pytest.approx(c_ew, rel=3e-4), (c_msm, c_ew)
    assert r_msm["evdwl"] == pytest.approx(r_ew["evdwl"], rel=1e-12)
    scale = float(np.abs(f_ew).max())
    assert np.abs(f_msm - f_ew).max() < 2e-3 * scale


def test_msm_cg_alias():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.one("kspace_style msm/cg 1e-4")
    assert s.kspace[0] == "msm/cg"


def test_msm_cutoff_adjust_parity():
    """Default cutoff/adjust yes reproduces the reference's grid and its
    'Adjusting Coulombic cutoff for MSM, new cutoff = 8.85111' warning
    value (msm.cpp:936-1053) on the 64-atom breadth box; our min-image
    kernels then cap the applied cutoff just under L/2."""
    from lidp_tpu.ops.msm import setup_msm

    q = np.tile([1.0, -1.0], 32)
    ms = setup_msm(accuracy_rel=1e-4, qqrd2e=1.0, q=q, natoms=64,
                   cutoff=2.5, box_lengths=[6.0, 6.0, 6.0],
                   cutoff_adjust=True)
    assert ms.grid == (4, 4, 4)
    assert ms.cutoff_uncapped == pytest.approx(8.85111, rel=1e-5)
    assert ms.cutoff == pytest.approx(0.499 * 6.0)


@pytest.mark.slow
def test_ljmsm_golden_with_press(tmp_path):
    """pair lj/cut/coul/msm + kspace msm (cutoff/adjust no) vs the rebuilt
    reference — including Press, which exercises the per-level FFT virial
    kernels (the v0..v5_direct analog)."""
    from scripts.gen_breadth_goldens import write_data

    from lidp_tpu.io.script import LammpsScript

    # reference rows (step temp pe evdwl ecoul elong press), minted from
    # /tmp/lmpsrc/lmp_serial on this same data file (grid 32^3, order 10)
    ref = {
        0: (1.0, -2.00554866157, -1.42299977076, -0.046983932177,
            -0.535564958637, -0.514594621195),
        5: (1.00633887599, -2.00241169314, -1.4195991171,
            -0.0476721452896, -0.535140430753, -0.50633974749),
    }
    write_data(str(tmp_path / "data.breadth"))
    (tmp_path / "in.msm").write_text(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/cut/coul/msm 2.2 2.5
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
kspace_style msm 1.0e-4
kspace_modify cutoff/adjust no
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 1
run 5
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.msm"))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, (temp, pe, ev, ec, el, pr) in ref.items():
        r = rows[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6)
        assert r["evdwl"] == pytest.approx(ev, rel=2e-6)
        assert r["ecoul"] == pytest.approx(ec, rel=2e-5)
        assert r["elong"] == pytest.approx(el, rel=2e-5)
        assert r["pe"] == pytest.approx(pe, rel=2e-6)
        # press includes the MSM grid virial; MSM accuracy floor ~1e-4
        assert r["press"] == pytest.approx(pr, rel=2e-3)
