"""Triclinic boxes: lamda-space minimum image + wrap (Domain::x2lamda/
lamda2x, domain.cpp), validated against a brute-force periodic-image sum
over the sheared cell vectors."""

import numpy as np
import pytest


def _tri_data(tmp, n_side=3, a=1.7, xy=0.9, xz=0.4, yz=0.6):
    """Simple-cubic LJ crystal in a sheared box."""
    L = n_side * a
    pts = []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                lam = np.array([i, j, k], float) / n_side
                h = np.array([[L, xy, xz], [0, L, yz], [0, 0, L]])
                pts.append(h @ lam)
    pts = np.array(pts) + 0.05 * np.sin(np.arange(len(pts) * 3)
                                        ).reshape(-1, 3)
    lines = [f"tri\n\n{len(pts)} atoms\n1 atom types\n",
             f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n",
             f"{xy} {xz} {yz} xy xz yz\n",
             "\nMasses\n\n1 1.0\n", "\nAtoms\n"]
    for i, p in enumerate(pts):
        lines.append(f"{i+1} 0 1 0.0 {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
    path = tmp / "tri.data"
    path.write_text("".join(lines))
    return path, pts, np.array([[L, xy, xz], [0, L, yz], [0, 0, L]])


def _brute_energy(x, h, cut=2.5):
    e = 0.0
    n = len(x)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                s = h @ np.array([di, dj, dk], float)
                d = x[:, None, :] - x[None, :, :] + s
                r2 = (d * d).sum(-1)
                if di == dj == dk == 0:
                    np.fill_diagonal(r2, np.inf)
                r6 = np.where(r2 < cut * cut, (1.0 / r2) ** 3, 0.0)
                e += 0.5 * np.sum(4.0 * (r6 * r6 - r6))
    return e


@pytest.fixture(scope="module")
def tri(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    tmp = tmp_path_factory.mktemp("tri")
    path, pts, h = _tri_data(tmp)
    s = LammpsScript()
    s.root = str(tmp)
    s.execute(f"""
units lj
atom_style full
read_data tri.data
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 0.2 12345 loop geom
fix 1 all nve
thermo 20
run 100
""".strip().splitlines())
    return s, pts, h


def test_triclinic_energy_matches_brute_force(tri):
    s, pts, h = tri
    e_ref = _brute_energy(pts, h) / len(pts)
    e0 = s.thermo_rows[0]["epair"]
    assert abs(e0 - e_ref) < 1e-9 * max(1.0, abs(e_ref)), (e0, e_ref)


def test_triclinic_nve_conserves(tri):
    s, _, _ = tri
    rows = {int(r["step"]): r for r in s.thermo_rows}
    e0, e1 = rows[0]["etotal"], rows[100]["etotal"]
    # 27-atom cell: velocity-Verlet energy fluctuation ~5e-5 at this dt
    assert abs(e1 - e0) < 2e-4 * max(1.0, abs(e0)), (e0, e1)


def test_triclinic_box_flags(tri):
    s, _, h = tri
    box = s._sim.sys.box
    assert box.triclinic
    assert np.allclose(np.asarray(box.h), h)
    # h_inv is the true inverse
    assert np.allclose(np.asarray(box.h) @ np.asarray(box.h_inv), np.eye(3),
                       atol=1e-12)


# ---------------- production path: lamda-space cells above the dense cap ----


def _melt_script(tmp, n_side, a, xy, xz, yz, steps, dense_cap=None):
    """Sheared sc LJ melt driven through the script engine."""
    import lidp_tpu.sim as sim_mod
    from lidp_tpu.io.script import LammpsScript

    L = n_side * a
    h = np.array([[L, xy, xz], [0, L, yz], [0, 0, L]])
    pts = []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                pts.append(h @ (np.array([i, j, k], float) / n_side))
    pts = np.array(pts) + 0.03 * np.sin(np.arange(len(pts) * 3)
                                        ).reshape(-1, 3)
    lines = [f"tri melt\n\n{len(pts)} atoms\n1 atom types\n",
             f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n",
             f"{xy} {xz} {yz} xy xz yz\n",
             "\nMasses\n\n1 1.0\n", "\nAtoms\n"]
    for i, p in enumerate(pts):
        lines.append(f"{i+1} 0 1 0.0 {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
    (tmp / "trimelt.data").write_text("".join(lines))

    old = sim_mod.DENSE_PATH_MAX_ATOMS
    if dense_cap is not None:
        sim_mod.DENSE_PATH_MAX_ATOMS = dense_cap
    try:
        s = LammpsScript()
        s.root = str(tmp)
        s.execute(f"""
units lj
atom_style full
read_data trimelt.data
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 0.3 9871 loop geom
fix 1 all nve
thermo {steps}
run {steps}
""".strip().splitlines())
    finally:
        sim_mod.DENSE_PATH_MAX_ATOMS = old
    return s


@pytest.mark.slow
def test_triclinic_cells_match_dense_above_cap(tmp_path):
    """The lamda-space cell stencil (production path, n > dense cap)
    reproduces the dense minimum-image path on a genuinely sheared box:
    4,913 atoms > DENSE_PATH_MAX_ATOMS=4,096 so the default run uses cells
    (npair_half_bin_newton_tri.cpp analog); the control run forces dense."""
    import lidp_tpu.sim as sim_mod

    kw = dict(n_side=17, a=1.7, xy=4.0, xz=2.0, yz=3.0, steps=4)
    s_cells = _melt_script(tmp_path, **kw)
    assert s_cells._sim.runner.neighbor_cfg is not None, \
        "expected the cell path above the dense cap"
    s_dense = _melt_script(tmp_path, dense_cap=100000, **kw)

    r0c = {k: v for k, v in s_cells.thermo_rows[0].items()}
    r0d = {k: v for k, v in s_dense.thermo_rows[0].items()}
    for key in ("epair", "etotal", "press", "temp"):
        assert abs(r0c[key] - r0d[key]) <= 1e-8 * max(1.0, abs(r0d[key])), (
            key, r0c[key], r0d[key])
    rc = s_cells.thermo_rows[-1]
    rd = s_dense.thermo_rows[-1]
    assert abs(rc["etotal"] - rd["etotal"]) <= 1e-8 * max(
        1.0, abs(rd["etotal"]))


def test_triclinic_ewald_equivalent_lattice():
    """Triclinic k enumeration (ewald.cpp coeffs_triclinic analog): the
    lattice {(L,0,0),(xy=L,L,0),(0,0,L)} is the SAME lattice as the cube, so
    with equal g_ewald the reciprocal energy/forces must agree to the k-cut
    accuracy even though the enumerated k sets differ."""
    import jax

    from lidp_tpu.ops.ewald import (EwaldParams, ewald_forces,
                                    setup_ewald_disp)

    rng = np.random.RandomState(7)
    n, L = 48, 10.0
    x = rng.uniform(0, L, (n, 3))
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    common = dict(accuracy_rel=1e-6, qqrd2e=1.0, q=q, natoms=n, cutoff=4.0,
                  box_lengths=(L, L, L))
    es_o = setup_ewald_disp(**common)
    es_t = setup_ewald_disp(**common, g_ewald=es_o.g_ewald, tilt=(L, 0.0, 0.0))
    assert es_t.hvecs.shape[0] > 0
    import jax.numpy as jnp

    xj = jnp.asarray(x)
    qj = jnp.asarray(q)
    V = jnp.asarray(L**3)
    f_o, e_o, _ = ewald_forces(xj, qj, V, EwaldParams.from_setup(es_o, 1.0))
    f_t, e_t, _ = ewald_forces(xj, qj, V, EwaldParams.from_setup(es_t, 1.0))
    assert abs(float(e_o - e_t)) < 5e-4 * max(1.0, abs(float(e_o))), (
        float(e_o), float(e_t))
    frms = float(np.sqrt(np.mean(np.asarray(f_o) ** 2)))
    drms = float(np.sqrt(np.mean((np.asarray(f_o) - np.asarray(f_t)) ** 2)))
    assert drms < 5e-4 * frms, (drms, frms)


def test_triclinic_ewald_g_invariance():
    """On a genuinely sheared cell, the total Coulomb energy
    E_real(erfc) + E_recip - E_self must be independent of the real/recip
    split parameter g_ewald (the standard Ewald identity)."""
    import math

    import jax.numpy as jnp

    from lidp_tpu.ops.ewald import (EwaldParams, ewald_forces,
                                    setup_ewald_disp)

    rng = np.random.RandomState(3)
    n, L = 32, 9.0
    xy, xz, yz = 2.5, 1.5, 2.0
    h = np.array([[L, xy, xz], [0, L, yz], [0, 0, L]])
    x = (rng.uniform(0, 1, (n, 3)) @ h.T)
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    rc = 4.0

    def real_part(g):
        from scipy.special import erfc
        e = 0.0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    s = h @ np.array([di, dj, dk], float)
                    d = x[:, None, :] - x[None, :, :] + s
                    r = np.sqrt((d * d).sum(-1))
                    if di == dj == dk == 0:
                        np.fill_diagonal(r, np.inf)
                    qq = q[:, None] * q[None, :]
                    e += 0.5 * np.sum(
                        np.where(r < rc, qq * erfc(g * r)
                                 / np.where(r < rc, r, 1.0), 0.0))
        return e

    totals = []
    for g in (0.9, 1.2):
        es = setup_ewald_disp(accuracy_rel=1e-7, qqrd2e=1.0, q=q, natoms=n,
                              cutoff=rc, box_lengths=(L, L, L), g_ewald=g,
                              tilt=(xy, xz, yz))
        _, e_k, _ = ewald_forces(jnp.asarray(x), jnp.asarray(q),
                                 jnp.asarray(L**3),
                                 EwaldParams.from_setup(es, 1.0))
        totals.append(real_part(g) + float(e_k))
    assert abs(totals[0] - totals[1]) < 2e-4 * max(1.0, abs(totals[0])), totals
