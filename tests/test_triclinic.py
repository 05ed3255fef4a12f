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
