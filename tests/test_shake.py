"""fix shake — batched SHAKE constraints (RIGID/fix_shake.cpp).

TIP3P-like water: O-H bonds + H-O-H angle constrained via `m 1.008 a 1`;
bond lengths and the 1-3 distance must stay on the constraint manifold over
many NVE steps, and the constrained bonds/angles must stop contributing
bonded forces.
"""

import numpy as np
import pytest

R_OH = 0.9572
THETA = 104.52

WATER_SCRIPT = """
units real
atom_style full
boundary p p p
bond_style harmonic
angle_style harmonic
pair_style lj/cut/coul/long 8.0 8.0
kspace_style ewald 1.0e-4
read_data {data}
pair_coeff 1 1 0.1521 3.1507
pair_coeff 2 2 0.0 0.0
bond_coeff 1 450.0 0.9572
angle_coeff 1 55.0 104.52
special_bonds lj/coul 0.0 0.0 0.0
velocity all create 300.0 87287 loop geom
fix 1 all shake 0.0001 20 0 m 1.008 a 1
fix 2 all nve
timestep 1.0
"""


def _water_data(nmol=8, L=16.0):
    """nmol waters on a grid, TIP3P geometry."""
    th = np.deg2rad(THETA)
    hx = R_OH * np.cos(th / 2)
    hy = R_OH * np.sin(th / 2)
    lines = [f"water\n\n{3*nmol} atoms\n{2*nmol} bonds\n{nmol} angles\n",
             "2 atom types\n1 bond types\n1 angle types\n",
             f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n",
             "\nMasses\n\n1 15.9994\n2 1.008\n", "\nAtoms\n"]
    k = int(np.ceil(nmol ** (1 / 3)))
    aid = 0
    pos = []
    for m in range(nmol):
        i, j, kk = m % k, (m // k) % k, m // (k * k)
        ox, oy, oz = 2.0 + i * L / k, 2.0 + j * L / k, 2.0 + kk * L / k
        pos += [(ox, oy, oz), (ox + hx, oy + hy, oz), (ox + hx, oy - hy, oz)]
    for m in range(nmol):
        o, h1, h2 = 3 * m + 1, 3 * m + 2, 3 * m + 3
        qs = (-0.834, 0.417, 0.417)
        for a, (q, t) in zip((o, h1, h2), zip(qs, (1, 2, 2))):
            x, y, z = pos[a - 1]
            lines.append(f"{a} {m+1} {t} {q} {x:.6f} {y:.6f} {z:.6f}\n")
    lines.append("\nBonds\n\n")
    for m in range(nmol):
        o, h1, h2 = 3 * m + 1, 3 * m + 2, 3 * m + 3
        lines.append(f"{2*m+1} 1 {o} {h1}\n{2*m+2} 1 {o} {h2}\n")
    lines.append("\nAngles\n\n")
    for m in range(nmol):
        o, h1, h2 = 3 * m + 1, 3 * m + 2, 3 * m + 3
        lines.append(f"{m+1} 1 {h1} {o} {h2}\n")
    return "".join(lines)


@pytest.fixture(scope="module")
def water(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    d = tmp_path_factory.mktemp("shake")
    (d / "water.data").write_text(_water_data())
    s = LammpsScript()
    s.execute(WATER_SCRIPT.format(data=d / "water.data").strip().splitlines())
    s.one("run 50")
    return s


def _distances(s):
    sys = s._sim.sys
    x = np.asarray(sys.x)
    L = np.asarray(sys.box.lengths)
    nmol = s.x.shape[0] // 3

    def mi(d):
        return d - L * np.round(d / L)

    oh1 = np.linalg.norm(mi(x[0::3] - x[1::3]), axis=1)
    oh2 = np.linalg.norm(mi(x[0::3] - x[2::3]), axis=1)
    hh = np.linalg.norm(mi(x[1::3] - x[2::3]), axis=1)
    return oh1, oh2, hh


def test_shake_holds_constraints(water):
    oh1, oh2, hh = _distances(water)
    th = np.deg2rad(THETA)
    hh_target = np.sqrt(2 * R_OH**2 - 2 * R_OH**2 * np.cos(th))
    # SHAKE tolerance 1e-4 on lambda; geometric error stays ~1e-4 Angstrom
    assert np.max(np.abs(oh1 - R_OH)) < 5e-4, np.max(np.abs(oh1 - R_OH))
    assert np.max(np.abs(oh2 - R_OH)) < 5e-4
    assert np.max(np.abs(hh - hh_target)) < 5e-4


def test_shake_removes_bonded_terms_and_dof(water):
    s = water
    rows = s.thermo_rows
    # constrained bonds/angles excluded from bonded energies
    assert rows[0]["ebond"] == 0.0 and rows[0]["eangle"] == 0.0
    # dof: 3N - 3 - 3*nmol (2 bonds + 1 angle constraint per water)
    n = s.x.shape[0]
    nmol = n // 3
    assert s._sim.thermo_params.dof == 3 * n - 3 - 3 * nmol


def test_shake_energy_behaviour(water):
    """NVE + SHAKE conserves E after the initial transient in which the
    constraint-violating components of the created velocities are removed
    (velocity create is constraint-unaware, exactly as in the reference)."""
    water.one("run 50")     # past the transient; rows appended
    rows = water.thermo_rows
    e0, e1 = rows[-2]["etotal"], rows[-1]["etotal"]
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 5e-3, (e0, e1)


def test_shake_cluster_finder_shapes():
    from lidp_tpu.ops.shake import find_clusters

    # one water: atoms 0(O),1(H),2(H); bonds (0,1),(0,2); angle (1,0,2)
    found = find_clusters(
        3, np.array([[0, 1], [0, 2]]), np.array([1, 1]),
        np.array([[1, 0, 2]]), np.array([1]),
        np.array([15.9994, 1.008, 1.008]),
        masses=[1.008], a_types=[1],
        bond_r0=np.array([0.0, R_OH]),
        angle_theta0=np.array([0.0, np.deg2rad(THETA)]))
    atoms, pairs, b2, mask, ncons, selb, sela = found
    assert atoms.shape == (1, 4) and atoms[0, 0] == 0
    assert ncons == 3 and mask.all()
    assert list(selb) == [0, 1] and list(sela) == [0]
    th = np.deg2rad(THETA)
    assert abs(b2[0, 2] - (2 * R_OH**2 * (1 - np.cos(th)))) < 1e-12
