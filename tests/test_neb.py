"""NEB minimum-energy path (REPLICA/neb.cpp + fix_neb.cpp).

Setup with an analytically known saddle: FOUR fixed anchor atoms at
(+-D, 0, 0) and (0, 0, +-D) around the origin and one mobile atom hopping
between the mirror-image minima at (0, +-y*, 0).  The anchors block the
azimuthal ring that a 2-anchor setup would leave degenerate, so the only
MEP crosses the origin: barrier = E(origin) - E(minimum), computable in
closed form (4 LJ pair energies).
"""

import numpy as np
import pytest

D = 1.0


def _pair_e(r, eps=1.0, sig=1.0):
    s6 = (sig / r) ** 6
    return 4.0 * eps * (s6 * s6 - s6)


def _mobile_energy(y):
    r = np.hypot(D, y)      # same distance to all four anchors
    return 4.0 * _pair_e(r)


def anchors_fixed_energy():
    """Constant anchor-anchor contribution (2 colinear + 4 diagonal pairs)."""
    return 2.0 * _pair_e(2 * D) + 4.0 * _pair_e(np.sqrt(2.0) * D)


def write_hop_system(tmp, name):
    """Data file + (ystar, e_min, e_saddle) for the 5-atom hop system."""
    from scipy.optimize import minimize_scalar

    opt = minimize_scalar(_mobile_energy, bounds=(0.2, 3.0),
                          method="bounded")
    ystar, e_min = float(opt.x), float(opt.fun)
    e_saddle = _mobile_energy(0.0)
    L = 20.0
    data = [f"{name}\n\n5 atoms\n2 atom types\n",
            f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n",
            "\nMasses\n\n1 1.0\n2 1.0\n", "\nAtoms\n",
            f"1 0 1 0.0 {10 - D} 10.0 10.0\n",
            f"2 0 1 0.0 {10 + D} 10.0 10.0\n",
            f"3 0 1 0.0 10.0 10.0 {10 - D}\n",
            f"4 0 1 0.0 10.0 10.0 {10 + D}\n",
            f"5 0 2 0.0 10.0 {10 + ystar} 10.0\n"]
    (tmp / f"{name}.data").write_text("".join(data))
    return ystar, e_min, e_saddle


@pytest.fixture(scope="module")
def neb(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    tmp = tmp_path_factory.mktemp("neb")
    ystar, e_min, e_saddle = write_hop_system(tmp, "neb")
    (tmp / "final.coords").write_text(
        f"1\n5 10.0 {10 - ystar} 10.0\n")

    s = LammpsScript()
    s.root = str(tmp)
    s.execute("""
units lj
atom_style full
read_data neb.data
pair_style lj/cut 10.0
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 1.0 1.0
group mobile type 2
fix 1 mobile neb 1.0
neb 0.0 1.0e-6 2000 2000 100 final final.coords nreplicas 9
""".strip().splitlines())
    return s, e_min, e_saddle, ystar


def test_neb_barrier(neb):
    s, e_min, e_saddle, ystar = neb
    barrier_ref = e_saddle - e_min
    assert barrier_ref > 1.0           # a real barrier (4 eps here)
    e = s.neb_energies - anchors_fixed_energy()
    assert abs(e[0] - e_min) < 1e-6
    assert abs(e[-1] - e_min) < 1e-6
    barrier = float(e.max() - e[0])
    assert abs(barrier - barrier_ref) < 0.02 * barrier_ref, (
        barrier, barrier_ref)


def test_neb_saddle_geometry(neb):
    s, _, _, ystar = neb
    # the climbing image should sit near the origin saddle (y = 10)
    top = int(np.argmax(s.neb_energies))
    x_top = s.neb_path[top][4]
    assert abs(x_top[1] - 10.0) < 0.05, x_top
