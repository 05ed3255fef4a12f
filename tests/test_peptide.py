"""examples/peptide golden-log parity (log.5Oct16.peptide.g++.1) — the full
CHARMM stack in one system: lj/charmm/coul/long switching, charmm angles
(Urey-Bradley) and dihedrals (+ weighted 1-4), harmonic impropers, PPPM
(grid 15^3 / g_ewald 0.268725 selected exactly like pppm.cpp), SHAKE
(19/6/3 clusters + 640 frozen angles), and NVT tchain 1.

Step-0 energies match to ~1e-5 relative (our thermo is computed after
FixShake::correct_coordinates; the reference prints pre-correction forces);
the 50-step trajectory tracks the golden at 4-6 significant digits.
"""

import numpy as np
import pytest

GOLD0 = dict(etotal=-5237.4580, ke=1134.9186, temp=282.1005, pe=-6372.3766,
             ebond=16.5572, eangle=36.3726, edihed=15.5190, eimp=1.9426,
             evdwl=692.8945, ecoul=26772.2646, elong=-33907.9271,
             press=-837.0112)
GOLD50 = dict(etotal=-5247.5537, temp=281.4745, ebond=12.2118,
              eangle=31.7365, edihed=18.8145, eimp=2.3611, evdwl=658.1785,
              ecoul=26804.4441, elong=-33907.7003, press=-1331.7946)


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def peptide():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = "/root/reference/examples/peptide"
    lines = [("run 50" if ln.strip().startswith("run") else ln)
             for ln in open(
                 "/root/reference/examples/peptide/in.peptide"
             ).read().splitlines()]
    s.execute(lines)
    return s


def test_peptide_step0(peptide):
    r = peptide.thermo_rows[0]
    assert abs(r["ke"] - GOLD0["ke"]) < 1e-3          # exact (data velocities)
    assert abs(r["temp"] - GOLD0["temp"]) < 1e-3      # shake dof exact
    for k, tol in (("ebond", 2e-4), ("eangle", 2e-4), ("edihed", 2e-4),
                   ("eimp", 2e-4), ("evdwl", 5e-3), ("ecoul", 0.2),
                   ("elong", 0.05), ("etotal", 0.2)):
        assert abs(r[k] - GOLD0[k]) < tol, (k, r[k], GOLD0[k])
    # pressure includes the SHAKE constraint virial with the setup-time
    # half-kick dtfsq (fix_shake.cpp:2734) and the PPPM mesh virial
    assert abs(r["press"] - GOLD0["press"]) < 1.0, r["press"]


def test_peptide_50_step_trajectory(peptide):
    rows = {int(r["step"]): r for r in peptide.thermo_rows}
    r = rows[50]
    for k, tol in (("etotal", 0.2), ("temp", 0.1), ("ebond", 0.02),
                   ("eangle", 0.05), ("edihed", 0.02), ("eimp", 0.005),
                   ("evdwl", 0.2), ("ecoul", 0.5), ("elong", 0.5),
                   ("press", 2.0)):
        assert abs(r[k] - GOLD50[k]) < tol, (k, r[k], GOLD50[k])


def test_peptide_shake_clusters():
    """find_clusters reproduces the log's cluster census exactly:
    19 size-2, 6 size-3, 3 size-4, 640 frozen angles."""
    import collections

    from lidp_tpu.io.data_reader import read_data
    from lidp_tpu.ops.shake import find_clusters

    d = read_data("/root/reference/examples/peptide/data.peptide",
                  atom_style="full")
    br0 = np.zeros(19); ath0 = np.zeros(32)
    for t, v in d.bond_coeffs.items():
        br0[t] = v[1]
    for t, v in d.angle_coeffs.items():
        ath0[t] = np.deg2rad(v[1])
    found = find_clusters(
        d.natoms, d.bonds - 1, d.bond_types, d.angles - 1, d.angle_types,
        d.mass[d.type], b_types=[4, 6, 8, 10, 12, 14, 18], a_types=[31],
        bond_r0=br0, angle_theta0=ath0, type_atom=d.type)
    atoms, pairs, b2, mask, ncons, selb, sela = found
    sizes = collections.Counter((atoms >= 0).sum(1).tolist())
    assert sizes[2] == 19 and sizes[4] == 3 and sizes[3] == 646
    assert len(sela) == 640
    assert ncons == 1960
