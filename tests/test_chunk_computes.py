"""The */chunk aggregate compute family vs the rebuilt reference.

Goldens minted by scripts/gen_chunk_goldens.py from the REBUILT 16Mar18
reference binary (compute_com_chunk.cpp, compute_vcm_chunk.cpp,
compute_gyration_chunk.cpp, compute_angmom_chunk.cpp,
compute_torque_chunk.cpp, compute_inertia_chunk.cpp,
compute_omega_chunk.cpp, compute_dipole_chunk.cpp,
compute_msd_chunk.cpp, compute_property_chunk.cpp,
compute_temp_chunk.cpp) on a deterministic two-type charged LJ melt;
output through fix ave/time mode vector (fix_ave_time.cpp file layout).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

HEAD = """units lj
atom_style charge
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 2 box
create_atoms 1 box
mass 1 1.0
mass 2 1.5
region left block 0 2 0 4 0 4
group left region left
set region left type 2
set type 1 charge 0.08
set type 2 charge -0.05
region bottom block 0 4 0 2 0 4
set region bottom charge 0.15
pair_style lj/cut 2.5
pair_coeff * * 1.0 1.0
velocity all create 1.44 87287 loop geom
fix 1 all nve
compute cc all chunk/atom type
"""

TAIL = """thermo 2
thermo_modify format float %.15g norm no
run 4
"""

CASES = {
    "com": "compute g all com/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "vcm": "compute g all vcm/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "gyration": "compute g all gyration/chunk cc\n"
                "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "gyration_tensor": "compute g all gyration/chunk cc tensor\n"
                       "fix av all ave/time 2 1 2 c_g mode vector "
                       "file out.txt\n",
    "angmom": "compute g all angmom/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "torque": "compute g all torque/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "inertia": "compute g all inertia/chunk cc\n"
               "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "omega": "compute g all omega/chunk cc\n"
             "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "dipole": "compute g all dipole/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "dipole_geom": "compute g all dipole/chunk cc geometry\n"
                   "fix av all ave/time 2 1 2 c_g mode vector "
                   "file out.txt\n",
    "msd": "compute g all msd/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "property": "compute g all property/chunk cc count\n"
                "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "tempchunk_bin": "compute cb all chunk/atom bin/1d x lower 2.0\n"
                     "compute g all temp/chunk cb temp\n"
                     "fix av all ave/time 2 1 2 c_g mode vector "
                     "file out.txt\n",
    "com_bin2d": "compute cb all chunk/atom bin/2d x lower 2.0 "
                 "y lower 2.0\n"
                 "compute g all com/chunk cb\n"
                 "fix av all ave/time 2 1 2 c_g mode vector "
                 "file out.txt\n",
}

SCALAR_CASES = {
    "tempchunk_scalar": "compute g all temp/chunk cc\n"
                        "thermo_style custom step temp c_g\n",
    "tempchunk_com": "compute g all temp/chunk cc com yes\n"
                     "thermo_style custom step temp c_g\n",
}

CHUNK_GOLDEN = {
    "com": {
        0: [[5.03879, 2.93929, 2.93929], [1.6796, 2.93929, 2.93929]],
        2: [[5.04004, 2.93895, 2.93856], [1.6791, 2.93943, 2.93959]],
        4: [[5.04129, 2.9386, 2.93783], [1.67859, 2.93957, 2.93988]],
    },
    "vcm": {
        0: [[0.125241, -0.0347403, -0.0730981], [-0.0500965, 0.0138961, 0.0292392]],
        2: [[0.125284, -0.0347568, -0.0730855], [-0.0501136, 0.0139027, 0.0292342]],
        4: [[0.125329, -0.0348927, -0.0729807], [-0.0501314, 0.0139571, 0.0291923]],
    },
    "gyration": {
        0: [[2.80632], [2.96913]],
        2: [[2.80771], [2.96709]],
        4: [[2.80924], [2.96514]],
    },
    "gyration_tensor": {
        0: [[0.470174, 3.70262, 3.70262, 3.75027e-17, 2.59379e-17, -0.0587717], [1.41052, 3.70262, 3.70262, 3.70074e-18, 1.85037e-17, 0.035263]],
        2: [[0.470959, 3.70441, 3.70787, 0.000651384, 0.000801812, -0.0599507], [1.40719, 3.6982, 3.69822, 0.00160213, 0.00343339, 0.0336957]],
        4: [[0.472045, 3.70648, 3.71332, 0.00132551, 0.00164542, -0.0610855], [1.40405, 3.69398, 3.69402, 0.00317367, 0.00683782, 0.0321215]],
    },
    "angmom": {
        0: [[-33.798, 14.14, -15.852], [-75.6906, 33.9075, 33.7975]],
        2: [[-33.8231, 14.1226, -15.8208], [-75.6365, 33.8817, 33.7708]],
        4: [[-33.9288, 14.0432, -15.7336], [-75.4972, 33.8231, 33.7039]],
    },
    "torque": {
        0: [[-2.60799e-14, -1.18294e-14, 3.94506e-15], [-4.02985e-14, 1.34319e-15, -1.08649e-14]],
        2: [[-5.59134, -4.00387, 6.08525], [10.3056, -4.70671, -5.0484]],
        4: [[-16.2566, -12.4727, 11.2827], [17.2087, -6.79467, -8.11273]],
    },
    "inertia": {
        0: [[710.903, 400.588, 400.588, -3.60026e-15, 5.64209, -2.49004e-15], [1777.26, 1227.15, 1227.15, -2.66454e-15, -8.46313, 6.21725e-15]],
        2: [[711.579, 401.168, 400.836, -0.0625329, 5.75527, -0.076974], [1775.14, 1225.3, 1225.29, -0.38451, -8.08698, -0.824013]],
        4: [[712.301, 401.795, 401.138, -0.127249, 5.86421, -0.15796], [1773.12, 1223.54, 1223.53, -0.761681, -7.70917, -1.64108]],
    },
    "omega": {
        0: [[-0.0475423, 0.0358625, -0.0400769], [-0.0425884, 0.0278223, 0.0277332]],
        2: [[-0.0475336, 0.03577, -0.0399923], [-0.0425899, 0.0278214, 0.0277164]],
        4: [[-0.0476352, 0.0355164, -0.0397602], [-0.0425412, 0.0277915, 0.0276646]],
    },
    "dipole": {
        0: [[-9.23706e-14, -5.29073, 0.117572, 5.29203], [-1.77636e-14, -25.1939, -0.335919, 25.1962]],
        2: [[-0.000297679, -5.29382, 0.12436, 5.29528], [0.001822, -25.1757, -0.320187, 25.1778]],
        4: [[-0.000588521, -5.2969, 0.131138, 5.29853], [0.00366289, -25.1576, -0.304464, 25.1594]],
    },
    "dipole_geom": {
        0: [[-9.23706e-14, -5.29073, 0.117572, 5.29203], [-1.42109e-14, -25.1939, -0.335919, 25.1962]],
        2: [[-0.000297679, -5.29382, 0.12436, 5.29528], [0.001822, -25.1757, -0.320187, 25.1778]],
        4: [[-0.000588521, -5.2969, 0.131138, 5.29853], [0.00366289, -25.1576, -0.304464, 25.1594]],
    },
    "msd": {
        0: [[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]],
        2: [[1.56886e-06, 1.20704e-07, 5.34313e-07, 2.22387e-06], [2.51017e-07, 1.93127e-08, 8.549e-08, 3.5582e-07]],
        4: [[6.27848e-06, 4.83611e-07, 2.13592e-06, 8.898e-06], [1.00456e-06, 7.73778e-08, 3.41746e-07, 1.42368e-06]],
    },
    "property": {
        0: [[96.0], [160.0]],
        2: [[96.0], [160.0]],
        4: [[96.0], [160.0]],
    },
    "tempchunk_bin": {
        0: [[1.4868], [1.38195]],
        2: [[1.46462], [1.38871]],
        4: [[1.44531], [1.36281]],
    },
    "com_bin2d": {
        0: [[1.2597, 1.2597, 2.93929], [1.2597, 4.61889, 2.93929], [4.47892, 1.2597, 2.93929], [4.47892, 4.61889, 2.93929]],
        2: [[1.57686, 1.6937, 2.90872], [1.72911, 4.19899, 2.93253], [4.25762, 1.65886, 2.95619], [3.78305, 4.03193, 2.97285]],
        4: [[1.57748, 1.69487, 2.91044], [1.72696, 4.19898, 2.93223], [4.25856, 1.65737, 2.95707], [3.78422, 4.03171, 2.97026]],
    },
}
SCALAR_GOLDEN = {
    "tempchunk_scalar": [[0.0, 1.44, 1.434375], [2.0, 1.43285519103294, 1.42725810044297], [4.0, 1.41021682263837, 1.40470816317494]],
    "tempchunk_com": [[0.0, 1.44, 1.43048377519289], [2.0, 1.43285519103294, 1.42336511679456], [4.0, 1.41021682263837, 1.40081424755624]],
}


def _read_frames(path):
    frames = {}
    with open(path) as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    i = 0
    while i < len(lines):
        step, nrow = lines[i].split()
        rows = []
        for j in range(int(nrow)):
            rows.append([float(v) for v in lines[i + 1 + j].split()[1:]])
        frames[int(step)] = rows
        i += 1 + int(nrow)
    return frames


@pytest.mark.parametrize("case", sorted(CHUNK_GOLDEN))
def test_chunk_compute_golden(case, tmp_path):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.case").write_text(HEAD + CASES[case] + TAIL)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.case"))
    got = _read_frames(tmp_path / "out.txt")
    want = CHUNK_GOLDEN[case]
    assert sorted(got) == sorted(want)
    for step, rows in want.items():
        g = np.asarray(got[step])
        w = np.asarray(rows)
        assert g.shape == w.shape, (case, step, g.shape, w.shape)
        # golden has 6 significant digits (%g); a frame whose largest
        # magnitude is ~1e-14 is pure catastrophic-cancellation noise on
        # both sides (e.g. step-0 torque of a fresh lattice)
        if np.abs(w).max() < 1e-9:
            assert np.abs(g).max() < 1e-9, (case, step)
            continue
        scale = np.maximum(np.abs(w).max(axis=0, keepdims=True),
                           1e-6 * np.abs(w).max())
        err = np.abs(g - w) / scale
        assert err.max() < 5e-5, (case, step, err.max())


@pytest.mark.parametrize("case", sorted(SCALAR_GOLDEN))
def test_temp_chunk_scalar_golden(case, tmp_path):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.case").write_text(HEAD + SCALAR_CASES[case] + TAIL)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.case"))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, cg in SCALAR_GOLDEN[case]:
        r = rows[int(step)]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-9)
        assert float(r["c_g"]) == pytest.approx(cg, rel=1e-9)
