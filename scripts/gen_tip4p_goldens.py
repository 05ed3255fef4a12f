"""Dev probe: mint golden thermo rows for the TIP4P pair-style family
(tip4p/cut, lj/cut/tip4p/cut, tip4p/long) by running the REBUILT
reference binary (/tmp/lmpsrc/lmp_serial, 16Mar18 + allocation patch) on
a deterministic 8-molecule flexible-water box.

Usage: python scripts/gen_tip4p_goldens.py
Prints a python dict of {case: [thermo rows]} to paste into
tests/test_tip4p_cut.py (which regenerates the identical data file).
"""
import math
import os
import subprocess
import sys

import numpy as np

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/tip4p_golden"

QO, QH = -1.1128, 0.5564
R0, THETA0 = 0.9572, 104.52
QDIST = 0.1546
EPS_OO, SIG_OO = 0.1852, 3.1589


def write_water_data(path, nside=2, L=12.0, seed=7):
    """nside^3 flexible water molecules on a jittered grid in an L^3 box
    (atom_style full: id mol type q x y z) — both engines read this
    identical file."""
    rng = np.random.RandomState(seed)
    th = math.radians(THETA0)
    h1 = np.array([R0 * math.sin(th / 2), R0 * math.cos(th / 2), 0.0])
    h2 = np.array([-R0 * math.sin(th / 2), R0 * math.cos(th / 2), 0.0])
    atoms, bonds, angles = [], [], []
    aid = 0
    for mi in range(nside ** 3):
        i, j, k = mi % nside, (mi // nside) % nside, mi // nside ** 2
        o = (np.array([i, j, k]) + 0.5) * (L / nside) \
            + rng.uniform(-0.4, 0.4, 3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)],
        ])
        atoms.append((aid + 1, mi + 1, 1, QO, o))
        atoms.append((aid + 2, mi + 1, 2, QH, o + R @ h1))
        atoms.append((aid + 3, mi + 1, 2, QH, o + R @ h2))
        bonds.append((aid + 1, aid + 2))
        bonds.append((aid + 1, aid + 3))
        angles.append((aid + 2, aid + 1, aid + 3))
        aid += 3
    with open(path, "w") as f:
        f.write("tip4p water golden box\n\n")
        f.write(f"{len(atoms)} atoms\n{len(bonds)} bonds\n"
                f"{len(angles)} angles\n")
        f.write("2 atom types\n1 bond types\n1 angle types\n\n")
        f.write(f"0.0 {L} xlo xhi\n0.0 {L} ylo yhi\n0.0 {L} zlo zhi\n\n")
        f.write("Masses\n\n1 15.9994\n2 1.008\n\n")
        f.write("Atoms\n\n")
        for aid_, mol, t, qq, p in atoms:
            f.write(f"{aid_} {mol} {t} {qq} {p[0]:.15g} {p[1]:.15g} "
                    f"{p[2]:.15g}\n")
        f.write("\nBonds\n\n")
        for bi, (i, j) in enumerate(bonds, start=1):
            f.write(f"{bi} 1 {i} {j}\n")
        f.write("\nAngles\n\n")
        for ai, (i, j, k) in enumerate(angles, start=1):
            f.write(f"{ai} 1 {i} {j} {k}\n")


# case -> (extra setup lines)
CASES = {
    # Coulomb-only off-site cutoff style (pair_tip4p_cut.cpp)
    "tip4pcut": [
        f"pair_style tip4p/cut 1 2 1 1 {QDIST} 5.0",
        "pair_coeff * *",
    ],
    # LJ on real sites + cutoff Coulomb on charge sites
    # (pair_lj_cut_tip4p_cut.cpp)
    "ljtip4pcut": [
        f"pair_style lj/cut/tip4p/cut 1 2 1 1 {QDIST} 5.9 5.0",
        f"pair_coeff 1 1 {EPS_OO} {SIG_OO}",
        "pair_coeff 2 2 0.0 0.0",
    ],
    # Coulomb-only off-site long style + ewald (pair_tip4p_long.cpp)
    "tip4plong": [
        f"pair_style tip4p/long 1 2 1 1 {QDIST} 5.0",
        "pair_coeff * *",
        "kspace_style pppm/tip4p 1.0e-4",
    ],
    # LJ-cut flavor of the dispersion-capable tip4p style
    # (pair_lj_long_tip4p_long.cpp, flags "cut long")
    "ljlongtip4p_cut": [
        # the pair style sets dispersionflag unconditionally
        # (pair_lj_long_tip4p_long.cpp:54), so even the "cut" lj flavor
        # must pair with pppm/disp/tip4p; function[1] stays off
        f"pair_style lj/long/tip4p/long cut long 1 2 1 1 {QDIST} 5.9 5.0",
        f"pair_coeff 1 1 {EPS_OO} {SIG_OO}",
        "pair_coeff 2 2 0.0 0.0",
        "kspace_style pppm/disp/tip4p 1.0e-4",
        # pppm_disp.cpp's own g_ewald iteration differs from pppm.cpp's —
        # pin it so the real/k charge split is comparable
        "kspace_modify gewald 0.521103",
    ],
    # full dispersion-long + coulomb-long tip4p
    # (pair_lj_long_tip4p_long.cpp "long long" + pppm_disp_tip4p.cpp)
    "ljlongtip4p_long": [
        f"pair_style lj/long/tip4p/long long long 1 2 1 1 {QDIST} 5.9 5.0",
        f"pair_coeff 1 1 {EPS_OO} {SIG_OO}",
        "pair_coeff 2 2 0.0 0.0",
        "kspace_style pppm/disp/tip4p 1.0e-4",
        # pin g_ewald (pppm_disp.cpp's own iteration differs from
        # pppm.cpp's) and g_ewald_6 so both real/k splits are comparable
        "kspace_modify gewald 0.521103 gewald/disp 0.28",
    ],
}


def make_input(case):
    lines = [
        "units real",
        "atom_style full",
        "read_data data.tip4p",
        f"bond_style harmonic",
        f"bond_coeff 1 450.0 {R0}",
        "angle_style harmonic",
        f"angle_coeff 1 55.0 {THETA0}",
        *CASES[case],
        "special_bonds lj/coul 0.0 0.0 0.5",
        "neighbor 2.0 bin",
        "velocity all create 300.0 4928459 loop geom",
        "timestep 0.2",
        "fix 1 all nve",
        "thermo 1",
        "thermo_style custom step temp pe evdwl ecoul elong ebond eangle"
        " press",
        "thermo_modify format float %.12g",
        "run 5",
    ]
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(ROOT, exist_ok=True)
    write_water_data(os.path.join(ROOT, "data.tip4p"))
    out = {}
    for case in CASES:
        inp = os.path.join(ROOT, f"in.{case}")
        with open(inp, "w") as f:
            f.write(make_input(case))
        r = subprocess.run([LMP, "-in", inp, "-log", "none"],
                           cwd=ROOT, capture_output=True, text=True,
                           timeout=120)
        rows = []
        grab = False
        for ln in r.stdout.splitlines():
            if ln.startswith("Step "):
                grab = True
                continue
            if grab:
                parts = ln.split()
                if not parts or not parts[0].isdigit():
                    grab = False
                    continue
                rows.append([float(v) for v in parts])
        if r.returncode != 0 or not rows:
            print(f"### {case} FAILED", file=sys.stderr)
            print(r.stdout[-3000:], file=sys.stderr)
            print(r.stderr[-500:], file=sys.stderr)
            continue
        out[case] = rows
    print("GOLDEN = {")
    for case, rows in out.items():
        print(f"    {case!r}: [")
        for row in rows:
            print(f"        {row},")
        print("    ],")
    print("}")


if __name__ == "__main__":
    main()
