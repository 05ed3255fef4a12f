"""Dev probe: mint golden thermo rows for the round-3 bonded-style
breadth (bond morse/nonlinear/gromos/fene-expand/quartic/table/zero/
hybrid, angle cosine family/table/zero/hybrid, dihedral multi-harmonic/
helix/charmmfsw/zero/hybrid, improper cvff/umbrella/zero/hybrid) by
running the REBUILT reference binary (/tmp/lmpsrc/lmp_serial, 16Mar18 +
allocation patch) on a deterministic 8-molecule zig-zag-chain box.

Usage: python scripts/gen_bonded_goldens.py
Prints a python dict {case: [thermo rows]} to paste into
tests/test_bonded_breadth.py (which regenerates the identical inputs).
"""
import os
import subprocess

import numpy as np

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/bonded_gold"

# ---------------------------------------------------------------------------
# Shared system: 8 four-atom zig-zag chains on a 2x2x2 grid, 12^3 box.
# Kept in exact sync with tests/test_bonded_breadth.py::write_data.


def build_positions():
    rng = np.random.RandomState(777)
    base = np.array([[0.0, 0.0, 0.0],
                     [0.96, 0.0, 0.0],
                     [1.28, 0.91, 0.0],
                     [1.28, 1.24, 0.90]])
    pos, mol = [], []
    m = 0
    for i in range(2):
        for j in range(2):
            for k in range(2):
                m += 1
                off = np.array([1.5 + 4.5 * i, 1.5 + 4.5 * j,
                                1.5 + 4.5 * k])
                pos.append(base + off
                           + rng.uniform(-0.04, 0.04, base.shape))
                mol += [m] * 4
    return np.concatenate(pos), np.array(mol)


def write_data(path, bonds_only=False):
    pos, mol = build_positions()
    n = len(pos)
    nm = mol.max()
    with open(path, "w") as f:
        f.write("bonded golden box\n\n")
        if bonds_only:
            # bond quartic forbids 3,4-body terms (bond_quartic.cpp:237)
            f.write(f"{n} atoms\n{3 * nm} bonds\n\n"
                    "2 atom types\n2 bond types\n\n")
        else:
            f.write(f"{n} atoms\n{3 * nm} bonds\n{2 * nm} angles\n"
                    f"{nm} dihedrals\n{nm} impropers\n\n")
            f.write("2 atom types\n2 bond types\n2 angle types\n"
                    "2 dihedral types\n2 improper types\n\n")
        f.write("0.0 12.0 xlo xhi\n0.0 12.0 ylo yhi\n0.0 12.0 zlo zhi\n\n")
        f.write("Masses\n\n1 1.0\n2 1.5\n\n")
        f.write("Atoms\n\n")
        for i in range(n):
            t = 1 + (i % 2)
            q = 0.2 if i % 2 == 0 else -0.2
            f.write(f"{i+1} {mol[i]} {t} {q} "
                    f"{pos[i,0]:.10f} {pos[i,1]:.10f} {pos[i,2]:.10f}\n")
        f.write("\nBonds\n\n")
        bid = 0
        for m in range(nm):
            a = 4 * m
            for (u, v, bt) in ((1, 2, 1), (2, 3, 2), (3, 4, 1)):
                bid += 1
                f.write(f"{bid} {bt} {a+u} {a+v}\n")
        if bonds_only:
            return
        f.write("\nAngles\n\n")
        aid = 0
        for m in range(nm):
            a = 4 * m
            for (u, v, w, at) in ((1, 2, 3, 1), (2, 3, 4, 2)):
                aid += 1
                f.write(f"{aid} {at} {a+u} {a+v} {a+w}\n")
        f.write("\nDihedrals\n\n")
        for m in range(nm):
            a = 4 * m
            f.write(f"{m+1} {1 + m % 2} {a+1} {a+2} {a+3} {a+4}\n")
        f.write("\nImpropers\n\n")
        for m in range(nm):
            a = 4 * m
            f.write(f"{m+1} {1 + m % 2} {a+1} {a+2} {a+3} {a+4}\n")


def write_bond_table(path):
    """Uniform 101-point table: soft anharmonic well around r=1."""
    r = np.linspace(0.5, 1.8, 101)
    e = 25.0 * (r - 1.0) ** 2 + 8.0 * (r - 1.0) ** 3
    fr = -(50.0 * (r - 1.0) + 24.0 * (r - 1.0) ** 2)
    with open(path, "w") as f:
        f.write("# bond table golden\n\nBTAB\nN 101\n\n")
        for i in range(101):
            f.write(f"{i+1} {r[i]:.10f} {e[i]:.10f} {fr[i]:.10f}\n")


def write_angle_table(path):
    """Uniform 181-point angle table 0..180 deg."""
    th = np.linspace(0.0, 180.0, 181)
    e = 12.0 * np.deg2rad(th - 110.0) ** 2
    fdeg = -24.0 * np.deg2rad(th - 110.0) * (np.pi / 180.0)
    with open(path, "w") as f:
        f.write("# angle table golden\n\nATAB\nN 181\n\n")
        for i in range(181):
            f.write(f"{i+1} {th[i]:.10f} {e[i]:.10f} {fdeg[i]:.10f}\n")


BASE = dict(
    bond="bond_style harmonic\nbond_coeff 1 40.0 1.0\nbond_coeff 2 55.0 1.02",
    angle=("angle_style harmonic\nangle_coeff 1 30.0 109.5\n"
           "angle_coeff 2 40.0 115.0"),
    dihed=("dihedral_style opls\ndihedral_coeff 1 1.3 -0.05 0.2 0.0\n"
           "dihedral_coeff 2 0.8 0.4 0.1 0.05"),
    improp=("improper_style harmonic\nimproper_coeff 1 5.0 10.0\n"
            "improper_coeff 2 3.0 -8.0"),
    pair="pair_style zero 2.0\npair_coeff * *",
    special="",
)

CASES = {
    # ---- bonds ----
    "bond_morse": dict(bond=("bond_style morse\nbond_coeff 1 50.0 2.0 1.0\n"
                             "bond_coeff 2 60.0 1.8 1.02")),
    "bond_nonlinear": dict(bond=("bond_style nonlinear\n"
                                 "bond_coeff 1 30.0 1.0 0.8\n"
                                 "bond_coeff 2 40.0 1.02 0.9")),
    "bond_gromos": dict(bond=("bond_style gromos\nbond_coeff 1 40.0 1.0\n"
                              "bond_coeff 2 55.0 1.02")),
    "bond_fene_expand": dict(
        bond=("special_bonds fene\nbond_style fene/expand\n"
              "bond_coeff 1 30.0 1.5 1.0 1.0 0.1\n"
              "bond_coeff 2 30.0 1.6 0.8 0.95 0.05")),
    "bond_quartic": dict(
        bond=("special_bonds lj/coul 1 1 1\nbond_style quartic\n"
              "bond_coeff 1 1200.0 -0.55 0.25 1.3 34.6878\n"
              "bond_coeff 2 1000.0 -0.5 0.2 1.35 30.0"),
        pair="pair_style lj/cut 1.5\npair_coeff * * 1.0 1.0",
        angle="", dihed="", improp="", bonds_only=True),
    "bond_table": dict(bond=("bond_style table linear 101\n"
                             "bond_coeff 1 BTAB.table BTAB\n"
                             "bond_coeff 2 BTAB.table BTAB")),
    "bond_zero": dict(bond="bond_style zero\nbond_coeff *"),
    "bond_hybrid": dict(bond=("bond_style hybrid harmonic morse\n"
                              "bond_coeff 1 harmonic 40.0 1.0\n"
                              "bond_coeff 2 morse 60.0 1.8 1.02")),
    # ---- angles ----
    "angle_cosine": dict(angle=("angle_style cosine\nangle_coeff 1 20.0\n"
                                "angle_coeff 2 25.0")),
    "angle_cosine_squared": dict(
        angle=("angle_style cosine/squared\nangle_coeff 1 30.0 109.5\n"
               "angle_coeff 2 40.0 115.0")),
    "angle_cosine_delta": dict(
        angle=("angle_style cosine/delta\nangle_coeff 1 30.0 109.5\n"
               "angle_coeff 2 40.0 115.0")),
    "angle_cosine_periodic": dict(
        angle=("angle_style cosine/periodic\nangle_coeff 1 40.0 1 2\n"
               "angle_coeff 2 50.0 -1 3")),
    "angle_table": dict(angle=("angle_style table linear 181\n"
                               "angle_coeff 1 ATAB.table ATAB\n"
                               "angle_coeff 2 ATAB.table ATAB")),
    "angle_zero": dict(angle="angle_style zero\nangle_coeff *"),
    "angle_hybrid": dict(angle=("angle_style hybrid harmonic cosine\n"
                                "angle_coeff 1 harmonic 30.0 109.5\n"
                                "angle_coeff 2 cosine 25.0")),
    # ---- dihedrals ----
    "dihedral_multi_harmonic": dict(
        dihed=("dihedral_style multi/harmonic\n"
               "dihedral_coeff 1 1.0 -0.8 0.6 -0.4 0.2\n"
               "dihedral_coeff 2 0.5 0.3 -0.2 0.7 -0.1")),
    "dihedral_helix": dict(
        dihed=("dihedral_style helix\ndihedral_coeff 1 1.2 0.8 0.5\n"
               "dihedral_coeff 2 0.7 0.3 0.9")),
    "dihedral_zero": dict(dihed="dihedral_style zero\ndihedral_coeff *"),
    # ---- impropers ----
    "improper_cvff": dict(
        improp=("improper_style cvff\nimproper_coeff 1 4.0 -1 2\n"
                "improper_coeff 2 6.0 1 3")),
    "improper_umbrella": dict(
        improp=("improper_style umbrella\nimproper_coeff 1 5.0 15.0\n"
                "improper_coeff 2 4.0 0.0")),
    "improper_zero": dict(improp="improper_style zero\nimproper_coeff *"),
}


def script_for(case):
    cfg = dict(BASE)
    cfg.update({k: v for k, v in CASES[case].items() if k != "bonds_only"})
    return f"""units lj
atom_style full
boundary p p p
{cfg['special']}
read_data data.bonded
{cfg['pair']}
{cfg['bond']}
{cfg['angle']}
{cfg['dihed']}
{cfg['improp']}
velocity all create 0.3 4928459 loop geom
neighbor 0.4 bin
neigh_modify every 1 delay 0 check yes
fix 1 all nve
timestep 0.004
thermo 1
thermo_style custom step ebond eangle edihed eimp evdwl ecoul pe press
thermo_modify format float %.15g norm no
run 4
"""


def run_case(case):
    path = os.path.join(ROOT, case)
    os.makedirs(path, exist_ok=True)
    write_data(os.path.join(path, "data.bonded"),
               bonds_only=CASES[case].get("bonds_only", False))
    write_bond_table(os.path.join(path, "BTAB.table"))
    write_angle_table(os.path.join(path, "ATAB.table"))
    with open(os.path.join(path, "in.case"), "w") as f:
        f.write(script_for(case))
    r = subprocess.run([LMP, "-in", "in.case"], cwd=path,
                       capture_output=True, text=True, timeout=300)
    rows = []
    grab = False
    for ln in r.stdout.splitlines():
        t = ln.split()
        if grab and t and t[0].isdigit():
            rows.append([float(v) for v in t])
            if t[0] == "4":
                grab = False
        if t[:2] == ["Step", "E_bond"]:
            grab = True
    if len(rows) != 5:
        print(f"### {case} FAILED")
        print(r.stdout[-3000:])
        print(r.stderr[-1000:])
        return None
    return rows


if __name__ == "__main__":
    out = {}
    for case in CASES:
        rows = run_case(case)
        if rows is not None:
            out[case] = rows
            print(f"# {case}: ok")
    print("GOLDEN = {")
    for case, rows in out.items():
        print(f'    "{case}": [')
        for row in rows:
            print(f"        {row},")
        print("    ],")
    print("}")
