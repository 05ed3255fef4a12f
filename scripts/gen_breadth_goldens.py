"""Dev probe: mint golden thermo rows for the round-3 pair-style breadth
(lj96/cut, lj/smooth, lj/smooth/linear, ufm, beck, zbl, coul/dsf,
coul/wolf, lj/cut/coul/dsf|wolf, born/coul/dsf|wolf) by running the
REBUILT reference binary (/tmp/lmpsrc/lmp_serial, 16Mar18 + allocation
patch) on a deterministic 64-atom charge-checkerboard box.

Usage: python scripts/gen_breadth_goldens.py
Prints a python dict of {case: [thermo rows]} to paste into
tests/test_pair_breadth2.py (which regenerates the identical data file).
"""
import os
import subprocess
import sys

import numpy as np

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/breadth"


def write_data(path, one_type=False):
    """4x4x4 sc lattice in a 6.0^3 box, checkerboard charges/types,
    deterministic jitter — both engines read this identical file.

    one_type=True collapses to a single atom type: the 2018 reference's
    PairLJCutCoulWolf::init_one never symmetrizes cut_ljsq[j][i]
    (pair_lj_cut_coul_wolf.cpp:285-312 — the j,i block skips it), so ANY
    multi-type run silently drops (2,1) LJ pairs; the single-type golden
    is the only well-defined one."""
    rng = np.random.RandomState(12345)
    n_side = 4
    a = 6.0 / n_side
    pos, typ, q = [], [], []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                p = (np.array([i, j, k]) + 0.5) * a
                pos.append(p)
                parity = (i + j + k) % 2
                typ.append(1 if one_type else 1 + parity)
                q.append(1.0 if parity == 0 else -1.0)
    pos = np.array(pos) + rng.uniform(-0.05, 0.05, (len(pos), 3))
    ntypes = 1 if one_type else 2
    masses = "1 1.0\n" if one_type else "1 1.0\n2 1.5\n"
    with open(path, "w") as f:
        f.write("breadth golden box\n\n")
        f.write(f"{len(pos)} atoms\n{ntypes} atom types\n\n")
        f.write("0.0 6.0 xlo xhi\n0.0 6.0 ylo yhi\n0.0 6.0 zlo zhi\n\n")
        f.write(f"Masses\n\n{masses}\n")
        f.write("Atoms\n\n")
        for m, (p, t, qq) in enumerate(zip(pos, typ, q), start=1):
            f.write(f"{m} {t} {qq:.1f} {p[0]:.15g} {p[1]:.15g} "
                    f"{p[2]:.15g}\n")


CASES = {
    "lj96": ("lj", 0.005, ["pair_style lj96/cut 2.5",
                           "pair_coeff 1 1 1.0 1.0",
                           "pair_coeff 2 2 0.8 1.1"]),
    "ljsmooth": ("lj", 0.005, ["pair_style lj/smooth 2.0 2.5",
                               "pair_coeff 1 1 1.0 1.0",
                               "pair_coeff 2 2 0.8 1.1"]),
    "ljsmoothlin": ("lj", 0.005, ["pair_style lj/smooth/linear 2.5",
                                  "pair_coeff 1 1 1.0 1.0",
                                  "pair_coeff 2 2 0.8 1.1"]),
    # ufm 1-2 coeffs are given explicitly AT the geometric-mix values:
    # the 2018 reference's pair_ufm.cpp sets scale[i][j] = 1.0 only inside
    # coeff() (:214), so a MIXED pair's scale stays uninitialized and its
    # forces are multiplied by garbage (energy is unaffected — verified by
    # finite-differencing the reference's own PE, which matches our
    # forces, not its dump).  Explicit coeffs sidestep the defect while
    # still checking our mixing (identical tables either way).
    "ufm": ("lj", 0.005, ["pair_style ufm 2.5",
                          "pair_coeff 1 1 2.0 1.2",
                          "pair_coeff 1 2 1.73205080756887729 "
                          "1.29614813968157218",
                          "pair_coeff 2 2 1.5 1.4"]),
    "beck": ("lj", 0.005, ["pair_style beck 2.5",
                           "pair_coeff * * 5.0 1.0 0.9 3.0 0.2"]),
    "zbl": ("metal", 1.0e-5, ["pair_style zbl 2.0 2.5",
                              "pair_coeff 1 1 13 13",
                              "pair_coeff 1 2 13 29",
                              "pair_coeff 2 2 29 29"]),
    "couldsf": ("lj", 0.005, ["pair_style coul/dsf 0.5 2.5",
                              "pair_coeff * *"]),
    "coulwolf": ("lj", 0.005, ["pair_style coul/wolf 0.5 2.5",
                               "pair_coeff * *"]),
    "ljdsf": ("lj", 0.005, ["pair_style lj/cut/coul/dsf 0.5 2.2 2.5",
                            "pair_coeff 1 1 1.0 1.0",
                            "pair_coeff 2 2 0.8 1.1"]),
    # NOTE 2-arg + single-type: the 2018 reference's lj/cut/coul/wolf has
    # TWO init defects — settings never reads arg[2] (cut_coul stays
    # uninitialized with 3 args; ecoul ~1e75) and init_one never
    # symmetrizes cut_ljsq[j][i] (multi-type runs drop (2,1) LJ pairs).
    # The 2-arg single-type case is the only well-defined one; our
    # implementation uses the modern (fixed) semantics for both.
    "ljwolf": ("lj", 0.005, ["pair_style lj/cut/coul/wolf 0.5 2.5",
                             "pair_coeff 1 1 1.0 1.0"],
               "data.breadth1"),
    # pair hybrid / hybrid/overlay (pair_hybrid.cpp)
    "hybover": ("lj", 0.005,
                ["pair_style hybrid/overlay lj/cut 2.5 coul/dsf 0.5 2.5",
                 "pair_coeff 1 1 lj/cut 1.0 1.0",
                 "pair_coeff 1 2 lj/cut 0.9 1.05",
                 "pair_coeff 2 2 lj/cut 0.8 1.1",
                 "pair_coeff * * coul/dsf"]),
    "hybrid": ("lj", 0.005,
               ["pair_style hybrid lj/cut 2.5 morse 3.0",
                "pair_coeff 1 1 lj/cut 1.0 1.0",
                "pair_coeff 1 2 lj/cut 0.9 1.05",
                "pair_coeff 2 2 morse 2.0 1.5 1.2"]),
    "hybmix": ("lj", 0.005,
               ["pair_style hybrid/overlay lj/cut 2.5 morse 3.0",
                "pair_coeff 1 1 lj/cut 1.0 1.0",
                "pair_coeff 2 2 lj/cut 0.8 1.1",
                "pair_coeff 1 2 morse 0.5 1.5 1.6"]),
    "borndsf": ("lj", 0.005,
                ["pair_style born/coul/dsf 0.5 2.2 2.5",
                 "pair_coeff 1 1 1.0 0.4 1.0 1.0 0.5",
                 "pair_coeff 1 2 0.9 0.45 1.05 1.0 0.5",
                 "pair_coeff 2 2 0.8 0.5 1.1 1.0 0.5"]),
    "bornwolf": ("lj", 0.005,
                 ["pair_style born/coul/wolf 0.5 2.2 2.5",
                  "pair_coeff 1 1 1.0 0.4 1.0 1.0 0.5",
                  "pair_coeff 1 2 0.9 0.45 1.05 1.0 0.5",
                  "pair_coeff 2 2 0.8 0.5 1.1 1.0 0.5"]),
    # Buckingham with both sums long (pair_buck_long_coul_long.cpp):
    # C coefficients given AT the geometric-mix values (the B_i B_j
    # k-space factorization is exact then); ewald/disp forces
    # g_ewald_6 = g_ewald (ewald_disp.cpp:230) so the split matches
    "bucklong": ("lj", 0.005,
                 ["pair_style buck/long/coul/long long long 2.5",
                  "pair_coeff 1 1 100.0 0.5 1.0",
                  "pair_coeff 1 2 90.0 0.55 0.894427190999916",
                  "pair_coeff 2 2 80.0 0.6 0.8",
                  "kspace_style ewald/disp 1.0e-4",
                  "pair_modify table/disp 0 table 0"]),
}


def make_input(case):
    units, dt, pair_lines = CASES[case][:3]
    datafile = CASES[case][3] if len(CASES[case]) > 3 else "data.breadth"
    tcreate = "1.0" if units == "lj" else "10.0"
    lines = [
        f"units {units}",
        "atom_style charge",
        f"read_data {datafile}",
        *pair_lines,
        "neighbor 0.3 bin",
        f"velocity all create {tcreate} 87287 loop geom",
        f"timestep {dt}",
        "fix 1 all nve",
        "thermo 1",
        "thermo_style custom step temp pe evdwl ecoul press",
        "thermo_modify format float %.12g",
        "run 5",
    ]
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(ROOT, exist_ok=True)
    write_data(os.path.join(ROOT, "data.breadth"))
    write_data(os.path.join(ROOT, "data.breadth1"), one_type=True)
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
            print(r.stdout[-2000:], file=sys.stderr)
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
