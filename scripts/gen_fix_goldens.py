"""Dev probe: mint golden thermo rows for the round-3 fix breadth
(nve/limit, nve/noforce, spring tether/couple, spring/rg, drag,
wall/lj126, wall/lj1043, wall/harmonic) from the REBUILT reference
binary (/tmp/lmpsrc/lmp_serial) on the deterministic LJ melt.

Usage: python scripts/gen_fix_goldens.py
Prints GOLDEN dict for tests/test_fix_breadth.py.
"""
import os
import subprocess

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/fix_gold"

HEAD = """units lj
atom_style atomic
boundary {bc}
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
velocity all create 1.44 87287 loop geom
region left block 0 2 0 4 0 4
group left region left
"""

TAIL = """thermo 2
thermo_style custom step temp pe ke etotal press
thermo_modify format float %.15g norm no
run 4
"""

CASES = {
    "nve_limit": ("p p p", "fix 1 all nve/limit 0.002\n"),
    "nve_noforce": ("p p p", "fix 2 left nve/noforce\n"),
    "spring_tether": ("p p p", "fix 1 all nve\n"
                      "fix 2 left spring tether 20.0 1.0 2.0 3.0 0.5\n"),
    "spring_couple": ("p p p", "group right subtract all left\n"
                      "fix 1 all nve\n"
                      "fix 2 left spring couple right 15.0 NULL 1.0 2.0 "
                      "1.0\n"),
    "spring_rg": ("p p p", "fix 1 all nve\nfix 2 left spring/rg 8.0 2.5\n"),
    "drag": ("p p p", "fix 1 all nve\n"
             "fix 2 left drag 3.0 3.0 3.0 0.5 1.0\n"),
    "wall_lj126": ("p p f", "fix 1 all nve\n"
                   "fix 2 all wall/lj126 zlo -0.8 0.05 1.0 1.12246 "
                   "zhi 7.52 0.05 1.0 1.12246 units box\n"),
    "wall_lj1043": ("p p f", "fix 1 all nve\n"
                    "fix 2 all wall/lj1043 zlo -0.8 0.05 1.0 2.5 "
                    "zhi 7.52 0.05 1.0 2.5 units box\n"),
    "wall_harmonic": ("p p f", "fix 1 all nve\n"
                      "fix 2 all wall/harmonic zlo -0.2 1.0 1.0 1.0 "
                      "zhi 6.92 1.0 1.0 1.0 units box\n"),
    "move_linear": ("p p p", "group rest subtract all left\n"
                    "fix 1 rest nve\n"
                    "fix 2 left move linear 0.3 -0.2 0.1 units box\n"),
    "move_wiggle": ("p p p", "group rest subtract all left\n"
                    "fix 1 rest nve\n"
                    "fix 2 left move wiggle 0.2 0.1 0.3 0.5 units box\n"),
    "heat": ("p p p", "fix 1 all nve\nfix 2 all heat 2 5.0\n"),
}


def script_for(case):
    bc, fixes = CASES[case]
    return HEAD.format(bc=bc) + fixes + TAIL


def run_case(case):
    path = os.path.join(ROOT, case)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "in.case"), "w") as f:
        f.write(script_for(case))
    r = subprocess.run([LMP, "-in", "in.case"], cwd=path,
                       capture_output=True, text=True, timeout=300)
    rows, grab = [], False
    for ln in r.stdout.splitlines():
        t = ln.split()
        if grab and t and t[0].isdigit():
            rows.append([float(v) for v in t])
            if t[0] == "4":
                grab = False
        if t[:2] == ["Step", "Temp"]:
            grab = True
    if len(rows) != 3:
        print(f"### {case} FAILED")
        print(r.stdout[-2500:])
        print(r.stderr[-800:])
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
