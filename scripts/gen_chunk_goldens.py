"""Dev probe: mint goldens for the */chunk aggregate compute family
(com/vcm/gyration/angmom/omega/torque/inertia/dipole/msd/property/temp
per-chunk computes) from the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial, 16Mar18 + allocation patch) on the
deterministic LJ melt with two types and charges.

Usage: python scripts/gen_chunk_goldens.py
Prints CHUNK_GOLDEN dict for tests/test_chunk_computes.py.
"""
import os
import subprocess

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/chunk_gold"

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

# each case: (extra script lines w/ one ave/time vector fix writing out.txt)
CASES = {
    "com": "compute g all com/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector file out.txt\n",
    "vcm": "compute g all vcm/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector file out.txt\n",
    "gyration": "compute g all gyration/chunk cc\n"
                "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "gyration_tensor": "compute g all gyration/chunk cc tensor\n"
                       "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] c_g[4] c_g[5] c_g[6] mode vector "
                       "file out.txt\n",
    "angmom": "compute g all angmom/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector file out.txt\n",
    "torque": "compute g all torque/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector file out.txt\n",
    "inertia": "compute g all inertia/chunk cc\n"
               "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] c_g[4] c_g[5] c_g[6] mode vector file out.txt\n",
    "omega": "compute g all omega/chunk cc\n"
             "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector file out.txt\n",
    "dipole": "compute g all dipole/chunk cc\n"
              "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] c_g[4] mode vector file out.txt\n",
    "dipole_geom": "compute g all dipole/chunk cc geometry\n"
                   "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] c_g[4] mode vector "
                   "file out.txt\n",
    "msd": "compute g all msd/chunk cc\n"
           "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] c_g[4] mode vector file out.txt\n",
    "property": "compute g all property/chunk cc count\n"
                "fix av all ave/time 2 1 2 c_g mode vector file out.txt\n",
    "tempchunk_bin": "compute cb all chunk/atom bin/1d x lower 2.0\n"
                     "compute g all temp/chunk cb temp\n"
                     "fix av all ave/time 2 1 2 c_g[1] mode vector "
                     "file out.txt\n",
    "com_bin2d": "compute cb all chunk/atom bin/2d x lower 2.0 "
                 "y lower 2.0\n"
                 "compute g all com/chunk cb\n"
                 "fix av all ave/time 2 1 2 c_g[1] c_g[2] c_g[3] mode vector "
                 "file out.txt\n",
}

# temp/chunk scalar goes through thermo instead
SCALAR_CASES = {
    "tempchunk_scalar": "compute g all temp/chunk cc\n"
                        "thermo_style custom step temp c_g\n",
    "tempchunk_com": "compute g all temp/chunk cc com yes\n"
                     "thermo_style custom step temp c_g\n",
}

TAIL = """thermo 2
thermo_modify format float %.15g norm no
run 4
"""


def run_case(name, body, scalar=False):
    path = os.path.join(ROOT, name)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "in.case"), "w") as f:
        f.write(HEAD + body + TAIL)
    r = subprocess.run([LMP, "-in", "in.case"], cwd=path,
                       capture_output=True, text=True, timeout=300)
    if scalar:
        rows, grab = [], False
        for ln in r.stdout.splitlines():
            t = ln.split()
            if grab and t and t[0].isdigit():
                rows.append([float(v) for v in t])
                if t[0] == "4":
                    grab = False
            if t and t[0] == "Step":
                grab = True
        if not rows:
            print(f"### {name} FAILED\n{r.stdout[-2000:]}\n{r.stderr[-500:]}")
            return None
        return rows
    out = os.path.join(path, "out.txt")
    if not os.path.exists(out):
        print(f"### {name} FAILED\n{r.stdout[-2000:]}\n{r.stderr[-500:]}")
        return None
    frames = {}
    with open(out) as f:
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


if __name__ == "__main__":
    print("CHUNK_GOLDEN = {")
    for name, body in CASES.items():
        frames = run_case(name, body)
        if frames is None:
            continue
        print(f'    "{name}": {{')
        for step, rows in sorted(frames.items()):
            print(f"        {step}: {rows},")
        print("    },")
    print("}")
    print("SCALAR_GOLDEN = {")
    for name, body in SCALAR_CASES.items():
        rows = run_case(name, body, scalar=True)
        if rows is not None:
            print(f'    "{name}": {rows},')
    print("}")
