"""fix wall/gran[/region] goldens: mint thermo rows from the REBUILT
16Mar18 reference (/tmp/lmpsrc/lmp_serial + allocation patch) on a small
sphere-atom box this script generates — bouncing grains on granular walls.

Cases:
  zplane   — hooke/history zplane floor + ceiling NULL, gravity down,
             tangential velocities + spins exercise the shear history
  hooke    — plain hooke (no history) on the same box
  hertz    — hertz/history zplane floor
  shear    — hooke/history + moving wall (shear x vshear)
  zcyl     — zcylinder wall, gravity along -z with z floor
  region   — wall/gran/region over a block region (4 finite faces)
"""

import os
import subprocess

import numpy as np

ROOT = "/tmp/wallgran_goldens"
LMP = "/tmp/lmpsrc/lmp_serial"


def write_data(path, xyscale=1.0):
    rng = np.random.RandomState(20260818)
    n = 12
    pos = np.zeros((n, 3))
    k = 0
    for ix in range(4):
        for iy in range(3):
            pos[k] = [-2.4 + 1.4 * ix, -2.3 + 1.7 * iy,
                      1.2 + 0.45 * ((ix + 2 * iy) % 5)]
            k += 1
    pos += rng.uniform(-0.05, 0.05, pos.shape)
    pos[:, :2] *= xyscale
    vel = rng.uniform(-0.2, 0.2, (n, 3))
    vel[:, 2] -= 0.3
    omg = rng.uniform(-0.5, 0.5, (n, 3))
    with open(path, "w") as f:
        f.write("wall gran golden box\n\n")
        f.write(f"{n} atoms\n\n1 atom types\n\n")
        f.write("-3.2 3.2 xlo xhi\n-3.2 3.2 ylo yhi\n0.0 8.0 zlo zhi\n\n")
        f.write("Atoms\n\n")
        for i in range(n):
            f.write(f"{i+1} 1 1.0 1.0 "
                    f"{pos[i,0]:.10f} {pos[i,1]:.10f} {pos[i,2]:.10f}\n")
        f.write("\nVelocities\n\n")
        for i in range(n):
            f.write(f"{i+1} {vel[i,0]:.10f} {vel[i,1]:.10f} {vel[i,2]:.10f} "
                    f"{omg[i,0]:.10f} {omg[i,1]:.10f} {omg[i,2]:.10f}\n")


CASES = {
    "zplane": ("fix w all wall/gran hooke/history 400.0 NULL 8.0 NULL "
               "0.5 1 zplane 0.0 NULL", "p p f"),
    "hooke": ("fix w all wall/gran hooke 400.0 NULL 8.0 NULL "
              "0.5 1 zplane 0.0 NULL", "p p f"),
    "hertz": ("fix w all wall/gran hertz/history 400.0 NULL 8.0 NULL "
              "0.5 1 zplane 0.0 NULL", "p p f"),
    "shear": ("fix w all wall/gran hooke/history 400.0 NULL 8.0 NULL "
              "0.5 1 zplane 0.0 NULL shear x 0.8", "p p f"),
    "zcyl": ("fix w all wall/gran hooke/history 400.0 NULL 8.0 NULL "
             "0.5 1 zcylinder 3.1\n"
             "fix wf all wall/gran hooke/history 400.0 NULL 8.0 NULL "
             "0.5 1 zplane 0.0 NULL", "f f f", "data.wallgran2"),
    "region": ("region cage block -2.9 2.9 -2.9 2.9 0.3 INF units box\n"
               "fix w all wall/gran/region hooke/history 400.0 NULL 8.0 "
               "NULL 0.5 1 region cage", "f f f"),
}


def make_input(case):
    fixline, bstr = CASES[case][:2]
    datafile = CASES[case][2] if len(CASES[case]) > 2 else "data.wallgran"
    return f"""units lj
atom_style sphere
boundary {bstr}
newton off
comm_modify vel yes
read_data {datafile}
pair_style gran/hooke/history 400.0 NULL 8.0 NULL 0.5 1
pair_coeff * *
neighbor 0.3 bin
neigh_modify every 1 delay 0 check yes
timestep 0.005
fix 1 all gravity 1.0 vector 0 0 -1
fix 2 all nve/sphere
{fixline}
compute rot all erotate/sphere
thermo_style custom step ke c_rot
thermo_modify format float %.15g norm no
thermo 40
run 400
"""


def main():
    os.makedirs(ROOT, exist_ok=True)
    write_data(os.path.join(ROOT, "data.wallgran"))
    write_data(os.path.join(ROOT, "data.wallgran2"), xyscale=0.7)
    for case in CASES:
        inp = os.path.join(ROOT, f"in.{case}")
        with open(inp, "w") as f:
            f.write(make_input(case))
        r = subprocess.run([LMP, "-in", inp, "-log", f"log.{case}"],
                           cwd=ROOT, capture_output=True, text=True,
                           timeout=120)
        rows, grab = [], False
        for ln in r.stdout.splitlines():
            if ln.startswith("Step"):
                grab = True
                continue
            if grab:
                t = ln.split()
                if not t or not t[0].isdigit():
                    grab = False
                    continue
                rows.append([float(v) for v in t])
        print(f"    '{case}': [")
        for row in rows:
            print(f"        {row},")
        print("    ],")


if __name__ == "__main__":
    main()
