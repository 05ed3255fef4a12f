"""Dev probe: mint golden thermo rows for the round-3 compute breadth
(ke/atom, pe/atom, stress/atom, coord/atom, cluster/atom,
displace/atom, property/atom through compute reduce; vacf; temp/ramp,
temp/region, temp/profile) by running the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial) on a deterministic LJ melt.

Usage: python scripts/gen_compute_goldens.py
Prints GOLDEN dict for tests/test_compute_breadth.py.
"""
import os
import subprocess

LMP = "/tmp/lmpsrc/lmp_serial"
ROOT = "/tmp/compute_gold"

SCRIPT = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
velocity all create 1.44 87287 loop geom
region half block 0 2 0 4 0 4
compute ka all ke/atom
compute pa all pe/atom
compute sa all stress/atom NULL
compute crd all coord/atom cutoff 1.5
compute cl all cluster/atom 1.3
compute dsp all displace/atom
compute rk all reduce sum c_ka
compute rp all reduce sum c_pa
compute rs all reduce sum c_sa[1] c_sa[4]
compute rc all reduce ave c_crd
compute rcl all reduce max c_cl
compute rd all reduce max c_dsp[4]
compute rr all reduce/region half sum c_ka
compute vac all vacf
compute tr all temp/ramp vx 0.0 2.0 x 0.0 4.0
compute treg all temp/region half
compute tp all temp/profile 1 1 0 x 4
fix 1 all nve
thermo 2
thermo_style custom step temp pe c_rk c_rp c_rs[1] c_rs[2] c_rc c_rcl c_rd c_rr c_vac[1] c_vac[4] c_tr c_treg c_tp
thermo_modify format float %.15g norm no
run 4
"""


def run():
    os.makedirs(ROOT, exist_ok=True)
    with open(os.path.join(ROOT, "in.case"), "w") as f:
        f.write(SCRIPT)
    r = subprocess.run([LMP, "-in", "in.case"], cwd=ROOT,
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
        print(r.stdout[-4000:])
        print(r.stderr[-2000:])
        raise SystemExit("golden run failed")
    return rows


if __name__ == "__main__":
    rows = run()
    print("GOLDEN = [")
    for row in rows:
        print(f"    {row},")
    print("]")
