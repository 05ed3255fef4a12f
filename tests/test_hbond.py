"""pair hbond/dreiding/lj + hbond/dreiding/morse
(pair_hbond_dreiding_lj.cpp, pair_hbond_dreiding_morse.cpp) through
pair_style hybrid/overlay: 3-body donor-hydrogen-acceptor hydrogen bonds
with the 12-10 LJ / Morse radial kernels, cos^ap angle gate and LAMMPS
switching.

GOLDEN rows minted from the REBUILT 16Mar18 reference
(/tmp/lmpsrc/lmp_serial + allocation patch) on the identical 3-water box
this test regenerates.  Columns: step temp pe evdwl press
(thermo_modify format float %.15g)."""

import numpy as np
import pytest

GOLDEN = {
    "lj": [
        [0, 11.6534413544866, -5.02134593821794, -5.02134593821796,
         46.5849943694826],
        [2, 11.5607127992312, -5.01913372467812, -5.02071109317161,
         47.6154345739727],
        [4, 11.4337376921595, -5.01609471626278, -5.02219102815062,
         51.1115889068202],
        [6, 11.3015274756951, -5.0129237952944, -5.02568102958299,
         56.8882377321442],
        [8, 11.2115920138498, -5.01075881356835, -5.0310585625504,
         64.6301800595781],
    ],
    "morse": [
        [0, 11.6534413544866, -11.4839822851457, -11.4839822851457,
         295.422068328193],
        [2, 11.6578863458207, -11.4840929813547, -11.4857123884612,
         297.384709259317],
        [4, 11.6710109590246, -11.4844011542017, -11.4908479756116,
         302.915826813913],
        [6, 11.7052100439714, -11.4852042554603, -11.4991591605188,
         311.706565579536],
        [8, 11.7927626408055, -11.4872760385779, -11.5103756482518,
         323.255996452036],
    ],
}

HB_LINE = {
    "lj": ("hbond/dreiding/lj 4 6.0 8.0 90",
           "pair_coeff 1 1 hbond/dreiding/lj 2 i 3.5 2.75 4"),
    "morse": ("hbond/dreiding/morse 2 6.0 8.0 90",
              "pair_coeff 1 1 hbond/dreiding/morse 2 i "
              "3.88 1.7241379 2.9 2"),
}


def write_data(path):
    def water(ox, oy, oz, th):
        c, s = np.cos(th), np.sin(th)
        o = np.array([ox, oy, oz])
        h1 = o + 0.9572 * np.array([c, s, 0.0])
        a2 = th + np.deg2rad(104.52)
        h2 = o + 0.9572 * np.array([np.cos(a2), np.sin(a2), 0.0])
        return [o, h1, h2]

    mols = [water(0.0, 0.0, 0.0, 0.1),
            water(2.9, 0.3, 0.2, np.pi * 0.9),
            water(1.2, 2.7, -0.4, -np.pi / 2)]
    rng = np.random.RandomState(7)
    with open(path, "w") as f:
        f.write("hbond golden\n\n9 atoms\n6 bonds\n3 angles\n\n"
                "2 atom types\n1 bond types\n1 angle types\n\n")
        f.write("-6.0 6.0 xlo xhi\n-6.0 6.0 ylo yhi\n-6.0 6.0 zlo zhi\n\n"
                "Masses\n\n1 15.9994\n2 1.008\n\nAtoms\n\n")
        i = 0
        for m, w in enumerate(mols):
            for k, p in enumerate(w):
                i += 1
                t = 1 if k == 0 else 2
                q = -0.8 if k == 0 else 0.4
                f.write(f"{i} {m+1} {t} {q} "
                        f"{p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
        f.write("\nBonds\n\n")
        bid = 0
        for m in range(3):
            o = 3 * m + 1
            for h in (o + 1, o + 2):
                bid += 1
                f.write(f"{bid} 1 {o} {h}\n")
        f.write("\nAngles\n\n")
        for m in range(3):
            o = 3 * m + 1
            f.write(f"{m+1} 1 {o+1} {o} {o+2}\n")
        f.write("\nVelocities\n\n")
        v = rng.uniform(-0.002, 0.002, (9, 3))
        for i in range(9):
            f.write(f"{i+1} {v[i,0]:.8f} {v[i,1]:.8f} {v[i,2]:.8f}\n")


@pytest.mark.parametrize("case", sorted(GOLDEN))
def test_hbond_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    write_data(tmp_path / "data.hb")
    style, coeff = HB_LINE[case]
    (tmp_path / "in.hb").write_text(f"""units real
atom_style full
boundary p p p
read_data {tmp_path}/data.hb
pair_style hybrid/overlay lj/cut 5.0 {style}
pair_coeff 1 1 lj/cut 0.1553 3.166
pair_coeff 2 2 lj/cut 0.0 1.0
pair_coeff 1 2 lj/cut 0.0 2.083
{coeff}
bond_style harmonic
bond_coeff 1 450.0 0.9572
angle_style harmonic
angle_coeff 1 55.0 104.52
special_bonds lj/coul 0.0 0.0 0.5
timestep 0.2
fix 1 all nve
thermo_style custom step temp pe evdwl press
thermo 2
run 8
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.hb"))
    got = {int(r["step"]): r for r in s.thermo_rows}
    for ref in GOLDEN[case]:
        r = got[int(ref[0])]
        for name, o, g in zip(("temp", "pe", "evdwl", "press"),
                              (r["temp"], r["pe"], r["evdwl"],
                               r["press"]), ref[1:]):
            assert float(o) == pytest.approx(g, rel=1e-8, abs=1e-10), (
                f"{case} step {ref[0]} {name}: {float(o)} vs {g}")
