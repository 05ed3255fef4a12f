"""eam/alloy (setfl) — pair_eam_alloy.cpp parity.

1. A single-element setfl generated from Cu_u3.eam (funcfl) must reproduce
   the funcfl path bit-for-bit-ish (same splines, same kernel maths).
2. Two-element AlCu: forces are the exact gradient of the energy
   (central finite differences through the library API), and element
   assignment actually changes the physics.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CU_FUNCFL = "/root/reference/bench/Cu_u3.eam"
ALCU_SETFL = "/root/reference/potentials/AlCu.eam.alloy"


def _write_setfl_from_funcfl(path_out):
    """Convert the Cu funcfl to setfl: z2r = 27.2*0.529*Z^2 (pair_eam.cpp
    file2array single-element rule), everything else copied."""
    from lidp_tpu.ops.eam import read_funcfl

    d = read_funcfl(CU_FUNCFL)
    z2r = 27.2 * 0.529 * d["zr"] * d["zr"]
    with open(path_out, "w") as fh:
        fh.write("converted from Cu_u3.eam\n#\n#\n")
        fh.write("1 Cu\n")
        fh.write(f"{d['nrho']} {d['drho']:.16e} {d['nr']} {d['dr']:.16e} "
                 f"{d['cut']:.16e}\n")
        fh.write(f"29 {d['mass']} 3.615 FCC\n")
        for arr in (d["frho"], d["rhor"]):
            for i in range(0, len(arr), 5):
                fh.write(" ".join(f"{v:.16e}" for v in arr[i:i + 5]) + "\n")
        for i in range(0, len(z2r), 5):
            fh.write(" ".join(f"{v:.16e}" for v in z2r[i:i + 5]) + "\n")


def _cu_script(pair_lines):
    return f"""
units metal
atom_style atomic
boundary p p p
lattice fcc 3.615
region box block 0 5 0 5 0 5
create_box 1 box
create_atoms 1 box
{pair_lines}
mass 1 63.550
velocity all create 800.0 376847 loop geom
neighbor 1.0 bin
fix 1 all nve
timestep 0.005
"""


@pytest.fixture(scope="module")
def cu_pair():
    """(funcfl thermo row, setfl thermo row) on the same 256-atom Cu block."""
    from lidp_tpu.api import lammps

    rows = []
    for pair in (f'pair_style eam\npair_coeff 1 1 {CU_FUNCFL}',
                 None):
        if pair is None:
            import tempfile

            f = tempfile.NamedTemporaryFile(
                suffix=".alloy", delete=False, mode="w")
            f.close()
            _write_setfl_from_funcfl(f.name)
            pair = (f'pair_style eam/alloy\n'
                    f'pair_coeff * * {f.name} Cu')
        L = lammps()
        L.commands_string(_cu_script(pair))
        L.command("run 2")
        rows.append({k: L.get_thermo(k)
                     for k in ("pe", "temp", "press", "etotal")})
        L.close()
    return rows


def test_setfl_matches_funcfl(cu_pair):
    func, alloy = cu_pair
    # identical tables + identical kernel math: agreement far below any
    # physical tolerance (segment-fit randomness is shared)
    assert abs(alloy["pe"] - func["pe"]) < 1e-9 * abs(func["pe"])
    assert abs(alloy["press"] - func["press"]) < 1e-7 * abs(func["press"])
    assert abs(alloy["etotal"] - func["etotal"]) < 1e-9 * abs(func["etotal"])


ALCU_SETUP = """
units metal
atom_style atomic
boundary p p p
lattice fcc 3.8
region box block 0 6 0 6 0 6
create_box 2 box
create_atoms 1 box
pair_style eam/alloy
pair_coeff * * %s Al Cu
neighbor 0.3 bin
fix 1 all nve
""" % ALCU_SETFL


@pytest.fixture(scope="module")
def alcu():
    from lidp_tpu.api import lammps

    L = lammps()
    L.command("units metal")
    L.commands_string(ALCU_SETUP)
    # make ~30% of the lattice Cu, deterministic pattern
    t = L.extract_atom("type").copy()
    t[::3] = 2
    L.scatter_atoms("type", t)
    yield L
    L.close()


def test_alcu_energy_sane(alcu):
    n = alcu.get_natoms()
    pe = alcu.get_thermo("pe")     # extensive in metal units (norm off)
    # metal units: cohesive energies ~ -3..-4 eV/atom for Al/Cu alloys
    assert -5.0 < pe / n < -1.0


def test_alcu_forces_are_energy_gradient(alcu):
    """Central-difference dE/dx vs reported force for a handful of atoms —
    exercises rho/z2 cross-element selection and the embedding chain rule."""
    f = alcu.extract_atom("f")
    x0 = alcu.extract_atom("x").copy()
    h = 1e-5
    rng = np.random.RandomState(3)
    for _ in range(2):
        i = rng.randint(alcu.get_natoms())
        d = rng.randint(3)
        for sgn in (+1, -1):
            x = x0.copy()
            x[i, d] += sgn * h
            alcu.scatter_atoms("x", x)
            if sgn > 0:
                ep = alcu.get_thermo("pe")
            else:
                em = alcu.get_thermo("pe")
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[i, d]) < 1e-5 * max(1.0, abs(f[i, d])), \
            f"atom {i} dim {d}: fd={fd} f={f[i, d]}"
    alcu.scatter_atoms("x", x0)


def test_alcu_element_mapping_matters(alcu):
    """Swapping the type->element map changes the energy (Al and Cu tables
    differ); NULL mapping rejects unknown names."""
    from lidp_tpu.ops.eam import build_eam_alloy_params

    p_alcu, m = build_eam_alloy_params(ALCU_SETFL, ["Al", "Cu"])
    p_cual, _ = build_eam_alloy_params(ALCU_SETFL, ["Cu", "Al"])
    assert m[1] != m[2] and m[1] == pytest.approx(26.982)
    assert not np.allclose(np.asarray(p_alcu.type2elem),
                           np.asarray(p_cual.type2elem))
    with pytest.raises(ValueError):
        build_eam_alloy_params(ALCU_SETFL, ["Al", "Zr"])
    p_null, m_null = build_eam_alloy_params(ALCU_SETFL, ["Al", "NULL"])
    assert m_null[2] == 0.0
