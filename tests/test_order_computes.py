"""Bond-orientational order computes vs the rebuilt reference:

- compute orientorder/atom (compute_orientorder_atom.cpp): Steinhardt
  Q_l with the reference's exact associated-Legendre recurrence and
  qlm component normalization.
- compute hexorder/atom (compute_hexorder_atom.cpp): 2-d q_n.
- compute global/atom (compute_global_atom.cpp): per-atom indices into
  global vectors (chunk aggregates here).

The hex-lattice rows also lock the bit-exact lattice arithmetic
(lattice.cpp:264 scale division order + lattice2box multiply order) that
geometry-hashed velocity streams depend on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript


def _run(tmp_path, text):
    path = tmp_path / "in.t"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return {int(r["step"]): r for r in s.thermo_rows}


ORIENT_GOLDEN = [
    # step, Q4, Q6, Q12 (per-atom means), q6 components [2] and [8]
    [0, 0.190940653956, 0.574524259714, 0.600083022202, 0.0, 0.0],
    [2, 0.190993699392, 0.572481281486, 0.592102548126,
     1.66602237131e-05, -4.02052611497e-05],
]


def test_orientorder_atom_golden(tmp_path):
    rows = _run(tmp_path, """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
compute oo all orientorder/atom
compute q6 all orientorder/atom degrees 1 6 components 6 nnn 12 cutoff 1.8
compute r1 all reduce sum c_oo[1] c_oo[2] c_oo[5]
compute r2 all reduce sum c_q6[2] c_q6[8]
thermo 2
thermo_style custom step c_r1[1] c_r1[2] c_r1[3] c_r2[1] c_r2[2]
run 2
""")
    for step, q4, q6, q12, c2, c8 in ORIENT_GOLDEN:
        r = rows[step]
        assert float(r["c_r1[1]"]) == pytest.approx(q4, rel=1e-10)
        assert float(r["c_r1[2]"]) == pytest.approx(q6, rel=1e-10)
        assert float(r["c_r1[3]"]) == pytest.approx(q12, rel=1e-10)
        # fcc lattice components are ~0 at step 0 (symmetry)
        assert float(r["c_r2[1]"]) == pytest.approx(c2, rel=1e-8,
                                                    abs=1e-12)
        assert float(r["c_r2[2]"]) == pytest.approx(c8, rel=1e-8,
                                                    abs=1e-12)


HEX_HEAD = """units lj
dimension 2
atom_style atomic
boundary p p p
lattice hex 0.9
region box block 0 6 0 4 -0.25 0.25
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 0.5 12345 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
fix 2 all enforce2d
"""


def test_hex_lattice_bitexact_trajectory(tmp_path):
    """hex-lattice coords are bit-exact -> geometry-seeded velocities and
    the 2-step trajectory match the rebuilt reference to all digits."""
    rows = _run(tmp_path, HEX_HEAD + """thermo 1
thermo_style custom step temp pe press
run 2
""")
    golden = [(0, 0.5, -3.28645051705, -1.15691923828),
              (1, 0.498167924015, -3.28465238381, -1.14317190697),
              (2, 0.4927054222, -3.27929962734, -1.10226353728)]
    for step, t, pe, pr in golden:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(t, rel=1e-11), step
        assert float(r["pe"]) == pytest.approx(pe, rel=1e-11), step
        assert float(r["press"]) == pytest.approx(pr, rel=1e-11), step


def test_hexorder_atom_golden(tmp_path):
    rows = _run(tmp_path, HEX_HEAD + """compute hx all hexorder/atom
compute hx4 all hexorder/atom degree 4 nnn 4 cutoff 1.5
compute rh all reduce sum c_hx[1] c_hx[2] c_hx4[1] c_hx4[2]
thermo 2
thermo_style custom step c_rh[1] c_rh[2] c_rh[3] c_rh[4]
run 2
""")
    r0, r2 = rows[0], rows[2]
    # degree-6 over all 6 nearest: q6 == 1 on the perfect hex lattice
    assert float(r0["c_rh[1]"]) == pytest.approx(1.0, rel=1e-12)
    assert float(r0["c_rh[2]"]) == pytest.approx(0.0, abs=1e-12)
    # step-2 rows: every column matches the reference exactly (distances
    # unique once melted, so the nnn=4 subset is well-defined; at step 0
    # picking 4 of 6 equidistant neighbors is implementation-defined in
    # the reference itself)
    assert float(r2["c_rh[1]"]) == pytest.approx(0.998595202424, rel=1e-10)
    assert float(r2["c_rh[2]"]) == pytest.approx(-1.59509088455e-05,
                                                 rel=1e-8)
    assert float(r2["c_rh[3]"]) == pytest.approx(0.00712479064708,
                                                 rel=1e-8)
    assert float(r2["c_rh[4]"]) == pytest.approx(0.0394258967726,
                                                 rel=1e-8)


def test_global_atom_golden(tmp_path):
    """global/atom indexing a com/chunk array by the chunk/atom ids —
    reduce-summed column matches the reference exactly."""
    rows = _run(tmp_path, """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
compute cc all chunk/atom bin/1d x lower 0.25 units reduced
compute vc all com/chunk cc
compute ga all global/atom c_cc c_vc[1] c_vc[2]
compute rg all reduce sum c_ga[1] c_ga[2]
thermo 2
thermo_style custom step c_rg[1] c_rg[2]
thermo_modify norm no
run 2
""")
    for step in (0, 2):
        assert float(rows[step]["c_rg[1]"]) == pytest.approx(
            226.745485837, rel=1e-10)
        assert float(rows[step]["c_rg[2]"]) == pytest.approx(
            226.745485837, rel=1e-10)
