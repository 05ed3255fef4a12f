"""Structure-analysis per-atom computes + heat/flux vs the rebuilt
reference: centro/atom (compute_centro_atom.cpp), cna/atom
(compute_cna_atom.cpp), fragment/atom / aggregate/atom
(compute_fragment_atom.cpp / compute_aggregate_atom.cpp), heat/flux
(compute_heat_flux.cpp).  Goldens minted from the REBUILT 16Mar18
binary (%.15g thermo, norm no), surfaced through compute reduce."""
import jax.numpy as jnp
import numpy as np
import pytest

MELT = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
"""

TAIL = """thermo 2
thermo_modify format float %.15g norm no
run 4
"""

# step temp c_rc(centro sum) c_rn(cna sum) c_rmax(centro max)
CENTRO_GOLDEN = [
    [0, 0.05, 16.9262601966397, 303.0, 1.41052168305331],
    [2, 0.0497155436205406, 16.8344794131108, 303.0, 1.4039770435622],
    [4, 0.0488345009278659, 17.0143705321207, 303.0, 1.39776467168435],
]

# step temp c_hf[1..6]
HF_GOLDEN = [
    [0, 1.44, -19.2689191241193, 94.555659420385, 14.9522180121156,
     -6.42297304137323, 31.5185531401283, 4.98407267070516],
    [2, 1.43088638838039, -18.8612691420027, 94.0148280123202,
     13.2503160176701, -6.76130330253762, 30.7961487238246,
     4.18199099216507],
    [4, 1.40164128098338, -16.5834633381717, 94.8852113586248,
     11.0075457474505, -7.22357783617436, 29.5831351867053,
     3.3153339738176],
]


def _run(tmp_path, text):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.s").write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.s"))
    return {int(r["step"]): r for r in s.thermo_rows}


def test_centro_cna_golden(tmp_path):
    """fcc melt with a spherical vacancy at low T: centrosymmetry sums
    and CNA pattern sums match the rebuilt reference over 4 steps."""
    rows = _run(tmp_path, MELT + """region hole sphere 2 2 2 0.4
delete_atoms region hole
velocity all create 0.05 87287 loop geom
fix 1 all nve
compute cc all centro/atom fcc
compute cn all cna/atom 1.4336
compute rc all reduce sum c_cc
compute rn all reduce sum c_cn
compute rmax all reduce max c_cc
thermo_style custom step temp c_rc c_rn c_rmax
""" + TAIL)
    for step, temp, rc, rn, rmax in CENTRO_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(r["c_rc"]) == pytest.approx(rc, rel=1e-8)
        assert float(r["c_rn"]) == pytest.approx(rn, rel=1e-12)
        assert float(r["c_rmax"]) == pytest.approx(rmax, rel=1e-8)


def test_heat_flux_golden(tmp_path):
    """compute heat/flux from ke/atom + pe/atom + stress/atom on the LJ
    melt: full + convective flux components match the rebuilt reference."""
    rows = _run(tmp_path, MELT + """velocity all create 1.44 87287 loop geom
fix 1 all nve
compute myke all ke/atom
compute mype all pe/atom
compute myst all stress/atom NULL
compute hf all heat/flux myke mype myst
thermo_style custom step temp c_hf[1] c_hf[2] c_hf[3] c_hf[4] c_hf[5] c_hf[6]
""" + TAIL)
    for row in HF_GOLDEN:
        r = rows[int(row[0])]
        assert float(r["temp"]) == pytest.approx(row[1], rel=1e-10)
        for k in range(6):
            assert float(r[f"c_hf[{k + 1}]"]) == pytest.approx(
                row[2 + k], rel=2e-7), (row[0], k)


def test_fragment_aggregate_golden(tmp_path):
    """fragment/atom (bond connectivity) and aggregate/atom (bonds +
    distance) on the 2d micelle system (1200 atoms, 300 dimer bonds):
    component labels = smallest atom ID; sums/maxima match the rebuilt
    reference exactly."""
    rows = _run(tmp_path, """dimension 2
units lj
atom_style bond
special_bonds lj/coul 0.0 1.0 1.0
read_data /root/reference/examples/micelle/data.micelle
pair_style lj/cut 1.12246
pair_coeff * * 1.0 1.0 1.12246
bond_style harmonic
bond_coeff 1 50.0 0.75
compute fr all fragment/atom
compute ag all aggregate/atom 1.12246
compute m1 all reduce max c_fr
compute s1 all reduce sum c_fr
compute m2 all reduce max c_ag
compute s2 all reduce sum c_ag
fix 1 all nve
fix 2 all enforce2d
thermo_style custom step c_m1 c_s1 c_m2 c_s2
thermo_modify format float %.15g norm no
run 0
""")
    r = rows[0]
    assert float(r["c_m1"]) == 900.0
    assert float(r["c_s1"]) == 542688.0
    assert float(r["c_m2"]) == 892.0
    assert float(r["c_s2"]) == 506253.0


SLICE_GOLDEN = [
    [0, 1.44, 94.555659420385, -6.42297304137323],
    [2, 1.43088638838039, 94.0148280123202, -6.76130330253762],
    [4, 1.40164128098338, 94.8852113586248, -7.22357783617436],
]


def test_slice_golden(tmp_path):
    """compute slice over the heat/flux global vector: Nstop-exclusive
    row selection (compute_slice.cpp) matches the rebuilt reference."""
    rows = _run(tmp_path, MELT + """velocity all create 1.44 87287 loop geom
fix 1 all nve
compute myke all ke/atom
compute mype all pe/atom
compute myst all stress/atom NULL
compute hf all heat/flux myke mype myst
compute s all slice 2 6 2 c_hf
thermo 2
thermo_style custom step temp c_s[1] c_s[2]
""" + TAIL)
    for step, temp, s1, s2 in SLICE_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(r["c_s[1]"]) == pytest.approx(s1, rel=2e-7)
        assert float(r["c_s[2]"]) == pytest.approx(s2, rel=2e-7)


def test_property_local_golden(tmp_path):
    """compute property/local patom*/ptype* through dump local: the
    reference's half-list pair ORIENTATION is implementation-defined, so
    the golden checks order-insensitive invariants (row count, id sums,
    dist/eng sums) vs the rebuilt reference file."""
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.s").write_text("""units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
velocity all create 1.44 87287 loop geom
fix 1 all nve
compute pl all property/local patom1 patom2 ptype1 ptype2
compute pr all pair/local dist eng
dump d1 all local 2 plocal.dump index c_pl[1] c_pl[2] c_pl[3] c_pl[4] c_pr[1] c_pr[2]
run 2
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.s"))
    rows = []
    take = False
    for ln in open(tmp_path / "plocal.dump"):
        if ln.startswith("ITEM: ENTRIES"):
            take = True
            continue
        if ln.startswith("ITEM:"):
            take = False
            continue
        if take:
            rows.append([float(v) for v in ln.split()[1:]])
    r = np.asarray(rows)
    assert len(r) == 5832                      # reference row count
    assert r[:, 0].sum() + r[:, 1].sum() == 635688.0   # sum patom1+patom2
    assert (r[:, 2] == 1.0).all() and (r[:, 3] == 1.0).all()
    assert r[:, 4].sum() == pytest.approx(11038.3946700000, rel=1e-6)
    assert r[:, 5].sum() == pytest.approx(-1461.5998068000, rel=1e-6)
