"""dump local (+ compute pair/local / bond/local) and dump image.

The pair/local golden was minted by running the rebuilt 16Mar18 reference
(/tmp/lmpsrc/lmp_serial) with `compute 1 all pair/local dist eng force` +
`dump local` on the same 64-atom box tests/test_pair_breadth2.py uses
(scripts/gen_breadth_goldens.write_data, identical seed); row ORDER is
neighbor-list dependent, so rows are compared sorted by (dist, eng).
"""

import numpy as np
import pytest

from scripts.gen_breadth_goldens import write_data

# reference (sorted by dist): count, column sums, first and last rows
REF_COUNT = 578
REF_SUMS = (1108.09055000, -91.54979700, -302.96293390)
REF_FIRST = (1.41302, -0.498218, -1.69075)
REF_LAST = (2.49625, -0.0195731, -0.0467859)


def _run(text, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    p = tmp_path / "in.case"
    p.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(p))
    return s


def _read_local(path):
    rows, grab = [], False
    for ln in open(path).read().splitlines():
        if ln.startswith("ITEM: ENTRIES"):
            grab = True
            continue
        if ln.startswith("ITEM: TIMESTEP"):
            grab = False
        if grab and ln.strip():
            rows.append([float(v) for v in ln.split()])
    return np.array(rows)


def test_dump_local_pair_local_golden(tmp_path):
    write_data(str(tmp_path / "data.breadth"))
    _run(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
compute 1 all pair/local dist eng force
dump 1 all local 1 {tmp_path}/dump.plocal index c_1[1] c_1[2] c_1[3]
run 0
""", tmp_path)
    r = _read_local(tmp_path / "dump.plocal")[:, 1:]
    assert len(r) == REF_COUNT
    r = r[np.lexsort((r[:, 1], r[:, 0]))]
    for got, ref in zip(r.sum(0), REF_SUMS):
        assert got == pytest.approx(ref, rel=1e-6, abs=1e-6)
    np.testing.assert_allclose(r[0], REF_FIRST, rtol=2e-5)
    np.testing.assert_allclose(r[-1], REF_LAST, rtol=2e-5)


def test_dump_local_bond_local_analytic(tmp_path):
    """bond/local dist/engpot against hand-computed harmonic values."""
    data = """tiny bonded box

4 atoms
1 atom types
2 bonds
1 bond types

0 10 xlo xhi
0 10 ylo yhi
0 10 zlo zhi

Masses

1 1.0

Atoms

1 1 1 0.0 2.0 2.0 2.0
2 1 1 0.0 3.2 2.0 2.0
3 1 1 0.0 5.0 5.0 5.0
4 1 1 0.0 5.0 6.5 5.0

Bonds

1 1 1 2
2 1 3 4
"""
    (tmp_path / "data.tiny").write_text(data)
    _run(f"""
units lj
atom_style full
read_data {tmp_path}/data.tiny
bond_style harmonic
bond_coeff 1 10.0 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 0.0 1.0
special_bonds lj 0 1 1
compute 1 all bond/local dist engpot
dump 1 all local 1 {tmp_path}/dump.blocal index c_1[1] c_1[2]
run 0
""", tmp_path)
    r = _read_local(tmp_path / "dump.blocal")[:, 1:]
    assert len(r) == 2
    r = r[np.argsort(r[:, 0])]
    # bond 1: r = 1.2, e = 10 * 0.2^2; bond 2: r = 1.5, e = 10 * 0.5^2
    np.testing.assert_allclose(r[0], [1.2, 10.0 * 0.04], rtol=1e-10)
    np.testing.assert_allclose(r[1], [1.5, 10.0 * 0.25], rtol=1e-10)


def test_dump_image_ppm(tmp_path):
    """dump image writes a well-formed PPM with atoms actually rendered."""
    write_data(str(tmp_path / "data.breadth"))
    _run(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
dump 1 all image 1 {tmp_path}/img.*.ppm type type size 200 160 zoom 1.2
run 0
""", tmp_path)
    raw = (tmp_path / "img.0.ppm").read_bytes()
    assert raw.startswith(b"P6\n200 160\n255\n")
    px = np.frombuffer(raw[len(b"P6\n200 160\n255\n"):], np.uint8)
    px = px.reshape(160, 200, 3)
    lit = np.count_nonzero(px.sum(-1) > 0)
    assert 500 < lit < 200 * 160   # spheres drawn, background remains
    # both type colors present (red-ish and blue-ish pixels)
    assert np.count_nonzero((px[..., 0] > 100) & (px[..., 2] < 50)) > 50
    assert np.count_nonzero((px[..., 2] > 100) & (px[..., 0] < 50)) > 50


def test_ave_chunk_bin2d_golden(tmp_path):
    """compute chunk/atom bin/2d + fix ave/chunk vs the rebuilt reference
    (chunk ids row-major x-then-y, Coord1/Coord2 columns, bin volumes)."""
    write_data(str(tmp_path / "data.breadth"))
    _run(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
velocity all create 1.0 87287 loop geom
fix 1 all nve
compute cc all chunk/atom bin/2d x lower 3.0 y lower 3.0 units box
fix 2 all ave/chunk 1 1 1 cc vx density/number file {tmp_path}/c2.out
run 2
""", tmp_path)
    # reference rows for step 2 (chunk coord1 coord2 ncount vx dens)
    ref = {
        (1.5, 1.5): (16, -0.0285281, 0.296296),
        (1.5, 4.5): (16, 0.238606, 0.296296),
        (4.5, 1.5): (16, -0.16674, 0.296296),
        (4.5, 4.5): (16, -0.0652551, 0.296296),
    }
    lines = (tmp_path / "c2.out").read_text().splitlines()
    i2 = max(i for i, ln in enumerate(lines) if ln.startswith("2 "))
    got = {}
    for ln in lines[i2 + 1:i2 + 5]:
        p = [float(v) for v in ln.split()]
        got[(p[1], p[2])] = (p[3], p[4], p[5])
    assert set(got) == set(ref)
    for key, (nc, vx, dens) in ref.items():
        assert got[key][0] == nc
        assert got[key][1] == pytest.approx(vx, rel=2e-5)
        assert got[key][2] == pytest.approx(dens, rel=1e-5)


def test_dump_movie_frames(tmp_path):
    """dump movie (dump_movie.cpp): numbered PPM frames rasterized per
    cadence (assembled by ffmpeg when present; none in this image)."""
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.mv").write_text("""units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
fix 1 all nve
dump mv all movie 2 out.mpg type type zoom 1.6
run 4
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.mv"))
    frames = sorted(tmp_path.glob("out.mpg.*.ppm"))
    assert len(frames) == 3
    assert frames[0].read_bytes()[:2] == b"P6"
