"""Non-LJ pair styles: morse, buck, yukawa, gauss, soft, born, coul/cut
(pair_*.cpp formulas), validated against hand-evaluated dimer energies,
finite-difference forces, and dense-vs-cell-kernel agreement."""

import numpy as np
import pytest


def _dimer(style_lines, r=1.5, q=(0.0, 0.0)):
    """Two atoms at distance r on the x axis in a big periodic box."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    qcmds = ""
    atom_style = "atomic" if q == (0.0, 0.0) else "full"
    s.execute(f"""
units lj
atom_style {atom_style}
boundary p p p
region box block 0 20 0 20 0 20 units box
create_box 1 box
""".strip().splitlines() + style_lines.strip().splitlines())
    n = 2
    s.x = np.array([[5.0, 5.0, 5.0], [5.0 + r, 5.0, 5.0]])
    s.v = np.zeros((n, 3))
    s.q = np.array(q, float)
    s.type = np.ones(n, np.int32)
    s.mol = np.zeros(n, np.int32)
    s.image = np.zeros((n, 3), np.int32)
    s._bonds = np.zeros((0, 2), np.int64)
    s.groups["all"] = np.ones(n, bool)
    s.mass_type = np.array([0.0, 1.0])
    s.one("fix 1 all nve")
    s.one("run 0")
    row = s.thermo_rows[-1]
    f = np.asarray(s._sim.res.f)
    return row, f, s


def _fd_force(style_lines, r, q=(0.0, 0.0), h=1e-6):
    ep, _, _ = _dimer(style_lines, r + h, q)
    em, _, _ = _dimer(style_lines, r - h, q)
    # lj units normalize per atom (2 atoms); returns dE/dr == f_x on the
    # LEFT atom (F0x = -dE/dx0 = +dE/dr since r = x1 - x0)
    return (ep["epair"] - em["epair"]) * 2 / (2 * h)


CASES = [
    ("morse",
     "pair_style morse 5.0\npair_coeff 1 1 2.0 1.5 1.2",
     lambda r: 2.0 * (np.exp(-2 * 1.5 * (r - 1.2))
                      - 2 * np.exp(-1.5 * (r - 1.2)))),
    ("buck",
     "pair_style buck 5.0\npair_coeff 1 1 100.0 0.5 2.0",
     lambda r: 100.0 * np.exp(-r / 0.5) - 2.0 / r**6),
    ("yukawa",
     "pair_style yukawa 1.8 5.0\npair_coeff 1 1 3.0",
     lambda r: 3.0 * np.exp(-1.8 * r) / r),
    ("gauss",
     "pair_style gauss 5.0\npair_coeff 1 1 2.5 0.8",
     lambda r: -2.5 * np.exp(-0.8 * r * r)),
    ("soft",
     "pair_style soft 5.0\npair_coeff 1 1 4.0",
     lambda r: 4.0 * (1.0 + np.cos(np.pi * r / 5.0))),
    ("born",
     "pair_style born 5.0\npair_coeff 1 1 50.0 0.4 1.0 2.0 1.5",
     lambda r: (50.0 * np.exp((1.0 - r) / 0.4) - 2.0 / r**6
                + 1.5 / r**8)),
]


@pytest.mark.parametrize("name,lines,eref", CASES, ids=[c[0] for c in CASES])
def test_dimer_energy(name, lines, eref):
    r = 1.5
    row, f, _ = _dimer(lines, r)
    # lj units: epair normalized per atom (2 atoms)
    assert abs(row["epair"] * 2 - eref(r)) < 1e-9 * max(1, abs(eref(r))), (
        row["epair"] * 2, eref(r))


@pytest.mark.parametrize("name,lines,eref", CASES, ids=[c[0] for c in CASES])
def test_dimer_force_fd(name, lines, eref):
    r = 1.5
    _, f, _ = _dimer(lines, r)
    fd = _fd_force(lines, r)
    assert abs(f[0, 0] - fd) < 1e-4 * max(1.0, abs(fd)), (f[0, 0], fd)
    assert abs(f[0, 0] + f[1, 0]) < 1e-10   # Newton


def test_coul_cut_dimer():
    r = 1.5
    row, f, _ = _dimer("pair_style coul/cut 5.0\npair_coeff * *",
                       r, q=(0.8, -0.5))
    eref = 0.8 * (-0.5) / r      # lj units qqr2e = 1
    assert abs(row["ecoul"] * 2 - eref) < 1e-9
    fd = _fd_force("pair_style coul/cut 5.0\npair_coeff * *", r,
                   q=(0.8, -0.5))
    assert abs(f[0, 0] - fd) < 1e-4 * abs(fd)


def test_morse_cells_vs_dense():
    """Cell kernel and dense path agree for a generic kind."""
    import jax.numpy as jnp

    from lidp_tpu.box import Box
    from lidp_tpu.ops.cells import CellConfig, build_cells, cell_pair_forces
    from lidp_tpu.ops.pair import dense_pair_forces, make_generic_pair_params

    rng = np.random.RandomState(5)
    n, L = 120, 9.0
    x = rng.uniform(0, L, (n, 3))
    t2 = np.zeros((2, 2))
    mk = lambda v: np.full((2, 2), v)   # noqa: E731
    p = make_generic_pair_params(
        "morse", mk(2.0), mk(1.5), mk(1.2), mk(2 * 2.0 * 1.5), None,
        cut_lj=mk(2.5), dtype=jnp.float64)
    box = Box.create(np.zeros(3), np.full(3, L))
    mask = jnp.ones(n, bool)
    q = jnp.zeros(n)
    ty = jnp.ones(n, jnp.int32)
    fd, ev_d, ec_d, vir_d = dense_pair_forces(
        jnp.asarray(x), q, ty, 0, mask, box, p)
    cfg = CellConfig.for_box([L] * 3, 2.8, density=n / L**3)
    cells = build_cells(jnp.asarray(x), mask, box, cfg)
    fc, ev_c, ec_c, vir_c = cell_pair_forces(
        jnp.asarray(x), q, ty, mask, cells, box, p, coul=False)
    assert abs(float(ev_d) - float(ev_c)) < 1e-9
    assert np.abs(np.asarray(fd) - np.asarray(fc)).max() < 1e-9
    assert np.abs(np.asarray(vir_d) - np.asarray(vir_c)).max() < 1e-8


def test_lj_expand_dimer():
    r, delta = 1.8, 0.5
    lines = "pair_style lj/expand 5.0\npair_coeff 1 1 1.0 1.0 0.5"
    row, f, _ = _dimer(lines, r)
    rs = r - delta
    eref = 4.0 * ((1 / rs) ** 12 - (1 / rs) ** 6)
    assert abs(row["epair"] * 2 - eref) < 1e-9
    fd = _fd_force(lines, r)
    assert abs(f[0, 0] - fd) < 1e-4 * max(1.0, abs(fd))


def test_coul_debye_dimer():
    r, kappa = 1.5, 1.2
    lines = "pair_style coul/debye 1.2 5.0\npair_coeff * *"
    row, f, _ = _dimer(lines, r, q=(0.8, -0.5))
    eref = 0.8 * (-0.5) / r * np.exp(-kappa * r)
    assert abs(row["ecoul"] * 2 - eref) < 1e-9
    fd = _fd_force(lines, r, q=(0.8, -0.5))
    assert abs(f[0, 0] - fd) < 1e-4 * abs(fd)


def test_lj_cut_coul_cut_dimer():
    r = 1.5
    lines = ("pair_style lj/cut/coul/cut 5.0\n"
             "pair_coeff 1 1 1.0 1.0")
    row, f, _ = _dimer(lines, r, q=(0.8, -0.5))
    eref_lj = 4.0 * ((1 / r) ** 12 - (1 / r) ** 6)
    eref_c = 0.8 * (-0.5) / r
    assert abs(row["evdwl"] * 2 - eref_lj) < 1e-9
    assert abs(row["ecoul"] * 2 - eref_c) < 1e-9


def test_mie_dimer():
    """pair_style mie/cut (pair_mie_cut.cpp): gamR=14, gamA=7 gives
    Cmie = 2*(2)^1 = 4; E = 4 eps ((sig/r)^14 - (sig/r)^7)."""
    r = 1.4
    lines = "pair_style mie/cut 5.0\npair_coeff 1 1 2.0 1.1 14.0 7.0"
    row, f, _ = _dimer(lines, r)
    sr = 1.1 / r
    eref = 4.0 * 2.0 * (sr**14 - sr**7)
    assert abs(row["epair"] * 2 - eref) < 1e-9 * max(1, abs(eref))
    fd = _fd_force(lines, r)
    assert abs(f[0, 0] - fd) < 1e-4 * max(1.0, abs(fd))
    assert abs(f[0, 0] + f[1, 0]) < 1e-10


def test_mie_reduces_to_lj():
    """gamR=12, gamA=6 => Cmie = 4: identical to lj/cut."""
    r = 1.3
    m_row, _, _ = _dimer(
        "pair_style mie/cut 5.0\npair_coeff 1 1 1.5 1.05 12.0 6.0", r)
    l_row, _, _ = _dimer(
        "pair_style lj/cut 5.0\npair_coeff 1 1 1.5 1.05", r)
    assert abs(m_row["epair"] - l_row["epair"]) < 1e-12


def test_mie_mixing_geometric():
    """Unset cross pair mixes every scalar geometrically
    (pair_mie_cut.cpp init_one :530-540 with mix GEOMETRIC)."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.execute("""
units lj
atom_style atomic
boundary p p p
region box block 0 20 0 20 0 20 units box
create_box 2 box
pair_style mie/cut 5.0
pair_coeff 1 1 2.0 1.0 14.0 7.0
pair_coeff 2 2 0.5 1.21 14.0 7.0
""".strip().splitlines())
    n = 2
    r = 1.4
    s.x = np.array([[5.0, 5.0, 5.0], [5.0 + r, 5.0, 5.0]])
    s.v = np.zeros((n, 3))
    s.q = np.zeros(n)
    s.type = np.array([1, 2], np.int32)
    s.mol = np.zeros(n, np.int32)
    s.image = np.zeros((n, 3), np.int32)
    s._bonds = np.zeros((0, 2), np.int64)
    s.groups["all"] = np.ones(n, bool)
    s.mass_type = np.array([0.0, 1.0, 1.0])
    s.one("fix 1 all nve")
    s.one("run 0")
    eps = np.sqrt(2.0 * 0.5)
    sig = np.sqrt(1.0 * 1.21)
    sr = sig / r
    eref = 4.0 * eps * (sr**14 - sr**7)
    assert abs(s.thermo_rows[-1]["epair"] * 2 - eref) < 1e-9


def test_lj_gromacs_dimer():
    """pair_lj_gromacs.cpp: inside cut_inner the energy is plain LJ plus
    the ljsw5 continuity constant; energy AND force vanish smoothly at the
    outer cutoff."""
    inner, outer = 1.5, 2.5
    lines = (f"pair_style lj/gromacs {inner} {outer}\n"
             "pair_coeff 1 1 1.0 1.0")
    # region 1: r < inner -> LJ + constant
    r1, r2 = 1.2, 1.4
    e1 = _dimer(lines, r1)[0]["epair"] * 2
    e2 = _dimer(lines, r2)[0]["epair"] * 2
    lj = lambda r: 4.0 * ((1 / r) ** 12 - (1 / r) ** 6)  # noqa: E731
    assert abs((e1 - lj(r1)) - (e2 - lj(r2))) < 1e-10   # same constant
    # the switch drives E to exactly 0 at the cutoff
    e_rc = _dimer(lines, outer - 1e-7)[0]["epair"] * 2
    assert abs(e_rc) < 1e-8
    # force is continuous at inner and ~0 at the cutoff
    _, f_rc, _ = _dimer(lines, outer - 1e-6)
    assert abs(f_rc[0, 0]) < 1e-7
    # FD force parity inside the switching region
    r = 2.0
    _, f, _ = _dimer(lines, r)
    fd = _fd_force(lines, r)
    assert abs(f[0, 0] - fd) < 1e-4 * max(1.0, abs(fd)), (f[0, 0], fd)


def test_born_coul_long_dimer():
    """born/coul/long: vdW identical to plain born; coul part identical to
    coul/long under the same ewald setup."""
    r = 1.5
    born = "pair_coeff 1 1 50.0 0.4 1.0 2.0 1.5"
    lines_bcl = ("pair_style born/coul/long 5.0\n" + born
                 + "\nkspace_style ewald 1.0e-5")
    row, f, _ = _dimer(lines_bcl, r, q=(0.8, -0.8))
    e_born = 50.0 * np.exp((1.0 - r) / 0.4) - 2.0 / r**6 + 1.5 / r**8
    assert abs(row["evdwl"] * 2 - e_born) < 1e-9
    lines_cl = ("pair_style coul/long 5.0\npair_coeff * *\n"
                "kspace_style ewald 1.0e-5")
    row_c, _, _ = _dimer(lines_cl, r, q=(0.8, -0.8))
    assert abs(row["ecoul"] - row_c["ecoul"]) < 1e-10
    assert abs(row["elong"] - row_c["elong"]) < 1e-10
    fd = _fd_force(lines_bcl, r, q=(0.8, -0.8))
    assert abs(f[0, 0] - fd) < 1e-4 * max(1.0, abs(fd))


def test_pair_modify_tail():
    """pair_modify tail yes: PE gains etail/V and pressure ptail/V
    (pair_lj_cut.cpp init_one, thermo.cpp:1789, compute_pressure.cpp:292),
    validated against the numerically integrated corrections."""
    from scipy.integrate import quad

    from lidp_tpu.io.script import LammpsScript

    def run(tail):
        s = LammpsScript()
        s.execute(f"""
units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
pair_modify tail {tail}
neighbor 0.3 bin
fix 1 all nve
run 0
""".strip().splitlines())
        return s.thermo_rows[-1], s

    row_no, _ = run("no")
    row_yes, s = run("yes")
    n = 256
    vol = float(s._sim.sys.box.volume)
    rc, eps, sig = 2.5, 1.0, 1.0
    phi = lambda r: 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)  # noqa
    fr = lambda r: 4 * eps * (12 * sig**12 / r**13 - 6 * sig**6 / r**7)  # noqa
    etail_q = n * n * 2 * np.pi * quad(lambda r: phi(r) * r * r,
                                       rc, np.inf)[0]
    ptail_q = n * n * (2 * np.pi / 3) * quad(lambda r: fr(r) * r**3,
                                             rc, np.inf)[0]
    dpe = (row_yes["pe"] - row_no["pe"]) * n        # de-normalized (lj units)
    dpress = row_yes["press"] - row_no["press"]
    assert abs(dpe - etail_q / vol) < 1e-8 * abs(etail_q / vol)
    assert abs(dpress - ptail_q / vol**2) < 1e-8 * abs(ptail_q / vol**2)


@pytest.mark.parametrize("kind", ["mie", "lj/gromacs"])
def test_stacked_t5_cells_vs_dense(kind):
    """Cell kernel == dense path for kinds whose lj5 table is stacked
    (trailing coefficient axis): mie exponents, gromacs switch constants."""
    import jax.numpy as jnp

    from lidp_tpu.box import Box
    from lidp_tpu.ops.cells import CellConfig, build_cells, cell_pair_forces
    from lidp_tpu.ops.pair import dense_pair_forces, make_generic_pair_params

    rng = np.random.RandomState(11)
    n, L = 150, 10.0
    x = rng.uniform(0, L, (n, 3))
    mk = lambda v: np.full((2, 2), v)   # noqa: E731
    if kind == "mie":
        eps, sig, gR, gA = 1.2, 1.0, 14.0, 7.0
        cmie = gR / (gR - gA) * (gR / gA) ** (gA / (gR - gA))
        t = [cmie * gR * eps * sig**gR, cmie * gA * eps * sig**gA,
             cmie * eps * sig**gR, cmie * eps * sig**gA]
        t5 = np.stack([mk(gR), mk(gA)], axis=-1)
    else:
        eps, sig, ri, rc = 1.0, 1.0, 2.0, 2.5
        s6 = sig**6
        t = [48 * eps * s6 * s6, 24 * eps * s6, 4 * eps * s6 * s6,
             4 * eps * s6]
        r6inv, r8inv = rc**-6.0, rc**-8.0
        tt = rc - ri
        t2inv, t3inv = tt**-2.0, tt**-3.0
        a6 = (7 * ri - 10 * rc) * r8inv * t2inv
        b6 = (9 * rc - 7 * ri) * r8inv * t3inv
        a12 = (13 * ri - 16 * rc) * r6inv * r8inv * t2inv
        b12 = (15 * rc - 13 * ri) * r6inv * r8inv * t3inv
        c6 = r6inv - tt**3 * (2 * a6 + 1.5 * b6 * tt)
        c12 = r6inv * r6inv - tt**3 * (4 * a12 + 3 * b12 * tt)
        t5 = np.stack([mk(t[0] * a12 - t[1] * a6), mk(t[0] * b12 - t[1] * b6),
                       mk(-t[2] * 4 * a12 + t[3] * 2 * a6),
                       mk(-t[2] * 3 * b12 + t[3] * 1.5 * b6),
                       mk(-t[2] * c12 + t[3] * c6), mk(ri)], axis=-1)
    p = make_generic_pair_params(
        kind, mk(t[0]), mk(t[1]), mk(t[2]), mk(t[3]), t5,
        cut_lj=mk(2.5), dtype=jnp.float64)
    box = Box.create(np.zeros(3), np.full(3, L))
    mask = jnp.ones(n, bool)
    q = jnp.zeros(n)
    ty = jnp.ones(n, jnp.int32)
    fd, ev_d, _, vir_d = dense_pair_forces(
        jnp.asarray(x), q, ty, 0, mask, box, p)
    cfg = CellConfig.for_box([L] * 3, 2.8, density=n / L**3)
    cells = build_cells(jnp.asarray(x), mask, box, cfg)
    fc, ev_c, _, vir_c = cell_pair_forces(
        jnp.asarray(x), q, ty, mask, cells, box, p, coul=False)
    # random overlaps make the magnitudes large: compare relatively
    esc = max(1.0, abs(float(ev_d)))
    fsc = max(1.0, float(np.abs(np.asarray(fd)).max()))
    vsc = max(1.0, float(np.abs(np.asarray(vir_d)).max()))
    assert abs(float(ev_d) - float(ev_c)) < 1e-12 * esc
    assert np.abs(np.asarray(fd) - np.asarray(fc)).max() < 1e-12 * fsc
    assert np.abs(np.asarray(vir_d) - np.asarray(vir_c)).max() < 1e-12 * vsc
