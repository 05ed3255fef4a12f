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
