"""CHARMM force-field styles: pair lj/charmm/coul/long (energy switching),
angle charmm (Urey-Bradley), dihedral charmm (K[1+cos(n phi - d)] + weighted
1-4), special_bonds charmm, thermo_style multi.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _box(L=100.0):
    from lidp_tpu.box import Box

    return Box.create(np.zeros(3), np.full(3, L))


def test_charmm_switching_continuity_and_force():
    """LJ force/energy smooth at the inner cutoff, zero at the outer; force
    equals -dE/dr everywhere in the switching region (FD)."""
    from lidp_tpu.ops.pair import make_pair_params, dense_pair_forces

    inner, outer = 8.0, 10.0
    eps_t = np.zeros((2, 2)); sig_t = np.zeros((2, 2)); cut_t = np.zeros((2, 2))
    eps_t[1, 1] = 0.2; sig_t[1, 1] = 3.5; cut_t[1, 1] = outer
    p = make_pair_params(eps_t, sig_t, cut_t, cut_lj_inner=inner, charmm=True,
                         coul=False)
    box = _box()
    type_ = jnp.asarray([1, 1], jnp.int32)
    q = jnp.zeros(2)
    sp = jnp.zeros((2, 2), jnp.int32)
    mask = jnp.asarray([True, True])

    def e_of(r):
        x = jnp.asarray([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
        f, ev, ec, vir = dense_pair_forces(x, q, type_, sp, mask, box, p)
        return float(ev), float(f[0, 0])

    e_in, _ = e_of(inner - 1e-7)
    e_out, _ = e_of(inner + 1e-7)
    assert abs(e_in - e_out) < 1e-9          # continuous at inner cutoff
    e_end, _ = e_of(outer - 1e-6)
    assert abs(e_end) < 1e-10                 # switched to zero at outer
    for r in (8.5, 9.0, 9.7):
        h = 1e-6
        ep, _ = e_of(r + h)
        em, _ = e_of(r - h)
        _, fx = e_of(r)
        # F_0x = -dE/dx0 = +dE/dr (r = x1 - x0)
        assert abs((ep - em) / (2 * h) - fx) < 1e-7, r


def test_angle_charmm_urey_bradley():
    from lidp_tpu.ops.bonded import AngleParams, angle_forces

    K, th0, Kub, rub = 50.0, np.deg2rad(109.47), 5.0, 1.6
    # 90-degree angle, arms length 1 => r13 = sqrt(2)
    x = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    p = AngleParams(idx=jnp.asarray([[0, 1, 2]], jnp.int32),
                    atype=jnp.asarray([1], jnp.int32),
                    k=jnp.asarray([0.0, K]), theta0=jnp.asarray([0.0, th0]),
                    k_ub=jnp.asarray([0.0, Kub]),
                    r_ub=jnp.asarray([0.0, rub]), style="charmm")
    f, e, vir = angle_forces(x, _box(), p)
    expect = K * (np.pi / 2 - th0) ** 2 + Kub * (np.sqrt(2) - rub) ** 2
    assert abs(float(e) - expect) < 1e-12
    assert abs(float(jnp.sum(f))) < 1e-10     # net force zero


def test_dihedral_charmm_energy():
    from lidp_tpu.ops.bonded import DihedralParams, dihedral_forces

    K, n, d = 2.0, 3.0, np.pi
    # phi = 90 degrees: planar zig with l rotated out of plane
    x = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0], [1.0, 0.0, 1.0]])
    p = DihedralParams(
        idx=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        dtype_=jnp.asarray([1], jnp.int32),
        c1=jnp.asarray([0.0, K]), c2=jnp.asarray([0.0, n]),
        c3=jnp.asarray([0.0, d]), c4=jnp.asarray([0.0, 0.0]),
        style="charmm")
    f, e, vir = dihedral_forces(x, _box(), p)
    phi = np.pi / 2
    assert abs(float(e) - K * (1 + np.cos(n * phi - d))) < 1e-10


CHARMM_SCRIPT = """
units real
atom_style full
boundary p p p
bond_style harmonic
angle_style charmm
dihedral_style charmm
improper_style harmonic
pair_style lj/charmm/coul/long 8.0 10.0
pair_modify mix arithmetic
kspace_style ewald 1.0e-4
read_data {data}
special_bonds charmm
velocity all create 300.0 4928459 loop geom
fix 1 all nvt temp 300.0 300.0 100.0
thermo 1
thermo_style multi
timestep 1.0
"""

DATA = """butane-ish test data

8 atoms
6 bonds
4 angles
2 dihedrals
1 impropers

2 atom types
1 bond types
1 angle types
1 dihedral types
1 improper types

0.0 24.0 xlo xhi
0.0 24.0 ylo yhi
0.0 24.0 zlo zhi

Masses

1 12.011
2 1.008

Atoms

1 1 1 -0.18 3.00 3.00 3.00
2 1 1 0.18 4.53 3.00 3.00
3 1 1 -0.18 5.04 4.45 3.00
4 1 1 0.18 6.57 4.45 3.10
5 2 1 -0.18 13.00 13.00 13.00
6 2 1 0.18 14.53 13.00 13.00
7 2 1 -0.18 15.04 14.45 13.00
8 2 1 0.18 16.57 14.45 13.10

Bonds

1 1 1 2
2 1 2 3
3 1 3 4
4 1 5 6
5 1 6 7
6 1 7 8

Angles

1 1 1 2 3
2 1 2 3 4
3 1 5 6 7
4 1 6 7 8

Dihedrals

1 1 1 2 3 4
2 1 5 6 7 8

Impropers

1 1 1 2 3 4
"""

COEFFS = """
pair_coeff 1 1 0.066 3.5
bond_coeff 1 268.0 1.529
angle_coeff 1 58.35 112.7 11.16 2.561
dihedral_coeff 1 0.6 3 180 0.5
improper_coeff 1 2.5 0.0
"""


@pytest.fixture(scope="module")
def charmm_sim(tmp_path_factory):
    from lidp_tpu.io.script import LammpsScript

    d = tmp_path_factory.mktemp("charmm")
    (d / "test.data").write_text(DATA)
    lines = []
    s = LammpsScript(log=lines.append)
    script = CHARMM_SCRIPT.format(data=d / "test.data") + COEFFS
    s.execute([ln for ln in script.strip().splitlines() if ln.strip()])
    s.one("run 5")
    return s, lines


def test_charmm_script_runs_multi_thermo(charmm_sim):
    s, lines = charmm_sim
    assert any("E_dihed" in ln for ln in lines)
    rows = s.thermo_rows
    r0 = rows[0]
    for k in ("ebond", "eangle", "edihed", "eimp", "elong"):
        assert np.isfinite(r0[k]), k
    assert r0["eangle"] != 0.0 and r0["edihed"] != 0.0
    # emol = sum of the bonded pieces
    assert abs(r0["emol"] - (r0["ebond"] + r0["eangle"] + r0["edihed"]
                             + r0["eimp"])) < 1e-10


def test_charmm_forces_are_energy_gradient(charmm_sim):
    """FD check of the TOTAL force (pair switching + UB + charmm dihedral
    with weighted 1-4 + ewald) — the strongest cross-term consistency test."""
    import jax

    from lidp_tpu.forcefield import compute_forces

    s, _ = charmm_sim
    sim = s._sim
    sys = sim.sys
    ff = sim.runner.ff

    def pe(x):
        return compute_forces(sys.replace(x=x), ff).pe

    f = compute_forces(sys, ff).f
    x0 = np.asarray(sys.x)
    rng = np.random.RandomState(5)
    for _ in range(3):
        i, dd = rng.randint(8), rng.randint(3)
        h = 1e-6
        xp = x0.copy(); xp[i, dd] += h
        xm = x0.copy(); xm[i, dd] -= h
        fd = -(float(pe(jnp.asarray(xp))) - float(pe(jnp.asarray(xm)))) / (2 * h)
        assert abs(fd - float(f[i, dd])) < 1e-4, (i, dd, fd, float(f[i, dd]))
