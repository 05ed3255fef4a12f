"""Per-step trajectory parity against the committed Bulk H2 dump.

The reference ships h2.dump (dump custom x y z type mol, every step,
timesteps 0-13) produced by the full polarizable stack: LJ + real-space
Ewald + ewald/disp + Wolf static field + SCF dipoles + rigid/nve bodies.
Frame 0 is the data-file configuration in the dump's (spatial) atom order;
we recover the permutation there and then require every later frame's
positions to match ours — per-step, per-atom trajectory parity, far
stronger than thermo-row checks.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

H2DIR = "/root/reference/polarization/examples/Bulk H2"
NFRAMES = 14


def _read_dump(path):
    frames = []
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        body = lines[i + 9:i + 9 + n]
        rows = np.array([[float(v) for v in ln.split()] for ln in body])
        frames.append((step, rows))
        i += 9 + n
    return frames


@pytest.fixture(scope="module")
def run13():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = H2DIR
    lines = []
    for ln in open(f"{H2DIR}/h2.input").read().splitlines():
        t = ln.split("#")[0].strip()
        if t.startswith(("run", "dump")):
            continue
        lines.append(ln)
    s.execute(lines)
    xs = [np.asarray(s.x, float).copy()]
    for _ in range(NFRAMES - 1):
        s.one("run 1")
        sim = s._sim
        L = np.asarray(sim.sys.box.lengths)
        xu = (np.asarray(sim.sys.x)
              + np.asarray(sim.sys.image) * L)[:s.x.shape[0]]
        xs.append(xu.copy())
    return s, xs


def test_h2_dump_trajectory(run13):
    s, xs = run13
    frames = _read_dump(f"{H2DIR}/h2.dump")
    assert len(frames) >= NFRAMES

    # permutation from frame 0: dump rows -> data-file atom indices.  The
    # dump stores WRAPPED coords at 3 decimals in spatial order; match by
    # periodic nearest neighbour + type + mol.
    from scipy.spatial import cKDTree

    step0, rows0 = frames[0]
    assert step0 == 0
    lo, L = -10.797442, 2 * 10.797442
    xd = (rows0[:, :3] - lo) % L
    x0 = (xs[0] - lo) % L
    t = cKDTree(xd, boxsize=L)
    dist, perm = t.query(x0, k=1)        # perm[atom] = dump row
    assert dist.max() < 2e-3, dist.max()
    assert len(set(perm)) == len(perm)
    assert np.all(rows0[perm][:, 3].astype(int) == np.asarray(s.type))
    assert np.all(rows0[perm][:, 4].astype(int) == np.asarray(s.mol))

    L = 2 * 10.797442
    for fi in range(1, NFRAMES):
        step, rows = frames[fi]
        ours = xs[step]
        theirs = rows[perm][:, :3]
        d = ours - theirs
        d -= L * np.round(d / L)         # dump may wrap differently
        err = np.abs(d).max()
        # dump prints 3 decimals (5e-4 quantization); allow slow chaotic
        # growth on top
        assert err < 5e-4 + 2e-4 * step, (step, err)
