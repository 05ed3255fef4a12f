"""Host-side data-collection fixes: store/state, ave/atom, ave/histo,
ave/correlate, vector (fix_store_state.cpp, fix_ave_atom.cpp,
fix_ave_histo.cpp, fix_ave_correlate.cpp, fix_vector.cpp).

ave/histo bin counts are a golden vs the REBUILT reference binary
(identical deterministic melt, bit-exact velocity create); the others
are checked self-consistently (snapshot identity, window-average
identity, thermo-series identity).
"""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow

LMP = "/tmp/lmpsrc/lmp_serial"

HEAD = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
velocity all create 1.44 87287 loop geom
fix 1 all nve
"""


def _run_ours(tmp_path, body):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.case").write_text(HEAD + body)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.case"))
    return s


def test_ave_histo_golden(tmp_path):
    body = ("fix 2 all ave/histo 1 4 4 -3.0 3.0 12 vx mode vector file histo.out\n"
            "run 8\n")
    s = _run_ours(tmp_path, body)
    ours = [ln.split() for ln in
            open(tmp_path / "histo.out").read().splitlines()
            if not ln.startswith("#")]
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    (ref_dir / "in.case").write_text(HEAD + body)
    if not os.path.exists(LMP):
        pytest.skip("rebuilt reference binary unavailable")
    subprocess.run([LMP, "-in", "in.case"], cwd=ref_dir,
                   capture_output=True, text=True, timeout=120)
    theirs = [ln.split() for ln in
              open(ref_dir / "histo.out").read().splitlines()
              if not ln.startswith("#")]
    ours_rows = np.array([[float(v) for v in r] for r in ours
                          if len(r) == 4])
    ref_rows = np.array([[float(v) for v in r] for r in theirs
                         if len(r) == 4])
    assert ours_rows.shape == ref_rows.shape
    # bin centers + counts + normalized counts all match
    # the reference file prints %g (6 sig figs) — compare at that precision
    np.testing.assert_allclose(ours_rows, ref_rows, rtol=1e-5)


def test_store_state_and_ave_atom(tmp_path):
    s = _run_ours(tmp_path, """
fix s0 all store/state 0 x y z
fix av all ave/atom 1 4 4 vx
dump 1 all custom 4 st.dump id f_s0[1] f_av
run 4
""")
    sim = s._sim
    frames = open(tmp_path / "st.dump").read().split("ITEM: TIMESTEP")
    last = frames[-1].splitlines()
    hdr = next(i for i, ln in enumerate(last) if ln.startswith("ITEM: ATOMS"))
    rows = np.array([[float(v) for v in ln.split()]
                     for ln in last[hdr + 1:] if ln.strip()])
    # store/state 0: x at setup — the fcc lattice coords
    from lidp_tpu.io.script import LammpsScript
    import jax.numpy as jnp

    s0 = LammpsScript(dtype=jnp.float64)
    (tmp_path / "in.init").write_text(HEAD + "run 0\n")
    s0.file(str(tmp_path / "in.init"))
    # dump text is %g (6 sig figs)
    np.testing.assert_allclose(rows[:, 1], np.asarray(s0.x)[:, 0],
                               rtol=1e-5, atol=1e-5)
    # ave/atom over the window is finite and near the per-atom vx scale
    assert np.isfinite(rows[:, 2]).all()
    assert np.abs(rows[:, 2]).max() < 10.0


def test_vector_matches_thermo(tmp_path):
    s = _run_ours(tmp_path, """
fix v1 all vector 2 temp
thermo 2
run 8
""")
    spec = s.fixes["v1"]
    series = np.asarray(spec._series)
    temps = np.array([float(r["temp"]) for r in s.thermo_rows])
    # fix vector samples at steps 0,2,4,6,8: FixVector's constructor sets
    # nextstep = (ntimestep/nevery)*nevery = 0 at creation on step 0, so
    # FixVector::setup -> end_of_step samples the setup step too
    # (fix_vector.cpp:163-169,242-253) = all five thermo rows
    np.testing.assert_allclose(series, temps, rtol=1e-12)


def test_ave_correlate_auto(tmp_path):
    s = _run_ours(tmp_path, """
fix c1 all ave/correlate 1 8 8 temp file corr.out
thermo 1
run 8
""")
    corr, cnt = s.ave_correlate_values["c1"]
    temps = np.array([float(r["temp"]) for r in s.thermo_rows])[1:]
    # lag-0 correlation = mean of T^2 over the window
    assert corr[0, 0] == pytest.approx(np.mean(temps ** 2), rel=1e-8)
    assert cnt[0] == len(temps)
    assert os.path.exists(tmp_path / "corr.out")
