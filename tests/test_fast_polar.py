"""Production fast-polar engine (parallel/fast_polar.py) parity.

The engine must reproduce the dense reference-parity path — same script,
same `fix rigid/nve molecule`, same thermo — through the panel force
evaluation, in both execution modes:

  * fused: the whole MD chunk as one jitted lax.scan (f32 product mode /
    CPU parity mode)
  * host:  per-phase host-driven dispatches with the host CG (the f64
    1e-11 regime on real TPU hardware)

Reference behavior: pair_lj_cut_coul_long_polarization.cpp compute +
RIGID/fix_rigid.cpp:891,1011 integrate; the goldens for the dense path
are asserted against the committed reference logs in test_bulk_h2.py, so
dense == fast here is transitively golden.
"""

import os

import numpy as np
import pytest

H2_DIR = "/root/reference/polarization/examples/Bulk H2"

COLS = ("etotal", "ke", "pe", "evdwl", "ecoul", "elong", "epol", "temp",
        "press")


def _run_h2(nsteps=3, fast=False, mode=None):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    os.environ["LIDP_FAST_POLAR"] = "1" if fast else "0"
    if mode is not None:
        os.environ["LIDP_FAST_POLAR_MODE"] = mode
    else:
        os.environ.pop("LIDP_FAST_POLAR_MODE", None)
    try:
        s = LammpsScript(dtype=jnp.float64)
        s.root = H2_DIR
        for line in open(os.path.join(s.root, "h2.input")).read() \
                .splitlines():
            t = line.split("#")[0].strip()
            if not t:
                continue
            if t.startswith("variable") and "nstep" in t:
                s.one(f"variable nstep equal {nsteps}")
                continue
            if t.startswith("dump"):
                continue
            s.one(line)
        return s
    finally:
        os.environ.pop("LIDP_FAST_POLAR", None)
        os.environ.pop("LIDP_FAST_POLAR_MODE", None)


@pytest.fixture(scope="module")
def dense_rows():
    return _run_h2(fast=False).thermo_rows


def _assert_rows_match(rows_a, rows_b, tol):
    assert len(rows_a) == len(rows_b)
    for ra, rb in zip(rows_a, rows_b):
        for k in COLS:
            a, b = float(ra[k]), float(rb[k])
            rel = abs(a - b) / max(1.0, abs(a))
            assert rel < tol, (int(ra["step"]), k, a, b, rel)


def test_fused_mode_matches_dense(dense_rows):
    """Fused scan engine == dense path through 3 rigid/nve steps
    (all thermo columns incl. the fdotr polar-virial press)."""
    rows = _run_h2(fast=True).thermo_rows
    _assert_rows_match(dense_rows, rows, 1e-9)


def test_host_mode_matches_dense(dense_rows):
    """Host-phase engine (per-dispatch phases + host CG, the f64/1e-11
    production mode) == dense path."""
    rows = _run_h2(fast=True, mode="host").thermo_rows
    _assert_rows_match(dense_rows, rows, 1e-9)


def test_engine_engages_automatically_above_cap(monkeypatch):
    """Above DENSE_PATH_MAX_ATOMS the fast engine must attach without any
    env opt-in (the dense tensor path is impossible at production sizes)."""
    from lidp_tpu.parallel import fast_polar as fp

    class _Fix:
        style = "rigid/nve"

    class _Pair:
        name = "lj/cut/coul/long/polarization"

    class _Script:
        pair = _Pair()
        kspace = ("ewald/disp", 1e-4)
        box_tilt = None
        periodic = (True, True, True)
        fixes = {"1": _Fix()}
        bond_style = None
        angle_style = dihedral_style = improper_style = None
        neigh_exclude_types = None
        n_shard_devices = 0

    monkeypatch.delenv("LIDP_FAST_POLAR", raising=False)
    assert fp.prescan(_Script(), 10_000) is True
    assert fp.prescan(_Script(), 1_000) is False    # dense goldens keep it

    s2 = _Script()
    s2.fixes = {"1": type("F", (), {"style": "nvt"})()}
    assert fp.prescan(s2, 10_000) is False


def test_aligned_npad():
    from lidp_tpu.parallel import fast_polar as fp

    for n in (750, 4097, 10592, 105920):
        npad = fp.aligned_npad(n)
        assert npad >= n and npad % 256 == 0
