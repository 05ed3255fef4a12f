"""min_style quickmin + hftn vs the rebuilt reference.

Deterministic case: sq2 lattice + displace_atoms random (bit-exact
RanPark), so the starting point is identical to the reference's.
Goldens (%.12g): quickmin (min_quickmin.cpp, 500 iters from E=+48.297)
reaches PotEng/atom -2.96612445689; hftn (min_hftn.cpp, truncated
Newton) then polishes to -2.96613896543 with fnorm 1.3e-9.  Our hftn is
the autodiff-Hvp Newton-CG analog, so we assert it reaches the same
basin at the same energy rather than iteration-for-iteration parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.io.script import LammpsScript

HEAD = """units lj
dimension 2
atom_style atomic
lattice sq2 0.8442
region box block 0 6 0 6 -0.1 0.1
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
pair_modify shift yes
neighbor 0.3 bin
displace_atoms all random 0.15 0.15 0 424242
fix 2 all enforce2d
"""


def _epair_per_atom(s):
    from lidp_tpu.forcefield import compute_forces

    sim = s._sim
    res = compute_forces(sim.sys, sim.runner.ff)
    return float(res.epair) / s.x.shape[0]


def test_quickmin_golden(tmp_path):
    path = tmp_path / "in.q"
    path.write_text(HEAD + "min_style quickmin\n"
                    "minimize 0.0 1.0e-6 500 5000\n")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    assert _epair_per_atom(s) == pytest.approx(-2.96612445689, rel=1e-7)


def test_hftn_golden(tmp_path):
    path = tmp_path / "in.h"
    path.write_text(HEAD + "min_style quickmin\n"
                    "minimize 0.0 1.0e-6 500 5000\n"
                    "min_style hftn\n"
                    "minimize 0.0 1.0e-8 100 5000\n")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    assert _epair_per_atom(s) == pytest.approx(-2.96613896543, rel=1e-9)
