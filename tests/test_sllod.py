"""fix nvt/sllod + compute temp/deform + fix deform remap v vs the
rebuilt reference.

Goldens minted from the REBUILT 16Mar18 reference binary
(fix_nvt_sllod.cpp, compute_temp_deform.cpp, fix_deform.cpp erate +
remap v, Domain::pbc velocity remap) on a 256-atom triclinic (prism)
LJ melt sheared at erate 0.05 in xy.
"""
import jax.numpy as jnp
import numpy as np
import pytest

SCRIPT = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box prism 0 4 0 4 0 4 0 0 0
create_box 1 box
create_atoms 1 box
mass 1 1.0
velocity all create 1.44 87287 loop geom
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0
neighbor 0.3 bin
{fixes}
compute td all temp/deform
thermo 2
thermo_style custom step temp c_td pe press xy
thermo_modify format float %.15g norm no
run 8
"""

# step temp c_td pe press xy (rebuilt reference, %.15g)
SLLOD_GOLDEN = [
    [0, 1.44, 1.44862268982703, -1733.98222163279, -5.02441789508558, 0.0],
    [2, 1.43084828809419, 1.43949480184665, -1730.51346331746,
     -4.94004050801759, 0.00335919238276539],
    [4, 1.40145658227449, 1.41012845563924, -1719.38153180331,
     -4.67912565374203, 0.00671838476552988],
    [6, 1.34629497789266, 1.35499534711582, -1698.3453582032,
     -4.21895756359984, 0.0100775771482953],
    [8, 1.25741796244405, 1.26615233426843, -1664.21340635333,
     -3.53052797543561, 0.0134367695310598],
]

# plain nve under the same shear (isolates fix deform erate + remap v +
# the pre-deform energy tally ordering); matched to all printed digits
NVE_GOLDEN = [
    [0, 1.44, 1.44862268982703, -1733.98222163279, -5.02441789508558, 0.0],
    [2, 1.43088799400848, 1.43953706382113, -1730.51345718733,
     -4.94000672287123, 0.00335919238276539],
    [4, 1.40165787656285, 1.4103351926896, -1719.38098965976,
     -4.67894079715081, 0.00671838476552988],
    [8, 1.25819721540802, 1.26694349519285, -1664.19735188248,
     -3.52950481954206, 0.0134367695310598],
]


def _run(tmp_path, fixes):
    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.s").write_text(SCRIPT.format(fixes=fixes))
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.s"))
    return {int(r["step"]): r for r in s.thermo_rows}


def _check(rows, golden, rel):
    for step, temp, ctd, pe, press, xy in golden:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=rel)
        assert float(r["c_td"]) == pytest.approx(ctd, rel=rel)
        assert float(r["pe"]) == pytest.approx(pe, rel=rel)
        assert float(r["press"]) == pytest.approx(press, rel=rel)
        assert float(r["xy"]) == pytest.approx(xy, rel=1e-10, abs=1e-14)


def test_nvt_sllod_golden(tmp_path):
    """SLLOD NH thermostat on the sheared melt: thermal-velocity-only
    scaling + -v.grad(u) correction (FixNVTSllod::nh_v_temp) with
    mtchain=1; matches the rebuilt reference to 1e-7 over 8 steps."""
    rows = _run(tmp_path,
                "fix 1 all nvt/sllod temp 1.0 1.0 1.0\n"
                "fix 2 all deform 1 xy erate 0.05 remap v")
    _check(rows, SLLOD_GOLDEN, rel=1e-7)


def test_nve_deform_remap_v_golden(tmp_path):
    """fix deform xy erate + remap v under plain NVE: box tilt schedule,
    energy tallied before the box update (verlet.cpp ordering), exact
    digit parity with the rebuilt reference."""
    rows = _run(tmp_path,
                "fix 1 all nve\n"
                "fix 2 all deform 1 xy erate 0.05 remap v")
    _check(rows, NVE_GOLDEN, rel=1e-9)
