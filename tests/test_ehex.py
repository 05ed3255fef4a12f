"""fix ehex goldens vs the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial, RIGID/fix_ehex.cpp — eHEX/a enhanced heat
exchange, Wirnsberger et al. arXiv:1507.07081).

Two region reservoirs on the deterministic 256-atom LJ melt
(bit-exact velocity create), hot +F / cold -F, 8 nve steps:

- "ehex": nevery 1, F=±1.0, full eHEX (velocity rescale about the
  reservoir COM + third-order coordinate correction Eq. 20)
- "hex":  nevery 2, F=±1.5, keyword hex (rescale only — reduces to
  fix_heat's HEX algorithm but through the ehex code path)

Columns step temp pe ke etotal press, thermo_modify norm no.
"""

import numpy as np
import pytest

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
region hot block 0 1 0 4 0 4
region cold block 2 3 0 4 0 4
fix 1 all nve
"""

TAIL = """thermo 2
thermo_style custom step temp pe ke etotal press
thermo_modify format float %.15g norm no
run 8
"""

CASES = {
    "ehex": ("fix hot all ehex 1 1.0 region hot\n"
             "fix cold all ehex 1 -1.0 region cold\n"),
    "hex": ("fix hot all ehex 2 1.5 region hot hex\n"
            "fix cold all ehex 2 -1.5 region cold hex\n"),
    # INF bounds + side out in the traced Region::match (region_block
    # interior flag + BIG bound handling): 'hot2' is unbounded below,
    # 'notcold' is everything OUTSIDE z<2
    "sideout": ("region hot2 block INF 1 INF INF INF INF\n"
                "region notcold block INF INF INF INF INF 2 side out\n"
                "fix hot all ehex 1 1.0 region hot2\n"
                "fix cold all ehex 1 -1.0 region notcold\n"),
}

GOLDEN = {
    "ehex": [
        [0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2, 1.43088638807977, -1730.51201204273, 547.314043440514, -1183.19796860222, -4.93997772985468],
        [4, 1.40164126151637, -1719.37322661199, 536.127782530013, -1183.24544408198, -4.67881403500711],
        [6, 1.34670287641278, -1698.3192618065, 515.11385022789, -1183.20541157861, -4.21816323126406],
        [8, 1.25806926647867, -1664.16459613699, 481.211494428091, -1182.9531017089, -3.52901897433976],
    ],
    "hex": [
        [0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2, 1.43088638838039, -1730.51201211474, 547.3140435555, -1183.19796855924, -4.93997774118256],
        [4, 1.40164126140064, -1719.37322659985, 536.127782485745, -1183.2454441141, -4.67881403482406],
        [6, 1.34670283471138, -1698.31924666489, 515.113834277102, -1183.20541238779, -4.21816296696953],
        [8, 1.25806897175533, -1664.16448614985, 481.211381696415, -1182.95310445344, -3.52901739298158],
    ],
    "sideout": [
        [0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2, 1.4308863879974, -1730.5120120139, 547.314043409005, -1183.1979686049, -4.93997773072133],
        [4, 1.40164126182212, -1719.37322657845, 536.127782646962, -1183.24544393149, -4.67881403811119],
        [6, 1.34670290610332, -1698.31927224899, 515.113861584518, -1183.20541066448, -4.21816333902306],
        [8, 1.25806948318791, -1664.16467675887, 481.211577319374, -1182.9530994395, -3.5290198351915],
    ],
}

COLS = ("step", "temp", "pe", "ke", "etotal", "press")


@pytest.mark.parametrize("case", sorted(CASES))
def test_ehex_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    path = tmp_path / "in.case"
    path.write_text(HEAD + CASES[case] + TAIL)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    rows = np.array([[float(r[k]) for k in COLS] for r in s.thermo_rows])
    gold = np.array(GOLDEN[case])
    assert rows.shape == gold.shape
    for col in range(1, len(COLS)):
        scale = max(1e-10, np.abs(gold[:, col]).max())
        tol = 1e-6 if COLS[col] == "press" else 1e-8
        assert np.abs(rows[:, col] - gold[:, col]).max() < tol * scale, (
            case, COLS[col], rows[:, col], gold[:, col])
