"""Fix breadth goldens vs the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial; rows minted by scripts/gen_fix_goldens.py).

nve/limit (per-atom |v| clamp, fix_nve_limit.cpp), nve/noforce
(drift-only, fix_nve_noforce.cpp), spring tether/couple
(fix_spring.cpp mass-distributed COM restoring force), spring/rg
(fix_spring_rg.cpp), drag (fix_drag.cpp), and the flat-wall family
wall/lj126, wall/lj1043, wall/harmonic (fix_wall_*.cpp) — 4 nve steps
on the deterministic 256-atom LJ melt (bit-exact velocity create).

Columns: step temp pe ke etotal press.
"""

import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "gen_fix_goldens",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "gen_fix_goldens.py"))
_gen = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_gen)

COLS = ("step", "temp", "pe", "ke", "etotal", "press")


@pytest.mark.parametrize("case", sorted(_gen.CASES))
def test_fix_breadth_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    path = tmp_path / "in.case"
    path.write_text(_gen.script_for(case))
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


GOLDEN = {
    "nve_limit": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 0.0532175408216198, -1733.85788069301, 20.3557093642696, -1713.50217132874, -6.18725210811116],
        [4.0, 0.0522508817162018, -1733.48800579225, 19.9859622564472, -1713.50204353581, -6.17821742387261],
    ],
    "nve_noforce": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.44, -1731.79747774224, 550.8, -1180.99747774224, -4.96618921495456],
        [4.0, 1.44, -1724.7371806538, 550.8, -1173.9371806538, -4.78424284555257],
    ],
    "spring_tether": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.43089551297979, -1730.51201236183, 547.31753371477, -1183.19447864706, -4.93997007126478],
        [4.0, 1.40165969159949, -1719.37319690213, 536.134832036805, -1183.23836486532, -4.67879812566432],
    ],
    "spring_couple": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.4308404288406, -1730.51200534833, 547.296464031529, -1183.2155413168, -4.94001622883683],
        [4.0, 1.40155070286624, -1719.3731866061, 536.093143846335, -1183.28004275976, -4.67888947484999],
    ],
    "spring_rg": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.43093518430293, -1730.51197631482, 547.332707995871, -1183.17926831895, -4.93993569252693],
        [4.0, 1.40173509006267, -1719.37292330045, 536.163671948969, -1183.20925135148, -4.678727032364],
    ],
    "drag": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.4312855159187, -1730.51172083712, 547.466709838902, -1183.04501099822, -4.93963370881767],
        [4.0, 1.40242345275758, -1719.37086801085, 536.426970679774, -1182.94389733108, -4.6780902569572],
    ],
    "wall_lj126": [
        [0.0, 1.44, -1573.31283526153, 550.8, -1022.51283526153, -4.39943720620178],
        [2.0, 1.43383930202212, -1570.74916378075, 548.443533023462, -1022.30563075729, -4.31579345288118],
        [4.0, 1.41874369532626, -1562.13717639452, 542.669463462296, -1019.46771293223, -4.05014667688315],
    ],
    "wall_lj1043": [
        [0.0, 1.44, -1573.31283526153, 550.8, -1022.51283526153, -4.39943720620178],
        [2.0, 1.43137888379005, -1570.42536883526, 547.502423049693, -1022.92294578557, -4.32007448342462],
        [4.0, 1.4048732498031, -1560.95473412412, 537.364018049685, -1023.59071607443, -4.0725383885691],
    ],
    "wall_harmonic": [
        [0.0, 1.44, -1573.31283526153, 550.8, -1022.51283526153, -4.39943720620178],
        [2.0, 1.43208171263455, -1570.32026416871, 547.771255082717, -1022.54900908599, -4.32019278580885],
        [4.0, 1.40647649255837, -1560.55866514907, 537.977258403576, -1022.5814067455, -4.0745289237735],
    ],
    "move_linear": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 0.54811631187421, -1732.73882818177, 209.654489291885, -1523.08433888989, -5.74187988669398],
        [4.0, 0.537851462723845, -1728.79297710353, 205.728184491871, -1523.06479261166, -5.65000129159936],
    ],
    "move_wiggle": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 5.06997777937581, -1731.23439932545, 1939.26650061125, 208.032101285797, -1.90022356323838],
        [4.0, 4.8456725470793, -1721.65220068836, 1853.46974925783, 131.81754856947, -1.85583974418776],
    ],
    "heat": [
        [0.0, 1.44, -1733.98222163279, 550.8, -1183.18222163279, -5.02441789508558],
        [2.0, 1.43101710733464, -1730.51201211474, 547.3640435555, -1183.14796855924, -4.93986781930756],
        [4.0, 1.4019008161603, -1719.37251352498, 536.227062181314, -1183.14545134366, -4.67857795171548],
    ],
}


def test_temp_csvr_csld_relax(tmp_path):
    """Stochastic thermostats (fix_temp_csvr.cpp / fix_temp_csld.cpp):
    statistically-equivalent streams, so assert relaxation of the melt
    temperature toward the target rather than a trajectory golden."""
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    for style in ("temp/csvr", "temp/csld"):
        path = tmp_path / f"in.{style.split('/')[1]}"
        path.write_text(_gen.HEAD.format(bc="p p p")
                        + f"fix 1 all nve\nfix 2 all {style} 0.7 0.7 "
                        "0.1 4928\n"
                        "thermo 50\nthermo_style custom step temp\n"
                        "run 250\n")
        s = LammpsScript(dtype=jnp.float64)
        s.file(str(path))
        t_end = float(s.thermo_rows[-1]["temp"])
        assert 0.55 < t_end < 0.95, (style, t_end)


PB_GOLDEN = [
    # rebuilt reference, 256-atom melt, fix press/berendsen iso 0.5 0.5
    # 10.0 modulus 50.0: step temp pe press vol
    [0, 1.44, -1733.98222163279, -5.02441789508558, 303.245676380005],
    [2, 1.43088423176168, -1730.6144695962, -4.94003430205048,
     303.21249251176],
    [4, 1.40161049457006, -1719.66151048776, -4.67816029954569,
     303.180625733081],
]


def test_press_berendsen_golden(tmp_path):
    """fix press/berendsen (fix_press_berendsen.cpp): per-step Berendsen
    box dilation about the box center; matches the rebuilt reference to
    every printed digit over 4 steps."""
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    (tmp_path / "in.pb").write_text(
        _gen.HEAD.format(bc="p p p")
        + "fix 1 all nve\n"
        "fix 2 all press/berendsen iso 0.5 0.5 10.0 modulus 50.0\n"
        "thermo 2\nthermo_style custom step temp pe press vol\n"
        "run 4\n")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(tmp_path / "in.pb"))
    rows = {int(r["step"]): r for r in s.thermo_rows}
    for step, temp, pe, press, vol in PB_GOLDEN:
        r = rows[step]
        assert float(r["temp"]) == pytest.approx(temp, rel=1e-10)
        assert float(r["pe"]) * 256 == pytest.approx(pe, rel=1e-9)
        assert float(r["press"]) == pytest.approx(press, rel=1e-8)
        assert float(r["vol"]) == pytest.approx(vol, rel=1e-10)
