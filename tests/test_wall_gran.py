"""fix wall/gran + fix wall/gran/region (fix_wall_gran.cpp,
fix_wall_gran_region.cpp): granular wall contacts — hooke, hooke/history,
hertz/history kernels, zplane/zcylinder walls, moving wall (shear), and
region walls (block faces) with per-contact shear history.

GOLDEN rows minted by scripts/gen_wallgran_goldens.py running the REBUILT
16Mar18 reference (/tmp/lmpsrc/lmp_serial + allocation patch) on the
identical 12-sphere bouncing-grain box this test regenerates (same seed).
Columns: step ke c_rot (erotate/sphere), thermo_modify norm no.

Tolerance tiering: rows through step 160 are free flight (no contacts) and
must match near-exactly; post-contact rows are chaotic bounce trajectories
where our cell-structured shear storage (ops/granular.py module doc) and
fp ordering amplify — wall-contact physics is checked there at 1e-5..1e-3
growing with steps, the same tier the chute 100-step row uses."""

import importlib.util
import os

import pytest

GOLDEN = {
    'zplane': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [40.0, 0.941507767957806, 0.112336233021246],
        [80.0, 1.70350290483923, 0.112336233021246],
        [120.0, 2.71682545400783, 0.112336233021246],
        [160.0, 3.98147541546359, 0.112336233021246],
        [200.0, 5.12244071545889, 0.106278707199278],
        [240.0, 5.43429387507068, 0.0948416033468421],
        [280.0, 6.1593639958018, 0.0932648768534011],
    ],
    'hooke': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [160.0, 3.98147541546359, 0.112336233021246],
        [200.0, 5.12247575594383, 0.108396439671863],
        [240.0, 5.43293511665156, 0.0911688697988497],
        [280.0, 6.16010769120933, 0.0855054634601906],
    ],
    'hertz': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [160.0, 3.98147541546359, 0.112336233021246],
        [200.0, 5.42174725315351, 0.110994243512174],
        [240.0, 5.80518751222407, 0.103845468403138],
        [280.0, 6.62257499637481, 0.100711181860508],
    ],
    'shear': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [160.0, 3.98147541546359, 0.112336233021246],
        [200.0, 5.13616540811937, 0.129596413356731],
        [240.0, 5.52082292564335, 0.358723359880122],
        [280.0, 6.27105098986118, 0.404621739595248],
    ],
    'zcyl': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [40.0, 0.929570874243157, 0.0971204344862171],
        [80.0, 1.67798430450714, 0.0910770282078867],
        [120.0, 2.68678271472701, 0.093758762802094],
        [160.0, 3.93817377722502, 0.0805317412297482],
        [200.0, 4.72499669818765, 0.0716544336703515],
        [240.0, 5.85000608630325, 0.0677403996541164],
    ],
    'region': [
        [0.0, 0.430840043363554, 0.112336233021246],
        [40.0, 0.980419610630615, 0.115639816210593],
        [80.0, 1.73499046880912, 0.115467674809056],
        [120.0, 2.70875998987395, 0.117434315391927],
        [160.0, 3.28450276236198, 0.09841320961663],
        [200.0, 4.00702146798457, 0.0975789975053053],
        [240.0, 4.71476721802795, 0.0960220202245548],
    ],
}

# rows at/before this step are contact-free on the plane cases and match
# to fp noise; later rows get a growing chaotic-bounce tier
FREE_FLIGHT_STEP = {"zplane": 160, "hooke": 160, "hertz": 160,
                    "shear": 160, "zcyl": 0, "region": 0}


def _gen():
    spec = importlib.util.spec_from_file_location(
        "g", os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "gen_wallgran_goldens.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    return g


@pytest.mark.parametrize(
    "case",
    [c if c in ("zplane", "region") else pytest.param(
        c, marks=pytest.mark.slow) for c in sorted(GOLDEN)])
def test_wall_gran_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    g = _gen()
    g.write_data(str(tmp_path / "data.wallgran"))
    g.write_data(str(tmp_path / "data.wallgran2"), xyscale=0.7)
    text = g.make_input(case)
    (tmp_path / "in.case").write_text(text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s = LammpsScript(dtype=jnp.float64)
        s.file(str(tmp_path / "in.case"))
    finally:
        os.chdir(cwd)
    got = {int(r["step"]): r for r in s.thermo_rows}
    for ref in GOLDEN[case]:
        step = int(ref[0])
        r = got[step]
        if step <= FREE_FLIGHT_STEP[case]:
            rel = 1e-9
        else:
            # chaotic bounce: tier grows with contact count (see docstring)
            rel = 1e-5 * max(1.0, (step - FREE_FLIGHT_STEP[case]) / 40.0) \
                if step <= 240 else 1e-3
        for name, o, gref in zip(("ke", "c_rot"),
                                 (r["ke"], r["c_rot"]), ref[1:]):
            assert float(o) == pytest.approx(gref, rel=rel, abs=1e-12), (
                f"{case} step {step} {name}: ours {float(o)} vs {gref} "
                f"(rel {rel})")
