"""Compute breadth goldens vs the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial; rows minted by scripts/gen_compute_goldens.py).

Per-atom computes ke/atom, pe/atom, stress/atom, coord/atom,
cluster/atom, displace/atom reduced through compute reduce /
reduce/region (compute_reduce.cpp) into thermo scalars, plus vacf and
the velocity-bias temperature variants temp/ramp, temp/region,
temp/profile — 4 nve steps on a deterministic 256-atom LJ melt
(velocity create is bit-exact, so trajectories are directly
comparable).

Columns: step temp pe c_rk c_rp c_rs[1] c_rs[2] c_rc c_rcl c_rd c_rr
c_vac[1] c_vac[4] c_tr c_treg c_tp.
"""

import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "gen_compute_goldens",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "gen_compute_goldens.py"))
_gen = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_gen)

COLS = ("step", "temp", "pe", "c_rk", "c_rp", "c_rs[1]", "c_rs[2]",
        "c_rc", "c_rcl", "c_rd", "c_rr", "c_vac[1]", "c_vac[4]", "c_tr",
        "c_treg", "c_tp")


def test_compute_breadth_golden(tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    path = tmp_path / "in.case"
    path.write_text(_gen.SCRIPT)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    rows = np.array([[float(r[k]) for k in COLS] for r in s.thermo_rows])
    gold = np.array(GOLDEN)
    assert rows.shape == gold.shape
    for col in range(1, len(COLS)):
        scale = max(1e-10, np.abs(gold[:, col]).max())
        assert np.abs(rows[:, col] - gold[:, col]).max() < 1e-8 * scale, (
            COLS[col], rows[:, col], gold[:, col])


GOLDEN = [
    [0.0, 1.44, -1733.98222163279, 550.8, -1733.98222163275, 1508.80009885537, 18.624455562878, 12.0, 1.0, 0.0, 351.107965223299, 1.49231603185803, 4.303125, 2.46774062430952, 1.47215079758197, 1.4439293822991],
    [2.0, 1.43088638838039, -1730.51201211474, 547.3140435555, -1730.51201211474, 1483.40084286785, 19.2894603640216, 12.0, 1.0, 0.033652954294526, 250.898146876965, 1.48756200406246, 4.28948145449566, 2.45382723018726, 1.46724062501149, 1.4342073562472],
    [4.0, 1.40164128098338, -1719.37323329849, 536.127789976143, -1719.37323329849, 1404.66757036162, 21.0434945058336, 12.0, 1.0, 0.0669976023997644, 245.730845301879, 1.4720851488003, 4.24532037845624, 2.41991275230278, 1.43702248714549, 1.40470199060461],
]