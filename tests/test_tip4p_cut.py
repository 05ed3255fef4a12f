"""TIP4P pair-style family goldens: tip4p/cut, lj/cut/tip4p/cut,
tip4p/long.

GOLDEN rows were minted by scripts/gen_tip4p_goldens.py running the
REBUILT 16Mar18 reference (/tmp/lmpsrc/lmp_serial) on the identical
8-molecule flexible-water data file this test regenerates (same seed).
Columns: step temp pe evdwl ecoul elong ebond eangle press.

Reference semantics:
  * pair_tip4p_cut.cpp — Coulomb-only cutoff style between off-site
    charge positions, cforce = factor_coul*qqrd2e*qi*qj/r^3 (:211-214),
    ecoul *= factor_coul (:343);
  * pair_lj_cut_tip4p_cut.cpp — LJ between real positions + the same
    cutoff Coulomb between charge sites;
  * pair_tip4p_long.cpp — erfc-damped real space + pppm/tip4p recip.
"""

import pytest

from scripts.gen_tip4p_goldens import CASES, make_input, write_water_data

GOLDEN = {
    'tip4pcut': [
        [0.0, 300.0, 32.0919872983, 0.0, 32.0919872983, 0.0, 3.24724730873e-25, 4.06051359821e-26, 968.570738187],
        [1.0, 297.826060061, -8.88888320993, 0.0, -8.98627783694, 0.0, 0.088513494793, 0.00888113221493, 244.436129027],
        [2.0, 293.264099187, -8.57486580263, 0.0, -8.95702676863, 0.0, 0.346975198177, 0.035185767823, 58.5011235308],
        [3.0, 286.394275108, -8.10201927732, 0.0, -8.93709989981, 0.0, 0.756885669626, 0.0781949528651, -129.707703068],
        [4.0, 277.647062913, -7.49997274399, 0.0, -8.92719794996, 0.0, 1.29029942289, 0.136925783082, -316.029585646],
        [5.0, 267.566113032, -6.80614479418, 0.0, -8.92794110819, 0.0, 1.91164032397, 0.210155990039, -496.029509342],
    ],
    'ljtip4pcut': [
        [0.0, 300.0, 31.9333492905, -0.15863800775, 32.0919872983, 0.0, 3.24724730873e-25, 4.06051359821e-26, 956.404640512],
        [1.0, 297.825424878, -9.04747776331, -0.158594297178, -8.98627828035, 0.0, 0.0885136917657, 0.00888112244913, 232.272264968],
        [2.0, 293.262834304, -8.73341727054, -0.158551170387, -8.95702854198, 0.0, 0.346976752006, 0.0351856898268, 46.3398640525],
        [3.0, 286.392366138, -8.26052666076, -0.158508258673, -8.93710389149, 0.0, 0.756890799005, 0.0781946904026, -141.86603084],
        [4.0, 277.644478554, -7.65843387927, -0.15846520767, -8.92720505267, 0.0, 1.29031121762, 0.136925163456, -328.184696119],
        [5.0, 267.562809166, -6.96455663509, -0.158421683364, -8.92795222141, 0.0, 1.91166248373, 0.210154785962, -508.181152362],
    ],
    'tip4plong': [
        [0.0, 300.0, -0.382946710379, 0.0, 1504.66437039, -1505.0473171, 3.24724730873e-25, 4.06051359821e-26, 534.752678013],
        [1.0, 298.555470982, -0.286620199243, 0.0, 1504.45973653, -1504.84438979, 0.0890808578837, 0.00895220456817, 351.554007651],
        [2.0, 294.357522858, 0.00234892044296, 0.0, 1504.25500284, -1504.63900152, 0.350607580869, 0.0357400158977, 157.887875077],
        [3.0, 287.6522113, 0.463850871337, 0.0, 1504.04957013, -1504.43367013, 0.767936553911, 0.0800143186641, -43.211255083],
        [4.0, 278.833010092, 1.07080206321, 0.0, 1503.84608532, -1504.23099056, 1.31460011816, 0.141107184633, -247.457580552],
        [5.0, 268.415920808, 1.7876845101, 0.0, 1503.64723723, -1504.03358637, 1.95598563041, 0.218048015276, -450.183280415],
    ],
}

COLS = ("temp", "pe", "evdwl", "ecoul", "elong", "ebond", "eangle",
        "press")


def _run_case(text, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    path = tmp_path / "in.case"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return s.thermo_rows


@pytest.mark.parametrize("case", sorted(GOLDEN))
def test_tip4p_family_golden(case, tmp_path):
    write_water_data(str(tmp_path / "data.tip4p"))
    text = make_input(case).replace("read_data data.tip4p",
                                    f"read_data {tmp_path}/data.tip4p")
    rows = _run_case(text, tmp_path)
    got = {int(r["step"]): r for r in rows}
    for ref in GOLDEN[case]:
        step = int(ref[0])
        r = got[step]
        for name, g in zip(COLS, ref[1:]):
            o = float(r[name])
            # tip4plong: the two engines' pppm meshes straddle the exact
            # converged Ewald value symmetrically (exact -1505.1005 vs ref
            # -1505.0473 / ours -1505.1510 at step 0, both within the
            # estimated absolute force accuracy 0.012) — the Green's
            # function optimizations differ; tolerance covers the mesh
            # discretization band, not an algorithmic error.
            tol = dict(rel=2e-5, abs=2e-6)
            if case == "tip4plong":
                tol = (dict(rel=5e-2, abs=15.0) if name == "press"
                       else dict(rel=1e-3, abs=0.2))
            assert o == pytest.approx(g, **tol), (
                f"{case} step {step} {name}: ours {o} vs ref {g}")
