"""Round-3 pair-style breadth goldens: lj96/cut, lj/smooth,
lj/smooth/linear, ufm, beck, zbl, coul/dsf, coul/wolf,
lj/cut/coul/dsf|wolf, born/coul/dsf|wolf.

GOLDEN rows were minted by scripts/gen_breadth_goldens.py running the
REBUILT 16Mar18 reference (/tmp/lmpsrc/lmp_serial) on the identical
64-atom charge-checkerboard data file this test regenerates (same seed).
Columns: step temp pe evdwl ecoul press.

Three genuine 2018-reference defects were found while minting these
goldens (each golden restricted to a configuration where the reference is
well-defined; our implementation uses the modern fixed semantics):

1. PairLJCutCoulWolf::settings never reads arg[2]
   (pair_lj_cut_coul_wolf.cpp:215-221) — the 3-arg form leaves cut_coul
   uninitialized (~1e75 ecoul).  Golden uses the 2-arg form.
2. PairLJCutCoulWolf::init_one never symmetrizes cut_ljsq[j][i]
   (:285-312) — multi-type runs silently drop (2,1) LJ pairs.  Golden
   uses a single-type box (data.breadth1).
3. pair_ufm.cpp sets scale[i][j] = 1.0 only inside coeff() (:214) —
   mixed pairs' FORCES are multiplied by uninitialized memory while the
   energy is unaffected (proved by finite-differencing the reference's
   own PE, which matches our forces, not its force dump).  Golden gives
   explicit 1-2 coeffs at the geometric-mix values.
"""

import numpy as np
import pytest

from scripts.gen_breadth_goldens import CASES, make_input, write_data

GOLDEN = {
    'lj96': [
        [0.0, 1.0, -1.10851734218, -1.10851734218, 0.0, -0.222544426775],
        [1.0, 1.00025254968, -1.10889036676, -1.10889036676, 0.0, -0.222358850888],
        [2.0, 1.00063315375, -1.10973492161, -1.10973492161, 0.0, -0.222220437058],
        [3.0, 1.00114668601, -1.11133886819, -1.11133886819, 0.0, -0.222288708271],
        [4.0, 1.00179065953, -1.11256910708, -1.11256910708, 0.0, -0.22191608249],
        [5.0, 1.00255901587, -1.11426632229, -1.11426632229, 0.0, -0.221578175859],
    ],
    'ljsmooth': [
        [0.0, 1.0, -1.43481747764, -1.43481747764, 0.0, -0.445534732454],
        [1.0, 1.00056237752, -1.43564794263, -1.43564794263, 0.0, -0.44537992762],
        [2.0, 1.0014390293, -1.43747995562, -1.43747995562, 0.0, -0.44510099716],
        [3.0, 1.00262872047, -1.44084910233, -1.44084910233, 0.0, -0.444693170175],
        [4.0, 1.00412945481, -1.44360282863, -1.44360282863, 0.0, -0.444149537204],
        [5.0, 1.00593840786, -1.44734917959, -1.44734917959, 0.0, -0.443461397888],
    ],
    'ljsmoothlin': [
        [0.0, 1.0, -1.00832341342, -1.00832341342, 0.0, -0.381421060745],
        [1.0, 1.00054645501, -1.00913035163, -1.00913035163, 0.0, -0.381329855936],
        [2.0, 1.0013926758, -1.01037993666, -1.01037993666, 0.0, -0.381167602454],
        [3.0, 1.00253790504, -1.01207111943, -1.01207111943, 0.0, -0.380934123546],
        [4.0, 1.00398077791, -1.01420192583, -1.01420192583, 0.0, -0.380620183981],
        [5.0, 1.0057191701, -1.01676919386, -1.01676919386, 0.0, -0.380213440376],
    ],
    'ufm': [
        [0.0, 1.0, 2.33083795588, 2.33083795588, 0.0, 1.17903275219],
        [1.0, 0.999739349277, 2.3312228395, 2.3312228395, 0.0, 1.17897075068],
        [2.0, 0.999353737117, 2.3324563221, 2.3324563221, 0.0, 1.1793590721],
        [3.0, 0.998823608116, 2.33522597971, 2.33522597971, 0.0, 1.18069901161],
        [4.0, 0.998150041348, 2.33687421207, 2.33687421207, 0.0, 1.18101429841],
        [5.0, 0.997345479155, 2.33872206343, 2.33872206343, 0.0, 1.18129276843],
    ],
    'beck': [
        [0.0, 1.0, -0.343736969178, -0.343736969178, 0.0, 0.128161197431],
        [1.0, 1.00008191671, -0.343857900226, -0.343857900226, 0.0, 0.128165404183],
        [2.0, 1.00020638906, -0.344118403892, -0.344118403892, 0.0, 0.128125588518],
        [3.0, 1.00037559406, -0.344597956316, -0.344597956316, 0.0, 0.127994288834],
        [4.0, 1.00058992857, -0.344990149319, -0.344990149319, 0.0, 0.127954175527],
        [5.0, 1.00084910258, -0.345525518419, -0.345525518419, 0.0, 0.127866306379],
    ],
    'zbl': [
        [0.0, 10.0, 2709.89288474, 2709.89288474, 0.0, 43695226.344],
        [1.0, 10.0310875151, 2709.89263144, 2709.89263144, 0.0, 43695236.3428],
        [2.0, 12.1154176204, 2709.87565607, 2709.87565607, 0.0, 43695226.2252],
        [3.0, 16.2493455875, 2709.84198832, 2709.84198832, 0.0, 43695196.0379],
        [4.0, 22.4258690912, 2709.79168522, 2709.79168522, 0.0, 43695145.8732],
        [5.0, 30.6346419344, 2709.72483103, 2709.72483103, 0.0, 43695075.8683],
    ],
    'couldsf': [
        [0.0, 1.0, -0.620841323336, 0.0, -0.620841323336, 0.236791717932],
        [1.0, 1.00003030179, -0.620886066396, 0.0, -0.620886066396, 0.236787556325],
        [2.0, 1.00005610758, -0.620924121983, 0.0, -0.620924121983, 0.236781021482],
        [3.0, 1.00007760095, -0.620955812944, 0.0, -0.620955812944, 0.236767285708],
        [4.0, 1.00009499973, -0.620981489547, 0.0, -0.620981489547, 0.236746971323],
        [5.0, 1.00010849638, -0.621001403623, 0.0, -0.621001403623, 0.236721341802],
    ],
    'coulwolf': [
        [0.0, 1.0, -0.58980503807, 0.0, -0.58980503807, 0.236791713798],
        [1.0, 1.00003030183, -0.58987561584, 0.0, -0.58987561584, 0.236787552196],
        [2.0, 1.00005610771, -0.589950300881, 0.0, -0.589950300881, 0.23678101731],
        [3.0, 1.0000776012, -0.590040283627, 0.0, -0.590040283627, 0.23676728139],
        [4.0, 1.00009500013, -0.590144463389, 0.0, -0.590144463389, 0.236746966983],
        [5.0, 1.00010849697, -0.590260220134, 0.0, -0.590260220134, 0.23672133745],
    ],
    'ljdsf': [
        [0.0, 1.0, -2.04384109409, -1.42299977076, -0.620841323336, -0.511933877009],
        [1.0, 1.00059594247, -2.04417782702, -1.42329164924, -0.620886177774, -0.511537895069],
        [2.0, 1.00151170179, -2.04521311528, -1.42428851739, -0.620924597892, -0.511225165566],
        [3.0, 1.00275918595, -2.04255929116, -1.42160231978, -0.620956971374, -0.508429943744],
        [4.0, 1.00434913691, -2.04302593566, -1.42204219348, -0.620983742187, -0.507120821117],
        [5.0, 1.00627069508, -2.04060334217, -1.41959805883, -0.621005283347, -0.503775831543],
    ],
    'ljwolf': [
        [0.0, 1.0, -1.82098700494, -1.23118196687, -0.58980503807, -0.4332919483],
        [1.0, 1.00067804433, -1.82201820665, -1.23213224166, -0.589885964991, -0.433373276841],
        [2.0, 1.00171729194, -1.82385416598, -1.23387942005, -0.589974745929, -0.433640656949],
        [3.0, 1.00312586495, -1.82677958526, -1.23669100099, -0.590088584274, -0.434251808558],
        [4.0, 1.00490464067, -1.82975448138, -1.23953989481, -0.590214586574, -0.434587387957],
        [5.0, 1.00705227612, -1.83355052668, -1.24319416314, -0.59035636354, -0.4350933882],
    ],
    'hybover': [
        [0.0, 1.0, -2.06485785659, -1.44401653326, -0.620841323336, -0.522496943896],
        [1.0, 1.00058016947, -2.0657145791, -1.44482839713, -0.620886181974, -0.522403537259],
        [2.0, 1.00144843413, -2.06730391051, -1.44637929738, -0.620924613132, -0.522422213498],
        [3.0, 1.00261133297, -2.06994087139, -1.44898386691, -0.620957004479, -0.522735640256],
        [4.0, 1.00406728088, -2.07239440899, -1.45141060926, -0.620983799725, -0.522610105358],
        [5.0, 1.0058107228, -2.07558079595, -1.45457542217, -0.621005373782, -0.522575958342],
    ],
    'hybrid': [
        [0.0, 1.0, -4.10034071088, -4.10034071088, 0.0, -1.15570855624],
        [1.0, 1.00074417167, -4.09328778374, -4.09328778374, 0.0, -1.15207997336],
        [2.0, 1.0018520244, -4.10336055223, -4.10336055223, 0.0, -1.15550526127],
        [3.0, 1.00325827677, -4.10229855191, -4.10229855191, 0.0, -1.15394295606],
        [4.0, 1.00504132107, -4.10930683543, -4.10930683543, 0.0, -1.15538732096],
        [5.0, 1.00720041639, -4.10499288224, -4.10499288224, 0.0, -1.1516574505],
    ],
    'hybmix': [
        [0.0, 1.0, -2.56277252437, -2.56277252437, 0.0, -0.0316272799458],
        [1.0, 0.999616493769, -2.56220626023, -2.56220626023, 0.0, -0.0315542343822],
        [2.0, 0.999032163694, -2.56134343918, -2.56134343918, 0.0, -0.0314735784458],
        [3.0, 0.998247300826, -2.5601844905, -2.5601844905, 0.0, -0.0313857204259],
        [4.0, 0.997262474439, -2.55873025419, -2.55873025419, 0.0, -0.0312912119941],
        [5.0, 0.996078536935, -2.55698198826, -2.55698198826, 0.0, -0.0311907462789],
    ],
    'borndsf': [
        [0.0, 1.0, 0.592441002597, 1.21328236779, -0.620841365197, 0.640916643464],
        [1.0, 0.999927797783, 0.591897339743, 1.21278343735, -0.620886097603, 0.640490981723],
        [2.0, 0.999781318144, 0.592073855842, 1.21299797277, -0.620924116932, 0.640212652551],
        [3.0, 0.999546232291, 0.586015273337, 1.20697101153, -0.620955738189, 0.637062415446],
        [4.0, 0.999209328469, 0.583920481214, 1.20490177928, -0.620981298062, 0.63564140403],
        [5.0, 0.998780876364, 0.576888879842, 1.19788991694, -0.621001037094, 0.631896069717],
    ],
    'bornwolf': [
        [0.0, 1.0, 0.623477329724, 1.21328236779, -0.58980503807, 0.640916643464],
        [1.0, 0.999927797783, 0.622907835414, 1.21278343735, -0.589875601933, 0.640490981723],
        [2.0, 0.999781318144, 0.623047749934, 1.21299797277, -0.589950222839, 0.640212652551],
        [3.0, 0.999546232291, 0.616930944398, 1.20697101153, -0.590040067128, 0.637062415446],
        [4.0, 0.999209328469, 0.614757749521, 1.20490177928, -0.590144029755, 0.63564140403],
        [5.0, 0.998780876364, 0.607630524401, 1.19788991694, -0.590259392535, 0.631896069717],
    ],
    'bucklong': [
        [0.0, 1.0, 28.1079554395, 28.9281580226, -0.0226758552563, 9.05390201464],
        [1.0, 0.997648721184, 28.1114282069, 28.9317318275, -0.0227117412837, 9.05335678808],
        [2.0, 0.994331680531, 28.1312588766, 28.9516942874, -0.0227653950795, 9.05916099863],
        [3.0, 0.989803595978, 28.1826615519, 29.0032589311, -0.0228368025403, 9.07805014336],
        [4.0, 0.984105194842, 28.2058644612, 29.026652203, -0.0229249955975, 9.08322204009],
        [5.0, 0.97743473188, 28.2305594281, 29.0515649715, -0.0230299363399, 9.08809008563],
    ],
}


def _run_case(text, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    path = tmp_path / "in.case"
    path.write_text(text)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    return s.thermo_rows


@pytest.mark.parametrize("case", sorted(GOLDEN))
def test_pair_breadth_golden(case, tmp_path):
    write_data(str(tmp_path / "data.breadth"))
    write_data(str(tmp_path / "data.breadth1"), one_type=True)
    # (also rewrites "data.breadth1" -> "<tmp>/data.breadth" + "1")
    text = make_input(case).replace("read_data data.breadth",
                                    f"read_data {tmp_path}/data.breadth")
    rows = _run_case(text, tmp_path)
    got = {int(r["step"]): r for r in rows}
    for ref in GOLDEN[case]:
        step = int(ref[0])
        r = got[step]
        ours = [r["temp"], r["pe"], r["evdwl"], r["ecoul"], r["press"]]
        for name, o, g in zip(("temp", "pe", "evdwl", "ecoul", "press"),
                              ours, ref[1:]):
            assert o == pytest.approx(g, rel=2e-6, abs=5e-8), (
                f"{case} step {step} {name}: ours {o} vs ref {g}")


def test_pair_zero(tmp_path):
    """pair_style zero: neighbor-only style, no forces or energy
    (pair_zero.cpp)."""
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style zero 2.5
pair_coeff * *
velocity all create 1.0 87287 loop geom
fix 1 all nve
thermo 1
thermo_style custom step temp pe evdwl ecoul press
run 3
""", tmp_path)
    for r in rows:
        assert float(r["pe"]) == 0.0
        assert float(r["evdwl"]) == 0.0
    # velocities untouched by forces: temp constant
    assert float(rows[-1]["temp"]) == pytest.approx(1.0, rel=1e-12)


@pytest.mark.parametrize("kind", ["dsf", "wolf"])
def test_dsf_wolf_cells_vs_dense(kind):
    """The cell-stencil kernel's dsf/wolf coul branch must agree with the
    dense path (the 64-atom goldens above only exercise dense)."""
    import jax.numpy as jnp

    from lidp_tpu.box import Box
    from lidp_tpu.ops.cells import CellConfig, build_cells, cell_pair_forces
    from lidp_tpu.ops.pair import dense_pair_forces, make_pair_params

    rng = np.random.RandomState(7)
    L = 9.0
    g = (np.stack(np.meshgrid(*[np.arange(6)] * 3, indexing="ij"), -1)
         .reshape(-1, 3) + 0.5) * (L / 6)
    n = len(g)   # 216 on-lattice atoms, jittered (no overlaps)
    x = g + rng.uniform(-0.25, 0.25, (n, 3))
    q = jnp.asarray(rng.choice([-1.0, 1.0], n))
    mk = lambda v: np.full((2, 2), v)   # noqa: E731
    p = make_pair_params(mk(1.0), mk(1.0), mk(2.2), cut_coul=2.5,
                         coul=True, g_ewald=0.5, coul_kind=kind,
                         dtype=jnp.float64)
    box = Box.create(np.zeros(3), np.full(3, L))
    mask = jnp.ones(n, bool)
    ty = jnp.ones(n, jnp.int32)
    fd, ev_d, ec_d, vir_d = dense_pair_forces(
        jnp.asarray(x), q, ty, 0, mask, box, p)
    cfg = CellConfig.for_box([L] * 3, 2.8, density=n / L**3)
    cells = build_cells(jnp.asarray(x), mask, box, cfg)
    fc, ev_c, ec_c, vir_c = cell_pair_forces(
        jnp.asarray(x), q, ty, mask, cells, box, p, coul=True)
    assert abs(float(ev_d) - float(ev_c)) < 1e-9
    assert abs(float(ec_d) - float(ec_c)) < 1e-9
    assert np.abs(np.asarray(fd) - np.asarray(fc)).max() < 1e-9
    assert np.abs(np.asarray(vir_d) - np.asarray(vir_c)).max() < 1e-8


# CHARMM / GROMACS switched-coulomb family goldens (minted like the rest;
# 4-arg coul inner/outer forms).  Columns: (temp, pe, evdwl, ecoul, press)
SWITCH_GOLDEN = {
    "lj/charmm/coul/charmm 1.8 2.2 1.9 2.4": {
        0: (1.0, -1.4049718834, -1.16764098581, -0.237330897585,
            -0.496527897347),
        5: (1.00770426374, -1.42791013497, -1.18115894998,
            -0.246751184988, -0.495670297183),
    },
    "lj/charmm/coul/charmm/implicit 1.8 2.2 1.9 2.4": {
        0: (1.0, -1.66776231135, -1.16764098581, -0.50012132554,
            0.209576781001),
        5: (1.01137285491, -1.68456253001, -1.1812279611,
            -0.503334568907, 0.19618799415),
    },
    "lj/gromacs/coul/gromacs 1.8 2.2 1.9 2.4": {
        0: (1.0, -1.4347075522, -0.916436204357, -0.518271347841,
            -0.335702725285),
        5: (1.00467091622, -1.4416053508, -0.925433889776,
            -0.516171461025, -0.339132796947),
    },
}


@pytest.mark.parametrize("style", sorted(SWITCH_GOLDEN))
def test_switched_coul_golden(style, tmp_path):
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style {style}
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 5
run 5
""", tmp_path)
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, ev, ec, pr) in SWITCH_GOLDEN[style].items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6), (style, step)
        assert r["evdwl"] == pytest.approx(ev, rel=2e-6), (style, step)
        assert r["ecoul"] == pytest.approx(ec, rel=2e-6), (style, step)
        assert r["pe"] == pytest.approx(pe, rel=2e-6), (style, step)
        assert r["press"] == pytest.approx(pr, rel=2e-5), (style, step)


@pytest.mark.slow
def test_born_coul_msm_golden(tmp_path):
    """born/coul/msm + kspace msm (cutoff/adjust no) vs the reference."""
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style born/coul/msm 2.2 2.5
pair_coeff 1 1 1.0 0.4 1.0 1.0 0.5
pair_coeff 1 2 0.9 0.45 1.05 1.0 0.5
pair_coeff 2 2 0.8 0.5 1.1 1.0 0.5
kspace_style msm 1.0e-4
kspace_modify cutoff/adjust no
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 5
run 5
""", tmp_path)
    ref = {0: (1.0, 0.630733487567, 1.21328236779, -0.0469839215897,
               -0.535564958637, 0.638255904458),
           5: (0.998847410872, 0.615083017909, 1.19789009871,
               -0.0476639127873, -0.535143168018, 0.629331053972)}
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, ev, ec, el, pr) in ref.items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6)
        assert r["evdwl"] == pytest.approx(ev, rel=2e-6)
        assert r["ecoul"] == pytest.approx(ec, rel=2e-5)
        assert r["elong"] == pytest.approx(el, rel=2e-5)
        assert r["pe"] == pytest.approx(pe, rel=2e-5)
        assert r["press"] == pytest.approx(pr, rel=2e-3)


def test_lj_cubic_golden(tmp_path):
    """lj/cubic (cutoffs derived from sigma) vs the rebuilt reference.
    Single-type box: pair_lj_cubic.cpp's compute reads sigma/epsilon
    [itype][jtype] directly but init_one never symmetrizes them, so any
    multi-type run multiplies by uninitialized memory (defect #4; our
    implementation mixes and symmetrizes)."""
    write_data(str(tmp_path / "data.breadth1"), one_type=True)
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth1
pair_style lj/cubic
pair_coeff 1 1 1.0 0.9
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 5
run 5
""", tmp_path)
    ref = {0: (1.0, -0.0930752815007, -0.00642528900636),
           5: (1.01597648147, -0.116698313029, -0.00423792546084)}
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, pr) in ref.items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6)
        assert r["pe"] == pytest.approx(pe, rel=2e-6)
        assert r["press"] == pytest.approx(pr, rel=2e-5, abs=1e-8)


def test_dpd_conservative_golden(tmp_path):
    """pair dpd with gamma = 0: the stochastic and drag terms vanish, so
    the trajectory is deterministic and must match the reference exactly
    (the RNG design difference — see ops/dpd.py — never enters)."""
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style dpd 1.0 2.0 48291
pair_coeff 1 1 25.0 0.0
pair_coeff 1 2 30.0 0.0
pair_coeff 2 2 20.0 0.0
comm_modify vel yes
velocity all create 1.0 87287 loop geom
timestep 0.02
fix 1 all nve
thermo 4
run 8
""", tmp_path)
    # steps 0..8 match the reference to every printed digit; at step 9 the
    # reference's stale neighbor list (delay 10 blocks the rebuild its own
    # skin/2 check requests) starts missing pairs that entered the cutoff,
    # while the dense path here is exact every step.
    ref = {0: (1.0, 5.63921149449, 3.61242796562),
           4: (0.91918324406, 5.75784340296, 3.60994606899),
           8: (0.714693089437, 6.06132641206, 3.6271520407)}
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, pr) in ref.items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6), step
        assert r["pe"] == pytest.approx(pe, rel=2e-6), step
        assert r["press"] == pytest.approx(pr, rel=2e-5), step


def test_dpd_thermostat_statistics(tmp_path):
    """Full DPD (gamma > 0): fluctuation-dissipation drives T toward the
    setpoint from a cold start, and the symmetrized noise conserves
    momentum exactly."""
    write_data(str(tmp_path / "data.breadth"))
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    p = tmp_path / "in.dpdt"
    p.write_text(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style dpd 1.0 2.0 48291
pair_coeff * * 25.0 4.5
comm_modify vel yes
timestep 0.02
fix 1 all nve
thermo 50
run 300
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(p))
    temps = [r["temp"] for r in s.thermo_rows]
    assert temps[0] == 0.0
    # T should rise from 0 toward the setpoint 1.0
    assert 0.5 < temps[-1] < 1.6, temps
    v = np.asarray(s._sim.sys.v)[:64]
    m = np.where(np.asarray(s.type) == 1, 1.0, 1.5)[:, None]
    ptot = np.abs((m * v).sum(axis=0)).max()
    assert ptot < 1e-9, ptot   # third law holds to the bit


def test_dpd_tstat_no_conservative(tmp_path):
    """dpd/tstat: drag+noise only (pair_dpd_tstat.cpp) — evdwl stays 0,
    momentum conserved, kinetic energy relaxes toward the target."""
    write_data(str(tmp_path / "data.breadth"))
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    p = tmp_path / "in.tst"
    p.write_text(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style dpd/tstat 1.0 1.0 2.0 937123
pair_coeff * * 4.5
comm_modify vel yes
velocity all create 3.0 87287 loop geom
timestep 0.02
fix 1 all nve
thermo 100
run 400
""")
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(p))
    rows = s.thermo_rows
    assert all(float(r["evdwl"]) == 0.0 for r in rows)
    # cooling from T=3 toward 1
    assert float(rows[-1]["temp"]) < 2.0
    v = np.asarray(s._sim.sys.v)[:64]
    m = np.where(np.asarray(s.type) == 1, 1.0, 1.5)[:, None]
    assert np.abs((m * v).sum(axis=0)).max() < 1e-9


def test_charmmfsw_fsh_golden(tmp_path):
    """lj/charmmfsw/coul/charmmfsh: CHARMM force-switched LJ + force-
    shifted coulomb vs the rebuilt reference."""
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/charmmfsw/coul/charmmfsh 1.8 2.2 2.4
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 5
run 5
""", tmp_path)
    ref = {0: (1.0, -1.14747471387, -0.904567057545, -0.242907656322,
               -0.366306512177),
           5: (1.00580226085, -1.15619587224, -0.913223875741,
               -0.242971996502, -0.368041811185)}
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, ev, ec, pr) in ref.items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6), step
        assert r["evdwl"] == pytest.approx(ev, rel=2e-6), step
        assert r["ecoul"] == pytest.approx(ec, rel=2e-6), step
        assert r["pe"] == pytest.approx(pe, rel=2e-6), step
        assert r["press"] == pytest.approx(pr, rel=2e-5), step


def test_charmmfsw_coul_long_golden(tmp_path):
    """lj/charmmfsw/coul/long + ewald vs the rebuilt reference."""
    write_data(str(tmp_path / "data.breadth"))
    rows = _run_case(f"""
units lj
atom_style charge
read_data {tmp_path}/data.breadth
pair_style lj/charmmfsw/coul/long 1.8 2.2 2.4
pair_coeff 1 1 1.0 1.0
pair_coeff 2 2 0.8 1.1
kspace_style ewald 1.0e-6
velocity all create 1.0 87287 loop geom
timestep 0.005
fix 1 all nve
thermo 5
run 5
""", tmp_path)
    ref = {0: (1.0, -1.48711586758, -0.904567057545, -0.00246372882613,
               -0.580085081204, -0.364550075037),
           5: (1.00593867861, -1.49603843883, -0.913225786853,
               -0.00256795946468, -0.58024469251, -0.366236953668)}
    got = {int(r["step"]): r for r in rows}
    for step, (temp, pe, ev, ec, el, pr) in ref.items():
        r = got[step]
        assert r["temp"] == pytest.approx(temp, rel=2e-6), step
        assert r["evdwl"] == pytest.approx(ev, rel=2e-6), step
        # ecoul is tiny (real-space erfc tail): absolute tolerance; the
        # reference's 12-bit erfc table costs it ~1e-5 relative anyway
        assert r["ecoul"] == pytest.approx(ec, rel=2e-4, abs=1e-7), step
        assert r["elong"] == pytest.approx(el, rel=2e-5), step
        assert r["pe"] == pytest.approx(pe, rel=2e-6), step
        assert r["press"] == pytest.approx(pr, rel=2e-4), step


def test_lj_sf_alias(tmp_path):
    """pair_style lj/sf is a registration alias for PairLJSmoothLinear
    (pair_lj_smooth_linear.h:17 `PairStyle(lj/sf,...)`): identical rows."""
    write_data(str(tmp_path / "data.breadth"))
    text = make_input("ljsmoothlin").replace(
        "read_data data.breadth", f"read_data {tmp_path}/data.breadth")
    rows_canon = _run_case(text, tmp_path)
    rows_alias = _run_case(
        text.replace("pair_style lj/smooth/linear", "pair_style lj/sf"),
        tmp_path)
    for a, b in zip(rows_canon, rows_alias):
        for k in ("temp", "pe", "evdwl", "press"):
            assert float(a[k]) == float(b[k])
