"""The equal/atom-style variable expression engine (lidp_tpu/io/expr.py) —
semantics ported from the reference `Variable::evaluate`
(/root/reference/src/variable.cpp:1168-2260, operator table :105-113,
math functions :3272-3668, group functions :3669-3911, special functions
:3913-4400, Boolean evaluator :4629-4895).

Covers: operator precedence/associativity, math + time-family functions,
v_/c_/f_ references (with [i] indices), thermo keywords, atom-style
vectors, group functions, special vector functions incl. slope(f_ID) on a
fix vector series, $() immediate substitution, the if-command Boolean
evaluator, and an end-to-end reference-style script (DIFFUSE in.msd.2d
pattern) that the pre-round-4 regex evaluator could not run.
"""

import math

import numpy as np
import pytest


@pytest.fixture()
def script():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.one("units lj")
    return s


def ev(s, text):
    return s.evaluate_expr(text)


# ---------------- operators (variable.cpp:105-113, 2147) ----------------

CASES = [
    ("1+2*3", 7.0),                 # * binds tighter than +
    ("(1+2)*3", 9.0),
    ("2^3^2", 64.0),                # ALL binary ops left-assoc (:2147)
    ("-2^2", 4.0),                  # unary binds tighter than ^
    ("2^-1", 0.5),
    ("7%3", 1.0),
    ("1/4", 0.25),
    ("0^0", 1.0),
    ("10-3-2", 5.0),
    ("3>2", 1.0),
    ("2>=3", 0.0),
    ("1<2&&3>=3", 1.0),
    ("1==2||2==2", 1.0),
    ("1|^1", 0.0),                  # logical xor
    ("1|^0", 1.0),
    ("!0", 1.0),
    ("!3", 0.0),
    ("1<2==2<3", 1.0),              # comparisons chain left-assoc
    ("2*PI", 2 * math.pi),
    ("yes+no+on+off+true+false", 3.0),
]


@pytest.mark.parametrize("text,want", CASES)
def test_operators(script, text, want):
    assert ev(script, text) == pytest.approx(want, rel=1e-14)


MATH_CASES = [
    ("sqrt(2)", math.sqrt(2)),
    ("exp(1)", math.e),
    ("ln(exp(2))", 2.0),
    ("log(100)", 2.0),              # log is base-10 (:3306)
    ("abs(-3.5)", 3.5),
    ("sin(PI/2)", 1.0),
    ("cos(0)", 1.0),
    ("tan(PI/4)", 1.0),
    ("asin(1)", math.pi / 2),
    ("acos(-1)", math.pi),
    ("atan(1)", math.pi / 4),
    ("atan2(1,1)", math.pi / 4),
    ("ceil(2.3)", 3.0),
    ("floor(2.7)", 2.0),
    ("round(2.5)", 3.0),            # MYROUND half-away-from-floor (:52)
    ("round(-2.5)", -2.0),
    ("2^(1/6)*1.5", 2 ** (1 / 6) * 1.5),
]


@pytest.mark.parametrize("text,want", MATH_CASES)
def test_math_functions(script, text, want):
    assert ev(script, text) == pytest.approx(want, rel=1e-14)


def test_errors(script):
    from lidp_tpu.io.expr import ExprError

    for bad in ("1/0", "5%0", "sqrt(-1)", "ln(0)", "log(-2)",
                "1+", "(1+2", "nosuchfunc(3)", "1 2"):
        with pytest.raises((ExprError, ValueError)):
            ev(script, bad)


# ---------------- time-family functions (variable.cpp:3350-3530) --------

def test_stagger_logfreq_stride(script):
    s = script
    s.step = 0
    assert ev(s, "stagger(100,10)") == 10.0
    s.step = 10
    assert ev(s, "stagger(100,10)") == 100.0
    s.step = 100
    assert ev(s, "stagger(100,10)") == 110.0
    # logfreq(10,3,10): 10,20,30,100,200,300,1000,...
    for step, want in ((0, 10), (10, 20), (20, 30), (30, 100),
                       (100, 200), (300, 1000)):
        s.step = step
        assert ev(s, "logfreq(10,3,10)") == float(want)
    # stride(10,100,20): 10,30,50,70,90 then BIGINT past i2
    for step, want in ((0, 10), (10, 30), (30, 50), (85, 90)):
        s.step = step
        assert ev(s, "stride(10,100,20)") == float(want)
    s.step = 0


def test_ramp_requires_run(script):
    from lidp_tpu.io.expr import ExprError

    with pytest.raises(ExprError):
        ev(script, "ramp(0,10)")    # between runs: an error (:3355)
    script._in_run = True
    script._run_begin, script._run_end = 0, 100
    script.step = 25
    assert ev(script, "ramp(0.0,10.0)") == 2.5
    assert ev(script, "vdisplace(1.0,2.0)") == \
        pytest.approx(1.0 + 2.0 * 25 * script.dt)
    assert ev(script, "swiggle(0.0,1.0,100.0)") == \
        pytest.approx(math.sin(2 * math.pi / 100 * 25 * script.dt))


# ---------------- variable refs / substitution --------------------------

def test_variable_refs_lazy_and_nested(script):
    s = script
    s.one("variable a equal 3")
    s.one("variable b equal v_a^2+1")
    assert s.var_value("b") == 10.0
    s.one("variable a equal 4")     # redefinition replaces (:259)
    assert s.var_value("b") == 17.0  # b sees a's CURRENT value


def test_circular_dependency(script):
    s = script
    s.one("variable a equal v_b+1")
    s.one("variable b equal v_a+1")
    with pytest.raises(ValueError):
        s.var_value("a")


def test_dollar_brace_substitution(script):
    s = script
    s.one("variable sigma equal 1.5")
    s.one("variable rc equal 2^(1/6)*${sigma}")
    assert s.var_value("rc") == pytest.approx(2 ** (1 / 6) * 1.5, rel=1e-14)


def test_dollar_paren_immediate(script):
    s = script
    s.one("variable half equal $(1/2)")
    assert s.var_value("half") == 0.5
    # nested parens inside $()
    s.one('variable y equal $((1+2)*(3+4))')
    assert s.var_value("y") == 21.0


def test_variable_delete_and_is_defined(script):
    s = script
    s.one("variable a equal 3")
    assert ev(s, "is_defined(variable,a)") == 1.0
    s.one("variable a delete")
    assert ev(s, "is_defined(variable,a)") == 0.0


# ---------------- system-backed: thermo keywords, atom vectors ----------

SETUP = """
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 3 0 3 0 3
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
velocity all create 1.0 87287 loop geom
fix 1 all nve
"""


@pytest.fixture(scope="module")
def sys_script():
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    for line in SETUP.strip().splitlines():
        s.one(line)
    s.one("run 0")
    return s


def test_thermo_keywords(sys_script):
    s = sys_script
    assert ev(s, "atoms") == 108.0
    lx = float(s.box_hi[0] - s.box_lo[0])
    assert ev(s, "lx") == pytest.approx(lx)
    assert ev(s, "vol") == pytest.approx(lx ** 3)
    assert ev(s, "step") == 0.0
    assert ev(s, "dt") == pytest.approx(s.dt)
    # state keywords come from the live thermo row
    row = s._sim._thermo_row()
    assert ev(s, "temp") == pytest.approx(row["temp"], rel=1e-12)
    assert ev(s, "pe+ke") == pytest.approx(row["pe"] + row["ke"], rel=1e-12)
    assert ev(s, "sqrt(temp)*2") == pytest.approx(
        2 * math.sqrt(row["temp"]), rel=1e-12)


def test_group_functions(sys_script):
    s = sys_script
    assert ev(s, "count(all)") == 108.0
    assert ev(s, "mass(all)") == pytest.approx(108.0)
    # velocity create zeroes linear momentum: vcm ~ 0
    assert abs(ev(s, "vcm(all,x)")) < 1e-10
    x = np.asarray(s.x, float)
    m = s.mass_type[s.type].astype(float)
    assert ev(s, "xcm(all,x)") == pytest.approx(
        (m * x[:, 0]).sum() / m.sum(), rel=1e-12)
    assert ev(s, "bound(all,xmax)") == pytest.approx(x[:, 0].max())
    assert ev(s, "bound(all,ymin)") == pytest.approx(x[:, 1].min())
    xcm = (m[:, None] * x).sum(0) / m.sum()
    gyr = math.sqrt((m * ((x - xcm) ** 2).sum(1)).sum() / m.sum())
    assert ev(s, "gyration(all)") == pytest.approx(gyr, rel=1e-12)
    u = s.units
    v = np.asarray(s.v, float)
    ke = 0.5 * u.mvv2e * (m[:, None] * v * v).sum()
    assert ev(s, "ke(all)") == pytest.approx(ke, rel=1e-12)


def test_atom_style_variable(sys_script):
    s = sys_script
    arr = s.evaluate_atom_expr("x+2*y")
    x = np.asarray(s.x, float)
    np.testing.assert_allclose(arr, x[:, 0] + 2 * x[:, 1], rtol=1e-14)
    # per-atom indexed access in an equal-style formula: x[3] is atom id 3
    assert ev(s, "x[3]") == pytest.approx(x[2, 0])
    # gmask in an atom-style formula
    m = s.evaluate_atom_expr("gmask(all)")
    assert m.sum() == 108.0
    # constant expression broadcasts
    c = s.evaluate_atom_expr("3*4")
    assert c.shape == (108,) and (c == 12.0).all()


def test_atom_vector_in_equal_style_rejected(sys_script):
    with pytest.raises(ValueError):
        ev(sys_script, "x+1")


# ---------------- the if-command Boolean evaluator -----------------------

def test_boolean_evaluator():
    from lidp_tpu.io.expr import ExprError, evaluate_boolean as eb

    assert eb("1 < 2") == 1.0
    assert eb("(1<2)&&(3>4)") == 0.0
    assert eb("!(1==2)") == 1.0
    assert eb("abc == abc") == 1.0       # bare-string compare (:4629)
    assert eb("abc != abd") == 1.0
    assert eb("-1.5e2 == -150") == 1.0
    with pytest.raises(ExprError):
        eb("abc < abd")                  # strings only for ==/!=


def test_if_elif_else(script):
    s = script
    s.one("variable x equal 7")
    s.one('if "${x} > 10" then "variable r equal 1" '
          'elif "${x} > 5" "variable r equal 2" else "variable r equal 3"')
    assert s.var_value("r") == 2.0
    s.one('if "${x} == 7" then "variable q equal 1" "variable p equal 2"')
    assert s.var_value("q") == 1.0 and s.var_value("p") == 2.0


# ---------------- end-to-end: the DIFFUSE in.msd.2d pattern --------------

def test_msd_slope_script(tmp_path):
    """The reference workflow the old regex evaluator could not run
    (examples/DIFFUSE/in.msd.2d): c_ID[i] refs, step*dt arithmetic,
    slope() over a fix vector series, v_ thermo columns."""
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    for line in """
units lj
dimension 2
atom_style atomic
variable rho equal 0.6
variable rc equal 2.5
lattice sq2 ${rho}
region simbox block 0 4 0 4 -0.1 0.1
create_box 1 simbox
create_atoms 1 box
mass * 1.0
pair_style lj/cut ${rc}
pair_coeff * * 1 1
velocity all create 1.0 97287
fix 1 all nve
fix 3 all enforce2d
compute msd all msd
variable twopoint equal c_msd[4]/4/(step*dt+1.0e-6)
fix 9 all vector 10 c_msd[4]
variable fitslope equal slope(f_9)/4/(10*dt)
thermo_style custom step temp c_msd[4] v_twopoint v_fitslope
thermo 20
run 40
""".strip().splitlines():
        s.one(line)
    row = s._sim._thermo_row()
    msd4 = row["c_msd[4]"]
    assert msd4 > 0.0
    assert s.var_value("twopoint") == pytest.approx(
        msd4 / 4 / (40 * s.dt + 1e-6), rel=1e-10)
    # slope over the 5 sampled points (steps 0,10,20,30,40)
    series = np.asarray(s.fixes["9"]._series, float)
    assert len(series) == 5
    xs = np.arange(5.0)
    lsq = np.polyfit(xs, series, 1)[0]
    assert s.var_value("fitslope") == pytest.approx(
        lsq / 4 / (10 * s.dt), rel=1e-10)


def test_equal_variable_in_command_args(script):
    """variable-driven pair_coeff / region arguments end-to-end."""
    s = script
    s.one("atom_style atomic")
    s.one("variable L equal 2+1")
    s.one("lattice fcc 0.8442")
    s.one("region box block 0 ${L} 0 $L 0 $(6/2)")
    s.one("create_box 1 box")
    s.one("create_atoms 1 box")
    assert len(s.x) == 108
