"""df32 (double-float32) primitives vs f64 ground truth (ops/df32.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lidp_tpu.ops import df32


def _rel(a, b):
    b = np.asarray(b)
    return np.max(np.abs(np.asarray(a) - b) / np.maximum(np.abs(b), 1e-300))


@pytest.fixture(scope="module")
def vals():
    rng = np.random.RandomState(0)
    # spread over many magnitudes incl. near-cancellation pairs
    x = np.concatenate([
        rng.uniform(0.1, 100.0, 4000),
        rng.uniform(1e-6, 1e-2, 2000),
        rng.uniform(1e2, 1e6, 2000),
    ])
    y = x * (1 + rng.uniform(-0.5, 0.5, x.shape))
    return jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)


def test_add_mul_sub(vals):
    x, y = vals
    dx, dy = df32.from_f64(x), df32.from_f64(y)
    assert _rel(df32.to_f64(df32.add(dx, dy)), x + y) < 1e-13
    assert _rel(df32.to_f64(df32.mul(dx, dy)), x * y) < 1e-13
    # catastrophic cancellation stays accurate RELATIVE TO THE OPERANDS
    z = df32.to_f64(df32.sub(dx, df32.from_f64(x * (1 + 1e-9))))
    ref = x - x * (1 + 1e-9)
    assert np.max(np.abs(np.asarray(z) - ref) / np.abs(x)) < 1e-13


def test_div_recip_rsqrt_sqrt(vals):
    x, y = vals
    dx, dy = df32.from_f64(x), df32.from_f64(y)
    assert _rel(df32.to_f64(df32.recip(dx)), 1.0 / x) < 1e-13
    assert _rel(df32.to_f64(df32.div(dx, dy)), x / y) < 1e-13
    assert _rel(df32.to_f64(df32.rsqrt(dx)), x ** -0.5) < 1e-13
    assert _rel(df32.to_f64(df32.sqrt(dx)), np.sqrt(x)) < 1e-13


def test_exp():
    x = jnp.asarray(np.linspace(-85.0, 3.0, 20001), jnp.float64)
    got = np.asarray(df32.to_f64(df32.exp(df32.from_f64(x))))
    ref = np.exp(np.asarray(x))
    xs = np.asarray(x)
    # full df32 precision where the value can matter downstream
    m = xs >= -30.0
    assert _rel(got[m], ref[m]) < 3e-13
    # deep tail (value < 1e-13): the lo limb lands in the subnormal range
    # and FTZ flushes it (documented contract) — hi stays f32-accurate,
    # and these values vanish against the O(1) terms they multiply into
    t = (xs < -30.0) & (xs >= -80.0)
    assert _rel(got[t], ref[t]) < 1e-7
    assert np.all(got[xs < -80.0] == 0.0)


def test_exp_composed_damping():
    """The Thole damping chain l2 = 1 - e^{-pr}(1+pr+p^2r^2/2+p^3r^3/6)
    — the exact expression the eind kernel needs at 1e-11 SCF."""
    rng = np.random.RandomState(2)
    r64 = jnp.asarray(rng.uniform(0.5, 40.0, 20000), jnp.float64)
    pd = 2.1304
    r = df32.from_f64(r64)
    # pd must enter as a df32 constant — a plain f32 pd would perturb the
    # exp argument by ~5e-8 (kernels pass damping params as hi/lo pairs)
    pr = df32.mul(r, df32.const(pd))
    pr2 = df32.sq(pr)
    pr3 = df32.mul(pr2, pr)
    t2 = df32.add(df32.add(df32.const(1.0), pr),
                  df32.add(df32.mul(df32.const(0.5), pr2),
                           df32.mul(df32.const(1.0 / 6.0), pr3)))
    l2 = df32.sub(df32.const(1.0), df32.mul(df32.exp(df32.neg(pr)), t2))
    ref = 1.0 - np.exp(-pd * np.asarray(r64)) * (
        1 + pd * np.asarray(r64) + 0.5 * (pd * np.asarray(r64)) ** 2
        + (pd * np.asarray(r64)) ** 3 / 6.0)
    assert _rel(df32.to_f64(l2), ref) < 1e-12
