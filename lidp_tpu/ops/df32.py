"""Double-float32 ("df32") arithmetic for f64-grade Pallas TPU kernels.

Mosaic cannot lower f64 on TPU, and XLA's own f64 emulation of the O(N^2)
polar panels runs them through HBM-bound column-chunk scans (~30 s per
panel pass at 100k atoms).  These error-free-transform primitives
(Dekker/Knuth; no FMA assumed — Veltkamp splitting) represent a value as
an unevaluated f32 pair (hi, lo) with |lo| <= ulp(hi)/2, giving ~49-bit
effective mantissas (~1e-14 relative) — enough for 1e-8-grade force
parity vs the pure-f64 path while running at native f32 VPU speed inside
VMEM-resident Pallas kernels.

Each value is a (hi, lo) tuple of same-shape f32 arrays.  All functions
are shape-polymorphic jnp expressions usable both inside Pallas kernels
and in plain XLA (the parity tests run them on CPU against f64).

Reference for the polar math these kernels reproduce:
pair_lj_cut_coul_long_polarization.cpp:327-380 (wolf field), :425-631
(dipole forces), :1158-1168 (T.mu matvec).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# python-float constants: weak scalars inline as literals in kernels
_SPLIT = 4097.0                       # 2^12 + 1 (Veltkamp split for f32)

# ln2 = LN2_HI + LN2_LO to ~2^-49
_LN2_HI = 0.6931471824645996          # float32(ln2)
_LN2_LO = -1.904654299957768e-09      # ln2 - float64(LN2_HI)
_INV_LN2 = 1.4426950408889634

# exp(r) Taylor coefficients 1/k! for k=0..13 (f32-rounded hi parts are
# enough: the series is evaluated in df32 with exact 1/k! split below)
_FACT_INV = [
    1.0, 1.0, 0.5, 0.16666666666666666, 0.041666666666666664,
    0.008333333333333333, 0.001388888888888889, 0.0001984126984126984,
    2.48015873015873e-05, 2.7557319223985893e-06, 2.755731922398589e-07,
    2.505210838544172e-08, 2.08767569878681e-09, 1.6059043836821613e-10,
]


def const(v):
    """df32 constant as PYTHON floats (f32-representable values): weak
    scalars inline as literals inside Pallas kernels — concrete jnp
    arrays would be rejected as captured constants."""
    import numpy as _np

    hi = float(_np.float32(v))
    lo = float(_np.float32(v - hi))
    return hi, lo


def from_f64(x):
    """Split an f64 array into a df32 pair (used OUTSIDE kernels)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(d):
    hi, lo = d
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _coerce(a, b):
    """Error-free transforms need BOTH operands as f32 arrays: a python
    float would run the transform in host f64 and produce wrong limbs.
    Python-float limbs (from const()) are materialized against the
    partner via zeros_like so Pallas sees no captured constants."""
    af, bf = isinstance(a, (int, float)), isinstance(b, (int, float))
    if af and not bf:
        a = jnp.zeros_like(b) + a      # python scalar inlines as literal
    elif bf and not af:
        b = jnp.zeros_like(a) + b
    elif af and bf:
        import numpy as _np
        a = _np.float32(a)
        b = _np.float32(b)
    return a, b


# XLA's HLO algebraic simplifier rewrites error-free-transform patterns
# like (a+b)-a -> b (measured: a jitted df32 sq() collapses to the naive
# algebra — the optimized HLO is literally hi=h*h+e, lo=e-(hi-h*h)).
# lax.optimization_barrier does NOT survive: this XLA version expands
# barriers before the simplifier runs.  An f32<->i32 bitcast round-trip
# IS opaque to FP algebra (and free on hardware: a register no-op on
# both CPU and the TPU VPU), so every EFT intermediate is laundered
# through one.  The Mosaic (real-TPU kernel) path does not run the HLO
# simplifier, but the bitcasts are harmless there.


# The Mosaic path needs no laundering (no HLO simplifier) — the Pallas
# wrappers set this False around kernel tracing on real TPU so the
# bitcasts don't obstruct Mosaic's own vectorizer.
LAUNDER = True


def _B(x):
    if (not LAUNDER or isinstance(x, (int, float))
            or getattr(x, "ndim", 0) == 0):
        # Mosaic's tpu.bitcast needs vectors; 0-d values (SMEM scalars,
        # python consts) pass through unlaundered — on the CPU/HLO path
        # scalar EFTs only appear in constant folding, which is exact
        return x
    return lax.bitcast_convert_type(
        lax.bitcast_convert_type(x, jnp.int32), jnp.float32)


def _two_sum(a, b):
    a, b = _coerce(a, b)
    s = _B(a + b)
    bb = _B(s - a)
    err = (a - _B(s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b|."""
    a, b = _coerce(a, b)
    s = _B(a + b)
    err = b - _B(s - a)
    return s, err


def _split(a):
    t = _B(_SPLIT * a)
    hi = _B(t - _B(t - a))
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    a, b = _coerce(a, b)
    p = _B(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = (_B(ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(x, y):
    xh, xl = x
    yh, yl = y
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _quick_two_sum(s, e)


def sub(x, y):
    yh, yl = y
    return add(x, (-yh, -yl))


def neg(x):
    return -x[0], -x[1]


def mul(x, y):
    xh, xl = x
    yh, yl = y
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def mul_f32(x, c):
    """df32 * plain f32 (exact two_prod on the hi part)."""
    xh, xl = x
    p, e = _two_prod(xh, c)
    e = e + xl * c
    return _quick_two_sum(p, e)


def sq(x):
    return mul(x, x)


def recip(x):
    """1/x via f32 seed + two df32 Newton steps."""
    xh, xl = x
    y = 1.0 / jnp.where(xh != 0, xh, 1.0)
    # Newton: y' = y*(2 - x*y), once in df32 is enough from an f32 seed
    one = (jnp.ones_like(xh), jnp.zeros_like(xh))
    yd = (y, jnp.zeros_like(y))
    for _ in range(2):
        r = sub(one, mul(x, yd))
        yd = add(yd, mul(yd, r))
    return yd


def div(x, y):
    return mul(x, recip(y))


def rsqrt(x):
    """1/sqrt(x) via hardware f32 seed + df32 Newton (x > 0)."""
    xh, xl = x
    y = lax.rsqrt(jnp.where(xh > 0, xh, 1.0))
    yd = (y, jnp.zeros_like(y))
    half = const(0.5)
    three_half = const(1.5)
    for _ in range(2):
        # y' = y*(1.5 - 0.5*x*y^2)
        t = mul(mul(half, x), sq(yd))
        yd = mul(yd, sub(three_half, t))
    return yd


def sqrt(x):
    """sqrt(x) = x * rsqrt(x), exact enough at df32 (x >= 0)."""
    xh, _ = x
    r = mul(x, rsqrt(x))
    return (jnp.where(xh > 0, r[0], 0.0), jnp.where(xh > 0, r[1], 0.0))


def exp(x):
    """exp(x) to ~1e-14 rel: range-reduce by ln2, df32 Taylor on the
    remainder.  Inputs below -80 return exactly 0 (the Thole/erfc factors
    there are < 1e-35 and vanish against the 1e-8 parity budget)."""
    xh, xl = x
    k = jnp.round(xh * _INV_LN2)
    # r = x - k*ln2 (df32; k*LN2_HI is NOT exact in general, use two_prod)
    r = add(x, neg(mul_f32((_LN2_HI, _LN2_LO), k)))
    # Taylor sum_{i} r^i/i! by Horner in df32
    acc = const(_FACT_INV[-1])
    for c in reversed(_FACT_INV[:-1]):
        acc = add(mul(acc, r), const(c))
    # EXACT 2^k via the exponent field (jnp.exp2 is a polynomial
    # approximation, ~7e-6 off even at integer inputs); the -80 cutoff
    # keeps k in the normal range [-116, 127]
    ki = jnp.clip(k.astype(jnp.int32), -126, 127)
    scale = lax.bitcast_convert_type(
        ((ki + 127) << 23).astype(jnp.int32), jnp.float32)
    hi = acc[0] * scale
    lo = acc[1] * scale
    dead = xh < -80.0
    return (jnp.where(dead, 0.0, hi), jnp.where(dead, 0.0, lo))
