"""f64-grade df32 Pallas panels (ops/pallas_panel.py eind_panel_df).

Three verification tiers:

1. The df32 EXPRESSION CHAIN (exactly the kernel math) evaluated eagerly
   on CPU against f64 — eager op-by-op execution never runs the HLO
   algebraic simplifier, so this proves the math at ~1e-13.
2. The kernel itself on CPU interpret at f32-grade tolerance only: XLA
   CPU's algebraic simplifier rewrites error-free transforms inside any
   jitted program (it literally reduces df32 sq() to the naive algebra;
   --xla_disable_hlo_passes=algsimp segfaults this CPU backend), so the
   interpret path can only check plumbing (masks, packing, reduction
   structure), not the extended precision.
3. On a real TPU the kernel holds ~5e-14 (measured 2026-08: Mosaic
   lowers jaxpr directly, never running the HLO simplifier) — asserted
   by the tpu-gated test below and exercised by the 100k/1e-11 bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidp_tpu.ops import df32 as dd


def _ref_eind(x, alpha, mu, L, pd, n):
    d = x[:n, None, :] - x[None, :n, :]
    d -= L * np.round(d / L)
    rsq = (d * d).sum(-1)
    pm = (~np.eye(n, dtype=bool)) & (alpha[:n][None, :] != 0) \
        & (alpha[:n][:, None] != 0)
    rsq = np.where(pm, rsq, 1.0)
    r = np.sqrt(rsq)
    t1 = np.exp(-pd * r)
    t2 = 1 + pd * r + 0.5 * pd * pd * rsq
    l1 = 1 - t1 * t2
    l2 = 1 - t1 * (t2 + pd ** 3 * rsq * r / 6)
    r3 = 1 / (rsq * r)
    r5 = r3 / rsq
    mdotd = (mu[None, :n, :] * d).sum(-1)
    a1 = np.where(pm, -3 * l2 * r5 * mdotd, 0.0)
    a2 = np.where(pm, l1 * r3, 0.0)
    return -(a1[..., None] * d + a2[..., None] * mu[None, :n, :]).sum(1)


def _case(npad=512, n=300):
    rng = np.random.RandomState(3)
    L = np.array([20.0, 22.0, 24.0])
    x = np.zeros((npad, 3))
    x[:n] = rng.uniform(0, 20, (n, 3))
    alpha = np.zeros(npad)
    alpha[:n] = rng.uniform(0.5, 2.0, n)
    alpha[:20] = 0.0
    mu = np.zeros((npad, 3))
    mu[:n] = rng.normal(0, 1e-2, (n, 3))
    mu[alpha == 0.0] = 0.0
    return x, alpha, mu, L, 2.1304


def test_df_math_chain_eager():
    """The kernel's exact df32 expression chain, eager, vs f64."""
    x, alpha, mu, L, pd = _case()
    n = 512
    xh, xl = dd.from_f64(jnp.asarray(x))
    d = []
    for k in range(3):
        dk = dd.add((xh[:, k:k + 1], xl[:, k:k + 1]),
                    (-xh[:, k][None, :], -xl[:, k][None, :]))
        nn = jnp.round(dk[0] * np.float32(1.0 / L[k]))
        Lc = (np.float32(L[k]),
              np.float32(L[k] - np.float64(np.float32(L[k]))))
        d.append(dd.sub(dk, dd.mul_f32(Lc, nn)))
    rsq = dd.add(dd.add(dd.sq(d[0]), dd.sq(d[1])), dd.sq(d[2]))
    pm = (~np.eye(n, dtype=bool)) & (alpha[None, :] != 0) \
        & (alpha[:, None] != 0)
    rsq = (jnp.where(pm, rsq[0], 1.0), jnp.where(pm, rsq[1], 0.0))
    rinv = dd.rsqrt(rsq)
    r = dd.mul(rsq, rinv)
    r2inv = dd.sq(rinv)
    r3inv = dd.mul(r2inv, rinv)
    r5inv = dd.mul(r3inv, r2inv)
    pdd = dd.const(pd)
    pr = dd.mul(pdd, r)
    pr2 = dd.sq(pr)
    pr3 = dd.mul(pr2, pr)
    t1 = dd.exp(dd.neg(pr))
    t2 = dd.add(dd.add(dd.const(1.0), pr), dd.mul(dd.const(0.5), pr2))
    t3 = dd.add(t2, dd.mul(dd.const(1.0 / 6.0), pr3))
    l1 = dd.sub(dd.const(1.0), dd.mul(t1, t2))
    l2 = dd.sub(dd.const(1.0), dd.mul(t1, t3))
    muh, mul_ = dd.from_f64(jnp.asarray(mu))
    muc = [(muh[:, k][None, :], mul_[:, k][None, :]) for k in range(3)]
    mdotd = dd.add(dd.add(dd.mul(muc[0], d[0]), dd.mul(muc[1], d[1])),
                   dd.mul(muc[2], d[2]))
    a1 = dd.mul(dd.mul(dd.mul(dd.const(-3.0), l2), r5inv), mdotd)
    a2 = dd.mul(l1, r3inv)
    a1 = (jnp.where(pm, a1[0], 0.0), jnp.where(pm, a1[1], 0.0))
    a2 = (jnp.where(pm, a2[0], 0.0), jnp.where(pm, a2[1], 0.0))
    E = []
    for k in range(3):
        tk = dd.add(dd.mul(a1, d[k]), dd.mul(a2, muc[k]))
        E.append(-(np.asarray(tk[0], np.float64)
                   + np.asarray(tk[1], np.float64)).sum(1))
    E = np.stack(E, -1)
    ref = _ref_eind(x, alpha, mu, L, pd, n)
    sc = np.abs(ref).max()
    assert np.abs(E - ref).max() / sc < 1e-12


def test_eind_df_kernel_interpret_structure():
    """Kernel plumbing on CPU interpret: f32-grade only (see module
    docstring for why the interpret path cannot hold df32 precision)."""
    from lidp_tpu.ops.pallas_panel import eind_panel_df

    x, alpha, mu, L, pd = _case()
    out = np.asarray(eind_panel_df(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(mu),
        jnp.asarray(L), pd))
    ref = _ref_eind(x, alpha, mu, L, pd, 300)
    sc = np.abs(ref).max()
    np.testing.assert_allclose(out[:300], ref, rtol=5e-6, atol=5e-7 * sc)
    assert np.isfinite(out).all()


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Mosaic-path precision only holds on real TPU")
def test_eind_df_kernel_tpu_full_precision():
    from lidp_tpu.ops.pallas_panel import eind_panel_df

    x, alpha, mu, L, pd = _case()
    out = np.asarray(eind_panel_df(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(mu),
        jnp.asarray(L), pd))
    ref = _ref_eind(x, alpha, mu, L, pd, 300)
    sc = np.abs(ref).max()
    assert np.abs(out[:300] - ref).max() / sc < 1e-12
