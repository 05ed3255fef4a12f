"""Pallas O(N^2) panel kernels (ops/pallas_panel.py) vs the XLA
column-chunk scan path (parallel/shard.py) — same math, different tiling.
Runs in interpreter mode off-TPU so CPU CI covers the kernels."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture(scope="module")
def built_pair():
    """The MOF5+Methane cell force/SCF step built both ways (f32)."""
    from lidp_tpu.models import polar_bench

    kw = dict(target_atoms=1324, n_devices=1, col_chunk=512,
              precision=1e-6, dtype=jnp.float32, dt=0.1)
    b_scan = polar_bench.build(**kw, panel="scan")
    b_pal = polar_bench.build(**kw, panel="pallas")
    return b_scan, b_pal


def test_init_forces_match(built_pair):
    from lidp_tpu.models import polar_bench

    b1, b2 = built_pair
    f1, e1 = polar_bench.setup_forces(b1)
    f2, e2 = polar_bench.setup_forces(b2)
    for k in ("evdwl", "ecoul", "elong"):
        # both paths accumulate in f32; tile order differs, so allow a few
        # ulps of cancellation noise on the large coulomb sums
        assert float(e2[k]) == pytest.approx(float(e1[k]), rel=5e-6), k
    # epol is a small difference of large terms; compare absolutely at the
    # f32 roundoff of its constituents
    assert float(e2["epol"]) == pytest.approx(float(e1["epol"]),
                                              rel=1e-4, abs=2e-2)
    fs = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=5e-4, atol=5e-5 * fs)
    mu1 = np.asarray(b1.arrays["mu"])
    mu2 = np.asarray(b2.arrays["mu"])
    ms = np.abs(mu1).max()
    np.testing.assert_allclose(mu2, mu1, rtol=5e-4, atol=5e-5 * ms)


def test_step_tracks(built_pair):
    from lidp_tpu.models import polar_bench

    b1, b2 = built_pair
    f1, e1 = polar_bench.run_step(b1)
    f2, e2 = polar_bench.run_step(b2)
    assert abs(int(e1["scf_iters"]) - int(e2["scf_iters"])) <= 1
    fs = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-3, atol=2e-4 * fs)


def test_eind_kernel_vs_numpy():
    """Direct kernel check against a dense numpy T.mu contraction."""
    from lidp_tpu.ops.pallas_panel import eind_panel

    rng = np.random.RandomState(3)
    n, npad = 300, 512
    L = np.array([20.0, 22.0, 24.0])
    x = np.zeros((npad, 3), np.float32)
    x[:n] = rng.uniform(0, 20, (n, 3))
    alpha = np.zeros(npad, np.float32)
    alpha[:n] = rng.uniform(0.5, 2.0, n)
    alpha[:20] = 0.0                       # some non-polarizable atoms
    mu = np.zeros((npad, 3), np.float32)
    mu[:n] = rng.normal(0, 1e-2, (n, 3))
    mu[alpha == 0.0] = 0.0
    pd = 2.1304

    out = np.asarray(eind_panel(
        jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(mu),
        jnp.asarray(L, jnp.float32), pd))

    # dense f64 reference
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
    l2 = 1 - t1 * (t2 + pd**3 * rsq * r / 6)
    r3inv = 1 / (rsq * r)
    r5inv = r3inv / rsq
    mdotd = (mu[None, :n, :] * d).sum(-1)
    a1 = np.where(pm, -3 * l2 * r5inv * mdotd, 0.0)
    a2 = np.where(pm, l1 * r3inv, 0.0)
    ref = -(a1[..., None] * d + a2[..., None] * mu[None, :n, :]).sum(1)

    sc = np.abs(ref).max()
    np.testing.assert_allclose(out[:n], ref, rtol=1e-4, atol=1e-5 * sc)
    assert np.abs(out[n:]).max() == 0.0 or np.isfinite(out[n:]).all()


def test_wolf_kernel_vs_numpy():
    from lidp_tpu.ops.pallas_panel import wolf_panel

    rng = np.random.RandomState(5)
    n, npad = 200, 256
    L = np.array([18.0, 18.0, 18.0])
    cut_coulsq = 8.0 ** 2
    x = np.zeros((npad, 3), np.float32)
    x[:n] = rng.uniform(0, 18, (n, 3))
    q = np.zeros(npad, np.float32)
    q[:n] = rng.normal(0, 0.5, n)
    mol = np.zeros(npad, np.float32)
    mol[:n] = rng.randint(0, 5, n)
    maskf = np.zeros(npad, np.float32)
    maskf[:n] = 1.0

    out = np.asarray(wolf_panel(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(mol),
        jnp.asarray(maskf), jnp.asarray(L, jnp.float32), cut_coulsq))

    d = x[:n, None, :] - x[None, :n, :]
    d -= L * np.round(d / L)
    rsq = (d * d).sum(-1)
    inc = (~np.eye(n, dtype=bool)) & (rsq <= cut_coulsq) & (
        (mol[:n][:, None] != mol[:n][None, :]) | (mol[:n][:, None] == 0))
    rsq = np.where(inc, rsq, 1.0)
    r = np.sqrt(rsq)
    efq = np.where(inc, (1 / rsq - 1 / cut_coulsq) / r, 0.0) \
        * q[None, :n]
    ref = (efq[..., None] * d).sum(1)
    sc = np.abs(ref).max()
    np.testing.assert_allclose(out[:n], ref, rtol=1e-4, atol=1e-5 * sc)
