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


# ---------------------------------------------------------------------------
# pair + dipole df kernels (VERDICT r4 #4): TPU-gated full-precision parity
# against the trusted dense f64 implementations (ops/pair semantics for the
# LJ+erfc pair terms; ops/polarization.dipole_forces_energy, golden-pinned by
# the example suites, for the dipole forces).
# ---------------------------------------------------------------------------


def _pair_case(npad=512, n=300, ntypes=3):
    rng = np.random.RandomState(11)
    L = np.array([21.0, 23.0, 25.0])
    x = np.zeros((npad, 3))
    # jittered lattice: uniform-random placement creates near-overlap
    # pairs with ~1e14 LJ forces, which turn the relative-error criterion
    # into a comparison against an unphysical global scale
    g = np.stack(np.meshgrid(*[np.arange(7)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n]
    x[:n] = g * (L / 7.2) + rng.uniform(0.2, 0.9, (n, 3))
    q = np.zeros(npad)
    q[:n] = rng.normal(0, 0.4, n)
    q[:n] -= q[:n].mean()
    typ = np.zeros(npad, np.int32)
    typ[:n] = rng.randint(1, ntypes + 1, n)
    mask = np.zeros(npad, bool)
    mask[:n] = True
    T1 = ntypes + 1
    eps = np.zeros((T1, T1)); sig = np.zeros((T1, T1))
    base_e = [0.1, 0.07, 0.05]
    base_s = [3.0, 2.8, 2.6]
    for i in range(1, T1):
        for j in range(1, T1):
            eps[i, j] = np.sqrt(base_e[i - 1] * base_e[j - 1])
            sig[i, j] = 0.5 * (base_s[i - 1] + base_s[j - 1])
    cut_lj = 7.0
    cut_coul = 9.0
    lj3 = 4 * eps * sig ** 12
    lj4 = 4 * eps * sig ** 6
    tabs = np.zeros((5, T1, T1))
    tabs[0], tabs[1] = lj3, lj4
    tabs[3] = np.where(eps > 0, cut_lj ** 2, 0.0)
    tabs[4] = np.where(eps > 0, max(cut_lj, cut_coul) ** 2, 0.0)
    tabs[3][1:, 1:] = cut_lj ** 2
    tabs[4][1:, 1:] = max(cut_lj, cut_coul) ** 2
    g_ewald = 0.30
    return x, q, typ, mask, tabs, L, cut_coul ** 2, 332.06371, g_ewald


def _ref_pair(x, q, typ, mask, tabs, L, cut_coulsq, qqrd2e, g_ewald, n):
    from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P

    d = x[:n, None, :] - x[None, :n, :]
    d -= L * np.round(d / L)
    rsq = (d * d).sum(-1)
    pm = ~np.eye(n, dtype=bool)
    rsq = np.where(pm, rsq, 1.0)
    lj3 = tabs[0][typ[:n][:, None], typ[:n][None, :]]
    lj4 = tabs[1][typ[:n][:, None], typ[:n][None, :]]
    cutlj = tabs[3][typ[:n][:, None], typ[:n][None, :]]
    cutsq = tabs[4][typ[:n][:, None], typ[:n][None, :]]
    in_range = pm & (rsq < cutsq)
    ljm = in_range & (rsq < cutlj)
    r2i = 1.0 / rsq
    r6i = r2i ** 3
    flj = np.where(ljm, r6i * (12 * lj3 * r6i - 6 * lj4), 0.0)
    ev = np.where(ljm, r6i * (lj3 * r6i - lj4), 0.0)
    cm = in_range & (rsq < cut_coulsq)
    r = np.sqrt(rsq)
    grij = g_ewald * r
    expm2 = np.exp(-grij * grij)
    t = 1.0 / (1.0 + EWALD_P * grij)
    erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
    pref = qqrd2e * q[:n][:, None] * q[:n][None, :] / r
    fc = np.where(cm, pref * (erfc + EWALD_F * grij * expm2), 0.0)
    ec = np.where(cm, pref * erfc, 0.0)
    fpair = (flj + fc) * r2i
    f = (fpair[..., None] * d).sum(1)
    return f, 0.5 * ev.sum(), 0.5 * ec.sum()


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Mosaic-path precision only holds on real TPU")
def test_pair_df_kernel_tpu_full_precision():
    from lidp_tpu.ops.pallas_panel import pair_panel_df

    x, q, typ, mask, tabs, L, ccsq, qq, gew = _pair_case()
    f, ev, ec, vir = pair_panel_df(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(typ, jnp.float64),
        jnp.asarray(mask, jnp.float64), jnp.asarray(tabs),
        jnp.asarray(L), ccsq, qq, gew)
    rf, rev, rec = _ref_pair(x, q, typ, mask, tabs, L, ccsq, qq, gew, 300)
    sc = np.abs(rf).max()
    assert np.abs(np.asarray(f)[:300] - rf).max() / sc < 1e-12
    assert abs(float(ev) - rev) / max(1.0, abs(rev)) < 1e-12
    assert abs(float(ec) - rec) / max(1.0, abs(rec)) < 1e-12


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Mosaic-path precision only holds on real TPU")
def test_dipole_df_kernel_tpu_full_precision():
    from lidp_tpu.box import Box
    from lidp_tpu.ops import polarization as pol
    from lidp_tpu.ops.pallas_panel import dipole_panel_df

    x, alpha, mu, L, pd = _case()
    rng = np.random.RandomState(5)
    n = 300
    q = np.zeros(512)
    q[:n] = rng.normal(0, 0.4, n)
    q[:n] -= q[:n].mean()
    mol = np.zeros(512)
    mol[:n] = np.arange(n) // 3 + 1
    mask = np.zeros(512)
    mask[:n] = 1.0
    ccsq = 81.0
    qq = 332.06371
    s = pol.PolarizationSettings(
        damping_type=pol.DAMPING_EXPONENTIAL, polar_damp=pd)
    fpol, u_ef, u_dd, _v = dipole_panel_df(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(mol),
        jnp.asarray(alpha), jnp.asarray(mu), jnp.asarray(mask),
        jnp.asarray(L), pd, ccsq, qq)
    # dense f64 reference (golden-pinned by the Bulk H2/MOF5 suites);
    # it also adds the mu^2/2alpha self-energy, subtracted here.
    # Evaluated on the host CPU backend: the dense pairwise math in
    # emulated f64 through the axon tunnel compiles for tens of minutes
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        box = Box.create([0.0, 0.0, 0.0], L, dtype=jnp.float64)
        rf, ru, _rv = pol.dipole_forces_energy(
            jnp.asarray(x[:n]), jnp.asarray(q[:n]),
            jnp.asarray(mol[:n].astype(np.int32)), jnp.asarray(alpha[:n]),
            jnp.asarray(mu[:n]), jnp.ones(n, bool), box, ccsq, qq, s)
    a = alpha[:n]
    u_self = 0.5 * float(np.sum(np.where(
        a != 0, (mu[:n] ** 2).sum(1) / np.where(a != 0, a, 1.0), 0.0)))
    sc = np.abs(np.asarray(rf)).max()
    assert np.abs(np.asarray(fpol)[:n] - np.asarray(rf)).max() / sc < 1e-11
    assert abs((float(u_ef) + float(u_dd)) -
               (float(ru) - u_self)) / max(1.0, abs(float(ru))) < 1e-11


@pytest.mark.slow
@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="df path is TPU-only")
def test_no_df_ab_energies_match(monkeypatch):
    """LIDP_NO_DF=1 A/B: the df32 kernels and the XLA-emulated-f64 scan
    phases must produce the same end-to-end step energies (host CG path,
    1324-atom MOF5+Methane cell)."""
    import os

    from lidp_tpu.models import polar_bench

    rows = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("LIDP_NO_DF", flag)
        b = polar_bench.build(1000, n_devices=1, precision=1e-11,
                              dtype=jnp.float64, host_strips=1)
        f, en = polar_bench.host_cg_step(b, zero_init=True, mixed=True)
        rows[flag] = {k: float(en[k]) for k in
                      ("evdwl", "ecoul", "elong", "epol")}
    for k, v_df in rows["0"].items():
        v_ref = rows["1"][k]
        assert abs(v_df - v_ref) / max(1.0, abs(v_ref)) < 1e-10, (
            k, v_df, v_ref)


def test_pair_wolf_df_fused_interpret_structure():
    """Fused wolf field in pair_panel_df (mol=...): plumbing check on CPU
    interpret at f32 grade vs the scan-path wolf math."""
    from lidp_tpu.ops.pallas_panel import pair_panel_df

    x, q, typ, mask, tabs, L, ccsq, qq, gew = _pair_case()
    rng = np.random.RandomState(7)
    mol = np.zeros(512)
    mol[:300] = np.arange(300) // 5 + 1
    f, ev, ec, vir, e0 = pair_panel_df(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(typ, jnp.float64),
        jnp.asarray(mask, jnp.float64), jnp.asarray(tabs),
        jnp.asarray(L), ccsq, qq, gew, mol=jnp.asarray(mol, jnp.float64))
    # reference wolf field (unscaled)
    n = 300
    d = x[:n, None, :] - x[None, :n, :]
    d -= L * np.round(d / L)
    rsq = (d * d).sum(-1)
    pm = ~np.eye(n, dtype=bool)
    inc = pm & (rsq <= ccsq) & (
        (mol[:n][:, None] != mol[:n][None, :]) | (mol[:n][:, None] == 0))
    rsq = np.where(inc, rsq, 1.0)
    r = np.sqrt(rsq)
    efq = np.where(inc, (1.0 / rsq - 1.0 / ccsq) / r, 0.0) * q[:n][None, :]
    ref_e0 = (efq[..., None] * d).sum(1)
    sc = np.abs(ref_e0).max()
    np.testing.assert_allclose(np.asarray(e0)[:n], ref_e0,
                               rtol=5e-5, atol=5e-6 * sc)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Mosaic-path precision only holds on real TPU")
def test_pair_wolf_df_fused_tpu_full_precision():
    from lidp_tpu.ops.pallas_panel import pair_panel_df

    x, q, typ, mask, tabs, L, ccsq, qq, gew = _pair_case()
    mol = np.zeros(512)
    mol[:300] = np.arange(300) // 5 + 1
    f, ev, ec, vir, e0 = pair_panel_df(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(typ, jnp.float64),
        jnp.asarray(mask, jnp.float64), jnp.asarray(tabs),
        jnp.asarray(L), ccsq, qq, gew, mol=jnp.asarray(mol, jnp.float64))
    n = 300
    d = x[:n, None, :] - x[None, :n, :]
    d -= L * np.round(d / L)
    rsq = (d * d).sum(-1)
    pm = ~np.eye(n, dtype=bool)
    inc = pm & (rsq <= ccsq) & (
        (mol[:n][:, None] != mol[:n][None, :]) | (mol[:n][:, None] == 0))
    rsq = np.where(inc, rsq, 1.0)
    r = np.sqrt(rsq)
    efq = np.where(inc, (1.0 / rsq - 1.0 / ccsq) / r, 0.0) * q[:n][None, :]
    ref_e0 = (efq[..., None] * d).sum(1)
    sc = np.abs(ref_e0).max()
    assert np.abs(np.asarray(e0)[:n] - ref_e0).max() / sc < 1e-12
    # the pair outputs must be unchanged by the fusion
    rf, rev, rec = _ref_pair(x, q, typ, mask, tabs, L, ccsq, qq, gew, n)
    assert np.abs(np.asarray(f)[:n] - rf).max() / np.abs(rf).max() < 1e-12
