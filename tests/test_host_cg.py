"""host_cg_step (per-phase dispatches + host-driven CG) must reproduce the
fused sharded step exactly — it is the same math restructured around the
axon per-dispatch execution deadline (models/polar_bench.py host_cg_step).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


@pytest.mark.slow
def test_host_cg_matches_fused_step():
    from lidp_tpu.models import polar_bench

    kw = dict(target_atoms=1324, n_devices=1, col_chunk=512,
              precision=1e-11, dtype=jnp.float64, dt=0.1)
    b1 = polar_bench.build(**kw)
    b2 = polar_bench.build(**kw)

    f1, e1 = polar_bench.run_step(b1, zero_init=True)
    f2, e2 = polar_bench.host_cg_step(b2, zero_init=True)

    assert int(e1["scf_iters"]) == int(e2["scf_iters"])
    for k in ("evdwl", "ecoul", "elong", "epol"):
        assert float(e2[k]) == pytest.approx(float(e1[k]), rel=1e-12), k
    # fused-loop vs eager-phase reassociation differs at the last few ulps
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b2.arrays["mu"]),
                               np.asarray(b1.arrays["mu"]),
                               rtol=1e-9, atol=1e-14)

    # a second (warm-started) step must track too
    f1, e1 = polar_bench.run_step(b1)
    f2, e2 = polar_bench.host_cg_step(b2)
    assert int(e1["scf_iters"]) == int(e2["scf_iters"])
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_host_cg_mixed_precision_matches_f64():
    """Mixed-precision iterative refinement (f32 inner-CG panel matvecs +
    f64 outer residuals) must land on the SAME dipoles/forces as the pure
    f64 CG at the same 1e-11 convergence (VERDICT r3 #2: 1e-8 force parity
    vs the pure-f64 path, genuine convergence on the replicated MOF)."""
    from lidp_tpu.models import polar_bench

    kw = dict(target_atoms=1324, n_devices=1, col_chunk=512,
              precision=1e-11, dtype=jnp.float64, dt=0.1)
    b1 = polar_bench.build(**kw)
    b2 = polar_bench.build(**kw)

    f1, e1 = polar_bench.host_cg_step(b1, zero_init=True)
    f2, e2 = polar_bench.host_cg_step(b2, zero_init=True, mixed=True)
    for k in ("evdwl", "ecoul", "elong"):
        assert float(e2[k]) == pytest.approx(float(e1[k]), rel=1e-12), k
    # both solves converge the dipoles to 1e-11; epol/forces then agree to
    # far better than 1e-8 relative
    assert float(e2["epol"]) == pytest.approx(float(e1["epol"]), rel=1e-9)
    fs = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-8, atol=1e-8 * fs)
    mu1, mu2 = np.asarray(b1.arrays["mu"]), np.asarray(b2.arrays["mu"])
    ms = np.abs(mu1).max()
    np.testing.assert_allclose(mu2, mu1, rtol=1e-8, atol=1e-8 * ms)

    # warm-started second step tracks too
    f1, e1 = polar_bench.host_cg_step(b1)
    f2, e2 = polar_bench.host_cg_step(b2, mixed=True)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-8, atol=1e-8 * fs)


@pytest.mark.slow
def test_host_cg_strips_match_unstriped():
    """Row-strip mode (each phase as S separate dispatches) must equal the
    single-dispatch host path bit-for-bit up to reduction order."""
    from lidp_tpu.models import polar_bench

    kw = dict(target_atoms=1324, n_devices=1, col_chunk=512,
              precision=1e-11, dtype=jnp.float64, dt=0.1)
    b1 = polar_bench.build(**kw, host_strips=1)
    b4 = polar_bench.build(**kw, host_strips=4)

    f1, e1 = polar_bench.host_cg_step(b1, zero_init=True)
    f4, e4 = polar_bench.host_cg_step(b4, zero_init=True)
    assert int(e1["scf_iters"]) == int(e4["scf_iters"])
    for k in ("evdwl", "ecoul", "elong", "epol"):
        assert float(e4[k]) == pytest.approx(float(e1[k]), rel=1e-11), k
    # near-zero force components differ only by reduction order (abs ~1e-9
    # on forces of magnitude ~60)
    np.testing.assert_allclose(np.asarray(f4), np.asarray(f1),
                               rtol=1e-9, atol=5e-9)
