"""Induced-dipole polarization: the feature of the reference fork.

Re-implements the physics of pair style ``lj/cut/coul/long/polarization``
(pair_lj_cut_coul_long_polarization.cpp) as batched tensor ops:

  * shifted-force (Wolf, undamped) static field E0 with same-molecule
    exclusion (:329-361) and the sqrt(qqrd2e) unit fold (:367-374);
  * damped dipole interaction tensor T_ij (Thole exponential,
    build_dipole_field_matrix :1243-1316) — built as (N,3,N,3) for moderate N,
    contracted matrix-free for large N;
  * the SCF solve (DipoleSolverIterative :1113-1238) with both stopping modes,
    the gamma-preconditioned initial guess (:376-385), zodid first-order mode,
    and the divergence fallback mu = alpha*E0 (:1227-1235).  The default
    parallel solver is the Jacobi fixed point (the reference's ``polar_gs no``
    path) — the rank-ordered Gauss-Seidel sweep is inherently serial; a serial
    reference mode (``gauss_seidel=True``) reproduces it exactly for
    validation.  Both iterations share the unique fixed point, so converged
    dipoles agree to solver precision;
  * charge-dipole (shifted-force) + dipole-dipole forces and the three-term
    polarization energy u_self + u_ef + u_dd (:406-641).

Scopes replicated exactly: charge-dipole terms live inside cut_coul with
molecule exclusion; dipole-dipole force/energy and the T tensor are global
(no cutoff, no molecule exclusion) — see SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, min_image_box, minimum_image

DAMPING_NONE = 0
DAMPING_EXPONENTIAL = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolarizationSettings:
    """Keyword settings of the pair style (settings(), :678-766; defaults :63-79)."""

    iterations_max: int = dataclasses.field(metadata=dict(static=True), default=50)
    damping_type: int = dataclasses.field(metadata=dict(static=True), default=DAMPING_NONE)
    polar_damp: float = dataclasses.field(metadata=dict(static=True), default=2.1304)
    zodid: bool = dataclasses.field(metadata=dict(static=True), default=False)
    polar_precision: float = dataclasses.field(metadata=dict(static=True), default=1e-11)
    fixed_iteration: bool = dataclasses.field(metadata=dict(static=True), default=False)
    polar_gs: bool = dataclasses.field(metadata=dict(static=True), default=False)
    polar_gs_ranked: bool = dataclasses.field(metadata=dict(static=True), default=True)
    polar_gamma: float = dataclasses.field(metadata=dict(static=True), default=1.03)
    use_previous: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # >0: run CG as a lax.scan of exactly this many trips with updates
    # masked once converged, instead of lax.while_loop.  Same math and same
    # stopping criterion; static trip counts avoid a TPU runtime fault that
    # f64-emulated while_loops hit at large N (observed at >=30k atoms
    # through the axon tunnel) and keep the step schedulable.
    cg_static_trips: int = dataclasses.field(metadata=dict(static=True),
                                             default=0)


def _pair_geometry(x, box: Box, mask):
    """Minimum-image pair displacements/delta (N,N,3), rsq masked to 1."""
    n = x.shape[0]
    delta = min_image_box(x[:, None, :] - x[None, :, :], box)
    rsq = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    pm = (~eye) & mask[:, None] & mask[None, :]
    rsq = jnp.where(pm, rsq, 1.0)
    return delta, rsq, pm


def static_field_wolf(x, q, mol, mask, box: Box, cut_coulsq, qqrd2e):
    """Shifted-force (Wolf, undamped) static field, folded by sqrt(qqrd2e).

    E0_i = sqrt(qqrd2e) * sum_j (1/r^2 - 1/rc^2) * (1/r) * q_j * (x_i - img(x_j))
    over pairs with rsq <= cut_coulsq and (mol_i != mol_j or mol_i == 0)
    (reference :329-374).
    """
    delta, rsq, pm = _pair_geometry(x, box, mask)
    cut_coul = jnp.sqrt(cut_coulsq)
    f_shift = -1.0 / (cut_coul * cut_coul)
    r = jnp.sqrt(rsq)
    include = pm & (rsq <= cut_coulsq) & (
        (mol[:, None] != mol[None, :]) | (mol[:, None] == 0)
    )
    ef_temp = jnp.where(include, (1.0 / rsq + f_shift) / r, 0.0)
    e0 = jnp.einsum("ij,j,ijp->ip", ef_temp, q, delta)
    return e0 * jnp.sqrt(qqrd2e)


def _damping_terms(r, rsq, damp, damping_type):
    """Thole exponential damping lambdas (build_dipole_field_matrix :1293-1296)."""
    if damping_type == DAMPING_EXPONENTIAL:
        e = jnp.exp(-damp * r)
        l1 = 1.0 - e * (0.5 * damp * damp * rsq + damp * r + 1.0)
        l2 = 1.0 - e * (damp**3 * rsq * r / 6.0 + 0.5 * damp * damp * rsq + damp * r + 1.0)
        return l1, l2
    one = jnp.ones_like(r)
    return one, one


def dipole_field_tensor(x, alpha, mask, box: Box, s: PolarizationSettings):
    """Dense T tensor, shape (N,3,N,3); off-diagonal blocks only (diag zeroed).

    T_ij^{pq} = -3 dp dq lam2 / r^5 + delta_pq lam1 / r^3, d = x_i - img(x_j).
    The reference stores 1/alpha on the diagonal (:1269-1276); here the
    contraction always excludes j == i so the diagonal is zero.
    """
    delta, rsq, pm = _pair_geometry(x, box, mask)
    r = jnp.sqrt(rsq)
    l1, l2 = _damping_terms(r, rsq, s.polar_damp, s.damping_type)
    r3inv = 1.0 / (rsq * r)
    r5inv = r3inv / rsq
    outer = delta[:, :, :, None] * delta[:, :, None, :]       # (N,N,3,3)
    t = -3.0 * outer * (l2 * r5inv)[:, :, None, None]
    t = t + jnp.eye(3, dtype=x.dtype) * (l1 * r3inv)[:, :, None, None]
    t = jnp.where(pm[:, :, None, None], t, 0.0)
    return jnp.transpose(t, (0, 2, 1, 3))                      # (N,3,N,3)


def induced_field(tensor, mu):
    """E_ind = -T . mu  (the sweep contraction, reference :1158-1168)."""
    n = mu.shape[0]
    return -jnp.einsum("ipjq,jq->ip", tensor, mu).reshape(n, 3)


def scf_solve_cg(e0, alpha, apply_T, s: PolarizationSettings, mu_init=None,
                 psum=None, n_total=None):
    """Conjugate-gradient dipole solve of (diag(1/alpha) + T) mu = E0.

    The reference's rank-ordered Gauss-Seidel sweep (:1145-1236) is serial and
    its Jacobi variant (polar_gs no) can diverge (spectral radius > 1 — it
    does on the MOF5 examples).  The interaction matrix A = diag(1/alpha) + T
    is symmetric positive definite, so CG converges unconditionally to the
    SAME fixed point, fully parallel.  Symmetrized: with y = mu/sqrt(alpha),
    B = I + sqrt(a) T sqrt(a), zero-polarizability sites decouple exactly.

    Stopping mirrors the reference's criterion: mean-square dipole change per
    component <= polar_precision^2.  `psum` (optional) reduces scalars across
    shards.  Returns (mu, iterations, diverged).
    """
    dtype = e0.dtype
    n3 = 3.0 * (n_total if n_total is not None else e0.shape[0])
    allsum = psum if psum is not None else (lambda v: v)
    sa = jnp.sqrt(alpha)[:, None]

    def B(y):
        return y + sa * apply_T(sa * y)

    b = sa * e0
    if mu_init is not None:
        y = jnp.where(sa > 0, mu_init / jnp.where(sa > 0, sa, 1.0), 0.0)
    else:
        y = s.polar_gamma * sa * e0        # = mu0 / sqrt(alpha)
    r = b - B(y)
    p = r
    rs = allsum(jnp.sum(r * r))
    rs0 = allsum(jnp.sum(b * b)) + jnp.asarray(1e-30, dtype)
    prec2 = jnp.asarray(s.polar_precision**2, dtype)
    # Safety net on the relative residual: if CG in f32 stagnates just above
    # the reference's change criterion it spins to iterations_max — but the
    # stagnated iterate is far BETTER than the divergence fallback
    # mu = alpha*E0, so only fall back when the residual is genuinely large
    # (true divergence or NaN).  The loop exit itself stays the reference's
    # change criterion so converged iteration counts are unaffected.
    res_accept = jnp.asarray(1e-5, dtype)    # no-fallback (relative residual)^2

    def cond(c):
        y, r, p, rs, change, it = c
        # NaN-safe: ~(change <= prec2) keeps iterating on NaN (overflowed
        # inputs) until iterations_max, which then triggers the reference's
        # divergence fallback instead of silently returning poisoned dipoles
        return (~(change <= prec2)) & (it < s.iterations_max)

    def body(c):
        y, r, p, rs, _, it = c
        Bp = B(p)
        denom = allsum(jnp.sum(p * Bp))
        a = rs / jnp.where(denom != 0, denom, 1.0)
        y2 = y + a * p
        r2 = r - a * Bp
        rs2 = allsum(jnp.sum(r2 * r2))
        beta = rs2 / jnp.where(rs != 0, rs, 1.0)
        p2 = r2 + beta * p
        change = allsum(jnp.sum((a * p * sa) ** 2)) / n3
        return y2, r2, p2, rs2, change, it + 1

    init = (y, r, p, rs, jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32))
    if s.cg_static_trips:
        # static-trip variant: after convergence the step size is forced to
        # 0, freezing y/r/change (p keeps accumulating harmlessly)
        def sbody(c, _):
            y, r, p, rs, change, it = c
            done = change <= prec2
            Bp = B(p)
            denom = allsum(jnp.sum(p * Bp))
            a = jnp.where(done, 0.0, rs / jnp.where(denom != 0, denom, 1.0))
            y2 = y + a * p
            r2 = r - a * Bp
            rs2 = allsum(jnp.sum(r2 * r2))
            beta = rs2 / jnp.where(rs != 0, rs, 1.0)
            p2 = r2 + beta * p
            change2 = jnp.where(
                done, change, allsum(jnp.sum((a * p * sa) ** 2)) / n3)
            return (y2, r2, p2, rs2, change2,
                    it + jnp.where(done, 0, 1)), None
        (y, r, p, rs, change, it), _ = jax.lax.scan(
            sbody, init, None, length=int(s.cg_static_trips))
    else:
        y, r, p, rs, change, it = jax.lax.while_loop(cond, body, init)
    converged = (change <= prec2) | (rs <= res_accept * rs0)
    diverged = ~converged
    mu = sa * y
    mu = jnp.where(diverged, alpha[:, None] * e0, mu)
    return mu, it, diverged


def scf_solve(
    e0, alpha, tensor, s: PolarizationSettings, mu_init=None,
):
    """Self-consistent dipole solve. Returns (mu, iterations, diverged).

    Precision mode uses the CG solver (scf_solve_cg) — same fixed point as
    the reference's converged GS, unconditionally convergent.  Fixed-count and
    zodid modes keep the reference's Jacobi update semantics exactly:
    fixed mode runs iterations_max effective updates (:1211-1215), zodid stays
    at the gamma-preconditioned first-order guess (:389-390).
    """
    a = alpha[:, None]
    if mu_init is None:
        mu0 = s.polar_gamma * a * e0
    else:
        mu0 = mu_init

    if s.zodid:
        return mu0, jnp.zeros((), jnp.int32), jnp.zeros((), bool)

    n3 = 3.0 * e0.shape[0]
    prec2 = s.polar_precision * s.polar_precision

    def one_sweep(mu):
        return a * (e0 + induced_field(tensor, mu))

    if s.fixed_iteration:
        def body(i, mu):
            return one_sweep(mu)
        mu = jax.lax.fori_loop(0, s.iterations_max, body, mu0)
        return mu, jnp.asarray(s.iterations_max, jnp.int32), jnp.zeros((), bool)

    def apply_T(m):
        return jnp.einsum("ipjq,jq->ip", tensor, m)

    return scf_solve_cg(e0, alpha, apply_T, s, mu_init=mu_init)


def scf_solve_gauss_seidel(
    e0, alpha, tensor, s: PolarizationSettings, rank_metric=None, mu_init=None,
):
    """Serial reference mode: rank-ordered Gauss-Seidel sweeps, exact
    trajectory parity with DipoleSolverIterative (:1113-1238) for
    polar_gs/polar_gs_ranked.  O(N) sequential per sweep — validation only.
    """
    n = e0.shape[0]
    a = alpha[:, None]
    mu = s.polar_gamma * a * e0 if mu_init is None else mu_init
    if s.zodid:
        return mu, jnp.zeros((), jnp.int32), jnp.zeros((), bool)

    if rank_metric is not None and s.polar_gs_ranked:
        # stable descending sort == the reference bubble sort result (:1130-1143)
        order = jnp.argsort(-rank_metric, stable=True)
    else:
        order = jnp.arange(n)

    n3 = 3.0 * n
    prec2 = s.polar_precision * s.polar_precision
    t2 = jnp.reshape(tensor, (n, 3, n, 3))

    def sweep(mu):
        def body(mu, idx):
            ef = -jnp.einsum("pjq,jq->p", t2[idx], mu) + jnp.einsum(
                "pq,q->p", t2[idx, :, idx, :], mu[idx]
            )
            mu_i = alpha[idx] * (e0[idx] + ef)
            if s.polar_gs or s.polar_gs_ranked:
                mu = mu.at[idx].set(mu_i)
            return mu, mu_i

        mu_after, mu_new_ordered = jax.lax.scan(body, mu, order)
        mu_new = jnp.zeros_like(mu).at[order].set(mu_new_ordered)
        return mu_after, mu_new

    if s.fixed_iteration:
        def body(i, mu):
            mu_after, mu_new = sweep(mu)
            # the reference returns before the mu=mu_new copy on the last sweep;
            # for GS the in-sweep updates have already been applied
            last = i == s.iterations_max
            return jnp.where(last, mu_after if (s.polar_gs or s.polar_gs_ranked) else mu,
                             mu_new)
        mu = jax.lax.fori_loop(0, s.iterations_max + 1, body, mu)
        return mu, jnp.asarray(s.iterations_max, jnp.int32), jnp.zeros((), bool)

    def cond(carry):
        mu, change, it = carry
        return (change > prec2) & (it <= s.iterations_max)

    def body(carry):
        mu, _, it = carry
        mu_old = mu
        _, mu_new = sweep(mu)
        change = jnp.sum((mu_new - mu_old) ** 2) / n3
        return mu_new, change, it + 1

    mu, change, it = jax.lax.while_loop(
        cond, body, (mu, jnp.asarray(jnp.inf, e0.dtype), jnp.zeros((), jnp.int32))
    )
    diverged = change > prec2
    mu = jnp.where(diverged, a * e0, mu)
    return mu, it, diverged


def rank_metric_compute(x, alpha, mol, mask, box: Box):
    """polar_gs_ranked ordering metric (reference :192-227).

    rmin = min distance between polarizable atoms on different molecules;
    rank_metric_i = sum over neighbors within 1.5*rmin of alpha_i*alpha_j.
    """
    delta, rsq, pm = _pair_geometry(x, box, mask)
    r = jnp.sqrt(rsq)
    diff_mol = (mol[:, None] != mol[None, :]) | (mol[:, None] == 0)
    polar_pair = (alpha[:, None] > 0) & (alpha[None, :] > 0)
    rmin = jnp.min(jnp.where(pm & diff_mol & polar_pair, r, jnp.inf))
    close = pm & diff_mol & (r < 1.5 * rmin)
    return jnp.sum(jnp.where(close, alpha[:, None] * alpha[None, :], 0.0), axis=1)


def dipole_forces_energy(
    x, q, mol, alpha, mu, mask, box: Box, cut_coulsq, qqrd2e,
    s: PolarizationSettings, xshift=None,
):
    """Charge-dipole + dipole-dipole forces, 3-term polarization energy, virial.

    Returns (f (N,3), u_polar (), virial6). Mirrors reference :406-641.

    xshift: optional (N,3) static shift mapping our coordinates onto the
    reference's STORED positions (read_data remap, frozen between rebuilds)
    for the fdotr virial; without it the virial wraps x into the box each
    call (equivalent until an atom crosses a face mid-run).
    """
    dtype = x.dtype
    delta, rsq, pm = _pair_geometry(x, box, mask)
    r2inv = 1.0 / rsq
    r = jnp.sqrt(rsq)
    rinv = 1.0 / r
    r3inv = r2inv * rinv
    sqrt_q = jnp.sqrt(qqrd2e)
    cut_coul = jnp.sqrt(cut_coulsq)
    f_shift = -1.0 / (cut_coul * cut_coul)

    dx, dy, dz = delta[..., 0], delta[..., 1], delta[..., 2]
    xsq, ysq, zsq = dx * dx, dy * dy, dz * dz

    # ---- charge-dipole (within cut_coul, different molecules) ----
    cd_mask = pm & (rsq < cut_coulsq) & (
        (mol[:, None] != mol[None, :]) | (mol[:, None] == 0)
    )
    # M(delta): symmetric 3x3 gradient-of-field matrix (reference :467-476)
    mxx = (-2.0 * xsq + ysq + zsq) * r2inv + f_shift * (ysq + zsq)
    myy = (-2.0 * ysq + xsq + zsq) * r2inv + f_shift * (xsq + zsq)
    mzz = (-2.0 * zsq + xsq + ysq) * r2inv + f_shift * (xsq + ysq)
    mxy = -3.0 * dx * dy * r2inv - f_shift * dx * dy
    mxz = -3.0 * dx * dz * r2inv - f_shift * dx * dz
    myz = -3.0 * dy * dz * r2inv - f_shift * dy * dz

    def matvec(m_vec):
        vx = mxx * m_vec[..., 0] + mxy * m_vec[..., 1] + mxz * m_vec[..., 2]
        vy = mxy * m_vec[..., 0] + myy * m_vec[..., 1] + myz * m_vec[..., 2]
        vz = mxz * m_vec[..., 0] + myz * m_vec[..., 1] + mzz * m_vec[..., 2]
        return jnp.stack([vx, vy, vz], axis=-1)

    cf_j = jnp.where(cd_mask, q[None, :] * sqrt_q * r3inv, 0.0)   # charge on j
    cf_i = jnp.where(cd_mask, q[:, None] * sqrt_q * r3inv, 0.0)   # charge on i
    f_cd = (cf_j[..., None] * matvec(mu[:, None, :])
            - cf_i[..., None] * matvec(mu[None, :, :]))           # (N,N,3)

    # u_polar_ef = -sum_{ordered pairs} mu_i . E_ij  (reference :477-508)
    ef_temp = jnp.where(cd_mask, (r2inv + f_shift) * rinv * sqrt_q, 0.0)
    e_ij = ef_temp[..., None] * q[None, :, None] * delta          # field at i from j
    u_ef = -jnp.sum(mu[:, None, :] * e_ij)

    # ---- dipole-dipole (ALL pairs of polarizable atoms, no cutoff) ----
    dd_mask = pm & (alpha[:, None] != 0.0) & (alpha[None, :] != 0.0)
    r5inv = r3inv * r2inv
    r7inv = r5inv * r2inv
    pdotp = jnp.einsum("ip,jp->ij", mu, mu)
    pidotr = jnp.einsum("ip,ijp->ij", mu, delta)
    pjdotr = jnp.einsum("jp,ijp->ij", mu, delta)

    if s.damping_type == DAMPING_EXPONENTIAL:
        pd = s.polar_damp
        t1 = jnp.exp(-pd * r)
        t2 = 1.0 + pd * r + 0.5 * pd * pd * rsq
        t3 = t2 + pd**3 * rsq * r / 6.0
        pre1 = 3.0 * r5inv * pdotp * (1.0 - t1 * t2) - 15.0 * r7inv * pidotr * pjdotr * (1.0 - t1 * t3)
        pre2 = 3.0 * r5inv * pjdotr * (1.0 - t1 * t3)
        pre3 = 3.0 * r5inv * pidotr * (1.0 - t1 * t3)
        pre4 = -pdotp * r3inv * (-t1 * (pd * rinv + pd * pd) + t1 * pd * t2 * rinv)
        pre5 = 3.0 * pidotr * pjdotr * r5inv * (
            -t1 * (pd * rinv + pd * pd + 0.5 * r * pd**3) + t1 * pd * t3 * rinv
        )
        u_dd_pair = r3inv * pdotp * (1.0 - t1 * t2) - 3.0 * r5inv * pidotr * pjdotr * (1.0 - t1 * t3)
        extra = pre4 + pre5
    else:
        pre1 = 3.0 * r5inv * pdotp - 15.0 * r7inv * pidotr * pjdotr
        pre2 = 3.0 * r5inv * pjdotr
        pre3 = 3.0 * r5inv * pidotr
        u_dd_pair = r3inv * pdotp - 3.0 * r5inv * pidotr * pjdotr
        extra = jnp.zeros_like(pre1)

    pre1 = jnp.where(dd_mask, pre1 + extra, 0.0)
    pre2 = jnp.where(dd_mask, pre2, 0.0)
    pre3 = jnp.where(dd_mask, pre3, 0.0)
    f_dd = (pre1[..., None] * delta
            + pre2[..., None] * mu[:, None, :]
            + pre3[..., None] * mu[None, :, :])
    u_dd = 0.5 * jnp.sum(jnp.where(dd_mask, u_dd_pair, 0.0))

    f_pair = f_cd + f_dd                                          # (N,N,3)
    f = jnp.sum(f_pair, axis=1)

    # ---- self energy (reference :431-433) ----
    u_self = 0.5 * jnp.sum(
        jnp.where(alpha != 0.0, jnp.sum(mu * mu, axis=1) / jnp.where(alpha != 0.0, alpha, 1.0), 0.0)
    )

    u_polar = u_self + u_ef + u_dd

    # Virial via F.r over WRAPPED coordinates, exactly like the reference:
    # with vflag_global == 2 (the normal thermo-pressure path) ev_setup
    # switches the whole pair virial to virial_fdotr_compute
    # (pair.cpp:810-816, called at ...polarization.cpp:644), which sums
    # x_i (x) f_i over the STORED (box-wrapped) positions.  For these
    # minimum-image O(N^2) loops that is NOT the min-image pairwise tally:
    # pairs whose raw wrapped-coordinate difference crosses the box pick up
    # image terms (measured 0.335 bar of Bulk H2's step-0 Press).  The polar
    # forces are pairwise with action=reaction, so fdotr over the net polar
    # force reproduces the reference exactly.
    if xshift is not None:
        xw = x + xshift
    else:
        per = jnp.asarray(box.periodic)
        L = box.lengths
        xw = jnp.where(per[None, :],
                       x - jnp.floor((x - box.lo) / L) * L, x)
    fm = jnp.where(mask[:, None], f, 0.0)
    virial = jnp.stack([
        jnp.sum(xw[:, 0] * fm[:, 0]),
        jnp.sum(xw[:, 1] * fm[:, 1]),
        jnp.sum(xw[:, 2] * fm[:, 2]),
        jnp.sum(xw[:, 0] * fm[:, 1]),
        jnp.sum(xw[:, 0] * fm[:, 2]),
        jnp.sum(xw[:, 1] * fm[:, 2]),
    ]).astype(dtype)
    return f, u_polar, virial
