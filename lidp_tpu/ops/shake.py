"""fix shake — batched SHAKE constraint solver (RIGID/fix_shake.cpp).

The reference solves each 2/3/4-atom cluster with a hand-unrolled routine
(shake :1398, shake3 :1499, shake4 :1672, shake3angle :1924).  All of them
are instances of one structure: C distance constraints c between cluster
atoms (p_c, q_c) with targets bond_c, corrections
dx_i = dtfsq/m_i * sum_c lambda_c r_c (delta_{i,p_c} - delta_{i,q_c}),
solved by iterating   lambda <- A^{-1} (bond^2 - s^2 - Q(lambda))
with A_cd = 2 c_cd (s_c . r_d),  Q_c = sum_de c_cd c_ce (r_d . r_e) l_d l_e,
c_cd = 1/m_{p_c} (d_{p_c p_d} - d_{p_c q_d}) - 1/m_{q_c} (d_{q_c p_d} -
d_{q_c q_d}) — the reference's a11/a12/quad_* coefficients are exactly these.
Here ALL clusters solve simultaneously as (M, C<=3) batches; the fixed-point
loop is a lax.fori over max_iter with converged lanes frozen.

Constraint forces are applied in post_force (:564): f += lambda/dtfsq * r_c
on p_c, minus on q_c, so the next Verlet position update lands on the
constraint manifold.  xshake prediction mirrors unconstrained_update (:1314).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.box import minimum_image


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShakeParams:
    atoms: jax.Array       # (M,4) int32 atom ids, -1 pad (slot 0 = central)
    cpairs: jax.Array      # (M,3,2) int32 local constraint pairs, -1 pad
    bond2: jax.Array       # (M,3) target distance^2 (0 pad)
    cmask: jax.Array       # (M,3) bool active constraints
    invmass: jax.Array     # (N,) 1/m per atom
    dtv: jax.Array
    dtfsq: jax.Array       # dt^2*ftm2v (fix_shake.cpp:458)
    nconstraints: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_iter: int = dataclasses.field(metadata=dict(static=True), default=25)
    tolerance: float = dataclasses.field(metadata=dict(static=True),
                                         default=1e-4)


def _inv3(A):
    """Batched explicit 3x3 inverse via the adjugate — jnp.linalg.inv lowers
    to LuDecomposition, which some TPU toolchains lack for f64, and the
    closed form is faster at this size anyway."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f_ = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f_ * h, c * h - b * i, b * f_ - c * e], -1),
        jnp.stack([f_ * g - d * i, a * i - c * g, c * d - a * f_], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1)], -2)
    det = a * (e * i - f_ * h) - b * (d * i - f_ * g) + c * (d * h - e * g)
    return co / det[..., None, None]


def shake_post_force(sys, f, p: ShakeParams):
    """Constraint force correction (FixShake::post_force)."""
    x, v = sys.x, sys.v
    L = sys.box.lengths
    dtype = x.dtype

    # unconstrained prediction (:1314)
    xs = x + p.dtv * v + (p.dtfsq * p.invmass)[:, None] * f

    ai = jnp.maximum(p.atoms, 0)                        # (M,4)
    pa = jnp.take_along_axis(ai, jnp.maximum(p.cpairs[:, :, 0], 0), axis=1)
    qa = jnp.take_along_axis(ai, jnp.maximum(p.cpairs[:, :, 1], 0), axis=1)
    r = minimum_image(x[pa] - x[qa], L)                 # (M,3,3) r_c
    s = minimum_image(xs[pa] - xs[qa], L)               # (M,3,3) s_c

    im_p = p.invmass[pa]                                # (M,3)
    im_q = p.invmass[qa]
    # coupling c_cd (M,3,3): via shared-atom deltas on local indices
    pc = p.cpairs[:, :, 0]
    qc = p.cpairs[:, :, 1]
    d_pp = (pc[:, :, None] == pc[:, None, :]).astype(dtype)
    d_pq = (pc[:, :, None] == qc[:, None, :]).astype(dtype)
    d_qp = (qc[:, :, None] == pc[:, None, :]).astype(dtype)
    d_qq = (qc[:, :, None] == qc[:, None, :]).astype(dtype)
    ccd = im_p[:, :, None] * (d_pp - d_pq) - im_q[:, :, None] * (d_qp - d_qq)
    act = p.cmask.astype(dtype)
    ccd = ccd * act[:, :, None] * act[:, None, :]

    sr = jnp.einsum("mcx,mdx->mcd", s, r)               # s_c . r_d
    rr = jnp.einsum("mcx,mdx->mcd", r, r)               # r_c . r_d
    A = 2.0 * ccd * sr
    # pad inactive constraints with identity rows so the 3x3 inverse exists
    eye = jnp.eye(3, dtype=dtype)
    A = A + (1.0 - act[:, :, None] * act[:, None, :]) * eye
    A = jnp.where((act[:, :, None] * act[:, None, :] + eye) > 0, A, 0.0)
    Ainv = _inv3(A)

    s2 = jnp.sum(s * s, axis=-1)
    rhs0 = (p.bond2 - s2) * act                         # (M,3)

    # Q_c(lambda) = sum_de c_cd c_ce (r_d.r_e) l_d l_e
    def body(_, carry):
        lam, done = carry
        cl = ccd * lam[:, None, :]                      # c_cd l_d
        quad = jnp.einsum("mcd,mde,mce->mc", cl, rr, ccd * lam[:, None, :])
        b = rhs0 - quad * act
        lam_new = jnp.einsum("mcd,md->mc", Ainv, b) * act
        step_done = jnp.all(jnp.abs(lam_new - lam) <= p.tolerance,
                            axis=-1, keepdims=True)
        lam = jnp.where(done, lam, lam_new)
        return lam, done | step_done

    lam0 = jnp.zeros_like(s2)
    lam, _ = jax.lax.fori_loop(
        0, p.max_iter, body, (lam0, jnp.zeros(s2.shape[:1] + (1,), bool)))

    lam = lam / p.dtfsq * act
    contrib = lam[:, :, None] * r                       # (M,3,3)
    f = f.at[pa.reshape(-1)].add(contrib.reshape(-1, 3))
    f = f.at[qa.reshape(-1)].add(-contrib.reshape(-1, 3))
    # constraint virial (v_tally in shake/shake3/...: lamda_c r_c (x) r_c)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    vir = jnp.stack([jnp.sum(lam * rx * rx), jnp.sum(lam * ry * ry),
                     jnp.sum(lam * rz * rz), jnp.sum(lam * rx * ry),
                     jnp.sum(lam * rx * rz), jnp.sum(lam * ry * rz)])
    return f, vir.astype(f.dtype)


def rattle_velocity(sys, p: ShakeParams):
    """RATTLE velocity-stage constraint (RIGID/fix_rattle.cpp vrattle2/3/4/
    3angle, :240-524): project velocities so r_c . (v_p - v_q) = 0 for every
    constraint.  Linear solve A mu = -b with A_cd = c_cd (r_c . r_d) and
    b_c = r_c . (v_p - v_q); correction v_i += invm_i sum_c mu_c r_c
    (delta_{i,p_c} - delta_{i,q_c}).  All clusters solve as one (M,C,C)
    batch; the 2-atom/3-atom cases are the same system with masked rows."""
    x, v = sys.x, sys.v
    L = sys.box.lengths
    dtype = x.dtype

    ai = jnp.maximum(p.atoms, 0)
    pa = jnp.take_along_axis(ai, jnp.maximum(p.cpairs[:, :, 0], 0), axis=1)
    qa = jnp.take_along_axis(ai, jnp.maximum(p.cpairs[:, :, 1], 0), axis=1)
    r = minimum_image(x[pa] - x[qa], L)                 # (M,3,3)
    vr = v[pa] - v[qa]
    act = p.cmask.astype(dtype)
    b = jnp.sum(r * vr, axis=-1) * act                  # (M,3)

    im_p = p.invmass[pa]
    im_q = p.invmass[qa]
    pc = p.cpairs[:, :, 0]
    qc = p.cpairs[:, :, 1]
    d_pp = (pc[:, :, None] == pc[:, None, :]).astype(dtype)
    d_pq = (pc[:, :, None] == qc[:, None, :]).astype(dtype)
    d_qp = (qc[:, :, None] == pc[:, None, :]).astype(dtype)
    d_qq = (qc[:, :, None] == qc[:, None, :]).astype(dtype)
    ccd = im_p[:, :, None] * (d_pp - d_pq) - im_q[:, :, None] * (d_qp - d_qq)
    pairact = act[:, :, None] * act[:, None, :]
    ccd = ccd * pairact

    rr = jnp.einsum("mcx,mdx->mcd", r, r)
    A = ccd * rr
    eye = jnp.eye(3, dtype=dtype)
    A = A + (1.0 - pairact) * eye
    A = jnp.where((pairact + eye) > 0, A, 0.0)
    mu = -jnp.einsum("mcd,md->mc", _inv3(A), b) * act   # (M,3)

    contrib = mu[:, :, None] * r                        # (M,3,3)
    v = v.at[pa.reshape(-1)].add(
        (im_p[:, :, None] * contrib).reshape(-1, 3))
    v = v.at[qa.reshape(-1)].add(
        (-im_q[:, :, None] * contrib).reshape(-1, 3))
    v = jnp.where(sys.mask[:, None], v, 0.0)
    return sys.replace(v=v)


def find_clusters(n, bonds, bond_types, angles, angle_types, mass_atom,
                  *, b_types=(), a_types=(), masses=(), t_types=(),
                  type_atom=None, bond_r0=None, angle_theta0=None,
                  tol=0.1):
    """FixShake::find_clusters (host-side): select constrained bonds, group
    them into star clusters around a central atom, and add 1-3 angle
    constraints for `a` types.  Returns numpy arrays for ShakeParams.

    masses: `m` values — a bond is constrained if either atom's mass matches
    within 0.1 (fix_shake.cpp MASSDELTA).  bond_r0/angle_theta0: equilibrium
    tables indexed by type (bond_distance/angle_distance :318 init).
    """
    bonds = np.asarray(bonds)
    sel = np.zeros(len(bonds), bool)
    for bt in b_types:
        sel |= bond_types == bt
    for m in masses:
        sel |= (np.abs(mass_atom[bonds[:, 0]] - m) <= tol) | \
               (np.abs(mass_atom[bonds[:, 1]] - m) <= tol)
    if t_types and type_atom is not None:
        for tt in t_types:
            sel |= (type_atom[bonds[:, 0]] == tt) | \
                   (type_atom[bonds[:, 1]] == tt)
    cb = bonds[sel]
    cbt = np.asarray(bond_types)[sel]
    if len(cb) == 0:
        return None
    sel_rows = np.nonzero(sel)[0]       # constrained bond rows (to disable —
    used_angle_rows = []                # the reference negates their types)

    # star grouping: the central atom is the one appearing in >1 constrained
    # bond, or the heavier atom of a lone bond (reference picks the non-H)
    from collections import defaultdict

    deg = defaultdict(list)
    for ib, (a, b) in enumerate(cb):
        deg[a].append(ib)
        deg[b].append(ib)
    multi = {a for a, ibs in deg.items() if len(ibs) > 1}
    clusters = {}
    for ib, (a, b) in enumerate(cb):
        if a in multi and b in multi:
            raise ValueError("SHAKE cluster of connected centrals "
                             "(ring/chain) — not a star")
        if a in multi:
            c = a
        elif b in multi:
            c = b
        else:
            c = a if mass_atom[a] >= mass_atom[b] else b
        clusters.setdefault(c, []).append(ib)

    # angle constraints: shake3 clusters whose 2 bonds form an `a`-type angle
    angle_by_pair = {}
    if len(a_types) and angles is not None and len(angles):
        for row, ((i, j, k), at) in enumerate(
                zip(np.asarray(angles), np.asarray(angle_types))):
            if at in a_types:
                angle_by_pair[(j, frozenset((i, k)))] = (at, row)

    rows_atoms, rows_pairs, rows_b2, rows_mask = [], [], [], []
    ncons = 0
    for c, ibs in clusters.items():
        if len(ibs) > 3:
            raise ValueError(f"SHAKE cluster with {len(ibs)} bonds at atom {c}")
        others = [cb[ib][1] if cb[ib][0] == c else cb[ib][0] for ib in ibs]
        atoms = [c] + others + [-1] * (3 - len(others))
        cpairs, b2 = [], []
        for loc, ib in enumerate(ibs):
            r0 = bond_r0[cbt[ib]]
            cpairs.append((0, loc + 1))
            b2.append(r0 * r0)
        if len(ibs) == 2:
            hit = angle_by_pair.get((c, frozenset(others)))
            if hit is not None:
                at, arow = hit
                used_angle_rows.append(arow)
                b1r = np.sqrt(b2[0]); b2r = np.sqrt(b2[1])
                th = angle_theta0[at]
                d2 = b1r * b1r + b2r * b2r - 2.0 * b1r * b2r * np.cos(th)
                cpairs.append((1, 2))
                b2.append(d2)
        mask = [True] * len(cpairs) + [False] * (3 - len(cpairs))
        ncons += len(cpairs)
        cpairs += [(-1, -1)] * (3 - len(cpairs))
        b2 += [0.0] * (3 - len(b2))
        rows_atoms.append(atoms)
        rows_pairs.append(cpairs)
        rows_b2.append(b2)
        rows_mask.append(mask)

    return (np.asarray(rows_atoms, np.int32), np.asarray(rows_pairs, np.int32),
            np.asarray(rows_b2), np.asarray(rows_mask), ncons,
            sel_rows, np.asarray(used_angle_rows, int))


def build_shake_params(n, dt, ftm2v, mass_atom, found, *, tolerance=1e-4,
                       max_iter=25, dtype=jnp.float64):
    atoms, cpairs, b2, cmask, ncons = found[:5]
    return ShakeParams(
        atoms=jnp.asarray(atoms), cpairs=jnp.asarray(cpairs),
        bond2=jnp.asarray(b2, dtype), cmask=jnp.asarray(cmask),
        invmass=jnp.asarray(1.0 / np.asarray(mass_atom), dtype),
        dtv=jnp.asarray(dt, dtype),
        # dt^2*ftm2v WITHOUT the 0.5 — the prediction covers a full kick
        # (two half-kicks with the same corrected f) plus the drift
        # (fix_shake.cpp:458; the 0.5 variant :457 is RATTLE-only)
        dtfsq=jnp.asarray(dt * dt * ftm2v, dtype),
        nconstraints=int(ncons), max_iter=max_iter, tolerance=tolerance)
