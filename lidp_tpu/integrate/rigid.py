"""fix rigid/nve — rigid-body velocity-Verlet integration.

Reimplements FixRigid (reference RIGID/fix_rigid.cpp) batched over bodies:

  * body setup (setup_bodies_static :1605-2118): per-body mass/COM, inertia
    tensor diagonalization (numpy eigh instead of the reference's Jacobi
    rotations — any right-handed principal basis yields identical dynamics),
    EPSILON=1e-7 zeroing of small principal moments (linear molecules,
    :1915-1921), body-frame atom displacements;
  * per step (initial_integrate :891, final_integrate :1011): vcm half-kick,
    xcm drift, angular-momentum half-kick, Richardson quaternion update
    (math_extra.cpp richardson), atom x/v reconstruction (set_xv :1289,
    set_v :1465).  The reference's MPI_Allreduce of per-body force/torque sums
    (:1063) becomes a segment_sum over body ids;
  * dof accounting (dof() :1181): 3n-6 removed per fully-counted body, +1 per
    linear body.

Unlike the reference we keep rigid-atom coordinates unwrapped (x = R d + xcm);
all force kernels are minimum-image/phase-periodic so wrapped and unwrapped
coordinates are physically identical, and xcmimage bookkeeping (:1150) is
unnecessary.  Massless virtual sites are tolerated: the 2018 inertia re-check
that aborts MOF5+CO2 ("Fix rigid: Bad principal moments", :2090-2103) is
deliberately not enforced (SURVEY.md §0 secondary defect).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidp_tpu.state import System

EPSILON = 1.0e-7


# ----------------------------- quaternion math -----------------------------

def q_to_matrix(q):
    """Rotation matrix with columns ex,ey,ez (math_extra q_to_exyz), batched (...,4)->(...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ex = jnp.stack([w * w + x * x - y * y - z * z,
                    2.0 * (x * y + w * z),
                    2.0 * (x * z - w * y)], axis=-1)
    ey = jnp.stack([2.0 * (x * y - w * z),
                    w * w - x * x + y * y - z * z,
                    2.0 * (y * z + w * x)], axis=-1)
    ez = jnp.stack([2.0 * (x * z + w * y),
                    2.0 * (y * z - w * x),
                    w * w - x * x - y * y + z * z], axis=-1)
    return jnp.stack([ex, ey, ez], axis=-1)   # R[.., :, col]


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def vecquat(a, b):
    """(0,a) (x) b quaternion product (math_extra vecquat), batched."""
    c0 = -(a[..., 0] * b[..., 1] + a[..., 1] * b[..., 2] + a[..., 2] * b[..., 3])
    c1 = b[..., 0] * a[..., 0] + (a[..., 1] * b[..., 3] - a[..., 2] * b[..., 2])
    c2 = b[..., 0] * a[..., 1] + (a[..., 2] * b[..., 1] - a[..., 0] * b[..., 3])
    c3 = b[..., 0] * a[..., 2] + (a[..., 0] * b[..., 2] - a[..., 1] * b[..., 1])
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def _omega_from_R(m, R, inertia):
    """omega = R diag(1/I) R^T m with zero-inertia components zeroed
    (angmom_to_omega / mq_to_omega)."""
    mbody = jnp.einsum("...ij,...i->...j", R, m)          # R^T m (R cols = axes)
    inv = jnp.where(inertia > 0.0, 1.0 / jnp.where(inertia > 0.0, inertia, 1.0), 0.0)
    wbody = mbody * inv
    return jnp.einsum("...ij,...j->...i", R, wbody)


def richardson(q, m, w, inertia, dtq):
    """Quaternion full-step Richardson update (math_extra.cpp richardson)."""
    wq = vecquat(w, q)
    qfull = qnormalize(q + dtq * wq)
    qhalf = qnormalize(q + 0.5 * dtq * wq)
    Rh = q_to_matrix(qhalf)
    w2 = _omega_from_R(m, Rh, inertia)
    wq2 = vecquat(w2, qhalf)
    qhalf = qnormalize(qhalf + 0.5 * dtq * wq2)
    return qnormalize(2.0 * qhalf - qfull), w2


# ------------------------------- body setup --------------------------------

@dataclasses.dataclass(frozen=True)
class RigidSetup:
    """Host-side static body data."""

    nbody: int
    body_of_atom: np.ndarray     # (N,) int32, -1 for non-rigid atoms
    masstotal: np.ndarray        # (B,)
    inertia: np.ndarray          # (B,3) principal moments (zeroed if tiny)
    displace: np.ndarray         # (N,3) body-frame coords (0 for non-rigid)
    xcm0: np.ndarray             # (B,3)
    quat0: np.ndarray            # (B,4)
    dof_removed: int             # dof removed from the full group temperature
    nlinear: int


def _exyz_to_q(R):
    """Quaternion from a rotation matrix with columns ex,ey,ez (host, one body)."""
    ex, ey, ez = R[:, 0], R[:, 1], R[:, 2]
    sq = np.array([
        1.0 + ex[0] + ey[1] + ez[2],
        1.0 + ex[0] - ey[1] - ez[2],
        1.0 - ex[0] + ey[1] - ez[2],
        1.0 - ex[0] - ey[1] + ez[2],
    ]) * 0.25
    i = int(np.argmax(sq))
    q = np.zeros(4)
    q[i] = np.sqrt(max(sq[i], 0.0))
    if i == 0:
        q[1] = (ey[2] - ez[1]) / (4.0 * q[0])
        q[2] = (ez[0] - ex[2]) / (4.0 * q[0])
        q[3] = (ex[1] - ey[0]) / (4.0 * q[0])
    elif i == 1:
        q[0] = (ey[2] - ez[1]) / (4.0 * q[1])
        q[2] = (ey[0] + ex[1]) / (4.0 * q[1])
        q[3] = (ex[2] + ez[0]) / (4.0 * q[1])
    elif i == 2:
        q[0] = (ez[0] - ex[2]) / (4.0 * q[2])
        q[1] = (ey[0] + ex[1]) / (4.0 * q[2])
        q[3] = (ez[1] + ey[2]) / (4.0 * q[2])
    else:
        q[0] = (ex[1] - ey[0]) / (4.0 * q[3])
        q[1] = (ex[2] + ez[0]) / (4.0 * q[3])
        q[2] = (ez[1] + ey[2]) / (4.0 * q[3])
    return q / np.linalg.norm(q)


def setup_bodies(x_unwrapped: np.ndarray, mass_atom: np.ndarray,
                 mol: np.ndarray, in_group: np.ndarray) -> RigidSetup:
    """Bodies = molecule ids of atoms in the fix group (fix rigid ... molecule,
    fix_rigid.cpp:126-160). Coordinates must be unwrapped (image-applied)."""
    mols = np.unique(mol[in_group])
    body_index = {int(m): i for i, m in enumerate(mols)}
    nb = len(mols)
    body = np.full(x_unwrapped.shape[0], -1, np.int32)
    for i in np.nonzero(in_group)[0]:
        body[i] = body_index[int(mol[i])]

    masstotal = np.zeros(nb)
    xcm = np.zeros((nb, 3))
    for i in np.nonzero(body >= 0)[0]:
        b = body[i]
        masstotal[b] += mass_atom[i]
        xcm[b] += mass_atom[i] * x_unwrapped[i]
    xcm /= masstotal[:, None]

    inertia = np.zeros((nb, 3))
    quat = np.zeros((nb, 4))
    Rall = np.zeros((nb, 3, 3))
    for b in range(nb):
        idx = np.nonzero(body == b)[0]
        d = x_unwrapped[idx] - xcm[b]
        m = mass_atom[idx]
        it = np.zeros((3, 3))
        it[0, 0] = np.sum(m * (d[:, 1] ** 2 + d[:, 2] ** 2))
        it[1, 1] = np.sum(m * (d[:, 0] ** 2 + d[:, 2] ** 2))
        it[2, 2] = np.sum(m * (d[:, 0] ** 2 + d[:, 1] ** 2))
        it[0, 1] = it[1, 0] = -np.sum(m * d[:, 0] * d[:, 1])
        it[0, 2] = it[2, 0] = -np.sum(m * d[:, 0] * d[:, 2])
        it[1, 2] = it[2, 1] = -np.sum(m * d[:, 1] * d[:, 2])
        evals, evecs = np.linalg.eigh(it)
        mx = float(np.max(evals))
        evals = np.where(np.abs(evals) < EPSILON * max(mx, 1e-300), 0.0, evals)
        evals = np.maximum(evals, 0.0)
        # right-handed basis (fix_rigid.cpp:1925-1931)
        if np.dot(np.cross(evecs[:, 0], evecs[:, 1]), evecs[:, 2]) < 0.0:
            evecs[:, 2] = -evecs[:, 2]
        inertia[b] = evals
        Rall[b] = evecs
        quat[b] = _exyz_to_q(evecs)

    displace = np.zeros_like(x_unwrapped)
    for i in np.nonzero(body >= 0)[0]:
        b = body[i]
        displace[i] = Rall[b].T @ (x_unwrapped[i] - xcm[b])

    nlinear = int(np.sum(np.any(inertia == 0.0, axis=1)))
    natoms_rigid = int(np.sum(body >= 0))
    dof_removed = 3 * natoms_rigid - 6 * nb + nlinear
    return RigidSetup(
        nbody=nb, body_of_atom=body, masstotal=masstotal, inertia=inertia,
        displace=displace, xcm0=xcm, quat0=quat,
        dof_removed=dof_removed, nlinear=nlinear,
    )


# ------------------------------ device params ------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidParams:
    dtv: jax.Array
    dtf: jax.Array            # 0.5*dt*ftm2v
    dtq: jax.Array            # 0.5*dt
    body: jax.Array           # (N,) int32 (-1 -> mapped to B for segment drop)
    in_body: jax.Array        # (N,) bool
    masstotal: jax.Array      # (B,)
    inertia: jax.Array        # (B,3)
    displace: jax.Array       # (N,3)
    quat0: jax.Array          # (B,4) initial orientation from body setup
    mass_atom: jax.Array      # (N,) per-atom mass (constraint-virial tally)
    nbody: int = dataclasses.field(metadata=dict(static=True), default=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidState:
    xcm: jax.Array     # (B,3)
    vcm: jax.Array
    angmom: jax.Array
    quat: jax.Array    # (B,4)
    fcm: jax.Array
    torque: jax.Array
    virial: jax.Array  # (6,) constraint virial of the current step (set_xv+set_v)


def make_rigid_params(setup: RigidSetup, dt: float, ftm2v: float,
                      mass_atom=None, dtype=jnp.float64) -> RigidParams:
    body = np.where(setup.body_of_atom < 0, setup.nbody, setup.body_of_atom)
    if mass_atom is None:
        mass_atom = np.zeros(setup.body_of_atom.shape[0])
    return RigidParams(
        dtv=jnp.asarray(dt, dtype),
        dtf=jnp.asarray(0.5 * dt * ftm2v, dtype),
        dtq=jnp.asarray(0.5 * dt, dtype),
        body=jnp.asarray(body, jnp.int32),
        in_body=jnp.asarray(setup.body_of_atom >= 0),
        masstotal=jnp.asarray(setup.masstotal, dtype),
        inertia=jnp.asarray(setup.inertia, dtype),
        displace=jnp.asarray(setup.displace, dtype),
        quat0=jnp.asarray(setup.quat0, dtype),
        mass_atom=jnp.asarray(mass_atom, dtype),
        nbody=setup.nbody,
    )


def init_rigid_state(sys: System, f, p: RigidParams, mass_atom):
    """setup_bodies_dynamic (:2120) + FixRigid::setup (:782): vcm/angmom from
    atom velocities, initial fcm/torque from current forces, then set_v —
    atom velocities are projected onto rigid motion (removes intra-body
    components created by `velocity create`). Returns (sys, state)."""
    b = p.body
    nb = p.nbody
    m = mass_atom[:, None] * p.in_body[:, None]
    xcm = jax.ops.segment_sum(m * sys.x, b, nb) / p.masstotal[:, None]
    vcm = jax.ops.segment_sum(m * sys.v, b, nb) / p.masstotal[:, None]
    d = sys.x - xcm[jnp.clip(b, 0, nb - 1)]
    angmom = jax.ops.segment_sum(m * jnp.cross(d, sys.v), b, nb)
    fcm, torque = _force_torque(sys.x, f, xcm, p)

    R = q_to_matrix(p.quat0)
    w = _omega_from_R(angmom, R, p.inertia)
    bidx = jnp.clip(p.body, 0, nb - 1)
    d_space = jnp.einsum("nij,nj->ni", R[bidx], p.displace)
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    # setup virial guesstimate = 2x the set_v tally (FixRigid::setup :880-889)
    vir = 2.0 * _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(v=jnp.where(inb, v_new, sys.v))
    st = RigidState(xcm=xcm, vcm=vcm, angmom=angmom, quat=p.quat0,
                    fcm=fcm, torque=torque, virial=vir)
    return sys, st


def _constraint_virial(x, v_old, v_new, f, p: RigidParams):
    """0.5 * sum_i x_i (x) fc_i with fc = m dv/dtf - f (set_xv/set_v tallies,
    fix_rigid.cpp:1383-1399, :1520-1545). Coordinates here are unwrapped."""
    inb = p.in_body[:, None]
    fc = jnp.where(inb, p.mass_atom[:, None] * (v_new - v_old) / p.dtf - f, 0.0)
    return 0.5 * jnp.stack([
        jnp.sum(x[:, 0] * fc[:, 0]), jnp.sum(x[:, 1] * fc[:, 1]),
        jnp.sum(x[:, 2] * fc[:, 2]), jnp.sum(x[:, 0] * fc[:, 1]),
        jnp.sum(x[:, 0] * fc[:, 2]), jnp.sum(x[:, 1] * fc[:, 2]),
    ])


def _force_torque(x, f, xcm, p: RigidParams):
    b = p.body
    nb = p.nbody
    w = p.in_body[:, None]
    fcm = jax.ops.segment_sum(jnp.where(w, f, 0.0), b, nb)
    d = x - xcm[jnp.clip(b, 0, nb - 1)]
    torque = jax.ops.segment_sum(jnp.where(w, jnp.cross(d, f), 0.0), b, nb)
    return fcm, torque


def initial_integrate(sys: System, f, p: RigidParams, st: RigidState):
    dtfm = (p.dtf / p.masstotal)[:, None]
    vcm = st.vcm + dtfm * st.fcm
    xcm = st.xcm + p.dtv * vcm
    angmom = st.angmom + p.dtf * st.torque
    R = q_to_matrix(st.quat)
    w = _omega_from_R(angmom, R, p.inertia)
    quat, w = richardson(st.quat, angmom, w, p.inertia, p.dtq)
    R = q_to_matrix(quat)

    # set_xv (:1289): x = R d + xcm (unwrapped), v = vcm + omega x (R d)
    bidx = jnp.clip(p.body, 0, p.nbody - 1)
    Ra = R[bidx]
    d_space = jnp.einsum("nij,nj->ni", Ra, p.displace)
    x_new = d_space + xcm[bidx]
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    # set_xv half of the constraint virial, tallied with pre-update coords
    vir = _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(
        x=jnp.where(inb, x_new, sys.x),
        v=jnp.where(inb, v_new, sys.v),
    )
    return sys, RigidState(xcm=xcm, vcm=vcm, angmom=angmom, quat=quat,
                           fcm=st.fcm, torque=st.torque, virial=vir)


def final_integrate(sys: System, f, p: RigidParams, st: RigidState):
    fcm, torque = _force_torque(sys.x, f, st.xcm, p)
    dtfm = (p.dtf / p.masstotal)[:, None]
    vcm = st.vcm + dtfm * fcm
    angmom = st.angmom + p.dtf * torque
    R = q_to_matrix(st.quat)
    w = _omega_from_R(angmom, R, p.inertia)

    # set_v (:1465)
    bidx = jnp.clip(p.body, 0, p.nbody - 1)
    d_space = jnp.einsum("nij,nj->ni", R[bidx], p.displace)
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    # set_v half of the constraint virial (current coords)
    vir = st.virial + _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(v=jnp.where(inb, v_new, sys.v))
    return sys, RigidState(xcm=st.xcm, vcm=vcm, angmom=angmom, quat=st.quat,
                           fcm=fcm, torque=torque, virial=vir)
