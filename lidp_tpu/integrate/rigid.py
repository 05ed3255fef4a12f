"""fix rigid/nve + rigid/nvt — rigid-body integration (no-squish + NH chains).

In the reference, rigid/nve and rigid/nvt are FixRigidNH (fix_rigid_nve.h:27
subclasses it): the symplectic NO-SQUISH quaternion integrator of Kamberaj et
al. (conjugate quaternion momentum + 5 permutation rotations,
math_extra.cpp no_squish_rotate, fix_rigid_nh.cpp:430-589,592-790), with
optional Nose-Hoover thermostat chains on the translational and rotational
kinetic energies (nhc_temp_integrate, fix_rigid_nh.cpp:829-917).  This module
reimplements exactly that, batched over bodies:

  * body setup (FixRigid::setup_bodies_static :1605-2118): per-body mass/COM,
    inertia diagonalization (numpy eigh instead of Jacobi rotations — any
    right-handed principal basis yields identical dynamics), EPSILON=1e-7
    zeroing of small principal moments (linear molecules), body-frame
    displacements;
  * per step: vcm half-kick (+thermostat scale), xcm drift, torque ->
    quaternion force, conjqm update, no-squish 3-2-1-2-3 rotation sequence,
    atom x/v reconstruction (set_xv :1289, set_v :1465); per-body force/torque
    MPI_Allreduce (:1063) becomes a segment_sum over body ids;
  * NH chains: Yoshida-Suzuki w coefficients (t_order 3/5, :244-258),
    per-chain masses q_t/q_r, the reference's update order, and the
    kinetic-energy accumulations akin_t/akin_r;
  * dof accounting (FixRigid::dof :1181): 3n-6 per fully-counted body, +1 per
    linear body; nf_t/nf_r per FixRigidNH::init (:225-237).

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
    """Quaternion full-step Richardson update (math_extra.cpp richardson).

    Kept for the plain `fix rigid` style; rigid/nve+nvt use no-squish below.
    """
    wq = vecquat(w, q)
    qfull = qnormalize(q + dtq * wq)
    qhalf = qnormalize(q + 0.5 * dtq * wq)
    Rh = q_to_matrix(qhalf)
    w2 = _omega_from_R(m, Rh, inertia)
    wq2 = vecquat(w2, qhalf)
    qhalf = qnormalize(qhalf + 0.5 * dtq * wq2)
    return qnormalize(2.0 * qhalf - qfull), w2


def quatvec(a, b):
    """c = a (x) (0,b): quaternion times pure-vector (math_extra.h:609)."""
    c0 = -a[..., 1] * b[..., 0] - a[..., 2] * b[..., 1] - a[..., 3] * b[..., 2]
    c1 = a[..., 0] * b[..., 0] + a[..., 2] * b[..., 2] - a[..., 3] * b[..., 1]
    c2 = a[..., 0] * b[..., 1] + a[..., 3] * b[..., 0] - a[..., 1] * b[..., 2]
    c3 = a[..., 0] * b[..., 2] + a[..., 1] * b[..., 1] - a[..., 2] * b[..., 0]
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def invquatvec(a, b):
    """c = vector part of conj(a) (x) b (math_extra.h:636)."""
    c0 = -a[..., 1] * b[..., 0] + a[..., 0] * b[..., 1] + a[..., 3] * b[..., 2] - a[..., 2] * b[..., 3]
    c1 = -a[..., 2] * b[..., 0] - a[..., 3] * b[..., 1] + a[..., 0] * b[..., 2] + a[..., 1] * b[..., 3]
    c2 = -a[..., 3] * b[..., 0] + a[..., 2] * b[..., 1] - a[..., 1] * b[..., 2] + a[..., 0] * b[..., 3]
    return jnp.stack([c0, c1, c2], axis=-1)


def no_squish_rotate(k, p, q, inertia, dt):
    """Evolution operator on (conjqm, quat), Miller et al. 2002
    (math_extra.cpp no_squish_rotate), batched over bodies.

    k indexes the permutation (1..3); inertia components < 1e-6 freeze the
    rotation (phi = 0), matching the reference's linear-body handling.
    """
    sgn_fix = {1: ((-1.0, 1), (1.0, 0), (1.0, 3), (-1.0, 2)),
               2: ((-1.0, 2), (-1.0, 3), (1.0, 0), (1.0, 1)),
               3: ((-1.0, 3), (1.0, 2), (-1.0, 1), (1.0, 0))}[k]
    kq = jnp.stack([s * q[..., i] for s, i in sgn_fix], axis=-1)
    kp = jnp.stack([s * p[..., i] for s, i in sgn_fix], axis=-1)
    phi = jnp.sum(p * kq, axis=-1)
    inert = inertia[..., k - 1]
    phi = jnp.where(jnp.abs(inert) < 1e-6, 0.0,
                    phi / jnp.where(jnp.abs(inert) < 1e-6, 1.0, 4.0 * inert))
    c = jnp.cos(dt * phi)[..., None]
    s = jnp.sin(dt * phi)[..., None]
    return c * p + s * kp, c * q + s * kq


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
    # thermostat (fix rigid/nvt); tstat False -> plain no-squish NVE
    t_start: jax.Array = None
    t_stop: jax.Array = None
    t_freq: jax.Array = None      # 1/Tdamp
    # current ramped target (driver substitutes via ramp_target each step,
    # FixRigidNH::compute_temp_target fix_rigid_nh.cpp:1107-1115)
    t_target: jax.Array = None
    # barostat (fix rigid/npt + rigid/nph, FixRigidNH pstat_flag path)
    p_target: jax.Array = None    # (3,) current per-dim target
    p_stop: jax.Array = None      # (3,)
    p_freq: jax.Array = None      # (3,) 1/Pdamp
    p_freq_max: jax.Array = None
    ramp_begin: jax.Array = None
    ramp_end: jax.Array = None
    nbody: int = dataclasses.field(metadata=dict(static=True), default=0)
    tstat: bool = dataclasses.field(metadata=dict(static=True), default=False)
    pstat: bool = dataclasses.field(metadata=dict(static=True), default=False)
    p_chain: int = dataclasses.field(metadata=dict(static=True), default=10)
    p_flag: tuple = dataclasses.field(metadata=dict(static=True),
                                      default=(False, False, False))
    iso: bool = dataclasses.field(metadata=dict(static=True), default=True)
    nktv2p: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    dim: int = dataclasses.field(metadata=dict(static=True), default=3)
    t_chain: int = dataclasses.field(metadata=dict(static=True), default=10)
    t_iter: int = dataclasses.field(metadata=dict(static=True), default=1)
    t_order: int = dataclasses.field(metadata=dict(static=True), default=3)
    nf_t: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    nf_r: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    boltz: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    mvv2e: float = dataclasses.field(metadata=dict(static=True), default=1.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidState:
    xcm: jax.Array      # (B,3)
    vcm: jax.Array
    angmom: jax.Array
    quat: jax.Array     # (B,4)
    conjqm: jax.Array   # (B,4) conjugate quaternion momentum (no-squish)
    fcm: jax.Array
    torque: jax.Array
    virial: jax.Array   # (6,) constraint virial of the current step
    eta_dot_t: jax.Array  # (chain,) thermostat velocities (translational)
    eta_dot_r: jax.Array  # (chain,) rotational
    # barostat state (rigid/npt + rigid/nph); None when pstat is off
    epsilon_dot: jax.Array = None  # (3,)
    eta_dot_b: jax.Array = None    # (p_chain,) barostat thermostat chain
    mtk_term2: jax.Array = None    # scalar, carried into the next initial


def make_rigid_params(setup: RigidSetup, dt: float, ftm2v: float,
                      mass_atom=None, dtype=jnp.float64, *,
                      tstat=False, t_start=0.0, t_stop=0.0, t_period=1.0,
                      t_chain=10, t_iter=1, t_order=3,
                      boltz=1.0, mvv2e=1.0,
                      pstat=False, p_start=(0.0, 0.0, 0.0),
                      p_stop=(0.0, 0.0, 0.0), p_period=(1.0, 1.0, 1.0),
                      p_flag=(False, False, False), p_chain=10,
                      iso=True, nktv2p=1.0, dim=3) -> RigidParams:
    body = np.where(setup.body_of_atom < 0, setup.nbody, setup.body_of_atom)
    if mass_atom is None:
        mass_atom = np.zeros(setup.body_of_atom.shape[0])
    # nf_t/nf_r per FixRigidNH::init (:225-237)
    nf_t = 3.0 * setup.nbody
    nf_r = 3.0 * setup.nbody - float(np.sum(np.abs(setup.inertia) < EPSILON))
    p_freq = np.where(np.asarray(p_period) > 0.0,
                      1.0 / np.maximum(np.asarray(p_period), 1e-300), 0.0)
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
        t_start=jnp.asarray(t_start, dtype),
        t_stop=jnp.asarray(t_stop, dtype),
        t_freq=jnp.asarray(1.0 / t_period if t_period else 0.0, dtype),
        t_target=jnp.asarray(t_start, dtype),
        p_target=jnp.asarray(p_start, dtype),
        p_stop=jnp.asarray(p_stop, dtype),
        p_freq=jnp.asarray(p_freq, dtype),
        p_freq_max=jnp.asarray(float(np.max(p_freq)), dtype),
        ramp_begin=jnp.zeros((), jnp.int32),
        ramp_end=jnp.zeros((), jnp.int32),
        nbody=setup.nbody, tstat=tstat, pstat=pstat,
        p_chain=p_chain, p_flag=tuple(bool(b) for b in p_flag), iso=iso,
        nktv2p=nktv2p, dim=dim,
        t_chain=t_chain, t_iter=t_iter, t_order=t_order,
        nf_t=nf_t, nf_r=nf_r, boltz=boltz, mvv2e=mvv2e,
    )


def _yoshida_w(order):
    if order == 3:
        w0 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
        return (w0, 1.0 - 2.0 * w0, w0)
    if order == 5:
        w0 = 1.0 / (4.0 - 4.0 ** (1.0 / 3.0))
        return (w0, w0, 1.0 - 4.0 * w0, w0, w0)
    raise ValueError("t_order must be 3 or 5 (fix_rigid_nh.cpp:244)")


def _maclaurin(x):
    x2 = x * x
    x4 = x2 * x2
    return (1.0 + x2 / 6.0 + x4 / 120.0 + x2 * x4 / 5040.0 + x4 * x4 / 362880.0)


def _nhc_integrate(eta_dot, akin, nf, p: RigidParams):
    """One nhc_temp_integrate chain update (fix_rigid_nh.cpp:829-917) for one
    sub-thermostat (translational or rotational). Returns new eta_dot."""
    kt = p.boltz * p.t_target      # per-run ramped target (driver substitutes)
    gfkt = nf * kt
    t_mass = kt / (p.t_freq * p.t_freq)
    q = [nf * t_mass] + [t_mass] * (p.t_chain - 1)

    eta = [eta_dot[i] for i in range(p.t_chain)]
    f = [jnp.zeros((), eta_dot.dtype) for _ in range(p.t_chain)]
    f[0] = (akin * p.mvv2e - gfkt) / q[0]
    for k in range(1, p.t_chain):
        f[k] = (q[k - 1] * eta[k - 1] * eta[k - 1] - kt) / q[k]

    w = _yoshida_w(p.t_order)
    C = p.t_chain
    for _ in range(p.t_iter):
        for j in range(p.t_order):
            wdti1 = w[j] * p.dtv / p.t_iter
            wdti2 = wdti1 / 2.0
            wdti4 = wdti1 / 4.0
            eta[C - 1] = eta[C - 1] + wdti2 * f[C - 1]
            for k in range(1, C):
                tmp = wdti4 * eta[C - k]
                s = jnp.exp(-tmp)
                eta[C - k - 1] = eta[C - k - 1] * s * s + \
                    wdti2 * f[C - k - 1] * s * _maclaurin(tmp)
            # thermostat positions advance eta (not tracked: only eta_dot
            # feeds back into the dynamics; conserved-quantity bookkeeping TBD)
            for k in range(1, C):
                f[k] = (q[k - 1] * eta[k - 1] * eta[k - 1] - kt) / q[k]
            for k in range(0, C - 1):
                tmp = wdti4 * eta[k + 1]
                s = jnp.exp(-tmp)
                eta[k] = eta[k] * s * s + wdti2 * f[k] * s * _maclaurin(tmp)
                f[k + 1] = (q[k] * eta[k] * eta[k] - kt) / q[k + 1]
            eta[C - 1] = eta[C - 1] + wdti2 * f[C - 1]
    return jnp.stack(eta)


# --------------------------- barostat (npt/nph) ----------------------------

def _press_current(sys, virial, p: RigidParams):
    """Coupled current pressure (FixRigidNH couple, fix_rigid_nh.cpp:1019):
    per-dim (sum m v_d^2 * mvv2e + virial_d)/V * nktv2p over the fix-group
    atoms' velocities + the FULL system virial (pair/bonded/kspace res.virial
    plus the rigid set_xv/set_v constraint tallies).  ISO averages dims."""
    m = jnp.where(p.in_body, p.mass_atom, 0.0)
    ke3 = p.mvv2e * jnp.sum(m[:, None] * sys.v * sys.v, axis=0)
    vol = jnp.prod(sys.box.lengths[:p.dim])
    ptens = (ke3 + virial[:3]) / vol * p.nktv2p
    if p.iso:
        ptens = jnp.full((3,), jnp.mean(ptens))
    return ptens


def _p_hydro(p: RigidParams):
    """compute_press_target (:1121-1133): hydrostatic target over coupled
    dims; the per-run p_target ramp itself is substituted by the driver."""
    flags = jnp.asarray(p.p_flag)
    pdim = sum(p.p_flag)
    return jnp.sum(jnp.where(flags, p.p_target, 0.0)) / max(pdim, 1)


def _nhc_press_rigid(eta_dot_b, epsilon_dot, p: RigidParams):
    """nhc_press_integrate (fix_rigid_nh.cpp:891-965): barostat thermostat
    chain.  NOTE the reference uses exp(-0.5*tmp) here where the temperature
    chain uses exp(-tmp) — preserved bug-for-bug."""
    kt = p.boltz * p.t_target
    pdim = max(sum(p.p_flag), 1)
    tb_mass = kt / (p.p_freq_max * p.p_freq_max)
    q = [p.dim * p.dim * tb_mass] + [tb_mass] * (p.p_chain - 1)
    flags = jnp.asarray(p.p_flag)
    eps_mass = (p.nf_t + p.nf_r + p.dim) * kt / jnp.where(
        p.p_freq > 0.0, p.p_freq * p.p_freq, 1.0)
    kecurrent = jnp.sum(jnp.where(
        flags, eps_mass * epsilon_dot * epsilon_dot, 0.0)) / pdim

    eta = [eta_dot_b[i] for i in range(p.p_chain)]
    f = [jnp.zeros((), eta_dot_b.dtype) for _ in range(p.p_chain)]
    f[0] = (kecurrent - kt) / q[0]
    for k in range(1, p.p_chain):
        f[k] = (q[k - 1] * eta[k - 1] * eta[k - 1] - kt) / q[k]

    w = _yoshida_w(p.t_order)
    C = p.p_chain
    for _ in range(p.t_iter):
        for j in range(p.t_order):
            wdti1 = w[j] * p.dtv / p.t_iter
            wdti2 = wdti1 / 2.0
            wdti4 = wdti1 / 4.0
            eta[C - 1] = eta[C - 1] + wdti2 * f[C - 1]
            for k in range(1, C):
                tmp = wdti4 * eta[C - k]
                s = jnp.exp(-0.5 * tmp)
                eta[C - k - 1] = eta[C - k - 1] * s * s + \
                    wdti2 * f[C - k - 1] * s * _maclaurin(tmp)
            for k in range(1, C):
                f[k] = (q[k - 1] * eta[k - 1] * eta[k - 1] - kt) / q[k]
            for k in range(0, C - 1):
                tmp = wdti4 * eta[k + 1]
                s = jnp.exp(-0.5 * tmp)
                eta[k] = eta[k] * s * s + wdti2 * f[k] * s * _maclaurin(tmp)
                f[k + 1] = (q[k] * eta[k] * eta[k] - kt) / q[k + 1]
            eta[C - 1] = eta[C - 1] + wdti2 * f[C - 1]
    return jnp.stack(eta)


def _nh_epsilon_dot(sys, akin_t, akin_r, p_current, st, p: RigidParams):
    """nh_epsilon_dot (fix_rigid_nh.cpp:1139-1165): advance the barostat
    strain rate with the MTK correction and the chain damping scale."""
    g_f = p.nf_t + p.nf_r
    vol = jnp.prod(sys.box.lengths[:p.dim])
    mtk_term1 = (akin_t + akin_r) * p.mvv2e / g_f
    scale = jnp.exp(-p.dtq * st.eta_dot_b[0])
    kt = p.boltz * p.t_target
    flags = jnp.asarray(p.p_flag)
    eps_mass = (g_f + p.dim) * kt / jnp.where(
        p.p_freq > 0.0, p.p_freq * p.p_freq, 1.0)
    f_eps = ((p_current - _p_hydro(p)) * vol / p.nktv2p
             + mtk_term1) / eps_mass
    eps_dot = jnp.where(flags,
                        (st.epsilon_dot + p.dtq * f_eps) * scale,
                        st.epsilon_dot)
    mtk_term2 = jnp.sum(jnp.where(flags, eps_dot, 0.0)) / g_f
    return dataclasses.replace(st, epsilon_dot=eps_dot, mtk_term2=mtk_term2)


def _remap_half(sys, st, p: RigidParams, xcm):
    """remap() (fix_rigid_nh.cpp:1049-1103): half-step box dilation about the
    box center; all atoms AND body centers of mass ride in lamda coords
    (allremap default + FixRigid::deform's xcm remap)."""
    flags = jnp.asarray(p.p_flag)
    expfac = jnp.where(flags, jnp.exp(p.dtq * st.epsilon_dot), 1.0)
    lo, hi = sys.box.lo, sys.box.hi
    ctr = 0.5 * (lo + hi)
    lo2 = (lo - ctr) * expfac + ctr
    hi2 = (hi - ctr) * expfac + ctr
    x2 = (sys.x - ctr) * expfac + ctr
    xcm2 = (xcm - ctr) * expfac + ctr
    box2 = dataclasses.replace(sys.box, lo=lo2.astype(lo.dtype),
                               hi=hi2.astype(hi.dtype))
    return sys.replace(x=x2.astype(sys.x.dtype), box=box2), xcm2


def init_pstat(sys: System, virial, p: RigidParams, st: RigidState):
    """FixRigidNH::setup tail (:420-422): initial compute_press_target +
    nh_epsilon_dot so step 1 sees a non-zero strain rate.  Called by the
    runner right after init_rigid_state (needs the setup force virial)."""
    akin_t = jnp.sum(p.masstotal * jnp.sum(st.vcm * st.vcm, axis=1))
    R = q_to_matrix(st.quat)
    w = _omega_from_R(st.angmom, R, p.inertia)
    akin_r = jnp.sum(jnp.sum(st.angmom * w, axis=1))
    p_cur = _press_current(sys, virial + st.virial, p)
    return _nh_epsilon_dot(sys, akin_t, akin_r, p_cur, st, p)


def init_rigid_state(sys: System, f, p: RigidParams, mass_atom):
    """FixRigid::setup (:782) + FixRigidNH::setup (:323): vcm/angmom from atom
    velocities, fcm/torque from forces, conjqm = 2 q (x) (0, R^T L), then
    set_v projects atom velocities onto rigid motion. Returns (sys, state)."""
    b = p.body
    nb = p.nbody
    m = mass_atom[:, None] * p.in_body[:, None]
    xcm = jax.ops.segment_sum(m * sys.x, b, nb) / p.masstotal[:, None]
    vcm = jax.ops.segment_sum(m * sys.v, b, nb) / p.masstotal[:, None]
    d = sys.x - xcm[jnp.clip(b, 0, nb - 1)]
    angmom = jax.ops.segment_sum(m * jnp.cross(d, sys.v), b, nb)
    fcm, torque = _force_torque(sys.x, f, xcm, p)

    quat = p.quat0
    R = q_to_matrix(quat)
    mbody = jnp.einsum("bij,bi->bj", R, angmom)       # R^T L
    conjqm = 2.0 * quatvec(quat, mbody)

    w = _omega_from_R(angmom, R, p.inertia)
    bidx = jnp.clip(p.body, 0, nb - 1)
    d_space = jnp.einsum("nij,nj->ni", R[bidx], p.displace)
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    vir = 2.0 * _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(v=jnp.where(inb, v_new, sys.v))

    dtype = sys.x.dtype
    st = RigidState(
        xcm=xcm, vcm=vcm, angmom=angmom, quat=quat, conjqm=conjqm,
        fcm=fcm, torque=torque, virial=vir,
        eta_dot_t=jnp.zeros((p.t_chain,), dtype),
        eta_dot_r=jnp.zeros((p.t_chain,), dtype),
        epsilon_dot=jnp.zeros((3,), dtype) if p.pstat else None,
        eta_dot_b=jnp.zeros((p.p_chain,), dtype) if p.pstat else None,
        mtk_term2=jnp.zeros((), dtype) if p.pstat else None,
    )
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
    """FixRigidNH::initial_integrate (:430-589)."""
    dtf2 = p.dtf * 2.0
    one = jnp.ones((), sys.x.dtype)
    scale_t3 = jnp.ones((3,), sys.x.dtype)
    scale_r = one
    if p.tstat:
        scale_t3 = scale_t3 * jnp.exp(-p.dtq * st.eta_dot_t[0])
        scale_r = scale_r * jnp.exp(-p.dtq * st.eta_dot_r[0])
    if p.pstat:
        pdim = sum(p.p_flag)
        scale_t3 = scale_t3 * jnp.exp(
            -p.dtq * (st.epsilon_dot + st.mtk_term2))
        scale_r = scale_r * jnp.exp(-p.dtq * (pdim * st.mtk_term2))
        tmp = p.dtq * st.epsilon_dot
        scale_v3 = p.dtv * jnp.exp(tmp) * _maclaurin(tmp)

    dtfm = (p.dtf / p.masstotal)[:, None]
    vcm = st.vcm + dtfm * st.fcm
    if p.tstat or p.pstat:
        vcm = vcm * scale_t3[None, :]
        akin_t = jnp.sum(p.masstotal * jnp.sum(vcm * vcm, axis=1))
    if p.pstat:
        xcm = st.xcm + scale_v3[None, :] * vcm
    else:
        xcm = st.xcm + p.dtv * vcm

    R = q_to_matrix(st.quat)
    tbody = jnp.einsum("bij,bi->bj", R, st.torque)
    fquat = quatvec(st.quat, tbody)
    conjqm = st.conjqm + dtf2 * fquat
    if p.tstat or p.pstat:
        conjqm = conjqm * scale_r

    q = st.quat
    cq = conjqm
    cq, q = no_squish_rotate(3, cq, q, p.inertia, p.dtq)
    cq, q = no_squish_rotate(2, cq, q, p.inertia, p.dtq)
    cq, q = no_squish_rotate(1, cq, q, p.inertia, p.dtv)
    cq, q = no_squish_rotate(2, cq, q, p.inertia, p.dtq)
    cq, q = no_squish_rotate(3, cq, q, p.inertia, p.dtq)
    quat, conjqm = q, cq

    R = q_to_matrix(quat)
    mbody = invquatvec(quat, conjqm)
    angmom = 0.5 * jnp.einsum("bij,bj->bi", R, mbody)
    w = _omega_from_R(angmom, R, p.inertia)

    eta_dot_t, eta_dot_r = st.eta_dot_t, st.eta_dot_r
    if p.tstat:
        akin_r = jnp.sum(jnp.sum(angmom * w, axis=1))
        eta_dot_t = _nhc_integrate(eta_dot_t, akin_t, p.nf_t, p)
        eta_dot_r = _nhc_integrate(eta_dot_r, akin_r, p.nf_r, p)
    st2 = dataclasses.replace(st, eta_dot_t=eta_dot_t, eta_dot_r=eta_dot_r)
    if p.pstat:
        # update_nhcb (nhc_press_integrate :891) then half-step box remap
        st2 = dataclasses.replace(
            st2, eta_dot_b=_nhc_press_rigid(st2.eta_dot_b,
                                            st2.epsilon_dot, p))
        sys, xcm = _remap_half(sys, st2, p, xcm)

    # set_xv (:1289): x = R d + xcm (unwrapped), v = vcm + omega x (R d)
    bidx = jnp.clip(p.body, 0, p.nbody - 1)
    Ra = R[bidx]
    d_space = jnp.einsum("nij,nj->ni", Ra, p.displace)
    x_new = d_space + xcm[bidx]
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    vir = _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(
        x=jnp.where(inb, x_new, sys.x),
        v=jnp.where(inb, v_new, sys.v),
    )
    if p.pstat:
        # second half remap AFTER set_xv (atoms ride along, :582-586);
        # kspace coefficients recompute in-jit from sys.box (the
        # force->kspace->setup() analog is ForceField.kspace_dynamic)
        sys, xcm = _remap_half(sys, st2, p, xcm)
    return sys, dataclasses.replace(
        st2, xcm=xcm, vcm=vcm, angmom=angmom, quat=quat, conjqm=conjqm,
        virial=vir)


def final_integrate(sys: System, f, p: RigidParams, st: RigidState,
                    res_virial=None):
    """FixRigidNH::final_integrate (:592-790).  res_virial: the step's force
    virial (pair/bonded/kspace), consumed by the barostat pressure."""
    dtf2 = p.dtf * 2.0
    scale_t3 = jnp.ones((3,), sys.x.dtype)
    scale_r = jnp.ones((), sys.x.dtype)
    if p.tstat:
        scale_t3 = scale_t3 * jnp.exp(-p.dtq * st.eta_dot_t[0])
        scale_r = scale_r * jnp.exp(-p.dtq * st.eta_dot_r[0])
    if p.pstat:
        pdim = sum(p.p_flag)
        scale_t3 = scale_t3 * jnp.exp(
            -p.dtq * (st.epsilon_dot + st.mtk_term2))
        scale_r = scale_r * jnp.exp(-p.dtq * (pdim * st.mtk_term2))

    fcm, torque = _force_torque(sys.x, f, st.xcm, p)
    dtfm = (p.dtf / p.masstotal)[:, None]
    vcm = st.vcm
    if p.tstat or p.pstat:
        vcm = vcm * scale_t3[None, :]
    vcm = vcm + dtfm * fcm
    akin_t = jnp.sum(p.masstotal * jnp.sum(vcm * vcm, axis=1))

    R = q_to_matrix(st.quat)
    tbody = jnp.einsum("bij,bi->bj", R, torque)
    fquat = quatvec(st.quat, tbody)
    if p.tstat or p.pstat:
        conjqm = scale_r * st.conjqm + dtf2 * fquat
    else:
        conjqm = st.conjqm + dtf2 * fquat

    mbody = invquatvec(st.quat, conjqm)
    angmom = 0.5 * jnp.einsum("bij,bj->bi", R, mbody)
    w = _omega_from_R(angmom, R, p.inertia)
    akin_r = jnp.sum(jnp.sum(angmom * w, axis=1))

    # set_v (:1465)
    bidx = jnp.clip(p.body, 0, p.nbody - 1)
    d_space = jnp.einsum("nij,nj->ni", R[bidx], p.displace)
    v_new = vcm[bidx] + jnp.cross(w[bidx], d_space)
    inb = p.in_body[:, None]
    vir = st.virial + _constraint_virial(sys.x, sys.v, v_new, f, p)
    sys = sys.replace(v=jnp.where(inb, v_new, sys.v))
    st2 = dataclasses.replace(
        st, vcm=vcm, angmom=angmom, conjqm=conjqm,
        fcm=fcm, torque=torque, virial=vir)
    if p.pstat:
        # current pressure -> nh_epsilon_dot (:775-790); the press target
        # ramp was already substituted into p.p_target by the driver
        total_vir = vir if res_virial is None else res_virial + vir
        p_cur = _press_current(sys, total_vir, p)
        st2 = _nh_epsilon_dot(sys, akin_t, akin_r, p_cur, st2, p)
    return sys, st2
