"""Multi-chip sharded polarizable MD step.

The TPU-native replacement for the reference's (broken, §0.2-0.3 SURVEY.md)
MPI parallelization: atoms are sharded across a 1-D device mesh axis
("atoms"); every O(N^2) loop — LJ + real-space Ewald pairs, Wolf static
field, the SCF dipole-field contraction E_ind = -T.mu, dipole forces — runs
as row-blocks on each chip against column chunks of the (cheaply)
all-gathered coordinates, never materializing an (N,N) or 3Nx3N object.

Collectives (jax.lax inside shard_map):
  * all_gather of positions/dipoles per SCF sweep (N*3 floats — tiny vs ICI);
  * psum for energies, virials, Ewald structure factors, and the SCF
    convergence test (the reference's serial `change` accumulation,
    ...polarization.cpp:1194-1210, becomes a psum so every chip takes the
    same while_loop branch);
  * the Ewald reciprocal sum mirrors the reference's MPI_Allreduce of
    structure factors (ewald_disp.cpp:795) as a psum over the atom axis.

Memory per chip is O(N/P * C) with column chunk C — at N=100k, P=8, C=4096
that is ~50 MB of f32 intermediates, HBM-friendly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidp_tpu.box import Box, minimum_image
from lidp_tpu.forcefield import ForceField
from lidp_tpu.ops.pair import _pair_terms
from lidp_tpu.ops.polarization import (DAMPING_EXPONENTIAL, PolarizationSettings,
                                       _damping_terms)

AXIS = "atoms"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _col_chunks(n: int, target: int) -> int:
    """Column chunk count dividing n (n is already device-padded)."""
    c = max(1, n // max(1, target))
    while n % c:
        c += 1
    return c


@dataclasses.dataclass(frozen=True)
class ShardedMD:
    """Jitted sharded MD step + helpers bound to one mesh/system size."""

    mesh: Mesh
    step_fn: object        # (arrays...) -> (arrays..., energies)
    n_padded: int


def build_sharded_polar_step(
    mesh: Mesh, ff: ForceField, s: Optional[PolarizationSettings],
    *, n: int, dt: float, ftm2v: float, col_chunk: int = 4096,
    dtype=jnp.float32,
):
    """Build a jitted, sharded velocity-Verlet step for the polarizable
    LJ+coul/long system.  Returns (step_fn, pad_to) where step_fn maps
    (x, v, q, type, mol, alpha, mu, mass, mask, box_lo, box_hi) ->
    (x, v, mu, f, energies_dict); all (N,*) arrays sharded over AXIS.
    """
    ndev = mesh.shape[AXIS]
    npad = -(-n // ndev) * ndev
    nloc = npad // ndev
    nchunks = _col_chunks(npad, col_chunk)
    csz = npad // nchunks

    pair = ff.pair
    ew = ff.ewald
    qqrd2e = ff.qqrd2e
    dtf = 0.5 * dt * ftm2v
    has_polar = s is not None

    # --- shared geometry helper over one column chunk ---
    def _geom(xl, rows, xc, cols, L):
        delta = minimum_image(xl[:, None, :] - xc[None, :, :], L)
        rsq = jnp.sum(delta * delta, axis=-1)
        not_self = rows[:, None] != cols[None, :]
        return delta, rsq, not_self

    def _pair_chunk(xl, ql, tl, rows, xc, qc, tc, mc, cols, L, acc):
        f, ev, ec, vir = acc
        delta, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :]
        rsq = jnp.where(pm, rsq, 1.0)
        fpair, evdwl, ecoul = _pair_terms(
            rsq, ql[:, None], qc[None, :], tl[:, None], tc[None, :], 0,
            pair, pm)
        f = f + jnp.sum(fpair[..., None] * delta, axis=1)
        w = 0.5 * fpair
        vir = vir + jnp.stack([
            jnp.sum(w * delta[..., 0] * delta[..., 0]),
            jnp.sum(w * delta[..., 1] * delta[..., 1]),
            jnp.sum(w * delta[..., 2] * delta[..., 2]),
            jnp.sum(w * delta[..., 0] * delta[..., 1]),
            jnp.sum(w * delta[..., 0] * delta[..., 2]),
            jnp.sum(w * delta[..., 1] * delta[..., 2]),
        ])
        return f, ev + 0.5 * jnp.sum(evdwl), ec + 0.5 * jnp.sum(ecoul), vir

    def _wolf_chunk(xl, ml, rows, xc, qc, molc, mc, cols, L, e0):
        delta, rsq, ns = _geom(xl, rows, xc, cols, L)
        cut_coulsq = pair.cut_coulsq
        f_shift = -1.0 / cut_coulsq
        include = ns & mc[None, :] & (rsq <= cut_coulsq) & (
            (ml[:, None] != molc[None, :]) | (ml[:, None] == 0))
        rsq = jnp.where(include, rsq, 1.0)
        r = jnp.sqrt(rsq)
        ef = jnp.where(include, (1.0 / rsq + f_shift) / r, 0.0)
        return e0 + jnp.einsum("ij,j,ijp->ip", ef, qc, delta)

    def _tensor_apply_chunk(xl, al, rows, xc, ac, mc, cols, muc, L, ei):
        """ei -= T_block . mu_chunk  (matrix-free SCF contraction)."""
        delta, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :] & (ac[None, :] != 0.0) & (al[:, None] != 0.0)
        rsq = jnp.where(pm, rsq, 1.0)
        r = jnp.sqrt(rsq)
        l1, l2 = _damping_terms(r, rsq, s.polar_damp, s.damping_type)
        r3inv = 1.0 / (rsq * r)
        r5inv = r3inv / rsq
        mdotd = jnp.einsum("jq,ijq->ij", muc, delta)
        # T.mu = -3 d (d.mu) l2 r^-5 + l1 r^-3 mu
        term = (-3.0 * (l2 * r5inv) * mdotd)[:, :, None] * delta \
            + (l1 * r3inv)[:, :, None] * muc[None, :, :]
        term = jnp.where(pm[:, :, None], term, 0.0)
        return ei - jnp.sum(term, axis=1)

    def _dipole_chunk(xl, ql, ml, al, mul, rows, xc, qc, molc, ac, mc, cols,
                      muc, L, acc):
        f, u_ef, u_dd, vir = acc
        delta, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :]
        rsq = jnp.where(pm, rsq, 1.0)
        r2inv = 1.0 / rsq
        r = jnp.sqrt(rsq)
        rinv = 1.0 / r
        r3inv = r2inv * rinv
        sqrt_q = jnp.sqrt(qqrd2e)
        cut_coulsq = pair.cut_coulsq
        f_shift = -1.0 / cut_coulsq
        dx, dy, dz = delta[..., 0], delta[..., 1], delta[..., 2]
        xsq, ysq, zsq = dx * dx, dy * dy, dz * dz

        cd_mask = pm & (rsq < cut_coulsq) & (
            (ml[:, None] != molc[None, :]) | (ml[:, None] == 0))
        mxx = (-2.0 * xsq + ysq + zsq) * r2inv + f_shift * (ysq + zsq)
        myy = (-2.0 * ysq + xsq + zsq) * r2inv + f_shift * (xsq + zsq)
        mzz = (-2.0 * zsq + xsq + ysq) * r2inv + f_shift * (xsq + ysq)
        mxy = -3.0 * dx * dy * r2inv - f_shift * dx * dy
        mxz = -3.0 * dx * dz * r2inv - f_shift * dx * dz
        myz = -3.0 * dy * dz * r2inv - f_shift * dy * dz

        def matvec(mv):
            vx = mxx * mv[..., 0] + mxy * mv[..., 1] + mxz * mv[..., 2]
            vy = mxy * mv[..., 0] + myy * mv[..., 1] + myz * mv[..., 2]
            vz = mxz * mv[..., 0] + myz * mv[..., 1] + mzz * mv[..., 2]
            return jnp.stack([vx, vy, vz], axis=-1)

        cf_j = jnp.where(cd_mask, qc[None, :] * sqrt_q * r3inv, 0.0)
        cf_i = jnp.where(cd_mask, ql[:, None] * sqrt_q * r3inv, 0.0)
        f_cd = (cf_j[..., None] * matvec(mul[:, None, :])
                - cf_i[..., None] * matvec(muc[None, :, :]))
        ef_temp = jnp.where(cd_mask, (r2inv + f_shift) * rinv * sqrt_q, 0.0)
        e_ij = ef_temp[..., None] * qc[None, :, None] * delta
        u_ef = u_ef - jnp.sum(mul[:, None, :] * e_ij)

        dd_mask = pm & (al[:, None] != 0.0) & (ac[None, :] != 0.0)
        r5inv = r3inv * r2inv
        r7inv = r5inv * r2inv
        pdotp = jnp.einsum("ip,jp->ij", mul, muc)
        pidotr = jnp.einsum("ip,ijp->ij", mul, delta)
        pjdotr = jnp.einsum("jp,ijp->ij", muc, delta)
        if s.damping_type == DAMPING_EXPONENTIAL:
            pd = s.polar_damp
            t1 = jnp.exp(-pd * r)
            t2 = 1.0 + pd * r + 0.5 * pd * pd * rsq
            t3 = t2 + pd**3 * rsq * r / 6.0
            pre1 = 3.0 * r5inv * pdotp * (1.0 - t1 * t2) \
                - 15.0 * r7inv * pidotr * pjdotr * (1.0 - t1 * t3)
            pre2 = 3.0 * r5inv * pjdotr * (1.0 - t1 * t3)
            pre3 = 3.0 * r5inv * pidotr * (1.0 - t1 * t3)
            pre4 = -pdotp * r3inv * (-t1 * (pd * rinv + pd * pd) + t1 * pd * t2 * rinv)
            pre5 = 3.0 * pidotr * pjdotr * r5inv * (
                -t1 * (pd * rinv + pd * pd + 0.5 * r * pd**3) + t1 * pd * t3 * rinv)
            u_dd_pair = r3inv * pdotp * (1.0 - t1 * t2) \
                - 3.0 * r5inv * pidotr * pjdotr * (1.0 - t1 * t3)
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
        f_dd = (pre1[..., None] * delta + pre2[..., None] * mul[:, None, :]
                + pre3[..., None] * muc[None, :, :])
        u_dd = u_dd + 0.5 * jnp.sum(jnp.where(dd_mask, u_dd_pair, 0.0))

        fp = f_cd + f_dd
        f = f + jnp.sum(fp, axis=1)
        vir = vir + 0.5 * jnp.stack([
            jnp.sum(dx * fp[..., 0]), jnp.sum(dy * fp[..., 1]),
            jnp.sum(dz * fp[..., 2]), jnp.sum(dx * fp[..., 1]),
            jnp.sum(dx * fp[..., 2]), jnp.sum(dy * fp[..., 2]),
        ])
        return f, u_ef, u_dd, vir

    def _scan_cols(fn, init, full_arrays):
        """lax.scan over column chunks of the gathered (npad, ...) arrays."""
        chunked = jax.tree.map(
            lambda a: a.reshape((nchunks, csz) + a.shape[1:]), full_arrays)
        cols0 = jnp.arange(npad).reshape(nchunks, csz)

        def body(acc, chunk):
            cols, arrs = chunk
            return fn(acc, cols, arrs), None

        acc, _ = jax.lax.scan(body, init, (cols0, chunked))
        return acc

    def local_step(x, v, q, type_, mol, alpha, mu, mass, mask):
        """shard_map body: all arrays are local row blocks (nloc, ...)."""
        didx = jax.lax.axis_index(AXIS)
        rows = didx * nloc + jnp.arange(nloc)
        L = box_lengths  # closed over (static per build; box is NVE-constant)

        def gather(a):
            return jax.lax.all_gather(a, AXIS, tiled=True)

        minv = jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0), 0.0)

        def forces(x, mu_init):
            xf = gather(x)
            qf, tf, molf, af, mf = (gather(q), gather(type_), gather(mol),
                                    gather(alpha), gather(mask))

            # pair LJ + coul
            zero6 = jnp.zeros((6,), dtype)
            f0 = jnp.zeros((nloc, 3), dtype)
            facc = _scan_cols(
                lambda acc, cols, arrs: _pair_chunk(
                    x, q, type_, rows, arrs[0], arrs[1], arrs[2], arrs[3],
                    cols, L, acc),
                (f0, jnp.zeros((), dtype), jnp.zeros((), dtype), zero6),
                (xf, qf, tf, mf))
            f, evdwl, ecoul, vir = facc
            evdwl = jax.lax.psum(evdwl, AXIS)
            ecoul = jax.lax.psum(ecoul, AXIS)

            # reciprocal Ewald
            elong = jnp.zeros((), dtype)
            if ew is not None:
                phases = x @ ew.hvecs.T.astype(dtype)
                cph, sph = jnp.cos(phases), jnp.sin(phases)
                sre = jax.lax.psum(q @ cph, AXIS)
                sim = jax.lax.psum(q @ sph, AXIS)
                sk2 = sre * sre + sim * sim
                c0 = 4.0 * jnp.pi * ew.qscale / volume
                eself = (ew.qsqsum * ew.qscale * ew.g_ewald / jnp.sqrt(jnp.pi)
                         + 0.5 * jnp.pi * ew.qscale / (ew.g_ewald**2 * volume)
                         * ew.qsum * ew.qsum)
                elong = c0 * jnp.sum(ew.kcoeff * sk2) - eself
                w1 = ew.kcoeff * sre * 2.0 * c0
                w2 = ew.kcoeff * sim * 2.0 * c0
                f = f + ((sph * w1[None, :] - cph * w2[None, :])
                         @ ew.hvecs.astype(dtype)) * q[:, None]
                vself_bg = (-0.5 * jnp.pi * ew.qscale
                            / (ew.g_ewald**2 * volume) * ew.qsum * ew.qsum)
                # replicated k-space virial: add on one device only so the
                # closing psum counts it once
                vk = c0 * (sk2 @ ew.kvirial.astype(dtype)) \
                    - vself_bg * jnp.array([1, 1, 1, 0, 0, 0], dtype)
                vir = vir + jnp.where(jax.lax.axis_index(AXIS) == 0, vk, 0.0)

            epol = jnp.zeros((), dtype)
            mu_new = mu_init
            scf_iters = jnp.zeros((), jnp.int32)
            if has_polar:
                # Wolf static field
                e0 = _scan_cols(
                    lambda acc, cols, arrs: _wolf_chunk(
                        x, mol, rows, arrs[0], arrs[1], arrs[2], arrs[3],
                        cols, L, acc),
                    jnp.zeros((nloc, 3), dtype), (xf, qf, molf, mf))
                e0 = e0 * jnp.sqrt(qqrd2e)

                a = alpha[:, None]
                mu0 = (mu_init if s.use_previous
                       else s.polar_gamma * a * e0)

                def e_ind_of(mu_l):
                    muf = gather(mu_l)
                    return _scan_cols(
                        lambda acc, cols, arrs: _tensor_apply_chunk(
                            x, alpha, rows, arrs[0], arrs[1], arrs[2], cols,
                            arrs[3], L, acc),
                        jnp.zeros((nloc, 3), dtype), (xf, af, mf, muf))

                if s.zodid:
                    mu_new = mu0
                elif s.fixed_iteration:
                    mu_new = jax.lax.fori_loop(
                        0, s.iterations_max,
                        lambda i, m: a * (e0 + e_ind_of(m)), mu0)
                    scf_iters = jnp.asarray(s.iterations_max, jnp.int32)
                else:
                    from lidp_tpu.ops.polarization import scf_solve_cg

                    mu_new, scf_iters, _div = scf_solve_cg(
                        e0, alpha, lambda m: -e_ind_of(m), s,
                        mu_init=(mu_init if s.use_previous else None),
                        psum=lambda v: jax.lax.psum(v, AXIS), n_total=n)

                # dipole forces + energy
                muf = gather(mu_new)
                dacc = _scan_cols(
                    lambda acc, cols, arrs: _dipole_chunk(
                        x, q, mol, alpha, mu_new, rows,
                        arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], cols,
                        arrs[5], L, acc),
                    (jnp.zeros((nloc, 3), dtype), jnp.zeros((), dtype),
                     jnp.zeros((), dtype), jnp.zeros((6,), dtype)),
                    (xf, qf, molf, af, mf, muf))
                fpol, u_ef, u_dd, vpol = dacc
                f = f + fpol
                vir = vir + vpol
                u_self = 0.5 * jnp.sum(jnp.where(
                    alpha != 0.0,
                    jnp.sum(mu_new * mu_new, axis=1)
                    / jnp.where(alpha != 0.0, alpha, 1.0), 0.0))
                epol = jax.lax.psum(u_self + u_ef + u_dd, AXIS)

            vir = jax.lax.psum(vir, AXIS)
            return f, mu_new, dict(evdwl=evdwl, ecoul=ecoul, elong=elong,
                                   epol=epol, virial=vir,
                                   scf_iters=scf_iters)

        # velocity Verlet around the force evaluation (fix nve semantics)
        f_prev, mu1, _ = forces(x, mu)
        v = v + (dtf * minv)[:, None] * f_prev
        v = jnp.where(mask[:, None], v, 0.0)
        x = x + dt * v
        f_new, mu2, energies = forces(x, mu1)
        v = v + (dtf * minv)[:, None] * f_new
        v = jnp.where(mask[:, None], v, 0.0)
        return x, v, mu2, f_new, energies

    # capture box geometry at build time (constant-volume ensembles)
    box_lengths = None
    volume = None

    def bind_box(L):
        nonlocal box_lengths, volume
        box_lengths = jnp.asarray(L, dtype)
        volume = box_lengths[0] * box_lengths[1] * box_lengths[2]

    spec = P(AXIS)
    rep = P()

    def make(mesh_local):
        sm = jax.shard_map(
            local_step, mesh=mesh_local,
            in_specs=(spec,) * 9,
            out_specs=(spec, spec, spec, spec,
                       dict(evdwl=rep, ecoul=rep, elong=rep, epol=rep,
                            virial=rep, scf_iters=rep)),
            check_vma=False,
        )
        return jax.jit(sm)

    return make, bind_box, npad
