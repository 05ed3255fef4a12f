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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lidp_tpu.box import minimum_image
from lidp_tpu.forcefield import ForceField
from lidp_tpu.ops.polarization import (DAMPING_EXPONENTIAL, PolarizationSettings,
                                       _damping_terms)

AXIS = "atoms"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _pad_and_chunk(n: int, ndev: int, target: int):
    """Pad the atom count so the column chunk is a lane-aligned power-of-two
    slice: npad = multiple of lcm(ndev, csz) with csz a multiple of 256.
    Unaligned odd chunk widths (e.g. 1324) have produced wrong results on the
    TPU backend; aligned chunks are also faster."""
    import math

    csz = max(256, (target // 256) * 256)
    if n <= csz:
        csz = max(256, -(-n // 256) * 256 // 1)
    block = (ndev * csz) // math.gcd(ndev, csz)
    npad = -(-n // block) * block
    return npad, csz, npad // csz


@dataclasses.dataclass(frozen=True)
class ShardedMD:
    """Jitted sharded MD step + helpers bound to one mesh/system size."""

    mesh: Mesh
    step_fn: object        # (arrays...) -> (arrays..., energies)
    n_padded: int


def build_sharded_polar_step(
    mesh: Mesh, ff: ForceField, s: Optional[PolarizationSettings],
    *, n: int, dt: float, ftm2v: float, col_chunk: int = 4096,
    dtype=jnp.float32, panel: str = "auto",
):
    """Build a jitted, sharded velocity-Verlet step for the polarizable
    LJ+coul/long system.  Returns (step_fn, pad_to) where step_fn maps
    (x, v, q, type, mol, alpha, mu, mass, mask, box_lo, box_hi) ->
    (x, v, mu, f, energies_dict); all (N,*) arrays sharded over AXIS.

    panel: O(N^2) polar-panel implementation — "auto" uses the Pallas
    VMEM-tiled kernels (ops/pallas_panel.py) on a single f32 device and
    the XLA column-chunk scan elsewhere; "scan"/"pallas" force a choice.
    """
    single = mesh is None or mesh.shape[AXIS] == 1
    ndev = 1 if single else mesh.shape[AXIS]
    npad, csz, nchunks = _pad_and_chunk(n, ndev, col_chunk)
    nloc = npad // ndev
    if panel == "auto":
        # the f32 kernels run on any device count: each device computes its
        # row strip against all-gathered columns (row0 rides the params
        # row, ops/pallas_panel.py _self_mask); the df32 f64 kernels stay
        # single-device (host-phase mode is host-driven per chip)
        pallas_ok = True
        use_panels = dtype == jnp.float32
    elif panel == "pallas":
        pallas_ok = use_panels = True
    else:
        pallas_ok = use_panels = False
    if pallas_ok:
        from lidp_tpu.ops import pallas_panel
    else:
        pallas_panel = None

    # collective layer: identity on a single chip (plain jit, no shard_map —
    # collectives through the axon tunnel backend cost seconds per step)
    if single:
        def _axidx():
            return jnp.zeros((), jnp.int32)

        def _gather(a):
            return a

        def _preduce(v):
            return v
    else:
        def _axidx():
            return jax.lax.axis_index(AXIS)

        def _gather(a):
            return jax.lax.all_gather(a, AXIS, tiled=True)

        def _preduce(v):
            return jax.lax.psum(v, AXIS)

    pair = ff.pair
    ew = ff.ewald
    qqrd2e = ff.qqrd2e
    dtf = 0.5 * dt * ftm2v
    has_polar = s is not None

    # --- shared geometry helpers over one column chunk ---
    # All pair intermediates are per-component (nloc, csz) arrays: a trailing
    # dimension of 3 would tile to 128 lanes on TPU (T(8,128)) and waste ~42x
    # HBM/compute.
    def _geom(xl, rows, xc, cols, L):
        dx = minimum_image(xl[:, 0:1] - xc[None, :, 0], L[0])
        dy = minimum_image(xl[:, 1:2] - xc[None, :, 1], L[1])
        dz = minimum_image(xl[:, 2:3] - xc[None, :, 2], L[2])
        rsq = dx * dx + dy * dy + dz * dz
        not_self = rows[:, None] != cols[None, :]
        return dx, dy, dz, rsq, not_self

    ntypes1 = pair.lj1.shape[0]

    def _type_tables_mm(tl, tc):
        """Per-pair type tables via one-hot MXU matmuls.

        Direct `table[ti, tj]` indexing costs ~1e9 scalar gathers per step at
        10k atoms x 10 types (~10 s/step on TPU); as row-gather + one-hot
        matmul it is ~0.1 ms.  Returns (lj3, lj4, offset, cut_ljsq, cutsq);
        lj1 = 12*lj3 and lj2 = 6*lj4 are derived by the caller.
        """
        oh = (tc[None, :] == jnp.arange(ntypes1)[:, None]).astype(dtype)  # (T1,csz)

        def tab(M):
            # HIGHEST precision: the default TPU matmul rounds operands to
            # bf16, which corrupts the coefficient tables (~0.2% in evdwl)
            return jnp.dot(M.astype(dtype)[tl], oh,
                           preferred_element_type=dtype,
                           precision=jax.lax.Precision.HIGHEST)

        return (tab(pair.lj3), tab(pair.lj4), tab(pair.offset),
                tab(pair.cut_ljsq), tab(pair.cutsq))

    def _pair_terms_chunk(rsq, qi, qj, tl, tc, pm, lj_excl=None):
        """LJ + coulomb per-pair terms with matmul-derived type tables
        (numerically identical to ops.pair._pair_terms with factor 1,
        except special pairs are excluded from the LJ term IN-PASS:
        bonded sites at sub-sigma separations produce ~1e11 kcal/mol pair
        terms, and summing then sparsely subtracting them is a
        catastrophic cancellation — eps*1e11 >> the net evdwl)."""
        lj3, lj4, off, cut_ljsq_ij, cutsq_ij = _type_tables_mm(tl, tc)
        r2inv = 1.0 / rsq
        in_range = (rsq < cutsq_ij) & pm
        lj_mask = in_range & (rsq < cut_ljsq_ij)
        if lj_excl is not None:
            lj_mask = lj_mask & ~lj_excl
        r6inv = r2inv * r2inv * r2inv
        forcelj = r6inv * (12.0 * lj3 * r6inv - 6.0 * lj4)
        evdwl = r6inv * (lj3 * r6inv - lj4) - off
        forcelj = jnp.where(lj_mask, forcelj, 0.0)
        evdwl = jnp.where(lj_mask, evdwl, 0.0)
        if pair.coul:
            from lidp_tpu.ops.pair import (A1, A2, A3, A4, A5, EWALD_F,
                                           EWALD_P)

            coul_mask = in_range & (rsq < pair.cut_coulsq)
            r = jnp.sqrt(rsq)
            grij = pair.g_ewald * r
            expm2 = jnp.exp(-grij * grij)
            t = 1.0 / (1.0 + EWALD_P * grij)
            erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
            erfc = jnp.where(pair.g_ewald > 0, erfc, 1.0)  # exact coul/cut
            prefactor = pair.qqrd2e * qi * qj / r
            forcecoul = jnp.where(
                coul_mask, prefactor * (erfc + EWALD_F * grij * expm2), 0.0)
            ecoul = jnp.where(coul_mask, prefactor * erfc, 0.0)
        else:
            forcecoul = jnp.zeros_like(forcelj)
            ecoul = jnp.zeros_like(evdwl)
        return (forcecoul + forcelj) * r2inv, evdwl, ecoul

    def _pair_chunk(xl, ql, tl, rows, xc, qc, tc, mc, cols, L, acc,
                    sp_rows=None):
        f, ev, ec, vir = acc
        dx, dy, dz, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :]
        rsq = jnp.where(pm, rsq, 1.0)
        lj_excl = None
        if sp_rows is not None:
            # special-pair LJ exclusion in-pass (see _pair_terms_chunk)
            lj_excl = jnp.zeros(rsq.shape, bool)
            for s_i in range(sp_rows.shape[1]):
                lj_excl = lj_excl | (sp_rows[:, s_i:s_i + 1]
                                     == cols[None, :])
        fpair, evdwl, ecoul = _pair_terms_chunk(
            rsq, ql[:, None], qc[None, :], tl, tc, pm, lj_excl)
        f = f + jnp.stack([jnp.sum(fpair * dx, axis=1),
                           jnp.sum(fpair * dy, axis=1),
                           jnp.sum(fpair * dz, axis=1)], axis=-1)
        w = 0.5 * fpair
        vir = vir + jnp.stack([
            jnp.sum(w * dx * dx), jnp.sum(w * dy * dy), jnp.sum(w * dz * dz),
            jnp.sum(w * dx * dy), jnp.sum(w * dx * dz), jnp.sum(w * dy * dz),
        ])
        return f, ev + 0.5 * jnp.sum(evdwl), ec + 0.5 * jnp.sum(ecoul), vir

    def _wolf_chunk(xl, ml, rows, xc, qc, molc, mc, cols, L, e0):
        dx, dy, dz, rsq, ns = _geom(xl, rows, xc, cols, L)
        cut_coulsq = pair.cut_coulsq
        f_shift = -1.0 / cut_coulsq
        include = ns & mc[None, :] & (rsq <= cut_coulsq) & (
            (ml[:, None] != molc[None, :]) | (ml[:, None] == 0))
        rsq = jnp.where(include, rsq, 1.0)
        r = jnp.sqrt(rsq)
        efq = jnp.where(include, (1.0 / rsq + f_shift) / r, 0.0) * qc[None, :]
        return e0 + jnp.stack([jnp.sum(efq * dx, axis=1),
                               jnp.sum(efq * dy, axis=1),
                               jnp.sum(efq * dz, axis=1)], axis=-1)

    def _tensor_apply_chunk(xl, al, rows, xc, ac, mc, cols, muc, L, ei):
        """ei -= T_block . mu_chunk  (matrix-free SCF contraction)."""
        dx, dy, dz, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :] & (ac[None, :] != 0.0) & (al[:, None] != 0.0)
        rsq = jnp.where(pm, rsq, 1.0)
        r = jnp.sqrt(rsq)
        l1, l2 = _damping_terms(r, rsq, s.polar_damp, s.damping_type)
        r3inv = 1.0 / (rsq * r)
        r5inv = r3inv / rsq
        mux, muy, muz = muc[None, :, 0], muc[None, :, 1], muc[None, :, 2]
        mdotd = mux * dx + muy * dy + muz * dz
        a1 = jnp.where(pm, -3.0 * (l2 * r5inv) * mdotd, 0.0)
        a2 = jnp.where(pm, l1 * r3inv, 0.0)
        # T.mu = a1 * d + a2 * mu
        tx = jnp.sum(a1 * dx + a2 * mux, axis=1)
        ty = jnp.sum(a1 * dy + a2 * muy, axis=1)
        tz = jnp.sum(a1 * dz + a2 * muz, axis=1)
        return ei - jnp.stack([tx, ty, tz], axis=-1)

    def _dipole_chunk(xl, ql, ml, al, mul, rows, xc, qc, molc, ac, mc, cols,
                      muc, L, acc):
        f, u_ef, u_dd, vir = acc
        dx, dy, dz, rsq, ns = _geom(xl, rows, xc, cols, L)
        pm = ns & mc[None, :]
        rsq = jnp.where(pm, rsq, 1.0)
        r2inv = 1.0 / rsq
        r = jnp.sqrt(rsq)
        rinv = 1.0 / r
        r3inv = r2inv * rinv
        sqrt_q = jnp.sqrt(qqrd2e)
        cut_coulsq = pair.cut_coulsq
        f_shift = -1.0 / cut_coulsq
        xsq, ysq, zsq = dx * dx, dy * dy, dz * dz

        cd_mask = pm & (rsq < cut_coulsq) & (
            (ml[:, None] != molc[None, :]) | (ml[:, None] == 0))
        mxx = (-2.0 * xsq + ysq + zsq) * r2inv + f_shift * (ysq + zsq)
        myy = (-2.0 * ysq + xsq + zsq) * r2inv + f_shift * (xsq + zsq)
        mzz = (-2.0 * zsq + xsq + ysq) * r2inv + f_shift * (xsq + ysq)
        mxy = -3.0 * dx * dy * r2inv - f_shift * dx * dy
        mxz = -3.0 * dx * dz * r2inv - f_shift * dx * dz
        myz = -3.0 * dy * dz * r2inv - f_shift * dy * dz

        mlx, mly, mlz = mul[:, 0:1], mul[:, 1:2], mul[:, 2:3]
        mcx, mcy, mcz = muc[None, :, 0], muc[None, :, 1], muc[None, :, 2]
        cf_j = jnp.where(cd_mask, qc[None, :] * sqrt_q * r3inv, 0.0)
        cf_i = jnp.where(cd_mask, ql[:, None] * sqrt_q * r3inv, 0.0)
        fcdx = cf_j * (mxx * mlx + mxy * mly + mxz * mlz) \
            - cf_i * (mxx * mcx + mxy * mcy + mxz * mcz)
        fcdy = cf_j * (mxy * mlx + myy * mly + myz * mlz) \
            - cf_i * (mxy * mcx + myy * mcy + myz * mcz)
        fcdz = cf_j * (mxz * mlx + myz * mly + mzz * mlz) \
            - cf_i * (mxz * mcx + myz * mcy + mzz * mcz)

        ef_t = jnp.where(cd_mask, (r2inv + f_shift) * rinv * sqrt_q, 0.0) \
            * qc[None, :]
        u_ef = u_ef - jnp.sum(mlx * ef_t * dx + mly * ef_t * dy
                              + mlz * ef_t * dz)

        dd_mask = pm & (al[:, None] != 0.0) & (ac[None, :] != 0.0)
        r5inv = r3inv * r2inv
        r7inv = r5inv * r2inv
        pdotp = mlx * mcx + mly * mcy + mlz * mcz
        pidotr = mlx * dx + mly * dy + mlz * dz
        pjdotr = mcx * dx + mcy * dy + mcz * dz
        if s.damping_type == DAMPING_EXPONENTIAL:
            pd = s.polar_damp
            t1 = jnp.exp(-pd * r)
            t2 = 1.0 + pd * r + 0.5 * pd * pd * rsq
            t3 = t2 + pd**3 * rsq * r / 6.0
            pre1 = 3.0 * r5inv * pdotp * (1.0 - t1 * t2) \
                - 15.0 * r7inv * pidotr * pjdotr * (1.0 - t1 * t3)
            pre2 = 3.0 * r5inv * pjdotr * (1.0 - t1 * t3)
            pre3 = 3.0 * r5inv * pidotr * (1.0 - t1 * t3)
            pre4 = -pdotp * r3inv * (-t1 * (pd * rinv + pd * pd)
                                     + t1 * pd * t2 * rinv)
            pre5 = 3.0 * pidotr * pjdotr * r5inv * (
                -t1 * (pd * rinv + pd * pd + 0.5 * r * pd**3)
                + t1 * pd * t3 * rinv)
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
        fpx = fcdx + pre1 * dx + pre2 * mlx + pre3 * mcx
        fpy = fcdy + pre1 * dy + pre2 * mly + pre3 * mcy
        fpz = fcdz + pre1 * dz + pre2 * mlz + pre3 * mcz
        u_dd = u_dd + 0.5 * jnp.sum(jnp.where(dd_mask, u_dd_pair, 0.0))

        f = f + jnp.stack([jnp.sum(fpx, axis=1), jnp.sum(fpy, axis=1),
                           jnp.sum(fpz, axis=1)], axis=-1)
        vir = vir + 0.5 * jnp.stack([
            jnp.sum(dx * fpx), jnp.sum(dy * fpy), jnp.sum(dz * fpz),
            jnp.sum(dx * fpy), jnp.sum(dx * fpz), jnp.sum(dy * fpz),
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

    def _ewald_kblock(x, q, hv, kc, kv):
        """Per-k-block reciprocal Ewald energy/forces/virial (terms
        independent per k; see ops/ewald.py _ewald_kblock).

        HIGHEST: the default TPU matmul rounds operands to bf16 — phases
        span tens of radians, so 0.4% rounding of x would put O(0.1 rad)
        errors into every structure factor."""
        hp = jax.lax.Precision.HIGHEST
        c0 = 4.0 * jnp.pi * ew.qscale / volume
        phases = jnp.dot(x, hv.T, precision=hp)
        cph, sph = jnp.cos(phases), jnp.sin(phases)
        sre = _preduce(jnp.dot(q, cph, precision=hp))
        sim = _preduce(jnp.dot(q, sph, precision=hp))
        sk2 = sre * sre + sim * sim
        e = c0 * jnp.sum(kc * sk2)
        w1 = kc * sre * 2.0 * c0
        w2 = kc * sim * 2.0 * c0
        fk = jnp.dot(sph * w1[None, :] - cph * w2[None, :],
                     hv, precision=hp) * q[:, None]
        vk = c0 * jnp.dot(sk2, kv, precision=hp)
        return fk, e, vk

    def _ewald_self():
        return (ew.qsqsum * ew.qscale * ew.g_ewald / jnp.sqrt(jnp.pi)
                + 0.5 * jnp.pi * ew.qscale / (ew.g_ewald**2 * volume)
                * ew.qsum * ew.qsum)

    def _rows_of(strip, *arrays):
        """(rows-index vector, row-sliced arrays): the whole local block by
        default, or a [i0, i0+ns) strip in host-phase mode (each strip runs
        as its own dispatch to stay under the tunnel execution deadline)."""
        if strip is None:
            didx = _axidx()
            rows = didx * nloc + jnp.arange(nloc)
            return (rows,) + arrays
        i0, ns_ = strip
        rows = i0 + jnp.arange(ns_)
        return (rows,) + tuple(
            jax.lax.dynamic_slice_in_dim(a, i0, ns_) for a in arrays)

    def _special_correction(x, q, type_, strip=None):
        """Sparse special-bond contributions, O(N*S).

        LJ: the dense pass EXCLUDES special pairs in-pass (see
        _pair_terms_chunk — summing then subtracting the huge sub-sigma
        intramolecular terms is a catastrophic cancellation), so this
        pass ADDS the full factor_lj * E contribution.
        Coulomb: the dense pass keeps the full erfc term and this pass
        applies the kspace-present convention forcecoul -=
        (1-factor)*prefactor (...polarization.cpp:262-278) — no
        cancellation there (plain 1/r magnitudes).
        Returns (df, dev, dec, dvir) for the local row block / strip."""
        rows, xr, qr, tr = _rows_of(strip, x, q, type_)
        L = box_lengths
        xf, qf, tf = _gather(x), _gather(q), _gather(type_)
        sp_idx_g, sp_lvl_g = special
        if strip is None:
            sp_base = _axidx() * nloc
            ns_rows = nloc
        else:
            sp_base, ns_rows = strip
        sp_idx = jax.lax.dynamic_slice_in_dim(sp_idx_g, sp_base,
                                              ns_rows, 0)
        sp_lvl = jax.lax.dynamic_slice_in_dim(sp_lvl_g, sp_base,
                                              ns_rows, 0)
        jvalid = sp_idx < n
        jc = jnp.minimum(sp_idx, npad - 1)
        sdx = minimum_image(xr[:, 0:1] - xf[:, 0][jc], L[0])
        sdy = minimum_image(xr[:, 1:2] - xf[:, 1][jc], L[1])
        sdz = minimum_image(xr[:, 2:3] - xf[:, 2][jc], L[2])
        srsq = sdx * sdx + sdy * sdy + sdz * sdz
        srsq = jnp.where(jvalid, srsq, 1.0)
        sr2inv = 1.0 / srsq
        tj = tf[jc]
        # per-pair tables via row-gather + one-hot einsum (avoids
        # (nloc,S) scalar table gathers)
        ohS = (tj[..., None]
               == jnp.arange(ntypes1)[None, None, :]).astype(x.dtype)

        def stab(M, _oh=ohS):
            return jnp.einsum("nt,nst->ns",
                              M.astype(x.dtype)[tr], _oh,
                              precision=jax.lax.Precision.HIGHEST)

        def lvl_factor(tbl, lvl=sp_lvl):
            return jnp.where(lvl == 1, tbl[1],
                             jnp.where(lvl == 2, tbl[2],
                                       jnp.where(lvl == 3, tbl[3],
                                                 tbl[0])))

        flj = lvl_factor(pair.special_lj)
        fcl = lvl_factor(pair.special_coul)
        in_rng = jvalid & (srsq < stab(pair.cutsq))
        lj_m = in_rng & (srsq < stab(pair.cut_ljsq))
        r6inv = sr2inv * sr2inv * sr2inv
        lj3s, lj4s = stab(pair.lj3), stab(pair.lj4)
        forcelj = r6inv * (12.0 * lj3s * r6inv - 6.0 * lj4s)
        evdwl_full = (r6inv * (lj3s * r6inv - lj4s)
                      - stab(pair.offset))
        dflj = jnp.where(lj_m, flj * forcelj, 0.0)
        devd = jnp.where(lj_m, flj * evdwl_full, 0.0)
        cm = in_rng & (srsq < pair.cut_coulsq)
        sr = jnp.sqrt(srsq)
        prefac = pair.qqrd2e * qr[:, None] * qf[jc] / sr
        dfc = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
        dec = jnp.where(cm, -(1.0 - fcl) * prefac, 0.0)
        fpair_c = (dflj + dfc) * sr2inv
        df_ = jnp.stack([jnp.sum(fpair_c * sdx, axis=1),
                         jnp.sum(fpair_c * sdy, axis=1),
                         jnp.sum(fpair_c * sdz, axis=1)], axis=-1)
        wks = 0.5 * fpair_c
        dvir = jnp.stack([
            jnp.sum(wks * sdx * sdx), jnp.sum(wks * sdy * sdy),
            jnp.sum(wks * sdz * sdz), jnp.sum(wks * sdx * sdy),
            jnp.sum(wks * sdx * sdz), jnp.sum(wks * sdy * sdz)])
        return df_, 0.5 * jnp.sum(devd), 0.5 * jnp.sum(dec), dvir

    def _nonpolar_forces(x, q, type_, mask, with_kspace=True, strip=None,
                         wolf_mol=None):
        """Pair LJ+coul + sparse special correction + reciprocal Ewald.
        Returns (f, evdwl, ecoul, elong, vir) — vir NOT yet psummed.

        with_kspace=False (host-phase mode) skips the Ewald sum so it can
        run as separate k-block dispatches (the f64-emulated [N,K] matmul
        is the longest-running part of the step at 100k atoms).

        wolf_mol (Pallas-panel path only): fuse the Wolf static-field
        panel into the pair panel — one geometry pass serves both
        pre-SCF O(N^2) phases — and return (..., e0) as a 6th output."""
        rows, xr, qr, tr = _rows_of(strip, x, q, type_)
        nrows = xr.shape[0]
        L = box_lengths  # closed over (static per build; box is NVE-constant)

        gather = _gather

        if True:
            xf = gather(x)
            qf, tf, mf = gather(q), gather(type_), gather(mask)

            # pair LJ + coul
            e0_fused = None
            sp_rows = None
            if special is not None:
                if strip is None:
                    sp_base_r, nrows_r = _axidx() * nloc, nloc
                else:
                    sp_base_r, nrows_r = strip
                sp_rows = jax.lax.dynamic_slice_in_dim(
                    special[0], sp_base_r, nrows_r, 0)
            if use_panels and strip is None:
                # the Pallas kernel assumes ONE uniform outer cutoff
                # (params-row scalar): every live type pair must share
                # cutsq (true when coulomb dominates the pair cutoffs)
                import numpy as _np
                _cq = _np.asarray(pair.cutsq)[1:, 1:]
                assert _np.all((_cq == _cq.max()) | (_cq == 0.0)), \
                    "pallas pair panel requires a uniform outer cutoff"
                tabs = jnp.stack([
                    pair.lj3.astype(jnp.float32),
                    pair.lj4.astype(jnp.float32),
                    pair.offset.astype(jnp.float32),
                    pair.cut_ljsq.astype(jnp.float32),
                    pair.cutsq.astype(jnp.float32)])
                if single:
                    pcols = pwcols = None
                    row0 = 0
                else:
                    # sharded: local rows vs all-gathered columns
                    pcols = (xf, qf, tf.astype(dtype), mf.astype(dtype))
                    row0 = _axidx() * nloc
                if wolf_mol is not None and bool(pair.coul):
                    if not single:
                        molf_w = _gather(wolf_mol).astype(dtype)
                        pwcols = (xf, qf, tf.astype(dtype), molf_w,
                                  mf.astype(dtype))
                    f, evdwl, ecoul, vir, e0_fused = \
                        pallas_panel.pair_wolf_panel(
                            x, q, type_.astype(dtype),
                            wolf_mol.astype(dtype), mask.astype(dtype),
                            tabs, L, pair.cut_coulsq, pair.qqrd2e,
                            pair.g_ewald, sp=sp_rows, cols=pwcols,
                            row0=row0)
                else:
                    f, evdwl, ecoul, vir = pallas_panel.pair_panel(
                        x, q, type_.astype(dtype), mask.astype(dtype),
                        tabs, L, pair.cut_coulsq, pair.qqrd2e,
                        pair.g_ewald, sp=sp_rows, cols=pcols, row0=row0,
                        coul=bool(pair.coul))
            else:
                zero6 = jnp.zeros((6,), dtype)
                f0 = jnp.zeros((nrows, 3), dtype)
                facc = _scan_cols(
                    lambda acc, cols, arrs: _pair_chunk(
                        xr, qr, tr, rows, arrs[0], arrs[1], arrs[2],
                        arrs[3], cols, L, acc, sp_rows=sp_rows),
                    (f0, jnp.zeros((), dtype), jnp.zeros((), dtype),
                     zero6),
                    (xf, qf, tf, mf))
                f, evdwl, ecoul, vir = facc

            # sparse special-bond correction pass: the dense main pass treats
            # every pair as factor 1.0; subtract the over-count for the
            # O(N*S) special pairs (factor_lj scaling, and the kspace-present
            # coulomb convention forcecoul -= (1-factor)*prefactor,
            # ...polarization.cpp:262-278)
            if special is not None:
                df_, dev_, dec_, dvir_ = _special_correction(
                    x, q, type_, strip=strip)
                f = f + df_
                evdwl = evdwl + dev_
                ecoul = ecoul + dec_
                vir = vir + dvir_
            evdwl = _preduce(evdwl)
            ecoul = _preduce(ecoul)

            # reciprocal Ewald
            elong = jnp.zeros((), dtype)
            if strip is not None:
                assert not with_kspace, \
                    "strip mode requires with_kspace=False (k-blocks)"
            if ew is not None and with_kspace:
                eself = _ewald_self()
                hv_full = ew.hvecs.astype(dtype)
                kc_full = ew.kcoeff.astype(dtype)
                kv_full = ew.kvirial.astype(dtype)

                def kblock(hv, kc, kv):
                    return _ewald_kblock(x, q, hv, kc, kv)

                Kk = hv_full.shape[0]
                nloc_ = x.shape[0]
                if nloc_ * Kk <= 64_000_000:
                    fk, e_k, vk = kblock(hv_full, kc_full, kv_full)
                else:
                    # (nloc, K) working set too big for HBM (f64 emulation
                    # materializes an (8,N,K) f32 intermediate, 36 GB at
                    # 100k f64 atoms): scan k-blocks with bounded memory
                    kb = max(128, 64_000_000 // max(nloc_, 1))
                    nck = -(-Kk // kb)
                    padk = nck * kb - Kk
                    hvb = jnp.pad(hv_full, ((0, padk), (0, 0))
                                  ).reshape(nck, kb, 3)
                    kcb = jnp.pad(kc_full, (0, padk)).reshape(nck, kb)
                    kvb = jnp.pad(kv_full, ((0, padk), (0, 0))
                                  ).reshape(nck, kb, 6)

                    def kbody(acc, blk):
                        fa, ea, va = acc
                        fb, eb, vb = kblock(*blk)
                        return (fa + fb, ea + eb, va + vb), None

                    (fk, e_k, vk), _ = jax.lax.scan(
                        kbody,
                        (jnp.zeros((nloc_, 3), dtype), jnp.zeros((), dtype),
                         jnp.zeros((6,), dtype)),
                        (hvb, kcb, kvb))
                elong = e_k - eself
                f = f + fk
                # replicated k-space virial (per-k terms only, no self/bg —
                # ewald.cpp:466-474): add on one device only so the closing
                # psum counts it once
                vir = vir + jnp.where(_axidx() == 0, vk, 0.0)

        if wolf_mol is not None:
            e0 = (e0_fused * jnp.sqrt(qqrd2e) if e0_fused is not None
                  else _wolf_field(x, q, wolf_mol, mask))
            return f, evdwl, ecoul, elong, vir, e0
        return f, evdwl, ecoul, elong, vir

    def _wolf_field(x, q, mol, mask, strip=None):
        """Shifted-force (Wolf) static field E0 (unit-folded)."""
        if use_panels and strip is None:
            if single:
                wcols, row0 = None, 0
            else:
                wcols = (_gather(x), _gather(q),
                         _gather(mol).astype(dtype),
                         _gather(mask).astype(dtype))
                row0 = _axidx() * nloc
            e0 = pallas_panel.wolf_panel(
                x, q, mol.astype(dtype), mask.astype(dtype),
                box_lengths, pair.cut_coulsq, cols=wcols, row0=row0)
            return e0 * jnp.sqrt(qqrd2e)
        rows, xr, molr = _rows_of(strip, x, mol)
        L = box_lengths
        xf, qf, molf, mf = (_gather(x), _gather(q), _gather(mol),
                            _gather(mask))
        e0 = _scan_cols(
            lambda acc, cols, arrs: _wolf_chunk(
                xr, molr, rows, arrs[0], arrs[1], arrs[2], arrs[3],
                cols, L, acc),
            jnp.zeros((xr.shape[0], 3), dtype), (xf, qf, molf, mf))
        return e0 * jnp.sqrt(qqrd2e)

    def _e_ind_of(x, alpha, mask, mu_l, strip=None, compute_dtype=None):
        """E_ind = -T.mu (matrix-free blockwise contraction).

        compute_dtype overrides the panel arithmetic precision: the
        mixed-precision iterative-refinement solver (models/polar_bench.py
        host_cg_step mixed=True) runs its inner CG matvecs in f32 while
        the residuals stay f64 — the TPU has no native f64 (XLA emulates
        it), so this is where the 100k/1e-11 north-star speedup comes
        from."""
        cd = dtype if compute_dtype is None else compute_dtype
        if strip is None and ((use_panels and cd == dtype)
                              or (pallas_ok and single
                                  and cd == jnp.float32)):
            # Pallas VMEM-tiled panel (f32); under an f64 build this is
            # the mixed-precision inner-CG matvec (host_cg_step mixed)
            f32 = jnp.float32
            ae = jnp.where(mask, alpha, 0.0)
            if single:
                ecols, row0 = None, 0
            else:
                ecols = (_gather(x).astype(f32),
                         _gather(ae).astype(f32),
                         _gather(mu_l).astype(f32))
                row0 = _axidx() * nloc
            return pallas_panel.eind_panel(
                x.astype(f32), ae.astype(f32),
                mu_l.astype(f32), box_lengths.astype(f32),
                s.polar_damp, damping_type=s.damping_type,
                cols=ecols, row0=row0)
        rows, xr, ar = _rows_of(strip, x, alpha)
        L = box_lengths
        if cd != dtype:
            xr, ar, mu_l = xr.astype(cd), ar.astype(cd), mu_l.astype(cd)
            x, alpha, L = x.astype(cd), alpha.astype(cd), L.astype(cd)
        xf, af, mf, muf = (_gather(x), _gather(alpha), _gather(mask),
                           _gather(mu_l))
        return _scan_cols(
            lambda acc, cols, arrs: _tensor_apply_chunk(
                xr, ar, rows, arrs[0], arrs[1], arrs[2], cols,
                arrs[3], L, acc),
            jnp.zeros((xr.shape[0], 3), cd), (xf, af, mf, muf))

    def _dipole_forces(x, q, mol, alpha, mu_new, mask, strip=None):
        """Charge-dipole + dipole-dipole forces, epol, fdotr virial rows.
        Returns (fpol, epol_psummed, vir_pol_local)."""
        if use_panels and strip is None:
            ae = jnp.where(mask, alpha, 0.0)
            if single:
                dcols, row0, rows_d = None, 0, None
            else:
                dcols = (_gather(x), _gather(q),
                         _gather(mol).astype(dtype), _gather(ae),
                         _gather(mu_new), _gather(mask).astype(dtype))
                row0 = _axidx() * nloc
                rows_d = row0 + jnp.arange(nloc)
            fpol, u_ef, u_dd, _vp = pallas_panel.dipole_panel(
                x, q, mol.astype(dtype), ae,
                mu_new, mask.astype(dtype), box_lengths, s.polar_damp,
                pair.cut_coulsq, qqrd2e, damping_type=s.damping_type,
                cols=dcols, row0=row0)
            xw_ = _vir_wrap(x, rows_d)
            vir_pol = jnp.stack([
                jnp.sum(xw_[:, 0] * fpol[:, 0]),
                jnp.sum(xw_[:, 1] * fpol[:, 1]),
                jnp.sum(xw_[:, 2] * fpol[:, 2]),
                jnp.sum(xw_[:, 0] * fpol[:, 1]),
                jnp.sum(xw_[:, 0] * fpol[:, 2]),
                jnp.sum(xw_[:, 1] * fpol[:, 2]),
            ])
            u_self = 0.5 * jnp.sum(jnp.where(
                alpha != 0.0,
                jnp.sum(mu_new * mu_new, axis=1)
                / jnp.where(alpha != 0.0, alpha, 1.0), 0.0))
            return fpol, _preduce(u_self + u_ef + u_dd), vir_pol
        rows, xr, qr, molr, ar, mur = _rows_of(strip, x, q, mol, alpha,
                                               mu_new)
        L = box_lengths
        xf, qf, molf, af, mf, muf = (
            _gather(x), _gather(q), _gather(mol), _gather(alpha),
            _gather(mask), _gather(mu_new))
        dacc = _scan_cols(
            lambda acc, cols, arrs: _dipole_chunk(
                xr, qr, molr, ar, mur, rows,
                arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], cols,
                arrs[5], L, acc),
            (jnp.zeros((xr.shape[0], 3), dtype), jnp.zeros((), dtype),
             jnp.zeros((), dtype), jnp.zeros((6,), dtype)),
            (xf, qf, molf, af, mf, muf))
        fpol, u_ef, u_dd, _vpol_pairwise = dacc
        # polar virial as F.r over wrapped coords (the reference's
        # virial_fdotr_compute path, pair.cpp:810-816 + :1495 — see
        # ops/polarization.py dipole_forces_energy): sum of the
        # local row-block's x_wrapped (x) f_polar, psummed by the caller.
        # Boxes here are origin-based (bind_box passes lengths only).
        xw = _vir_wrap(xr, rows)
        vir_pol = jnp.stack([
            jnp.sum(xw[:, 0] * fpol[:, 0]),
            jnp.sum(xw[:, 1] * fpol[:, 1]),
            jnp.sum(xw[:, 2] * fpol[:, 2]),
            jnp.sum(xw[:, 0] * fpol[:, 1]),
            jnp.sum(xw[:, 0] * fpol[:, 2]),
            jnp.sum(xw[:, 1] * fpol[:, 2]),
        ])
        u_self = 0.5 * jnp.sum(jnp.where(
            ar != 0.0,
            jnp.sum(mur * mur, axis=1)
            / jnp.where(ar != 0.0, ar, 1.0), 0.0))
        epol = _preduce(u_self + u_ef + u_dd)
        return fpol, epol, vir_pol

    def _forces(x, q, type_, mol, alpha, mu_init, mask):
        """One full force/SCF evaluation on local row blocks (nloc, ...)."""
        e0 = None
        if has_polar:
            # fused pair+wolf: one geometry pass serves both pre-SCF
            # O(N^2) phases (Pallas path; falls back to separate passes)
            f, evdwl, ecoul, elong, vir, e0 = _nonpolar_forces(
                x, q, type_, mask, wolf_mol=mol)
        else:
            f, evdwl, ecoul, elong, vir = _nonpolar_forces(x, q, type_,
                                                           mask)

        epol = jnp.zeros((), dtype)
        mu_new = mu_init
        scf_iters = jnp.zeros((), jnp.int32)
        if has_polar:
            a = alpha[:, None]
            mu0 = (mu_init if s.use_previous
                   else s.polar_gamma * a * e0)

            if s.zodid:
                mu_new = mu0
            elif s.fixed_iteration:
                mu_new = jax.lax.fori_loop(
                    0, s.iterations_max,
                    lambda i, m: a * (e0 + _e_ind_of(x, alpha, mask, m)),
                    mu0)
                scf_iters = jnp.asarray(s.iterations_max, jnp.int32)
            else:
                from lidp_tpu.ops.polarization import scf_solve_cg

                mu_new, scf_iters, _div = scf_solve_cg(
                    e0, alpha, lambda m: -_e_ind_of(x, alpha, mask, m), s,
                    mu_init=(mu_init if s.use_previous else None),
                    psum=_preduce, n_total=n)

            fpol, epol, vir_pol = _dipole_forces(x, q, mol, alpha, mu_new,
                                                 mask)
            f = f + fpol
            vir = vir + vir_pol

        vir = _preduce(vir)

        return f, mu_new, dict(evdwl=evdwl, ecoul=ecoul, elong=elong,
                               epol=epol, virial=vir, scf_iters=scf_iters)

    def local_step(x, v, f_prev, q, type_, mol, alpha, mu, mass, mask):
        """Velocity-Verlet with force carry: ONE force evaluation per step
        (Verlet::run semantics). Obtain the initial f_prev via the init fn."""
        minv = jnp.where(mass > 0, 1.0 / jnp.where(mass > 0, mass, 1.0), 0.0)
        v = v + (dtf * minv)[:, None] * f_prev
        v = jnp.where(mask[:, None], v, 0.0)
        x = x + dt * v
        f_new, mu2, energies = _forces(x, q, type_, mol, alpha, mu, mask)
        v = v + (dtf * minv)[:, None] * f_new
        v = jnp.where(mask[:, None], v, 0.0)
        return x, v, mu2, f_new, energies

    def local_init(x, q, type_, mol, alpha, mu, mask):
        """Initial force evaluation (Verlet::setup analog)."""
        return _forces(x, q, type_, mol, alpha, mu, mask)

    # capture box geometry + special lists at build time
    box_lengths = None
    volume = None
    special = None
    vir_xshift = None

    def bind_box(L, xshift=None):
        """xshift (npad,3), optional: frozen stored-coordinate wrap offset
        for the polar fdotr virial (the reference wraps at read_data and
        then only at reneighbor — pair.cpp:810-816 virial_fdotr_compute
        over stored coords; see sim.py polar_xshift).  Default: re-wrap
        every step."""
        nonlocal box_lengths, volume, vir_xshift
        box_lengths = jnp.asarray(L, dtype)
        volume = box_lengths[0] * box_lengths[1] * box_lengths[2]
        vir_xshift = (None if xshift is None
                      else jnp.asarray(xshift, dtype))

    def _vir_wrap(x, rows=None):
        if vir_xshift is not None:
            sh = (vir_xshift if rows is None
                  else jnp.take(vir_xshift, rows, axis=0))
            return x + sh
        L_ = box_lengths
        return x - jnp.floor(x / L_) * L_

    def bind_special(idx, lvl):
        """(npad, S) padded special lists (topology.special_lists), replicated."""
        nonlocal special
        pad_rows = npad - idx.shape[0]
        if pad_rows:
            import numpy as _np
            idx = _np.concatenate([idx, _np.full((pad_rows, idx.shape[1]), n,
                                                 idx.dtype)])
            lvl = _np.concatenate([lvl, _np.zeros((pad_rows, lvl.shape[1]),
                                                  lvl.dtype)])
        special = (jnp.asarray(idx, jnp.int32), jnp.asarray(lvl, jnp.int32))

    spec = P(AXIS)
    rep = P()

    energy_specs = dict(evdwl=rep, ecoul=rep, elong=rep, epol=rep,
                        virial=rep, scf_iters=rep)

    def make(mesh_local):
        """Returns (step_fn, init_fn):
        step_fn(x, v, f_prev, q, type, mol, alpha, mu, mass, mask)
            -> (x, v, mu, f, energies)
        init_fn(x, q, type, mol, alpha, mu, mask) -> (f, mu, energies)
        """
        if single:
            return jax.jit(local_step), jax.jit(local_init)
        sm = jax.shard_map(
            local_step, mesh=mesh_local,
            in_specs=(spec,) * 10,
            out_specs=(spec, spec, spec, spec, energy_specs),
            check_vma=False,
        )
        sm_init = jax.shard_map(
            local_init, mesh=mesh_local,
            in_specs=(spec,) * 7,
            out_specs=(spec, spec, energy_specs),
            check_vma=False,
        )
        return jax.jit(sm), jax.jit(sm_init)

    def make_host_phases(strips: int = 1):
        """Single-device jitted PHASE functions for host-driven stepping.

        The axon tunnel enforces a per-dispatch execution deadline (~1-2
        min): one fused step at 100k atoms in emulated f64 exceeds it (a
        single O(N^2) panel pass is ~30 s), so the bench drives the phases
        as separate dispatches with the CG loop on the host
        (models/polar_bench.py host_cg_step) — same math as local_step.

        strips > 1 further splits every O(N^2) phase into that many
        row-strip dispatches (strip i covers rows [i*ns, (i+1)*ns)): at
        100k f64 even ONE panel pass busts the deadline, so the phase
        functions then take a leading i0 row-offset argument and return
        strip-shaped results the host concatenates."""
        assert single, "host phases are a single-device bench path"
        import functools

        if strips == 1:
            phases = dict(
                nonpolar=jax.jit(_nonpolar_forces),
                # kspace-free pair phase + per-k-block Ewald dispatches:
                # the f64-emulated [N,K] structure-factor matmul is the
                # single longest program in the step at 100k atoms and
                # must be split below the deadline on its own
                pair_real=jax.jit(functools.partial(_nonpolar_forces,
                                                    with_kspace=False)),
                wolf=jax.jit(_wolf_field),
                eind=jax.jit(_e_ind_of),
                eind32=jax.jit(functools.partial(
                    _e_ind_of, compute_dtype=jnp.float32)),
                eind32_full=jax.jit(functools.partial(
                    _e_ind_of, compute_dtype=jnp.float32)),
                dipole=jax.jit(_dipole_forces),
            )
        else:
            assert npad % strips == 0, (npad, strips)
            ns_ = npad // strips

            phases = dict(
                strips=strips,
                pair_real=jax.jit(lambda i0, x, q, t, m: _nonpolar_forces(
                    x, q, t, m, with_kspace=False, strip=(i0, ns_))),
                wolf=jax.jit(lambda i0, x, q, mol, m: _wolf_field(
                    x, q, mol, m, strip=(i0, ns_))),
                eind=jax.jit(lambda i0, x, a, m, mu: _e_ind_of(
                    x, a, m, mu, strip=(i0, ns_))),
                eind32=jax.jit(lambda i0, x, a, m, mu: _e_ind_of(
                    x, a, m, mu, strip=(i0, ns_),
                    compute_dtype=jnp.float32)),
                # full-row f32 matvec in ONE dispatch (the Pallas panel is
                # fast enough to fit the tunnel deadline even at 100k)
                eind32_full=jax.jit(functools.partial(
                    _e_ind_of, compute_dtype=jnp.float32)),
                dipole=jax.jit(lambda i0, x, q, mol, a, mu, m:
                               _dipole_forces(x, q, mol, a, mu, m,
                                              strip=(i0, ns_))),
            )
        if ew is not None:
            import numpy as _np

            phases["ewald_kblock"] = jax.jit(_ewald_kblock)
            phases["ewald_eself"] = lambda: _ewald_self()
            phases["ewald_tables"] = (
                _np.asarray(ew.hvecs), _np.asarray(ew.kcoeff),
                _np.asarray(ew.kvirial))

        # f64-grade df32 Pallas phases (ops/pallas_panel.py *_df): the
        # XLA-emulated-f64 scan panels dominate the 100k step (measured:
        # pair 78 s, dipole 51 s, eind 15 s per pass); the df32 kernels
        # run the same math at native f32 VPU speed (~1e-13 rel, verified
        # vs f64 on the chip).  Only meaningful for f64 builds on real
        # TPU — the host driver checks the backend before using them.
        if pallas_ok and dtype == jnp.float64 and pair.coul:
            import numpy as _np2

            from lidp_tpu.ops import pallas_panel as _pp

            _cq = _np2.asarray(pair.cutsq)[1:, 1:]
            if bool(_np2.all((_cq == _cq.max()) | (_cq == 0.0))):
                tabs64 = jnp.stack([pair.lj3, pair.lj4, pair.offset,
                                    pair.cut_ljsq, pair.cutsq])

                def _pair_df(x, q, type_, mask):
                    f, ev, ec, vir = _pp.pair_panel_df(
                        x, q, type_.astype(dtype), mask.astype(dtype),
                        tabs64, box_lengths, pair.cut_coulsq,
                        pair.qqrd2e, pair.g_ewald,
                        sp=(special[0] if special is not None else None))
                    if special is not None:
                        df_, dev_, dec_, dvir_ = _special_correction(
                            x, q, type_)
                        f = f + df_
                        ev = ev + dev_
                        ec = ec + dec_
                        vir = vir + dvir_
                    return f, ev, ec, jnp.zeros((), dtype), vir

                phases["pair_df"] = jax.jit(_pair_df)

                def _pair_wolf_df(x, q, type_, mol, mask):
                    """Fused pair + Wolf static field: one df32 geometry
                    pass replaces the separate XLA-emulated-f64 wolf scan
                    (~30 s per step at 100k atoms)."""
                    f, ev, ec, vir, e0 = _pp.pair_panel_df(
                        x, q, type_.astype(dtype), mask.astype(dtype),
                        tabs64, box_lengths, pair.cut_coulsq,
                        pair.qqrd2e, pair.g_ewald,
                        sp=(special[0] if special is not None else None),
                        mol=mol.astype(dtype))
                    if special is not None:
                        df_, dev_, dec_, dvir_ = _special_correction(
                            x, q, type_)
                        f = f + df_
                        ev = ev + dev_
                        ec = ec + dec_
                        vir = vir + dvir_
                    return (f, ev, ec, jnp.zeros((), dtype), vir,
                            e0 * jnp.sqrt(qqrd2e))

                phases["pair_wolf_df"] = jax.jit(_pair_wolf_df)

                def _eind_df(x, alpha, mask, mu_l):
                    ae = jnp.where(mask, alpha, 0.0)
                    return _pp.eind_panel_df(x, ae, mu_l, box_lengths,
                                             s.polar_damp,
                                             damping_type=s.damping_type)

                phases["eind_df"] = jax.jit(_eind_df)

                def _dipole_df(x, q, mol, alpha, mu_new, mask):
                    ae = jnp.where(mask, alpha, 0.0)
                    fpol, u_ef, u_dd, _vp = _pp.dipole_panel_df(
                        x, q, mol.astype(dtype), ae, mu_new,
                        mask.astype(dtype), box_lengths, s.polar_damp,
                        pair.cut_coulsq, qqrd2e,
                        damping_type=s.damping_type)
                    xw = _vir_wrap(x)
                    vir_pol = jnp.stack([
                        jnp.sum(xw[:, 0] * fpol[:, 0]),
                        jnp.sum(xw[:, 1] * fpol[:, 1]),
                        jnp.sum(xw[:, 2] * fpol[:, 2]),
                        jnp.sum(xw[:, 0] * fpol[:, 1]),
                        jnp.sum(xw[:, 0] * fpol[:, 2]),
                        jnp.sum(xw[:, 1] * fpol[:, 2]),
                    ])
                    u_self = 0.5 * jnp.sum(jnp.where(
                        alpha != 0.0,
                        jnp.sum(mu_new * mu_new, axis=1)
                        / jnp.where(alpha != 0.0, alpha, 1.0), 0.0))
                    return fpol, u_self + u_ef + u_dd, vir_pol

                phases["dipole_df"] = jax.jit(_dipole_df)
        return phases

    make.host_phases = make_host_phases
    # raw (unjitted) full force+SCF evaluation — composed into larger jitted
    # programs by the production fast-polar engine (parallel/fast_polar.py):
    # (x, q, type, mol, alpha, mu_init, mask) -> (f, mu, energies dict)
    make.forces = local_init
    return make, bind_box, npad, bind_special
