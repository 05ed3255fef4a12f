"""Pallas TPU kernel for the blocked LJ pair force (experimental).

A hand-tiled version of the row-block x column-chunk pair computation used by
parallel/shard.py: grid over (row blocks, column chunks), per-program VMEM
tiles of the per-component coordinate arrays, accumulation into the row-block
force components across the column grid dimension.

Status (round 1): numerically validated against the jnp path on real TPU
(rel err ~1e-17), but SLOW as written — the (1, N) input layouts give
sublane-1 tiles (8x padding) and the in-kernel transposes defeat the VPU.
Measured 4.4 s for a 32k all-pairs pass vs ~5 ms for the XLA cell kernel.
Not used in production paths; kept as the starting point for a properly
(BM, BN)-tiled fused pair+field pipeline in later rounds.  The XLA roll-based
cell kernel (ops/cells.py) and column-chunked shard path (parallel/shard.py)
are the production kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lj_kernel(xr, yr, zr, xc, yc, zc, rowid, colid, fx, fy, fz,
               *, lj1, lj2, cutsq, Lx, Ly, Lz):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        fx[:] = jnp.zeros_like(fx)
        fy[:] = jnp.zeros_like(fy)
        fz[:] = jnp.zeros_like(fz)

    def mi(d, L):
        return d - L * jnp.round(d / L)

    dx = mi(xr[:].T - xc[:], Lx)          # (BM,1) - (1,BN) -> (BM,BN)
    dy = mi(yr[:].T - yc[:], Ly)
    dz = mi(zr[:].T - zc[:], Lz)
    rsq = dx * dx + dy * dy + dz * dz
    ok = (rowid[:].T != colid[:]) & (rsq < cutsq)
    rsq = jnp.where(ok, rsq, 1.0)
    r2inv = 1.0 / rsq
    r6 = r2inv * r2inv * r2inv
    fpair = jnp.where(ok, r6 * (lj1 * r6 - lj2) * r2inv, 0.0)
    fx[:] = fx[:] + jnp.sum(fpair * dx, axis=1, keepdims=True).T
    fy[:] = fy[:] + jnp.sum(fpair * dy, axis=1, keepdims=True).T
    fz[:] = fz[:] + jnp.sum(fpair * dz, axis=1, keepdims=True).T


def pallas_lj_forces(x, box_lengths, lj1, lj2, cutsq,
                     block_m: int = 512, block_n: int = 2048):
    """Single-type LJ all-pairs forces via a Pallas grid. x: (N,3), N must be
    a multiple of block sizes (pad+mask upstream)."""
    n = x.shape[0]
    dtype = x.dtype
    assert n % block_m == 0 and n % block_n == 0
    comps = [jnp.asarray(x[:, d]).reshape(1, n) for d in range(3)]
    ids = jnp.arange(n, dtype=jnp.int32).reshape(1, n)
    L = jnp.asarray(box_lengths, dtype)

    grid = (n // block_m, n // block_n)
    row_spec = pl.BlockSpec((1, block_m), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_m), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _lj_kernel, lj1=float(lj1), lj2=float(lj2), cutsq=float(cutsq),
        Lx=float(box_lengths[0]), Ly=float(box_lengths[1]),
        Lz=float(box_lengths[2]))
    fx, fy, fz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec,
                  col_spec, col_spec, col_spec,
                  row_spec, col_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((1, n), dtype),) * 3,
    )(comps[0], comps[1], comps[2], comps[0], comps[1], comps[2], ids, ids)
    return jnp.stack([fx[0], fy[0], fz[0]], axis=-1)
