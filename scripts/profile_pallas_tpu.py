"""Break down the pallas cell-pair path: precompute vs kernel vs post."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidp_tpu.models import lj_melt
from lidp_tpu.ops import cells as C
from lidp_tpu.ops import pallas_pair as PP


def timeit(fn, *args, n=50, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    melt = lj_melt.build(scale=1, dtype=jnp.float32, neighbor="cells")
    s = melt.system
    p = melt.runner.ff.pair
    cfg = C.CellConfig.for_box([float(s.box.lengths[0])] * 3, 2.8,
                               density=0.8442, cap_slack=1.5)
    cells = C.build_cells(s.x, s.mask, s.box, cfg)

    n = s.x.shape[0]
    aos = cells.atom_of_slot
    nbins = aos.shape[:3]
    cap = aos.shape[-1]
    Cn = int(np.prod(nbins))
    noff = len(C._HALF_OFFSETS)
    K = (1 + noff) * cap
    K_pad = ((K + 127) // 128) * 128
    BC = 8
    C_pad = ((Cn + BC - 1) // BC) * BC

    # -- precompute only --
    def precompute(x):
        L = s.box.lengths.astype(jnp.float32)
        amax = jnp.minimum(aos, n - 1)
        valid = (aos < n).reshape(Cn, cap)
        lin = jnp.arange(Cn * cap, dtype=jnp.float32).reshape(Cn, cap)
        sent = 1e4 + 10.0 * lin
        ctr = []
        for d in range(3):
            g = x[:, d][amax].reshape(Cn, cap)
            pad = sent if d == 0 else jnp.zeros_like(g)
            ctr.append(jnp.where(valid, g, pad))
        shifts = PP._shift_table(nbins)
        nbr = []
        for d in range(3):
            g4 = ctr[d].reshape(*nbins, cap)
            blocks = [ctr[d]]
            for i, off in enumerate(C._HALF_OFFSETS):
                r = g4
                for ax, sh in enumerate(off):
                    if sh:
                        r = jnp.roll(r, -sh, axis=ax)
                blocks.append(r.reshape(Cn, cap)
                              + jnp.asarray(shifts[i, d])[:, None] * L[d])
            col = jnp.concatenate(blocks, axis=1)
            col = jnp.pad(col, ((0, C_pad - Cn), (0, K_pad - K)),
                          constant_values=2e6 if d == 0 else 0.0)
            nbr.append(col)
        ctr = [jnp.pad(c_, ((0, C_pad - Cn), (0, 0)),
                       constant_values=1e5 if d == 0 else 0.0)
               for d, c_ in enumerate(ctr)]
        return ctr, nbr

    pre = jax.jit(precompute)
    out = pre(s.x)
    print("precompute ms:", timeit(pre, s.x), flush=True)
    ctr, nbr = jax.tree.map(lambda a: a, out)

    # -- kernel only --
    grid = (C_pad // BC,)
    par = jnp.array([p.lj1[1, 1], p.lj2[1, 1], p.lj3[1, 1], p.lj4[1, 1],
                     p.offset[1, 1], p.cut_ljsq[1, 1]], jnp.float32)
    kern = functools.partial(PP._lj_kernel, cap=cap, need_ev=False)
    spec_c = pl.BlockSpec((BC, cap), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((BC, K_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    @jax.jit
    def run_kernel(par, cx, cy, cz, nx, ny, nz):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      spec_c, spec_c, spec_c, spec_n, spec_n, spec_n],
            out_specs=[spec_c] * 3 + [spec_n] * 3 +
                      [pl.BlockSpec((8, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((C_pad, cap), jnp.float32)] * 3 +
                      [jax.ShapeDtypeStruct((C_pad, K_pad), jnp.float32)] * 3 +
                      [jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        )(par, cx, cy, cz, nx, ny, nz)

    print("kernel ms:", timeit(run_kernel, par, *ctr, *nbr), flush=True)


if __name__ == "__main__":
    main()
