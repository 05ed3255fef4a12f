"""Profile the bench/in.lj step on the real TPU: where do the 5.5 ms go?"""
import time

import jax
import jax.numpy as jnp

from lidp_tpu.models import lj_melt
from lidp_tpu.ops.cells import build_cells, cell_pair_forces


def timeit(fn, *args, n=50, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    melt = lj_melt.build(scale=1, dtype=jnp.float32, neighbor="cells")
    sys_, res, nlist, istate = melt.runner.setup(melt.system)
    print("cap", nlist.atom_of_slot.shape, flush=True)

    cfg = melt.runner.neighbor_cfg
    p = melt.runner.ff.pair

    f_cells = jax.jit(lambda s: build_cells(s.x, s.mask, s.box, cfg))
    print("build_cells ms:", timeit(f_cells, sys_), flush=True)

    f_pair = jax.jit(lambda s, c: cell_pair_forces(
        s.x, s.q, s.type, s.mask, c, s.box, p))
    print("cell_pair_forces ms:", timeit(f_pair, sys_, nlist), flush=True)

    # 20-step chunk = 19 normal steps + 1 rebuild step
    t = timeit(lambda: melt.runner.run(sys_, res, nlist, istate, 20), n=10)
    print("20-step chunk ms:", t, "-> per step:", t / 20, flush=True)

    t = timeit(lambda: melt.runner.run(sys_, res, nlist, istate, 400), n=3)
    print("400-step ms:", t, "-> steps/s:", 400 / (t / 1e3), flush=True)


if __name__ == "__main__":
    main()
