"""Sweep cell-kernel variants on the real TPU."""
import time

import jax
import jax.numpy as jnp

from lidp_tpu.models import lj_melt
from lidp_tpu.ops import cells as C


def timeit(fn, *args, n=30, **kw):
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

    for slack in (2.0, 1.5, 1.25):
        cfg = C.CellConfig.for_box([s.box.lengths[0]] * 3, 2.8,
                                   density=0.8442, cap_slack=slack)
        cells = C.build_cells(s.x, s.mask, s.box, cfg)
        ovf = bool(cells.overflow)
        f_ev = jax.jit(lambda st, c, _cfg=cfg: C.cell_pair_forces(
            st.x, st.q, st.type, st.mask, c, st.box, p, need_ev=True))
        f_q = jax.jit(lambda st, c, _cfg=cfg: C.cell_pair_forces(
            st.x, st.q, st.type, st.mask, c, st.box, p, need_ev=False))
        t_ev = timeit(f_ev, s, cells)
        t_q = timeit(f_q, s, cells)
        print(f"slack={slack} cap={cfg.cap} overflow={ovf} "
              f"ev={t_ev:.3f}ms quiet={t_q:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
