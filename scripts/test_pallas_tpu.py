"""Validate + time the Pallas LJ kernel on the real TPU vs the XLA kernel."""
import time

import jax
import jax.numpy as jnp

from lidp_tpu.models import lj_melt
from lidp_tpu.ops import cells as C
from lidp_tpu.ops.pallas_pair import cell_pair_forces_pallas


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
    print("cap", cfg.cap, flush=True)
    cells = C.build_cells(s.x, s.mask, s.box, cfg)
    print("overflow", bool(cells.overflow), flush=True)

    ref = jax.jit(lambda st, c: C.cell_pair_forces(
        st.x, st.q, st.type, st.mask, c, st.box, p, need_ev=True))
    pal = jax.jit(lambda st, c: cell_pair_forces_pallas(
        st.x, st.mask, c, st.box, p, need_ev=True))
    pal_q = jax.jit(lambda st, c: cell_pair_forces_pallas(
        st.x, st.mask, c, st.box, p, need_ev=False))

    f0, ev0, ec0, v0 = ref(s, cells)
    f1, ev1, ec1, v1 = pal(s, cells)
    print("f maxdiff:", float(jnp.max(jnp.abs(f0 - f1))),
          "max|f|:", float(jnp.max(jnp.abs(f0))), flush=True)
    print("evdwl:", float(ev0), float(ev1), flush=True)
    print("vir0:", [float(a) for a in v0], flush=True)
    print("vir1:", [float(a) for a in v1], flush=True)

    print("xla ev ms:", timeit(ref, s, cells), flush=True)
    print("pallas ev ms:", timeit(pal, s, cells), flush=True)
    print("pallas quiet ms:", timeit(pal_q, s, cells), flush=True)


if __name__ == "__main__":
    main()
