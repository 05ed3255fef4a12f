"""Phase-level TPU profiling for the sharded polarizable step (dev tool)."""
import time, sys, faulthandler
faulthandler.enable()
import jax, jax.numpy as jnp, numpy as np
from lidp_tpu.box import minimum_image

npad, csz = 12288, 2048
rng = np.random.RandomState(0)
L = jnp.asarray([51.3, 51.3, 51.3], jnp.float32)
x = jnp.asarray(rng.uniform(0, 51.3, (npad, 3)), jnp.float32)
q = jnp.asarray(rng.normal(size=npad), jnp.float32)

def pair_pass(x, q):
    nch = npad // csz
    def body(acc, idx):
        xc = jax.lax.dynamic_slice_in_dim(x, idx * csz, csz, 0)
        qc = jax.lax.dynamic_slice_in_dim(q, idx * csz, csz, 0)
        dx = minimum_image(x[:, 0:1] - xc[None, :, 0], L[0])
        dy = minimum_image(x[:, 1:2] - xc[None, :, 1], L[1])
        dz = minimum_image(x[:, 2:3] - xc[None, :, 2], L[2])
        rsq = dx * dx + dy * dy + dz * dz
        rsq = jnp.where(rsq > 1e-6, rsq, 1.0)
        r2inv = 1.0 / rsq
        r6 = r2inv * r2inv * r2inv
        fl = r6 * (r6 * 48.0 - 24.0)
        r = jnp.sqrt(rsq)
        pref = q[:, None] * qc[None, :] / r
        grij = 0.19 * r
        ex = jnp.exp(-grij * grij)
        tt = 1.0 / (1.0 + 0.3275911 * grij)
        erfc = tt * (0.25 + tt * (-0.28 + tt * (1.42 + tt * (-1.45 + tt * 1.06)))) * ex
        fc = pref * (erfc + 1.128 * grij * ex)
        fp = (fl + fc) * r2inv
        return (acc[0] + jnp.sum(fp * dx, axis=1),
                acc[1] + jnp.sum(fp * dy, axis=1),
                acc[2] + jnp.sum(fp * dz, axis=1)), None
    acc, _ = jax.lax.scan(body, (jnp.zeros(npad), jnp.zeros(npad), jnp.zeros(npad)),
                          jnp.arange(nch))
    return acc[0] + acc[1] + acc[2]

t0 = time.perf_counter()
jp = jax.jit(pair_pass)
r = jp(x, q); jax.block_until_ready(r)
print("compile+first:", round(time.perf_counter() - t0, 1), flush=True)
t0 = time.perf_counter()
for _ in range(10):
    r = jp(x, q)
jax.block_until_ready(r)
print("one O(N^2) pass ms:", round((time.perf_counter() - t0) * 100, 2), flush=True)

# unchunked single-block version for comparison
def pair_block(x, q):
    dx = minimum_image(x[:, 0:1] - x[None, :, 0], L[0])
    dy = minimum_image(x[:, 1:2] - x[None, :, 1], L[1])
    dz = minimum_image(x[:, 2:3] - x[None, :, 2], L[2])
    rsq = jnp.where(dx*dx+dy*dy+dz*dz > 1e-6, dx*dx+dy*dy+dz*dz, 1.0)
    r2inv = 1.0 / rsq
    r6 = r2inv * r2inv * r2inv
    fp = r6 * (r6 * 48.0 - 24.0) * r2inv
    return (jnp.sum(fp * dx, axis=1), jnp.sum(fp * dy, axis=1))

jb = jax.jit(pair_block)
r = jb(x, q); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10):
    r = jb(x, q)
jax.block_until_ready(r)
print("unchunked LJ-only pass ms:", round((time.perf_counter() - t0) * 100, 2), flush=True)
