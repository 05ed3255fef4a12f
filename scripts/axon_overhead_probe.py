"""Isolate the fixed ~10s-per-call overhead on axon (dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

n = 12288
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(0, 50, (n, 3)), jnp.float32)
v = jnp.zeros((n, 3), jnp.float32)
q = jnp.asarray(rng.normal(size=n), jnp.float32)
ti = jnp.asarray(rng.randint(1, 11, n), jnp.int32)
mask = jnp.ones(n, bool)


def base(x):
    return jnp.sum(x * x, axis=1)


def many_io(x, v, f, q, ti, mol, al, mu, mass, mask):
    r = jnp.sum(x * x, axis=1) + q + mass
    en = dict(a=jnp.sum(r), b=jnp.sum(q), c=jnp.sum(x),
              d=jnp.sum(v), e=jnp.sum(r * r), it=jnp.zeros((), jnp.int32))
    return x + 0.1 * v, v + f, mu, x - v, en


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    print(name, round((time.perf_counter() - t0) * 200, 2), "ms/call",
          flush=True)


timeit("1-in 1-out", jax.jit(base), x)
timeit("10-in 5-out dict", jax.jit(many_io),
       x, v, v, q, ti, ti, q, v, q, mask)

# scan with 6 chunks + one big elementwise block, many io
def scan_io(x, v, f, q, ti, mol, al, mu, mass, mask):
    def body(acc, idx):
        xc = jax.lax.dynamic_slice_in_dim(x, idx * 2048, 2048, 0)
        d = x[:, 0:1] - xc[None, :, 0]
        return acc + jnp.sum(d * d, axis=1), None
    acc, _ = jax.lax.scan(body, jnp.zeros(n), jnp.arange(6))
    en = dict(a=jnp.sum(acc), it=jnp.zeros((), jnp.int32))
    return x + 0.1 * v, v, mu, x, en


timeit("scan6 many-io", jax.jit(scan_io), x, v, v, q, ti, ti, q, v, q, mask)
