"""Clean-harness test: does materializing the gather (optimization_barrier
or explicit copy) beat XLA's fused gather+chain?  Plus tile-chunked forms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
n, d, ns = 131072, 128, 5


def timeit_loop(step_fn, init_carry, *arrays, steps=STEPS):
    @jax.jit
    def run(c, *arrs):
        out = jax.lax.fori_loop(0, steps, lambda i, cc: step_fn(i, cc, *arrs), c)
        return jnp.sum(out.astype(jnp.float32))

    s = run(init_carry, *arrays)
    float(s)
    t0 = time.perf_counter()
    s = run(init_carry, *arrays)
    float(s)
    return (time.perf_counter() - t0) / steps


def chain_rep(xi, s, step):
    s = s.astype(jnp.float32)
    diff = xi[:, None, :] - s
    r = jnp.sum(diff * diff, axis=-1, keepdims=True)
    d1 = jnp.where(r > 0.0, 2.0 / jnp.where(r > 0.0, r * (1.0 + r), 1.0), 0.0)
    return jnp.sum(jnp.clip(d1 * diff, -5, 5) * step, axis=1)


def main():
    print(f"platform={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (n, d), dtype=jnp.float32)
    negs = jax.random.randint(jax.random.PRNGKey(2), (n, ns), 0, n, jnp.int32)
    rows = n * ns

    def rep_barrier(i, x, ng):
        xg = x.astype(jnp.bfloat16)
        s = jnp.take(xg, ng.reshape(-1), axis=0)
        s = jax.lax.optimization_barrier(s).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    t = timeit_loop(rep_barrier, x32, negs)
    print(f"repulsion barrier          : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)

    # K=16 attraction-shaped problem (2.1M rows): fused vs barrier
    k = 16
    idx = jax.random.randint(jax.random.PRNGKey(3), (n * k,), 0, n, jnp.int32)
    dgf = jnp.full((n,), k, dtype=jnp.int32)

    def chain_edge(xi, xj, dg, step):
        xj = xj.astype(jnp.float32)
        diff = xi[:, None, :] - xj
        a = jnp.sum(diff * diff, axis=-1, keepdims=True)
        d1 = -2.0 / (1.0 + a)
        f = jnp.clip(d1 * diff, -5.0, 5.0) * step
        mask = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], k), 1) < dg[:, None]
        return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

    def attr_fused(i, x, ii):
        xg = x.astype(jnp.bfloat16)
        xj = jnp.take(xg, ii, axis=0).reshape(n, k, d)
        return x + chain_edge(x, xj, dgf, jnp.float32(0.02))

    def attr_barrier(i, x, ii):
        xg = x.astype(jnp.bfloat16)
        xj = jnp.take(xg, ii, axis=0)
        xj = jax.lax.optimization_barrier(xj).reshape(n, k, d)
        return x + chain_edge(x, xj, dgf, jnp.float32(0.02))

    t = timeit_loop(attr_fused, x32, idx)
    print(f"attraction K=16 fused      : {t*1e3:7.2f} ms ({n*k/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(attr_barrier, x32, idx)
    print(f"attraction K=16 barrier    : {t*1e3:7.2f} ms ({n*k/t/1e6:6.1f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
