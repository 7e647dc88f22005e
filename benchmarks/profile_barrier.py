"""Does an optimization_barrier between gather and chain defeat XLA's
pathological gather-into-elementwise fusion?  Also: tile-chunked variant
(gather+chain per 16k-row tile under lax.map) to bound HBM round-trips.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20


def timeit_loop(step_fn, init_carry, *arrays, steps=STEPS):
    @jax.jit
    def run(c, *arrs):
        return jax.lax.fori_loop(0, steps, lambda i, cc: step_fn(i, cc, *arrs), c)

    c = run(init_carry, *arrays)
    np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    t0 = time.perf_counter()
    c = run(init_carry, *arrays)
    np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / steps


n, d, k = 131072, 128, 16
c_ = 131072


def chain(xi, xj, dg, step):
    xi = xi.astype(jnp.float32)
    xj = xj.astype(jnp.float32)
    diff = xi[:, None, :] - xj
    a = jnp.sum(diff * diff, axis=-1, keepdims=True)
    d1 = -2.0 / (1.0 + a)
    f = jnp.clip(d1 * diff, -5.0, 5.0) * step
    mask = jax.lax.broadcasted_iota(jnp.int32, (xi.shape[0], k), 1) < dg[:, None]
    return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)


def main():
    print(f"platform={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (n, d), dtype=jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (c_ * k,), 0, n, dtype=jnp.int32)
    dgf = jnp.full((c_,), k, dtype=jnp.int32)

    def barrier_step(i, c, x, ii):
        xj = jnp.take(x, (ii + c) % n, axis=0)
        xj = jax.lax.optimization_barrier(xj).reshape(c_, k, d)
        out = chain(x[:c_], xj, dgf, jnp.float32(0.02))
        return c + out[0, 0].astype(jnp.int32) % 2

    t = timeit_loop(barrier_step, jnp.int32(0), x32, idx)
    print(f"barrier gather+chain f32 : {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)
    t = timeit_loop(barrier_step, jnp.int32(0), x16, idx)
    print(f"barrier gather+chain bf16: {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)

    # tile-chunked: per 16k-row tile, gather -> barrier -> chain, lax.map
    tile = 16384
    nt = c_ // tile

    def tiled_step(i, c, x, ii):
        ii2 = (ii + c) % n

        def one(t_):
            sl = jax.lax.dynamic_slice(ii2, (t_ * tile * k,), (tile * k,))
            dg_t = jax.lax.dynamic_slice(dgf, (t_ * tile,), (tile,))
            xi = jax.lax.dynamic_slice(x, (t_ * tile, 0), (tile, d))
            xj = jnp.take(x, sl, axis=0)
            xj = jax.lax.optimization_barrier(xj).reshape(tile, k, d)
            return chain(xi, xj, dg_t, jnp.float32(0.02))

        out = jax.lax.map(one, jnp.arange(nt, dtype=jnp.int32))
        return c + out[0, 0, 0].astype(jnp.int32) % 2

    t = timeit_loop(tiled_step, jnp.int32(0), x16, idx)
    print(f"tiled barrier gather+chain bf16: {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
