"""Pallas chain kernel as the gather's consumer vs XLA's fused gather+chain.

The Pallas call is opaque to XLA fusion, so the take stays a standalone
bulk gather (fast path) and the kernel streams the materialized [C, K, D]
tile through VMEM once.  Candidate to beat the fused-XLA 187 M rows/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
n, d = 131072, 128


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


def main():
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force

    model = get_model("tdist")
    print(f"platform={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (n, d), dtype=jnp.float32)

    for k in (16, 5):
        idx = jax.random.randint(jax.random.PRNGKey(3), (n * k,), 0, n, jnp.int32)
        dgf = jnp.full((n,), k, dtype=jnp.int32)
        invd = jnp.zeros((n,), jnp.float32)

        def pallas_step(i, x, ii):
            xg = x.astype(jnp.bfloat16)
            xj = jnp.take(xg, ii, axis=0).reshape(n, k, d)
            out = ell_force(model, "edge", x, xj, dgf, invd, jnp.float32(0.02))
            return x + out

        t = timeit_loop(pallas_step, x32, idx)
        print(f"take+pallas K={k:2d}: {t*1e3:7.2f} ms ({n*k/t/1e6:6.1f} M rows/s)",
              flush=True)

        # f32 gather variant (no replica cast)
        def pallas_step32(i, x, ii):
            xj = jnp.take(x, ii, axis=0).reshape(n, k, d)
            out = ell_force(model, "edge", x, xj, dgf, invd, jnp.float32(0.02))
            return x + out

        t = timeit_loop(pallas_step32, x32, idx)
        print(f"take+pallas K={k:2d} f32 gather: {t*1e3:7.2f} ms ({n*k/t/1e6:6.1f} M rows/s)",
              flush=True)


if __name__ == "__main__":
    main()
