"""Cost of the per-iteration negative-sample draw: threefry vs rbg."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
n = 131072


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
    print(f"platform={jax.devices()[0]}", flush=True)
    x0 = jnp.zeros((8, 128), jnp.float32)

    for impl in ("threefry2x32", "rbg"):
        key = jax.random.PRNGKey(1, impl=impl)

        for shape, tag in (((n, 5), "per-vertex [n,5]"), ((512, 5), "grouped [512,5]")):
            def step(i, c, k):
                kit = jax.random.fold_in(k, i)
                negs = jax.random.randint(kit, shape, 0, n - 1, jnp.int32)
                return c + jnp.sum(negs[:8, :]).astype(jnp.float32)

            t = timeit_loop(step, x0, key)
            print(f"randint {impl:12s} {tag:18s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
