"""Single-variable experiments on the repulsion-shaped problem
([n_pad, ns=5, 128] from a 131k-row table), all with FULL output
consumption (x + result is the loop carry).  Pins down where the 139 ms
goes: gather-with-full-consume, fusion, index locality, chain, cast.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 10
n, d, ns = 131072, 128, 5


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
    x16 = x32.astype(jnp.bfloat16)
    negs = jax.random.randint(jax.random.PRNGKey(2), (n, ns), 0, n, jnp.int32)
    negs_sorted = jnp.sort(negs.reshape(-1)).reshape(n, ns)
    rows = n * ns

    def v1(i, x, xg, ng):  # gather + reduce only
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + jnp.sum(s, axis=1).astype(jnp.float32)

    def v2(i, x, xg, ng):  # barrier between gather and reduce
        s = jnp.take(xg, ng.reshape(-1), axis=0)
        s = jax.lax.optimization_barrier(s).reshape(n, ns, d)
        return x + jnp.sum(s, axis=1).astype(jnp.float32)

    def v4(i, x, xg, ng):  # full chain, barrier after gather
        s = jnp.take(xg, ng.reshape(-1), axis=0)
        s = jax.lax.optimization_barrier(s).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    def v6(i, x, xg, ng):  # full chain, no barrier (xg is an arg, not cast)
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    t = timeit_loop(v1, x32, x16, negs)
    print(f"v1 gather+reduce bf16 arg        : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v2, x32, x16, negs)
    print(f"v2 gather|barrier|reduce         : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v1, x32, x16, negs_sorted)
    print(f"v3 gather+reduce, SORTED idx     : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v4, x32, x16, negs)
    print(f"v4 chain, barrier after gather   : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v6, x32, x16, negs)
    print(f"v6 chain, fused, xg as arg       : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)

    # v5: chain on PRE-GATHERED input (no gather at all)
    s_pre = jnp.take(x16, negs.reshape(-1), axis=0).reshape(n, ns, d)

    def v5(i, x, sp):
        return x + chain_rep(x, sp, jnp.float32(0.02))

    t = timeit_loop(v5, x32, s_pre)
    print(f"v5 chain only, pre-gathered      : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)

    # v7: cast inside (the sync.py pattern)
    def v7(i, x, ng):
        xg = x.astype(jnp.bfloat16)
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    t = timeit_loop(v7, x32, negs)
    print(f"v7 chain, fused, cast inside     : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
