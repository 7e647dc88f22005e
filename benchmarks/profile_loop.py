"""Isolate the per-loop-step fixed cost on this platform: fori_loop vs
scan vs unrolled variants, empty body vs a real gather body."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch1(arr):
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(arr))


def bench(name, fn, *args, reps=3):
    r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        fetch1(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    print(f"platform={jax.devices()[0]}", flush=True)
    N = 100

    def body(i, c):
        return c + jnp.float32(1.0) * (i % 2)

    f_fori = jax.jit(lambda c: jax.lax.fori_loop(0, N, body, c))
    f_fori_u8 = jax.jit(lambda c: jax.lax.fori_loop(0, N, body, c, unroll=8))
    f_scan = jax.jit(
        lambda c: jax.lax.scan(lambda cc, i: (body(i, cc), None),
                               c, jnp.arange(N))[0]
    )
    f_scan_u8 = jax.jit(
        lambda c: jax.lax.scan(lambda cc, i: (body(i, cc), None),
                               c, jnp.arange(N), unroll=8)[0]
    )

    def unrolled(c):
        for i in range(N):
            c = body(jnp.int32(i), c)
        return c

    f_unroll = jax.jit(unrolled)

    c0 = jnp.float32(0)
    bench(f"empty fori_loop x{N}", f_fori, c0)
    bench(f"empty fori_loop x{N} unroll=8", f_fori_u8, c0)
    bench(f"empty scan x{N}", f_scan, c0)
    bench(f"empty scan x{N} unroll=8", f_scan_u8, c0)
    bench(f"empty python-unrolled x{N}", f_unroll, c0)

    # real body: gather 1.25M bf16 rows + reduce (approximates one bucket)
    n, d = 131072, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1_250_000,), 0, n, jnp.int32)

    def gbody(i, c, x, idx):
        g = jnp.take(x, (idx + i) % n, axis=0)
        return c + jnp.sum(g.astype(jnp.float32))

    M = 20
    g_fori = jax.jit(
        lambda c, x, idx: jax.lax.fori_loop(
            0, M, lambda i, cc: gbody(i, cc, x, idx), c))
    g_fori_u = jax.jit(
        lambda c, x, idx: jax.lax.fori_loop(
            0, M, lambda i, cc: gbody(i, cc, x, idx), c, unroll=M))
    t1 = bench(f"gather-1.25Mrow fori x{M}", g_fori, c0, x, idx)
    t2 = bench(f"gather-1.25Mrow fori x{M} unroll", g_fori_u, c0, x, idx)
    print(f"per-step: looped {t1/M*1e3:.2f} ms, unrolled {t2/M*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
