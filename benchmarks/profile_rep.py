"""Single-variable experiments on the repulsion-shaped problem
([n_pad, ns=5, 128] from a 131k-row table).  Harness rules learned the
hard way on the remote-TPU tunnel:

* every candidate runs N steps inside ONE jitted fori_loop whose carry is
  the FULL [n, D] array (so nothing can be dead-code eliminated), and
* the jit returns only jnp.sum(carry) — transferring the full array back
  through the tunnel costs ~1.3 s for 67 MB and would swamp the signal.
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
    float(s)  # sync
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
    x16 = x32.astype(jnp.bfloat16)
    negs = jax.random.randint(jax.random.PRNGKey(2), (n, ns), 0, n, jnp.int32)
    rows = n * ns

    def v1(i, x, xg, ng):  # gather + reduce only
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + jnp.sum(s, axis=1).astype(jnp.float32)

    def v5(i, x, sp):  # chain only, pre-gathered
        return x + chain_rep(x, sp, jnp.float32(0.02))

    def v7(i, x, ng):  # full repulsion, cast inside (sync.py pattern)
        xg = x.astype(jnp.bfloat16)
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    def v8(i, x, ng):  # full repulsion, f32 table (no replica)
        s = jnp.take(x, ng.reshape(-1), axis=0).reshape(n, ns, d)
        return x + chain_rep(x, s, jnp.float32(0.02))

    t = timeit_loop(v1, x32, x16, negs)
    print(f"v1 gather+reduce bf16            : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    s_pre = jnp.take(x16, negs.reshape(-1), axis=0).reshape(n, ns, d)
    t = timeit_loop(v5, x32, s_pre)
    print(f"v5 chain only, pre-gathered      : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v7, x32, negs)
    print(f"v7 repulsion, bf16 cast inside   : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)
    t = timeit_loop(v8, x32, negs)
    print(f"v8 repulsion, f32 table          : {t*1e3:7.2f} ms ({rows/t/1e6:6.1f} M rows/s)", flush=True)

    # full sync iteration, same harness
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    ups = graph.nnz + graph.n * 5
    for gd in (None, "bfloat16"):
        cfg = TrainConfig(dim=128, model="tdist", ns=5, per_vertex_samples=True,
                          gather_dtype=gd)
        fv = SyncForce2Vec(graph, cfg, min_width=16, hub_width=128)
        x0 = fv.init_embedding(seed=1)
        ng = jax.random.randint(jax.random.PRNGKey(2), (fv.layout.n_pad, 5), 0,
                                graph.n, jnp.int32)

        def it_step(i, xc, g, ngg, fv=fv):
            return fv._iteration(g, xc, ngg, None, jnp.float32(0.02))

        t = timeit_loop(it_step, x0, fv._garr, ng)
        print(f"sync iteration gd={str(gd):8s}: {t*1e3:7.2f} ms "
              f"({ups/t/1e6:6.1f} M updates/s)", flush=True)


if __name__ == "__main__":
    main()
