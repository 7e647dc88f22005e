"""Definitive sync-iteration bisect. Every variant consumes its FULL output
(the [n_pad, D] update is the fori_loop carry), so XLA cannot dead-code or
partially evaluate anything.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 10


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


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, per_vertex_samples=True,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=16, hub_width=128)
    lay = fv.layout
    n, dim = graph.n, 128
    n_pad = lay.n_pad
    model = fv.model
    x0 = fv.init_embedding(seed=1)
    negs = jax.random.randint(jax.random.PRNGKey(2), (n_pad, 5), 0, n, jnp.int32)
    ups = graph.nnz + graph.n * 5

    def force_sum(kind, xi, xj, dg, invd, step):
        xj = xj.astype(xi.dtype)
        k = xj.shape[1]
        if kind == "edge":
            f = model.edge_force(xi[:, None, :], xj, invd[:, None, None], step)
        else:
            f = model.sample_force(xi[:, None, :], xj, step)
        mask = jnp.arange(k, dtype=jnp.int32)[None, :] < dg[:, None]
        return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

    bucket_meta = []
    for bi, b in enumerate(lay.buckets):
        is_hub = b.owners is not None
        end = n if is_hub or bi == len(lay.buckets) - 1 else lay.buckets[bi + 1].start
        bucket_meta.append((bi, b.width, b.start, b.count, end - b.start, is_hub))

    def attraction(g, x, xg, step, barrier=False):
        parts = []
        for bi, width, start, count, real, is_hub in bucket_meta:
            nbr = g[f"nbr{bi}"]
            dg_ = g[f"deg{bi}"]
            if is_hub:
                owners = g[f"own{bi}"]
                xi = jnp.take(x, owners + jnp.int32(start), axis=0)
                invd = jnp.take(g["inv_deg"], owners + jnp.int32(start))
            else:
                xi = jax.lax.dynamic_slice(x, (start, 0), (count, dim))
                invd = jax.lax.dynamic_slice(g["inv_deg"], (start,), (count,))
            xj = jnp.take(xg, nbr.reshape(-1), axis=0).reshape(count, width, dim)
            if barrier:
                xj = jax.lax.optimization_barrier(xj)
            part = force_sum("edge", xi, xj, dg_, invd, step)
            if is_hub:
                part = jax.ops.segment_sum(part, g[f"own{bi}"], num_segments=real)
            else:
                part = part[:real]
            parts.append(part)
        if n_pad > n:
            parts.append(jnp.zeros((n_pad - n, dim), dtype=x.dtype))
        return jnp.concatenate(parts, axis=0)

    def repulsion(x, xg, ng, step):
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(n_pad, 5, dim)
        full = jnp.full((n_pad,), 5, dtype=jnp.int32)
        invd0 = jnp.zeros((n_pad,), dtype=x.dtype)
        return force_sum("sample", x, s, full, invd0, step)

    step = jnp.float32(0.02)

    def v_attr(i, x, g, ng):
        xg = x.astype(jnp.bfloat16)
        return x + attraction(g, x, xg, step)

    def v_rep(i, x, g, ng):
        xg = x.astype(jnp.bfloat16)
        return x + repulsion(x, xg, ng, step)

    def v_full(i, x, g, ng):
        xg = x.astype(jnp.bfloat16)
        return x + attraction(g, x, xg, step) + repulsion(x, xg, ng, step)

    def v_full_barrier(i, x, g, ng):
        xg = x.astype(jnp.bfloat16)
        return x + attraction(g, x, xg, step, barrier=True) + repulsion(x, xg, ng, step)

    for name, fn in [("attraction only", v_attr), ("repulsion only", v_rep),
                     ("full", v_full), ("full+barrier", v_full_barrier)]:
        t = timeit_loop(fn, x0, fv._garr, negs)
        print(f"{name:18s}: {t*1e3:7.2f} ms  ({ups/t/1e6:6.1f} M updates/s equiv)",
              flush=True)


if __name__ == "__main__":
    main()
