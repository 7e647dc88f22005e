"""Bisect the sync iteration: attraction vs repulsion vs per-bucket cost."""

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
    n = graph.n
    x = fv.init_embedding(seed=1)
    negs = jax.random.randint(jax.random.PRNGKey(2), (lay.n_pad, 5), 0, n, jnp.int32)
    for b in lay.buckets:
        print(f"bucket w={b.width} count={b.count} start={b.start} "
              f"hub={b.owners is not None}", flush=True)
    print(f"n_pad={lay.n_pad} padded_edges={lay.padded_edges}", flush=True)

    model = fv.model
    dim = cfg.dim

    def force_sum(kind, xi, xj, dg, invd, step):
        xj = xj.astype(xi.dtype)
        k = xj.shape[1]
        if kind == "edge":
            f = model.edge_force(xi[:, None, :], xj, invd[:, None, None], step)
        else:
            f = model.sample_force(xi[:, None, :], xj, step)
        mask = jnp.arange(k, dtype=jnp.int32)[None, :] < dg[:, None]
        return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

    # per-bucket attraction cost
    for bi, b in enumerate(lay.buckets):
        def bstep(i, c, g, xx, bi=bi, b=b):
            xg = xx.astype(jnp.bfloat16)
            nbr = g[f"nbr{bi}"]
            dg_ = g[f"deg{bi}"]
            if b.owners is not None:
                own = g[f"own{bi}"]
                xi = jnp.take(xx, own + jnp.int32(b.start), axis=0)
                invd = jnp.take(g["inv_deg"], own + jnp.int32(b.start))
            else:
                xi = jax.lax.dynamic_slice(xx, (b.start, 0), (b.count, dim))
                invd = jax.lax.dynamic_slice(g["inv_deg"], (b.start,), (b.count,))
            xj = jnp.take(xg, nbr.reshape(-1), axis=0).reshape(b.count, b.width, dim)
            part = force_sum("edge", xi, xj, dg_, invd, jnp.float32(0.02))
            return c + part[0, 0] * 1e-9

        t = timeit_loop(bstep, jnp.float32(0), fv._garr, x)
        print(f"bucket {bi} (w={b.width}, count={b.count}, "
              f"rows*w={b.count*b.width}): {t*1e3:7.2f} ms", flush=True)

    # repulsion
    def rstep(i, c, g, xx, ng):
        xg = xx.astype(jnp.bfloat16)
        s = jnp.take(xg, ng.reshape(-1), axis=0).reshape(lay.n_pad, 5, dim)
        full = jnp.full((lay.n_pad,), 5, dtype=jnp.int32)
        invd0 = jnp.zeros((lay.n_pad,), dtype=xx.dtype)
        part = force_sum("sample", xx, s, full, invd0, jnp.float32(0.02))
        return c + part[0, 0] * 1e-9

    t = timeit_loop(rstep, jnp.float32(0), fv._garr, x, negs)
    print(f"repulsion [n_pad,5]: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
