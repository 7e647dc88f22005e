"""Why is _train_jit 3x slower than the same body in a static-count loop?
Candidates: dynamic trip count, donation, something in draw()."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def sync_time(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    ups = graph.nnz + graph.n * 5
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      per_vertex_samples=True, gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=16, hub_width=128, use_pallas=False)
    key = jax.random.PRNGKey(1)
    train = fv._build_train_fn()

    def bench(tag, jitted, *args):
        x = fv.init_embedding(seed=1)
        sync_time(jitted, fv._garr, x, *args)  # compile+warm
        x = fv.init_embedding(seed=1)
        t0 = time.perf_counter()
        sync_time(jitted, fv._garr, x, *args)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag:32s}: {dt*1e3:7.2f} ms/iter ({ups/dt/1e6:6.1f} M ups/s)",
              flush=True)

    # A: as shipped (donated, dynamic counts)
    bench("A shipped train_jit", fv._train_jit, key, ITERS, 0)
    # B: no donation, dynamic counts
    jit_b = jax.jit(train)
    bench("B no-donate dynamic", jit_b, key, ITERS, 0)
    # C: static counts, no donation
    jit_c = jax.jit(lambda g, x, k: train(g, x, k, ITERS, 0))
    bench("C no-donate static", jit_c, key)
    # D: static counts, donated
    jit_d = jax.jit(lambda g, x, k: train(g, x, k, ITERS, 0), donate_argnums=(1,))
    bench("D donate static", jit_d, key)


if __name__ == "__main__":
    main()
