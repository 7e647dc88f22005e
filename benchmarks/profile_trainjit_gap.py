"""Why is _train_jit slower than a directly-jitted fori_loop of the same
iteration body?  Candidates: the chunked gather sweeps (tile budget splits
buckets at this size), the traced iter_offset, the garr-dict argument.
All measured by span differencing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPANS = (20, 120)


def fetch1(arr):
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(arr))


def slope(run_for_span, x0, reps=2):
    ts = []
    for s in SPANS:
        run = run_for_span(s)
        fetch1(run(x0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            xx = run(x0)
            fetch1(xx)
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (SPANS[1] - SPANS[0])


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    ups = graph.nnz + graph.n * 5
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")

    def report(name, s):
        print(f"{name:44s} {s*1e3:8.2f} ms/iter ({ups/s/1e6:5.0f} M ups/s)",
              flush=True)

    for budget_mb in (256, 2048):
        fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                           tile_budget_bytes=budget_mb * 1024 * 1024)
        x0 = fv.init_embedding(seed=1)
        key = jax.random.PRNGKey(1)

        def mk_dispatcher(span):
            def run(x):
                return fv._train_jit(fv._garr, x, key, span, 0)
            return run

        report(f"budget={budget_mb}MB via _train_jit", slope(mk_dispatcher, x0))

        iteration = fv._iteration
        garr = fv._garr
        ng = -(-fv.layout.n_pad // 256)

        def mk_direct(span):
            def body(t, xc):
                kit = jax.random.fold_in(key, t)
                nkey = jax.random.fold_in(kit, 0)
                negs = jax.random.randint(nkey, (ng, 5), 0, graph.n - 1,
                                          jnp.int32)
                return iteration(garr, xc, negs, None, jnp.float32(0.02))
            return jax.jit(lambda x: jax.lax.fori_loop(0, span, body, x))

        report(f"budget={budget_mb}MB direct jit", slope(mk_direct, x0))


if __name__ == "__main__":
    main()
