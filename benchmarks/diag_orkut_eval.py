"""Diagnose the Orkut-scale AUC-0.5 eval (round 5).

BIGRUN_orkut's 300-iteration run reported link-pred AUC 0.5002 on the
FIRST 50K vertices while the same pipeline at Youtube scale reads 0.634.
synth_big gives low ids the highest degrees (dst ~ rank^-0.5), so
"first N" selects the top-degree hub core — hypothesis: at com-Orkut
density (avg deg 78, hub core ~4x denser than Youtube's) the core's
t-dist embedding collapses into an undiscriminative blob, while the
reference's first-N protocol on real arbitrary-id .mtx files is
effectively a random sample.  This probe trains a short run and compares
first-N vs random-N eval plus embedding geometry stats.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    iters = int(os.environ.get("DIAG_ITERS", "60"))
    es = int(os.environ.get("DIAG_EVAL", "20000"))
    from force2vec_tpu.graphs.io import load_graph

    t0 = time.perf_counter()
    graph = load_graph("/tmp/bigrun_orkut.mtx")
    print(f"load {time.perf_counter()-t0:.1f}s n={graph.n} nnz={graph.nnz}",
          flush=True)

    import jax
    import jax.numpy as jnp

    from force2vec_tpu.eval.linkpred import link_prediction_scores
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    lrs = [float(v) for v in os.environ.get(
        "DIAG_LRS", "0.02,0.01,0.005,0.0025").split(",")]
    base = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                       gather_dtype="bfloat16")

    sub_nodes = np.sort(np.random.default_rng(12345).choice(
        graph.n, size=es, replace=False))
    sub = graph.induced_subgraph(sub_nodes)
    take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))

    fv = None
    for lr in lrs:
        cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                          gather_dtype="bfloat16", lr=lr)
        t0 = time.perf_counter()
        if fv is None:
            fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                               take_group_bytes=32 * 2**20)
            print(f"layout {time.perf_counter()-t0:.1f}s", flush=True)
        else:
            fv.config = cfg
            fv.lr = cfg.resolve_lr(fv.model)
        # the train fn closes over fv.lr at build time — rebuild the
        # dispatcher for this lr (big-graph path: garr as jit arguments)
        from force2vec_tpu.train.trainer import make_train_dispatcher

        train = fv._build_train_fn()
        fv._train_jit = make_train_dispatcher(
            lambda k, train=train: jax.jit(
                lambda g, x, key, off: train(g, x, key, k, off)))

        x = fv.init_embedding(seed=1)
        key = jax.random.PRNGKey(1)
        span = 20
        x = fv._train_jit(fv._garr, x, key, span, 0)
        done = span
        while done < iters:
            k = min(span, iters - done)
            x = fv._train_jit(fv._garr, x, key, k, done)
            done += k

        idx_rel = jnp.asarray(fv.layout.inv_perm[sub_nodes], jnp.int32)
        emb = np.asarray(take(x, idx_rel))
        norms = np.linalg.norm(emb, axis=1)
        rng = np.random.default_rng(0)
        src = np.repeat(np.arange(sub.n), np.diff(sub.rowptr))
        samp = rng.choice(sub.nnz, size=min(20000, sub.nnz), replace=False)
        d_edge = np.linalg.norm(
            emb[src[samp]] - emb[sub.colids[samp]], axis=1).mean()
        a, b = rng.integers(0, es, 20000), rng.integers(0, es, 20000)
        d_rand = np.linalg.norm(emb[a] - emb[b], axis=1).mean()
        scores = link_prediction_scores(sub, emb, seed=0)
        print(f"[lr={lr} iters={iters}] norm_mean={norms.mean():.3f} "
              f"d_edge={d_edge:.3f} d_rand={d_rand:.3f} "
              f"scores={ {k: round(v,4) for k,v in scores.items()} }",
              flush=True)


if __name__ == "__main__":
    main()
