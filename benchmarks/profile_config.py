"""Bisect the bench config: pallas on/off x sampling x min_width, using the
real _train_jit (what bench.py times)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run_one(graph, pallas, per_vertex, mw, iters=50):
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      per_vertex_samples=per_vertex, gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=mw, hub_width=128,
                       use_pallas=pallas)
    x = fv.init_embedding(seed=1)
    key = jax.random.PRNGKey(1)
    x = fv._train_jit(fv._garr, x, key, 5, 0)
    np.asarray(x).ravel()[:1]
    t0 = time.perf_counter()
    x = fv._train_jit(fv._garr, x, key, iters, 5)
    np.asarray(x).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    ups = graph.nnz + graph.n * 5
    print(f"pallas={pallas} per_vertex={per_vertex} mw={mw}: "
          f"{dt*1e3:7.2f} ms/iter ({ups/dt/1e6:6.1f} M updates/s) "
          f"padded={fv.layout.padded_edges}", flush=True)


def main():
    from bench import synth_powerlaw_graph

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    run_one(graph, pallas=False, per_vertex=True, mw=16)
    run_one(graph, pallas=True, per_vertex=True, mw=16)
    run_one(graph, pallas=True, per_vertex=False, mw=16)
    run_one(graph, pallas=False, per_vertex=False, mw=16)
    run_one(graph, pallas=True, per_vertex=False, mw=8)


if __name__ == "__main__":
    main()
