"""Measure the TRUE per-iteration train cost by differencing two span
lengths — cancels the remote-tunnel dispatch overhead (~0.4s/call) and
avoids the 67MB full-embedding fetch that polluted earlier bench numbers.

Completion is forced by a 4-byte device-side slice (data-dependent, so it
blocks on the whole train program).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def fetch1(arr):
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(arr))


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    x = fv.init_embedding(seed=1)
    key = jax.random.PRNGKey(1)

    spans = [100, 400]
    times = {}
    for it in spans:
        # warmup/compile for this span length
        xx = fv._train_jit(fv._garr, x, key, it, 0)
        fetch1(xx)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            xx = fv._train_jit(fv._garr, x, key, it, it)
            fetch1(xx)
            best = min(best, time.perf_counter() - t0)
        times[it] = best
        print(f"span {it}: {best:.3f}s  ({best/it*1e3:.2f} ms/iter incl dispatch)",
              flush=True)

    s = (times[spans[1]] - times[spans[0]]) / (spans[1] - spans[0])
    d = times[spans[0]] - spans[0] * s
    ups = (graph.nnz + graph.n * cfg.ns) / s / 1e6
    print(f"per-iter: {s*1e3:.3f} ms   dispatch overhead: {d*1e3:.0f} ms", flush=True)
    print(f"TRUE rate: {ups:.0f} M updates/s/chip", flush=True)


if __name__ == "__main__":
    main()
