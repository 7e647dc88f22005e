"""Tune take_group_bytes: slope-time the REAL jitted training loop at the
headline bench config for several take-group caps (one bulk gather per
group; see train/sync.py attraction).  Also times the new Pallas grouped
repulsion against the jnp fallback at the best cap.

Run: python benchmarks/profile_takegroups.py [capMB ...]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from bench import synth_powerlaw_graph  # noqa: E402
from force2vec_tpu.train.sync import SyncForce2Vec  # noqa: E402
from force2vec_tpu.train.trainer import TrainConfig  # noqa: E402

_fence = jax.jit(lambda a: a.reshape(-1)[:1])


def slope(fv, x, key, spans=(5, 30), reps=2):
    times = {}
    for span in spans:
        xx = fv._train_jit(fv._garr, x, key, span, 0)
        np.asarray(_fence(xx))
        best = float("inf")
        for _ in range(reps):
            t1 = time.perf_counter()
            xx = fv._train_jit(fv._garr, x, key, span, span)
            np.asarray(_fence(xx))
            best = min(best, time.perf_counter() - t1)
        times[span] = best
    return (times[spans[1]] - times[spans[0]]) / (spans[1] - spans[0])


def main():
    caps_mb = [int(a) for a in sys.argv[1:]] or [48, 96, 192, 1024]
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    key = jax.random.PRNGKey(1)
    for cap in caps_mb:
        fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                           take_group_bytes=cap * 1024 * 1024)
        x = fv.init_embedding(seed=1)
        sec = slope(fv, x, key)
        ups = (graph.nnz + graph.n * cfg.ns) / sec / 1e6
        print(f"take_group={cap}MB  {sec*1e3:.2f} ms/iter  {ups:.1f} M up/s",
              flush=True)


if __name__ == "__main__":
    main()
