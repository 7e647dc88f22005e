"""Round-3 second-stage probes at the headline bench config:

  widths  — mult4 (min gather rows, Mosaic pads K to 8 sublanes in the
            kernel) vs mult8 (12% more gather rows, zero sublane waste):
            which side of the gather/VPU balance wins now that the take
            groups pipeline?
  tgb     — fine take_group_bytes scan around the measured optimum.

Usage: python benchmarks/profile_r3b.py widths|tgb [values...]
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


def run(tag, **kw):
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128, **kw)
    x = fv.init_embedding(seed=1)
    sec = slope(fv, x, jax.random.PRNGKey(1))
    ups = (graph.nnz + graph.n * cfg.ns) / sec / 1e6
    print(f"{tag}: {sec*1e3:.2f} ms/iter  {ups:.1f} M up/s  "
          f"(padded_edges={fv.layout.padded_edges})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "widths"
    if which == "widths":
        for scheme in (sys.argv[2:] or ["mult4", "mult8", "pow2"]):
            run(f"widths={scheme}", width_scheme=scheme,
                take_group_bytes=8 * 1024 * 1024)
    elif which == "tgb":
        for mb in [int(a) for a in sys.argv[2:]] or [2, 4, 6, 8, 12]:
            run(f"tgb={mb}MB", take_group_bytes=mb * 1024 * 1024)


if __name__ == "__main__":
    main()
