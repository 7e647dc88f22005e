"""Round benchmark: edge force-updates/s on one chip, flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE.json's headline metric — tForce2Vec (t-dist +
negative sampling, reference option 5) at dim=128 — on a deterministic
synthetic power-law graph big enough to saturate the chip.  An
edge force-update is one endpoint update from either an attraction edge
(nnz per iteration) or a sampled repulsion pair (n·ns per iteration),
i.e. exactly the unit of the reference's inner loops
(sample/algorithms.cpp:598-627).

``vs_baseline`` compares against the reference C++ AVX512 build measured on
this host (baselines/cpu_reference.json, produced by
benchmarks/run_reference_baseline.sh); null until that file exists.
"""

import json
import os
import sys
import time

import numpy as np


def synth_powerlaw_graph(n=131072, avg_deg=16, seed=42):
    """Deterministic preferential-attachment-flavored graph: each vertex
    draws `avg_deg/2` endpoints with probability ∝ (rank+1)^-0.5, then the
    edge set is symmetrized. Gives a heavy-tailed degree distribution like
    the reference's com-* configs."""
    from force2vec_tpu.graphs.csr import Graph

    rng = np.random.default_rng(seed)
    m = n * avg_deg // 2
    # power-law target distribution over vertex ranks
    w = (np.arange(n, dtype=np.float64) + 1.0) ** -0.5
    w /= w.sum()
    src = rng.integers(0, n, size=m)
    dst = rng.choice(n, size=m, p=w)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    return Graph.from_coo(rows, cols, None, n=n)


def main():
    t0 = time.time()
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    n = int(os.environ.get("BENCH_N", 131072))
    avg_deg = int(os.environ.get("BENCH_DEG", 16))
    iters = int(os.environ.get("BENCH_ITERS", 100))
    warmup = int(os.environ.get("BENCH_WARMUP", 10))

    graph = synth_powerlaw_graph(n=n, avg_deg=avg_deg)
    gather_dtype = os.environ.get("BENCH_GATHER_DTYPE") or None
    cfg = TrainConfig(
        dim=128, model="tdist", ns=5, per_vertex_samples=True,
        gather_dtype=gather_dtype,
    )
    # few, wide buckets: keeps the XLA program small — compile through the
    # remote-TPU tunnel is the scarce resource, not device time
    fv = SyncForce2Vec(graph, cfg, min_width=16, hub_width=128)

    x = fv.init_embedding(seed=1)
    import jax
    import numpy as _np

    key = jax.random.PRNGKey(1)

    # warmup (compile + first steps; block via a real host transfer — on
    # the remote-TPU platform block_until_ready alone does not block)
    x = fv._train_jit(fv._garr, x, key, warmup, 0)
    _np.asarray(x).ravel()[:1]

    t1 = time.perf_counter()
    x = fv._train_jit(fv._garr, x, key, iters, warmup)
    _np.asarray(x).ravel()[:1]
    dt = time.perf_counter() - t1

    updates_per_iter = graph.nnz + graph.n * cfg.ns
    mups = updates_per_iter * iters / dt / 1e6

    vs = None
    base_path = os.path.join(os.path.dirname(__file__), "baselines", "cpu_reference.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("m_updates_per_s"):
            vs = mups / base["m_updates_per_s"]

    print(
        json.dumps(
            {
                "metric": "edge_force_updates_per_s",
                "value": round(mups, 2),
                "unit": "M updates/s/chip",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )
    print(
        f"# n={graph.n} nnz={graph.nnz} dim=128 schedule=sync ns=5 iters={iters} "
        f"time={dt:.2f}s total_wall={time.time()-t0:.1f}s "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
