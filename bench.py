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
    # bf16 gather replica by default (quality-gated vs the golden artifact
    # in tests/test_golden.py); BENCH_GATHER_DTYPE=float32 opts out.
    gather_dtype = os.environ.get("BENCH_GATHER_DTYPE", "bfloat16")
    if gather_dtype in ("", "none", "float32"):
        gather_dtype = None
    # batch-shared negatives per 256-row group — the reference's own
    # option-5 sampling pattern (sample/algorithms.cpp:577-586);
    # BENCH_PER_VERTEX=1 switches to the -bs 1 per-vertex flavor.
    per_vertex = os.environ.get("BENCH_PER_VERTEX", "") == "1"
    cfg = TrainConfig(
        dim=128, model="tdist", ns=5, batch_size=256,
        per_vertex_samples=per_vertex, gather_dtype=gather_dtype,
    )
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)

    x = fv.init_embedding(seed=1)
    import jax
    import numpy as _np

    if fv.use_pallas and os.environ.get("BENCH_SKIP_PARITY", "") != "1":
        # on-chip parity: the Pallas force kernel vs the pure-jnp path on
        # one real iteration (same injected negatives)
        jnp_fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                               use_pallas=False)
        ng = -(-fv.layout.n_pad // cfg.batch_size)
        negs = _np.random.default_rng(7).integers(
            0, graph.n - 1, size=(fv.layout.n_pad if per_vertex else ng, 5)
        ).astype(_np.int32)
        a = _np.asarray(fv.run_iteration(x, negs))
        b = _np.asarray(jnp_fv.run_iteration(x, negs))
        err = float(_np.max(_np.abs(a - b)))
        assert err < 1e-3, f"pallas/jnp parity failed on-chip: max err {err}"
        print(f"# pallas on-chip parity ok (max |err| = {err:.2e})", file=sys.stderr)

    key = jax.random.PRNGKey(1)

    # warmup with the SAME span length as the timed run — the train entry
    # compiles one program per iteration count, so a different warmup span
    # would leave the real compile inside the timed region.  Block via a
    # real host transfer (on the remote-TPU platform block_until_ready
    # alone does not block).
    del warmup
    x = fv._train_jit(fv._garr, x, key, iters, 0)
    _np.asarray(x).ravel()[:1]

    t1 = time.perf_counter()
    x = fv._train_jit(fv._garr, x, key, iters, iters)
    _np.asarray(x).ravel()[:1]
    dt = time.perf_counter() - t1

    updates_per_iter = graph.nnz + graph.n * cfg.ns
    mups = updates_per_iter * iters / dt / 1e6

    # gather-bound roofline: time a standalone bulk take of the same row
    # volume the iteration gathers, at the same dtype
    rows_per_iter = fv.layout.padded_edges + (
        graph.n * cfg.ns if per_vertex
        else (-(-fv.layout.n_pad // cfg.batch_size)) * cfg.ns
    )
    roof_pct = None
    if os.environ.get("BENCH_SKIP_ROOFLINE", "") != "1":
        import jax.numpy as jnp

        gd = jnp.bfloat16 if gather_dtype else jnp.float32
        xg = jnp.asarray(_np.asarray(x), dtype=gd)
        m_idx = min(rows_per_iter, 4_000_000)
        idx = jax.random.randint(jax.random.PRNGKey(3), (m_idx,), 0, graph.n, jnp.int32)

        @jax.jit
        def graze(xg, idx):
            def body(i, c):
                return c + jnp.sum(
                    jnp.take(xg, (idx + i) % graph.n, axis=0).astype(jnp.float32)
                )
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        float(graze(xg, idx))
        t2 = time.perf_counter()
        float(graze(xg, idx))
        gather_rate = m_idx * 10 / (time.perf_counter() - t2)
        roofline_mups = updates_per_iter / (rows_per_iter / gather_rate) / 1e6
        roof_pct = 100.0 * mups / roofline_mups

    # Honest baseline: the linearly-extrapolated 32-thread AVX512 number
    # (overstates the CPU — see baselines/cpu_reference.json), per
    # BASELINE.json's ">=5x vs 32-thread" north star.
    vs = vs_host = None
    base_path = os.path.join(os.path.dirname(__file__), "baselines", "cpu_reference.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("m_updates_per_s_extrapolated_32t"):
            vs = mups / base["m_updates_per_s_extrapolated_32t"]
        elif base.get("m_updates_per_s"):
            vs = mups / base["m_updates_per_s"]
        if base.get("m_updates_per_s"):
            vs_host = mups / base["m_updates_per_s"]

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
        f"platform={jax.devices()[0].platform} pallas={fv.use_pallas} "
        f"gather_dtype={gather_dtype} "
        f"vs_baseline=per-chip / extrapolated-32-thread-AVX512 (linear, overstated); "
        f"vs 2-thread measured host: {vs_host and round(vs_host, 2)}x; "
        f"gather-roofline: {roof_pct and round(roof_pct, 1)}%",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
