"""Scaling-efficiency harness: edges/s at 1..N devices (BASELINE.md).

Runs the epoch-synchronous trainer over (dp, tp) meshes of increasing
size on whatever devices the runtime has — real chips on a pod slice, or
a virtual CPU mesh (JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=N) for plumbing validation — and
reports throughput + efficiency vs the single-device run.

Usage:
    python benchmarks/scaling.py [--n 65536] [--deg 16] [--iters 30]
                                 [--tp 1] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--devices", default="")
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    import jax

    from bench import synth_powerlaw_graph
    from force2vec_tpu.dist.sharded import ShardedSyncForce2Vec
    from force2vec_tpu.dist.sharded import make_mesh
    from force2vec_tpu.train.trainer import TrainConfig

    avail = len(jax.devices())
    sizes = (
        [int(s) for s in args.devices.split(",") if s]
        if args.devices
        else [s for s in (1, 2, 4, 8, 16, 32) if s <= avail]
    )

    graph = synth_powerlaw_graph(n=args.n, avg_deg=args.deg)
    cfg = TrainConfig(
        dim=args.dim, model="tdist", ns=5, per_vertex_samples=True
    )
    updates = (graph.nnz + graph.n * cfg.ns) * args.iters

    base_rate = None
    rows = []
    for nd in sizes:
        if nd % args.tp:
            continue
        mesh = make_mesh(jax.devices()[:nd], dp=nd // args.tp, tp=args.tp)
        runner = ShardedSyncForce2Vec(graph, cfg, mesh, min_width=16, hub_width=128)
        x = runner.fv.init_embedding(1)
        key = jax.random.PRNGKey(1)
        import jax as _jax

        x = _jax.device_put(
            x, _jax.sharding.NamedSharding(mesh, runner.x_spec)
        )
        x = runner._train_jit(runner.fv._garr, x, key, args.warmup, 0)
        np.asarray(x).ravel()[:1]
        t0 = time.perf_counter()
        x = runner._train_jit(runner.fv._garr, x, key, args.iters, args.warmup)
        np.asarray(x).ravel()[:1]
        dt = time.perf_counter() - t0
        rate = updates / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        rows.append(
            {
                "devices": nd,
                "dp": nd // args.tp,
                "tp": args.tp,
                "seconds": round(dt, 4),
                "m_updates_per_s": round(rate / 1e6, 2),
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"scaling": rows}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
