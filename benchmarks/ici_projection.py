"""Analytic multi-chip scaling projection from measured quantities.

The environment has ONE real TPU chip, so the ≥80%-at-2-hosts north star
cannot be measured directly.  What CAN be pinned down (VERDICT r3 weak #2):

  * compute/iter: the measured single-chip sec/iter at the bench config
    (slope method, real chip — bench.py / BENCH_r*.json);
  * comm/iter: the vertex-sharded schedule's per-shard exchange volume,
    from VertexShardedForce2Vec.comm_stats() — exact byte counts of the
    cold all_to_all, hot all_gather and pool psum, derived from the real
    partition of the real bench graph (built here on a virtual mesh; the
    layout is a host-side object, identical on real chips);
  * link bandwidths: published TPU v5e numbers — 1600 Gbit/s aggregate
    ICI per chip (= 200 GB/s, ~100 GB/s effective one-way for a2a
    patterns) and a 200 Gbit/s (25 GB/s) per-host DCN NIC (the
    conservative public figure for v5e pods).

Projection model, per mesh size P:

    t_comp(P)  = sec_iter_1chip / P          (work partitions exactly:
                 padded rows and repulsion rows both split 1/P)
    t_comm(P)  = bytes_per_iter_per_shard(P) / BW
    efficiency = t_comp / (t_comp + t_comm)      [no overlap — pessimistic]
                 t_comp / max(t_comp, t_comm)    [full overlap — optimistic]

The truth lies between the bounds; the overlap machinery (free/dep slab
split, dist/vertex_sharded.py) exists precisely to push toward the
optimistic bound.  For the 2-host row, bytes crossing the host boundary
(the fraction of a2a peers on the other host) ride DCN; intra-host
traffic rides ICI.

Writes the `ici_projection` section into SCALING.json.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/ici_projection.py [--sec-iter 8.47e-3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ICI_BYTES_PER_S = 100e9  # v5e: 1600 Gbit/s aggregate → ~100 GB/s one-way
DCN_BYTES_PER_S = 25e9   # 200 Gbit/s NIC per host


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sec-iter", type=float, default=None,
                    help="measured single-chip sec/iter at the bench "
                    "config (default: derived from BENCH_r03.json tail)")
    ap.add_argument("--chips-per-host", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    ap.add_argument("--big-mtx", default="",
                    help="also project a big graph (e.g. /tmp/bigrun_yt.mtx) "
                    "with --big-sec-iter as its measured 1-chip sec/iter")
    ap.add_argument("--big-sec-iter", type=float, default=0.477)
    args = ap.parse_args()

    sec_iter = args.sec_iter
    if sec_iter is None:
        # headline measured value (PERF.md §6 / bench.py slope): prefer an
        # explicit flag; fall back to the r3 committed number
        sec_iter = 8.47e-3

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bench import synth_powerlaw_graph
    from force2vec_tpu.dist.vertex_sharded import (
        VertexShardedForce2Vec,
        make_vp_mesh,
    )
    from force2vec_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256)
    cph = args.chips_per_host

    if args.big_mtx:
        from force2vec_tpu.graphs.io import load_graph

        graph = load_graph(args.big_mtx)
        sec_iter = args.big_sec_iter
        section = "ici_projection_big"
    else:
        graph = synth_powerlaw_graph()
        section = "ici_projection"

    rows = []
    for p in (2, 4, 8):
        if p > len(jax.devices()):
            break
        fv = VertexShardedForce2Vec(
            graph, cfg, mesh=make_vp_mesh(jax.devices()[:p]),
            min_width=8, hub_width=128,
        )
        cs = fv.comm_stats()
        bytes_iter = float(cs["bytes_per_iter_per_shard"])
        t_comp = sec_iter / p
        # single-host: all traffic on ICI
        t_ici = bytes_iter / ICI_BYTES_PER_S
        eff_pess = t_comp / (t_comp + t_ici)
        eff_opt = t_comp / max(t_comp, t_ici)
        row = {
            "P": p,
            "bytes_per_iter_per_shard": int(bytes_iter),
            "t_comp_ms": round(t_comp * 1e3, 4),
            "t_ici_ms": round(t_ici * 1e3, 4),
            "efficiency_no_overlap": round(eff_pess, 4),
            "efficiency_full_overlap": round(eff_opt, 4),
        }
        if p > cph:
            # two-host row: peers on the other host = p - cph of the p-1
            # a2a destinations; that byte fraction rides DCN (per-host NIC
            # shared by this host's cph shards)
            remote_frac = (p - cph) / (p - 1)
            dcn_bytes_host = bytes_iter * remote_frac * cph
            t_dcn = dcn_bytes_host / DCN_BYTES_PER_S
            t_comm = max(t_ici, t_dcn)
            row["hosts"] = p // cph
            row["t_dcn_ms"] = round(t_dcn * 1e3, 4)
            row["efficiency_2host_no_overlap"] = round(
                t_comp / (t_comp + t_comm), 4)
            row["efficiency_2host_full_overlap"] = round(
                t_comp / max(t_comp, t_comm), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    proj = {
        "model": "t_comp = sec_iter_1chip/P; t_comm = bytes/iter/shard ÷ BW;"
                 " efficiency bounds: comp/(comp+comm) .. comp/max(comp,comm)",
        "inputs": {
            "sec_iter_1chip": sec_iter,
            "ici_bytes_per_s": ICI_BYTES_PER_S,
            "dcn_bytes_per_s": DCN_BYTES_PER_S,
            "chips_per_host": cph,
            "graph": {"n": graph.n, "nnz": graph.nnz},
            "comm_source": "VertexShardedForce2Vec.comm_stats() on the real"
                           " partition layout (exact byte accounting)",
        },
        "projection": rows,
    }
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data[section] = proj
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(f"wrote ici_projection into {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
