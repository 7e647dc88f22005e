"""Evaluate a needed-rows-only exchange for the vertex-sharded rwalk ring
(VERDICT r2, next-round item 6).

Today ``VertexShardedForce2Vec.attraction_walk`` rotates the FULL local
embedding table around the vp ring: (P-1)·n_loc rows sent per shard per
iteration, regardless of how many remote rows the walks actually touch
(dist/vertex_sharded.py).  The alternative is a request/response
all_to_all fetching only the needed rows — but under XLA's static shapes
it must be provisioned for the WORST per-(shard, peer) needed count over
the run, not the mean.  This script measures that distribution with real
walk semantics (uniform neighbor steps over the degree-sorted layout) on
the headline bench graph and prints the break-even.

Host-side numpy only (no device) — run anywhere:
    python benchmarks/rwalk_ring_eval.py
Writes benchmarks/out/rwalk_ring_eval.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import synth_powerlaw_graph  # noqa: E402
from force2vec_tpu.graphs.partition import VertexShardLayout  # noqa: E402

WL = 5  # reference WALKLENGTH (sample/algorithms.cpp:1073)


def walk_targets(graph, rng, wl=WL):
    """[n, wl] uniform-neighbor walk targets (original ids), stay-in-place
    for degree-0 rows — the walk engine's semantics."""
    n = graph.n
    rowptr, colids = graph.rowptr, graph.colids
    deg = (rowptr[1:] - rowptr[:-1]).astype(np.int64)
    cur = np.arange(n, dtype=np.int64)
    out = np.empty((n, wl), dtype=np.int64)
    for s in range(wl):
        d = deg[cur]
        slot = (rng.integers(0, 1 << 31, size=n) % np.maximum(d, 1)).astype(
            np.int64
        )
        nxt = colids[rowptr[cur] + np.minimum(slot, np.maximum(d - 1, 0))]
        cur = np.where(d > 0, nxt, cur)
        out[:, s] = cur
    return out


def main():
    graph = synth_powerlaw_graph()
    rng = np.random.default_rng(11)
    iters = int(os.environ.get("RWALK_EVAL_ITERS", 8))
    results = []
    for P in (4, 8, 16, 32):
        lay = VertexShardLayout.build(graph, P, min_width=8, hub_width=128)
        shard_of, n_loc = lay.shard_of, lay.n_loc
        # walker i lives on shard_of[inv_perm? — walks are per local row of
        # each shard; walker set == all vertices, so per-iteration each
        # shard q needs, from peer p, the rows p owns among q's walkers'
        # targets (deduplicated: one fetch serves all local walkers).
        owner_v = shard_of[lay.inv_perm]  # owner of original id v
        max_need = np.zeros((P, P), dtype=np.int64)  # worst over iters
        sum_need = np.zeros((P, P), dtype=np.float64)
        for _ in range(iters):
            tgt = walk_targets(graph, rng)  # original ids [n, wl]
            t_owner = owner_v[tgt]  # [n, wl]
            w_owner = owner_v[:, None].repeat(WL, axis=1)
            for q in range(P):
                mask_q = w_owner == q
                tq, oq = tgt[mask_q], t_owner[mask_q]
                for p in range(P):
                    if p == q:
                        continue
                    need = np.unique(tq[oq == p]).size
                    max_need[q, p] = max(max_need[q, p], need)
                    sum_need[q, p] += need
        off = ~np.eye(P, dtype=bool)
        mean_need = float(sum_need[off].mean() / iters)
        worst_need = int(max_need[off].max())
        ring_rows = (P - 1) * n_loc  # rows sent per shard per iteration
        # a2a provisioned at the observed worst per-pair count (plus the
        # id-request volume at 4 B/row vs 512 B rows: negligible, counted)
        a2a_rows = (P - 1) * worst_need
        results.append(
            {
                "P": P,
                "n_loc": int(n_loc),
                "ring_rows_sent_per_shard": int(ring_rows),
                "needed_rows_mean_per_pair": round(mean_need, 1),
                "needed_rows_worst_per_pair": worst_need,
                "a2a_rows_at_worst_cap": int(a2a_rows),
                "a2a_over_ring": round(a2a_rows / ring_rows, 3),
            }
        )
        print(results[-1], flush=True)
    os.makedirs("benchmarks/out", exist_ok=True)
    with open("benchmarks/out/rwalk_ring_eval.json", "w") as f:
        json.dump(
            {
                "graph": {"n": graph.n, "nnz": graph.nnz},
                "wl": WL,
                "iters_sampled": iters,
                "note": "rows are deduplicated fetches; a2a cap = observed "
                "worst per-pair need (a real impl must cap statically and "
                "the cap must hold for EVERY iteration, so worst is the "
                "operative number)",
                "results": results,
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
