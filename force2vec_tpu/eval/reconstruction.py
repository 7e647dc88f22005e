"""Graph reconstruction accuracy.

Parity with ``performancescores/runnodeclassclust.py::graphReconstruction``
(:194-219, shipped disabled): sample V vertices; for each, rank all other
vertices by cosine similarity of embeddings and count how many of the top
``deg(i)`` ranks are true neighbors.  Vectorized (the reference's loop is
O(V·n) python); ties broken identically by argsort order.
"""

from __future__ import annotations

import numpy as np

from force2vec_tpu.graphs.csr import Graph


def graph_reconstruction_accuracy(
    graph: Graph,
    emb: np.ndarray,
    num_vertices: int = 1000,
    seed: int = 0,
) -> float:
    rng = np.random.default_rng(seed)
    v = min(num_vertices, graph.n)
    picks = rng.choice(graph.n, size=v, replace=False)
    x = np.asarray(emb, dtype=np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.maximum(norms, 1e-12)

    correct = 0
    total = 0
    for i in picks:
        deg = int(graph.rowptr[i + 1] - graph.rowptr[i])
        if deg == 0:
            continue
        sims = xn @ xn[i]
        sims[i] = -np.inf  # exclude self
        top = np.argpartition(-sims, deg)[:deg]
        nbrs = set(graph.colids[graph.rowptr[i] : graph.rowptr[i + 1]].tolist())
        correct += sum(1 for j in top if int(j) in nbrs)
        total += deg
    return correct / total if total else 0.0
