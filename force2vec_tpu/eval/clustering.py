"""Clustering quality: KMeans sweep scored by graph modularity, plus the
silhouette / Davies-Bouldin indices.

Parity with ``performancescores/runnodeclassclust.py:311-331`` (KMeans
k ∈ [2, 50), partition scored by modularity of the graph under the cluster
assignment — the reference calls python-louvain's ``modularity``; here
Newman modularity is computed directly and vectorized) and with
``runvisualization.py:185-188`` (silhouette, Davies-Bouldin against
ground-truth communities).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from force2vec_tpu.graphs.csr import Graph


def modularity(graph: Graph, assignment: np.ndarray) -> float:
    """Newman modularity Q = Σ_c (e_c/m − (d_c/2m)²) of a partition.

    ``e_c`` counts intra-community edge endpoints over 2m (directed-pair
    count of the symmetric CSR), ``d_c`` sums community degrees — the same
    quantity python-louvain computes for the reference.
    """
    src = np.repeat(np.arange(graph.n), graph.degrees)
    dst = graph.colids
    m2 = graph.nnz  # = 2m for symmetric CSR
    if m2 == 0:
        return 0.0
    same = assignment[src] == assignment[dst]
    e_in = np.bincount(assignment[src][same], minlength=assignment.max() + 1) / m2
    d_c = np.bincount(assignment, weights=graph.degrees.astype(np.float64))
    return float(np.sum(e_in) - np.sum((d_c / m2) ** 2))


def clustering_scores(
    graph: Graph,
    emb: np.ndarray,
    k_range=range(2, 50),
    labels: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """KMeans sweep → best modularity (runnodeclassclust.py:311-331); if
    ground-truth ``labels`` given, also silhouette/DB of the embedding
    under them (runvisualization.py:185-188)."""
    from sklearn.cluster import KMeans

    best_q, best_k = -1.0, 0
    for k in k_range:
        if k >= graph.n:
            break
        km = KMeans(n_clusters=k, random_state=seed, n_init=3).fit(emb)
        q = modularity(graph, km.labels_)
        if q > best_q:
            best_q, best_k = q, k
    out = {"best_modularity": best_q, "best_k": float(best_k)}

    if labels is not None:
        from sklearn.metrics import davies_bouldin_score, silhouette_score

        out["silhouette"] = float(silhouette_score(emb, labels))
        out["davies_bouldin"] = float(davies_bouldin_score(emb, labels))
    return out
