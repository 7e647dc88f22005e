"""Embedding visualization: 2-D scatter colored by community.

Parity with ``performancescores/runvisualization.py`` (drawGraphc,
:101-125): project the embedding to 2-D (PCA by default; the reference's
t-SNE path, :177-182, is available via ``method="tsne"``), scatter one
color per ground-truth community, save as PDF.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def project_2d(emb: np.ndarray, method: str = "pca", seed: int = 0) -> np.ndarray:
    if emb.shape[1] == 2:
        return emb
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2, random_state=seed).fit_transform(emb)
    if method == "tsne":
        from sklearn.manifold import TSNE

        return TSNE(n_components=2, random_state=seed).fit_transform(emb)
    raise ValueError(f"unknown projection {method!r}")


def draw_communities(
    emb: np.ndarray,
    labels: Optional[np.ndarray],
    out_path: str,
    method: str = "pca",
    seed: int = 0,
) -> None:
    """Scatter the (projected) embedding, one color per community, → PDF/PNG
    (drawGraphc, runvisualization.py:101-125)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xy = project_2d(np.asarray(emb), method=method, seed=seed)
    fig, ax = plt.subplots(figsize=(6, 6))
    if labels is None:
        ax.scatter(xy[:, 0], xy[:, 1], s=3, alpha=0.6)
    else:
        labels = np.asarray(labels)
        for c in np.unique(labels):
            sel = labels == c
            ax.scatter(xy[sel, 0], xy[sel, 1], s=3, alpha=0.7, label=str(c))
        if len(np.unique(labels)) <= 12:
            ax.legend(markerscale=3, fontsize=7)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
