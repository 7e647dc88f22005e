"""Multilabel node classification, DeepWalk-style top-k protocol.

Parity with ``performancescores/runnodeclassclust.py``: labels file has
``node(1-based) label`` lines, possibly several per node
(makeNodeClassificationData, :173-190); training fractions
{5,10,15,20,25}% (:289); a OneVsRest LogisticRegression predicts, for each
test node with k true labels, its top-k classes by probability
(MyClass.prediction, :162-171); F1 is computed on the multilabel
binarization (:304-309).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def read_node_labels(path: str, n: int) -> List[List[int]]:
    """Per-node label lists from a ``node label`` text file (1-based)."""
    labels: List[List[int]] = [[] for _ in range(n)]
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 2:
                continue
            node = int(toks[0]) - 1
            if 0 <= node < n:
                labels[node].append(int(toks[1]))
    return labels


def _topk_predict(model, classes: np.ndarray, X: np.ndarray, ks: Sequence[int]):
    prob = model.predict_proba(X)
    out = []
    for i, k in enumerate(ks):
        idx = np.argsort(prob[i])[-max(k, 1):]
        out.append([int(classes[j]) for j in idx])
    return out


def node_classification_scores(
    emb: np.ndarray,
    labels: List[List[int]],
    train_fracs: Sequence[float] = (0.05, 0.10, 0.15, 0.20, 0.25),
    seed: int = 0,
) -> Dict[float, Dict[str, float]]:
    """F1 micro/macro per training fraction (runnodeclassclust.py:289-309)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score
    from sklearn.multiclass import OneVsRestClassifier
    from sklearn.preprocessing import MultiLabelBinarizer

    keep = [i for i, ls in enumerate(labels) if ls]
    X = emb[keep]
    Y = [labels[i] for i in keep]
    mlb = MultiLabelBinarizer()
    Yb = mlb.fit_transform(Y)
    rng = np.random.default_rng(seed)

    results: Dict[float, Dict[str, float]] = {}
    for tf in train_fracs:
        order = rng.permutation(len(keep))
        cv = max(int(len(keep) * tf), 1)
        tr, te = order[:cv], order[cv:]
        model = OneVsRestClassifier(LogisticRegression(max_iter=200, random_state=0))
        model.fit(X[tr], Yb[tr])
        ks = [len(Y[i]) for i in te]
        pred_lists = _topk_predict(model, mlb.classes_, X[te], ks)
        pred_b = mlb.transform(pred_lists)
        results[tf] = {
            "f1_macro": float(f1_score(Yb[te], pred_b, average="macro", zero_division=0)),
            "f1_micro": float(f1_score(Yb[te], pred_b, average="micro", zero_division=0)),
        }
    return results
