"""Plain-numpy oracle implementations of every Force2Vec variant.

These mirror the reference C++ training loops *loop for loop* (citations
inline) and exist only as test oracles: parity tests feed the same injected
negative samples / walks to this oracle and to the JAX training step and
assert allclose.  RNG parity with the C++ ``rand()`` stream is explicitly a
non-goal (SURVEY.md §4) — parity is defined at the level of injected samples.

All math is float32, like the reference (VALUETYPE, sample/algorithms.h:38).
"""

from __future__ import annotations

import numpy as np

from force2vec_tpu.graphs.csr import Graph

MAXBOUND = 5.0


def _clamp(x):
    return np.clip(x, -MAXBOUND, MAXBOUND)


def _sigmoid(v):
    return 1.0 / (1.0 + np.exp(-v.astype(np.float64))).astype(np.float32)


# fast_SM table mirror (init_SM_TABLE/fast_SM, sample/algorithms.cpp:755-776):
# 2048 entries over [-SM_BOUND, SM_BOUND); out-of-range clamps to 0/1.  The
# index is clipped to the last entry (the C++ reads past the table for
# v == SM_BOUND exactly — UB we do not reproduce).
_SM_TABLE_SIZE, _SM_BOUND = 2048, 6.0
_SM_RES = _SM_TABLE_SIZE / (2.0 * _SM_BOUND)
_SM_TABLE = 1.0 / (
    1.0 + np.exp(
        -(2.0 * _SM_BOUND * np.arange(_SM_TABLE_SIZE) / _SM_TABLE_SIZE
          - _SM_BOUND)
    )
).astype(np.float32)


def _fast_sm(v):
    if v > _SM_BOUND:
        return np.float32(1.0)
    if v < -_SM_BOUND:
        return np.float32(0.0)
    idx = min(int((v + _SM_BOUND) * _SM_RES), _SM_TABLE_SIZE - 1)
    return np.float32(_SM_TABLE[idx])


def run_reference(
    graph: Graph,
    x0: np.ndarray,
    model: str,
    iters: int,
    batch_size: int,
    lr: float,
    neg_ids: np.ndarray,  # [iters, NB, M] int; M = ns (shared) or ns*B (per-vertex)
    per_vertex: bool = False,
    walks: np.ndarray = None,  # [iters, n, L] int (rwalk only)
    sm_table: bool = False,  # fast_SM table mode (sigmoid family)
) -> np.ndarray:
    """Run `iters` iterations of the chosen variant, returning the final
    embedding.  Batch-sequential, exactly like the reference: batch b reads
    the updates batch b-1 already applied (sample/algorithms.cpp:569-639)."""
    n = graph.n
    x = np.array(x0, dtype=np.float32, copy=True)
    b_size = min(batch_size, n)
    nb = -(-n // b_size)
    rowptr, colids = graph.rowptr, graph.colids
    deg = graph.degrees

    sig = _fast_sm if sm_table else _sigmoid
    step = np.float32(lr)
    for it in range(iters):
        for b in range(nb):
            lo, hi = b * b_size, min((b + 1) * b_size, n)
            s_rows = x[neg_ids[it, b]]  # copy of sample rows BEFORE the batch
            ns = s_rows.shape[0] if not per_vertex else s_rows.shape[0] // b_size
            acc = np.zeros((hi - lo, x.shape[1]), dtype=np.float32)

            for i in range(lo, hi):
                xi = x[i]
                li = i - lo
                if model in ("tdist", "tdist_exact"):
                    # attraction (algorithms.cpp:598-612 / :378-395)
                    for j in colids[rowptr[i] : rowptr[i + 1]]:
                        diff = xi - x[j]
                        a = np.float32(np.dot(diff, diff))
                        d1 = np.float32(-2.0 / (1.0 + a))
                        if model == "tdist_exact":
                            d2 = np.float32(2.0 / (a * (1.0 + a)))
                            acc[li] += step * (_clamp(d1 * diff) - _clamp(d2 * diff))
                        else:
                            acc[li] += step * _clamp(d1 * diff)
                    # repulsion
                    if model == "tdist_exact":
                        # vs all j != i (algorithms.cpp:399-422)
                        for j in range(n):
                            if j == i:
                                continue
                            diff = xi - x[j]
                            r = np.float32(np.dot(diff, diff))
                            d1 = np.float32(2.0 / (r * (1.0 + r)))
                            acc[li] += step * _clamp(d1 * diff)
                    else:
                        base = li if per_vertex else 0
                        count = ns if per_vertex else s_rows.shape[0]
                        for j in range(base, base + count):
                            diff = xi - s_rows[j]
                            r = np.float32(np.dot(diff, diff))
                            if r == 0:  # coincident → zero force (see forces.py)
                                continue
                            d1 = np.float32(2.0 / (r * (1.0 + r)))
                            acc[li] += step * _clamp(d1 * diff)

                elif model in ("sigmoid", "rwalk"):
                    # sigmoid attraction (algorithms.cpp:854-868) over CSR
                    # neighbors or walk targets (algorithms.cpp:1154-1171)
                    degi = np.float32(1.0 / (deg[i] + 1.0))
                    targets = (
                        walks[it, i]
                        if model == "rwalk"
                        else colids[rowptr[i] : rowptr[i + 1]]
                    )
                    for j in targets:
                        xj = x[j]
                        a = np.float32(np.dot(xi, xj))
                        acc[li] += step * degi * (1.0 - sig(a)) * xj
                    base = li if per_vertex else 0
                    count = ns if per_vertex else s_rows.shape[0]
                    for j in range(base, base + count):
                        r = np.float32(np.dot(xi, s_rows[j]))
                        acc[li] -= step * sig(r) * s_rows[j]

                elif model in ("fr", "linlog", "forceatlas"):
                    # layout-family attraction (algorithms.cpp:196-222 /
                    # :290-316 / :101-128): diff = xj - xi, weight w(a)
                    for j in colids[rowptr[i] : rowptr[i + 1]]:
                        diff = x[j] - xi
                        a = np.float32(np.dot(diff, diff))
                        if model == "fr":
                            w = np.float32(a + 1.0 / a) if a > 0 else np.float32(0)
                        elif model == "linlog":
                            w = np.float32(np.log2(1.0 + np.sqrt(a)))
                        else:
                            w = (
                                np.float32(np.sqrt(a) + 1.0 / a)
                                if a > 0
                                else np.float32(0)
                            )
                        acc[li] += w * diff
                    for j in range(s_rows.shape[0]):
                        diff = s_rows[j] - xi
                        r = np.float32(np.dot(diff, diff))
                        if r > 0:
                            acc[li] -= (1.0 / r) * diff
                else:
                    raise ValueError(model)

            # apply (serial in the reference: algorithms.cpp:629-639 /
            # :224-239; energy normalization for the layout family)
            if model in ("fr", "linlog", "forceatlas"):
                for li in range(hi - lo):
                    f = np.float32(np.dot(acc[li], acc[li]))
                    factor = np.float32(step / np.sqrt(f)) if f > 0 else np.float32(0)
                    x[lo + li] += factor * acc[li]
            else:
                x[lo:hi] += acc

        if model in ("fr", "linlog", "forceatlas", "tdist_exact"):
            step = np.float32(step * 0.999)  # algorithms.cpp:436 etc.
    return x
