"""Offline data tooling: edgelist→mtx converter + degree stats
(reference: datasets/edgelist2mtx.py, datasets/input/averagedeg.py)."""

import numpy as np

from force2vec_tpu.graphs.csr import Graph
from force2vec_tpu.graphs.io import load_graph
from force2vec_tpu.graphs.tools import (
    average_degree,
    edgelist_to_mtx,
    main,
    write_mtx,
)


def _graph(n=30, extra=21):
    rng = np.random.default_rng(9)
    src = np.arange(n)
    dst = (src + 1) % n
    es = rng.integers(0, n, size=extra)
    ed = rng.integers(0, n, size=extra)
    keep = es != ed
    rows = np.concatenate([src, dst, es[keep], ed[keep]])
    cols = np.concatenate([dst, src, ed[keep], es[keep]])
    # duplicate-free (read_edgelist dedupes; from_coo keeps duplicates)
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    return Graph.from_coo(rows[idx], cols[idx], None, n=n)


def test_write_mtx_roundtrip(tmp_path):
    g = _graph()
    p = str(tmp_path / "g.mtx")
    write_mtx(g, p)
    head = open(p).readline()
    assert "pattern symmetric" in head
    g2 = load_graph(p)
    assert g2.n == g.n and g2.nnz == g.nnz
    np.testing.assert_array_equal(g2.rowptr, g.rowptr)
    np.testing.assert_array_equal(np.sort(g2.colids), np.sort(g.colids))


def test_edgelist_to_mtx(tmp_path):
    g = _graph()
    edges = str(tmp_path / "g.edges")
    deg = g.degrees
    src = np.repeat(np.arange(g.n), deg)
    with open(edges, "w") as f:
        for u, v in zip(src, g.colids):
            if u < v:
                f.write(f"{u} {v}\n")
    out = edgelist_to_mtx(edges)
    assert out.endswith(".mtx")
    g2 = load_graph(out)
    assert g2.n == g.n and g2.nnz == g.nnz


def test_average_degree(tmp_path):
    g = _graph()
    # reference semantics: sum of networkx degrees / n == 2|E|/n == nnz/n
    assert abs(average_degree(g) - g.nnz / g.n) < 1e-12
    p = str(tmp_path / "g.mtx")
    write_mtx(g, p)
    assert abs(average_degree(p) - g.nnz / g.n) < 1e-12


def test_cli(tmp_path, capsys):
    g = _graph()
    p = str(tmp_path / "g.mtx")
    write_mtx(g, p)
    assert main(["avgdeg", p]) == 0
    assert "Average Degree:" in capsys.readouterr().out
    assert main([]) == 2
