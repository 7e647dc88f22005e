"""Graph IO tests: reference-semantics mtx reading vs scipy, embd round-trip."""

import os

import numpy as np
import pytest
import scipy.io
import scipy.sparse

from force2vec_tpu.graphs import (
    Graph,
    load_graph,
    read_embeddings,
    read_mtx,
    write_embeddings,
)
from force2vec_tpu.graphs.csr import DeviceGraph

REF_INPUT = "/root/reference/datasets/input"


def _scipy_coo(path):
    """scipy ground truth with reference semantics: symmetric expand is done
    by mmread; drop self-loops like sample/IO.h:130-134.  Kept in COO form so
    duplicate entries stay distinct — the reference's CSC constructor does
    not merge duplicates (sample/CSC.h:147-190), and e.g. cora.mtx lists 151
    edge pairs in both orientations."""
    m = scipy.sparse.coo_matrix(scipy.io.mmread(path))
    keep = m.row != m.col
    rows, cols = m.row[keep], m.col[keep]
    order = np.lexsort((cols, rows))
    return m.shape[0], rows[order], cols[order]


@pytest.mark.parametrize("name", ["karate.mtx", "cora.mtx", "citeseer.mtx"])
def test_read_mtx_matches_scipy(name):
    path = os.path.join(REF_INPUT, name)
    g = read_mtx(path)
    n_ref, ref_rows, ref_cols = _scipy_coo(path)
    assert g.n == n_ref
    assert g.nnz == len(ref_rows)
    g_rows = np.repeat(np.arange(g.n), g.degrees)
    np.testing.assert_array_equal(g_rows, ref_rows)
    np.testing.assert_array_equal(g.colids, ref_cols)
    assert g.is_sorted()


def test_load_graph_dispatch():
    g = load_graph(os.path.join(REF_INPUT, "karate.mtx"))
    assert g.n == 34
    # karate degrees: vertex 33 (0-based) has degree 17
    assert g.degrees.max() == 17


def test_edgelist_reader(tmp_path):
    p = tmp_path / "g.edgelist"
    p.write_text("0 1\n1 2\n2 0\n")
    g = load_graph(str(p))
    assert g.n == 3 and g.nnz == 6  # symmetrized


def test_embd_roundtrip(tmp_path):
    emb = np.random.default_rng(0).normal(size=(17, 8)).astype(np.float32)
    path = str(tmp_path / "x.embd")
    write_embeddings(path, emb)
    back = read_embeddings(path)
    np.testing.assert_allclose(back, emb, rtol=1e-4, atol=1e-5)
    # header format parity with algorithms::writeToFile
    first = open(path).readline().split()
    assert first == ["17", "8"]


def test_golden_embd_readable():
    emb = read_embeddings(
        "/root/reference/datasets/output/cora.mtxF2VNS384D128IT1200NS5.embd"
    )
    assert emb.shape == (2708, 128)
    assert np.isfinite(emb).all()


def test_device_graph_layout():
    g = read_mtx(os.path.join(REF_INPUT, "karate.mtx"))
    dg = DeviceGraph.build(g, batch_size=10, edge_chunk=16)
    assert dg.batch_size == 10
    assert dg.num_batches == 4
    assert dg.n_pad == 40
    # padded rowptr rows beyond n all point at nnz
    assert (dg.rowptr[g.n :] == g.nnz).all()
    # edge_src expands rowptr
    assert dg.edge_src[: g.nnz][dg.rowptr[5]] == 5
    # per-batch edge spans cover all edges exactly once
    spans = [
        (dg.rowptr[b * 10], dg.rowptr[(b + 1) * 10]) for b in range(dg.num_batches)
    ]
    assert spans[0][0] == 0 and spans[-1][1] == g.nnz
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c


def test_native_loader_matches_numpy_mtx():
    """The C++ parser and the numpy reference path must agree exactly."""
    import importlib

    from force2vec_tpu.graphs import io as gio
    from force2vec_tpu.graphs.native import load_mtx_native

    for name in ["karate.mtx", "cora.mtx", "citeseer.mtx", "pubmed.mtx"]:
        path = os.path.join(REF_INPUT, name)
        out = load_mtx_native(path)
        if out is None:
            pytest.skip("native loader unavailable (no g++)")
        n, rowptr, colids, values = out
        os.environ["F2V_NO_NATIVE"] = "1"
        try:
            ref = gio.read_mtx(path)
        finally:
            del os.environ["F2V_NO_NATIVE"]
        assert n == ref.n and len(colids) == ref.nnz
        np.testing.assert_array_equal(rowptr, ref.rowptr)
        np.testing.assert_array_equal(colids, ref.colids)


def test_native_loader_matches_numpy_edgelist(tmp_path):
    from force2vec_tpu.graphs.native import load_edgelist_native
    from force2vec_tpu.graphs import io as gio

    p = tmp_path / "g.edgelist"
    p.write_text("0 1\n1 2\n2 0\n1 0\n3 3\n")  # duplicate + self-loop
    out = load_edgelist_native(str(p))
    if out is None:
        pytest.skip("native loader unavailable (no g++)")
    os.environ["F2V_NO_NATIVE"] = "1"
    try:
        ref = gio.read_edgelist(str(p))
    finally:
        del os.environ["F2V_NO_NATIVE"]
    g = gio.read_edgelist(str(p))  # native path (default)
    assert g.n == ref.n and g.nnz == ref.nnz
    np.testing.assert_array_equal(g.rowptr, ref.rowptr)
    np.testing.assert_array_equal(g.colids, ref.colids)


def test_third_party_embedding_readers(tmp_path):
    """Format option codes of the reference eval scripts
    (runnodeclassclust.py:233-245): 3=HOPE, 4=ROLX, 5=HARP, else binary."""
    from force2vec_tpu.graphs.io import read_embeddings_any

    x = np.arange(15, dtype=np.float32).reshape(5, 3) / 7.0
    p = tmp_path / "h.txt"
    p.write_text("5 3\n" + "\n".join(" ".join(map(str, r)) for r in x))
    np.testing.assert_allclose(read_embeddings_any(str(p), 3), x, rtol=1e-6)
    p = tmp_path / "r.csv"
    p.write_text("a,b,c\n" + "\n".join(",".join(map(str, r)) for r in x))
    np.testing.assert_allclose(read_embeddings_any(str(p), 4), x, rtol=1e-6)
    p = tmp_path / "x.npy"
    np.save(p, x)
    np.testing.assert_allclose(read_embeddings_any(str(p), 5), x)
    p = tmp_path / "x.bin"
    x.tofile(p)
    np.testing.assert_allclose(read_embeddings_any(str(p), 2, dim=3), x)
