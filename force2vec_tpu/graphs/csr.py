"""CSR graph container and TPU device layout.

Host side we keep a plain CSR (numpy int32 rowptr/colids), the same
training-time format as the reference's ``CSR<IT,NT>`` container
(reference: sample/CSR.h:89-96).  For the device we re-lay the graph out for
XLA's static-shape world:

* vertices are padded to a whole number of batches so every minibatch has
  identical shape (the reference instead guards every loop with
  ``if (i >= graph.rows) continue`` — sample/algorithms.cpp:590);
* edges stay in CSR order, which means each batch's edges form one
  *contiguous* slice of ``colids`` — the device step walks that slice in
  fixed-size chunks, which is the TPU-native replacement for the reference's
  per-thread nnz load balancing (sample/algorithms.cpp:2483-2511): an
  edge-centric schedule is balanced by construction;
* an explicit ``edge_src`` array (the expanded rowptr) gives every edge its
  source vertex so a chunk of edges can be segment-reduced into batch rows.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Graph:
    """Host-side CSR adjacency.

    Mirrors the capability of the reference CSR container
    (sample/CSR.h:89-96): ``rowptr``/``colids``/optional ``values`` over
    ``n`` vertices.  Column ids within a row are sorted ascending, matching
    the reference's counting-sort construction (sample/CSC.h:147-190 →
    sample/CSR.h:155-186).
    """

    n: int
    rowptr: np.ndarray  # [n+1] int64-safe int32
    colids: np.ndarray  # [nnz] int32
    values: Optional[np.ndarray] = None  # [nnz] float32 (unused by training)

    @property
    def nnz(self) -> int:
        return int(self.colids.shape[0])

    @property
    def degrees(self) -> np.ndarray:
        return np.diff(self.rowptr)

    @staticmethod
    def from_coo(
        rows: np.ndarray,
        cols: np.ndarray,
        vals: Optional[np.ndarray],
        n: int,
        sum_duplicates: bool = False,
    ) -> "Graph":
        """Build CSR from COO by counting sort (rows then cols ascending).

        The reference keeps duplicate entries as distinct nonzeros (its CSC
        constructor does not merge unless asked, sample/CSC.h:147-190), so we
        default to keeping duplicates too.
        """
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        if vals is not None:
            vals = np.asarray(vals, dtype=np.float32)[order]
        if sum_duplicates and rows.size:
            keep = np.ones(rows.size, dtype=bool)
            keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            if vals is not None:
                group = np.cumsum(keep) - 1
                vals = np.bincount(group, weights=vals).astype(np.float32)
            rows, cols = rows[keep], cols[keep]
        rowptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(rowptr, rows + 1, 1)
        np.cumsum(rowptr, out=rowptr)
        return Graph(
            n=n,
            rowptr=rowptr.astype(np.int64),
            colids=cols.astype(np.int32),
            values=vals,
        )

    def shuffled_ids(self, seed: int = 0) -> "Graph":
        """Per-row shuffle of colids (parity with CSR::shuffleIds,
        sample/CSR.h:430-447). Training never needs it; provided for
        completeness."""
        rng = np.random.default_rng(seed)
        colids = self.colids.copy()
        for i in range(self.n):
            s, e = self.rowptr[i], self.rowptr[i + 1]
            rng.shuffle(colids[s:e])
        return Graph(self.n, self.rowptr.copy(), colids, self.values)

    def is_sorted(self) -> bool:
        """Row-wise sortedness check (parity with CSR::Sorted,
        used by the driver at Test/Force2Vec.cpp:123)."""
        for i in range(self.n):
            s, e = self.rowptr[i], self.rowptr[i + 1]
            if e - s > 1 and np.any(np.diff(self.colids[s:e]) < 0):
                return False
        return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class DeviceGraph:
    """Static-shape device layout of a :class:`Graph` for one batch size.

    ``n_pad = num_batches * batch_size`` so each minibatch is a fixed
    ``[B, D]`` slice of the (padded) embedding table.  ``colids``/``edge_src``
    are padded by at least one chunk with sentinel edges (dst=0, src=0) that
    every kernel masks out via the per-batch edge extent ``rowptr[b1]``.
    """

    n: int
    n_pad: int
    nnz: int
    batch_size: int
    num_batches: int
    edge_chunk: int
    rowptr: np.ndarray  # [n_pad+1] int32, rowptr[i]=nnz for i>=n
    colids: np.ndarray  # [nnz_pad] int32
    edge_src: np.ndarray  # [nnz_pad] int32
    deg: np.ndarray  # [n_pad] int32 (0 for padded rows)
    max_batch_edges: int

    @staticmethod
    def build(graph: Graph, batch_size: int, edge_chunk: int = 2048) -> "DeviceGraph":
        n = graph.n
        b = min(batch_size, n)
        num_batches = -(-n // b)
        n_pad = num_batches * b
        nnz = graph.nnz
        nnz_pad = _round_up(nnz, edge_chunk) + edge_chunk

        rowptr = np.full(n_pad + 1, nnz, dtype=np.int32)
        rowptr[: n + 1] = graph.rowptr.astype(np.int32)

        colids = np.zeros(nnz_pad, dtype=np.int32)
        colids[:nnz] = graph.colids

        edge_src = np.zeros(nnz_pad, dtype=np.int32)
        edge_src[:nnz] = np.repeat(
            np.arange(n, dtype=np.int32), graph.degrees.astype(np.int64)
        )

        deg = np.zeros(n_pad, dtype=np.int32)
        deg[:n] = graph.degrees.astype(np.int32)

        starts = rowptr[0 : n_pad : b].astype(np.int64)
        ends = rowptr[b : n_pad + 1 : b].astype(np.int64)
        max_batch_edges = int((ends - starts).max()) if num_batches else 0

        return DeviceGraph(
            n=n,
            n_pad=n_pad,
            nnz=nnz,
            batch_size=b,
            num_batches=num_batches,
            edge_chunk=edge_chunk,
            rowptr=rowptr,
            colids=colids,
            edge_src=edge_src,
            deg=deg,
            max_batch_edges=max_batch_edges,
        )
