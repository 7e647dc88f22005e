"""Vertex partition + halo-exchange layout for the sharded embedding table.

The reference is single-address-space OpenMP: every thread reads any row of
``nCoordinates`` through the cache hierarchy (SURVEY.md §2.5 / §5 — there is
no distributed backend to translate).  This module is the from-scratch TPU
answer for graphs whose embedding table outgrows one chip's HBM: a 1-D
vertex partition of X over a ``vp`` mesh axis, with the remote neighbor rows
each shard needs ("the halo") exchanged once per iteration by a single
static-shape ``all_to_all``.

Layout construction (host side, all numpy):

* vertices are relabeled by ascending degree exactly like
  :class:`~force2vec_tpu.graphs.csr.SyncLayout` (same ``perm``), and grouped
  into the same power-of-two ELL degree buckets;
* each bucket's row count is padded to a multiple of ``P·row_align`` and its
  rows are dealt round-robin to the P shards — so every shard holds the SAME
  number of rows of every bucket, at the SAME local offsets: the per-shard
  tables stack into one ``[P, ...]`` array and the per-bucket force results
  concatenate into the local update with no scatter;
* rows with degree > ``hub_width`` split into virtual rows placed on the
  owner's shard (per-shard virtual counts padded to the max across shards);
  their partials segment-sum into the owner's local row;
* neighbor ids are pre-remapped into each shard's ``[local ∪ halo]`` index
  space: id < n_loc is a local row, id ≥ n_loc addresses the halo buffer
  slot ``n_loc + src_shard·H + t``;
* ``send_idx[q, p]`` lists the q-local rows shard p needs, padded to the
  uniform width H = max over (q, p) pairs — shard q builds its send buffer
  with one gather and one ``lax.all_to_all`` delivers every halo.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from force2vec_tpu.graphs.csr import Graph, _round_up


@dataclasses.dataclass
class ShardBucket:
    """One degree bucket of the vertex-sharded layout.  All arrays carry a
    leading shard axis P.  Non-hub buckets cover local rows
    ``[start_local, start_local + count)`` on every shard; the hub bucket's
    ``owners`` are local-row offsets *within* the hub range."""

    width: int
    start_local: int  # first local row of this bucket (same on all shards)
    count: int  # rows per shard (virtual rows for the hub bucket)
    real_count: int  # local rows this bucket COVERS in the update concat:
    # the padded per-shard row count (non-hub: == count; hub: the padded
    # count of real owner rows, which the hub segment-sum reduces into)
    nbr: np.ndarray  # [P, count, width] int32 indices into [local ∪ halo]
    deg: np.ndarray  # [P, count] int32 valid neighbors per row
    owners: np.ndarray | None = None  # [P, count] int32 offsets into hub range


@dataclasses.dataclass
class VertexShardLayout:
    """Static halo-exchange layout of a graph over P vertex shards."""

    n: int
    n_shards: int
    n_loc: int  # local embedding rows per shard (padding rows included)
    halo_width: int  # H — rows exchanged per (src, dst) shard pair
    perm: np.ndarray  # [n] original id of degree-sorted global row g
    inv_perm: np.ndarray  # [n] degree-sorted global row of original id
    shard_of: np.ndarray  # [n] owning shard of global row g
    lrow_of: np.ndarray  # [n] local row of global row g on its shard
    deg_loc: np.ndarray  # [P, n_loc] int32 degree per local row (0 = padding)
    buckets: list  # list[ShardBucket]
    send_idx: np.ndarray  # [P, P, H] int32 — send_idx[q, p] = q-local rows for p
    padded_edges: int  # Σ P·count·width — gather volume per iteration

    @staticmethod
    def build(
        graph: Graph,
        n_shards: int,
        min_width: int = 8,
        hub_width: int = 256,
        row_align: int = 8,
    ) -> "VertexShardLayout":
        P = int(n_shards)
        n = graph.n
        deg_orig = graph.degrees.astype(np.int64)
        perm = np.argsort(deg_orig, kind="stable").astype(np.int32)
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(n, dtype=np.int32)
        deg_sorted = deg_orig[perm]

        widths = []
        w = min_width
        while w < hub_width:
            widths.append(w)
            w *= 2
        widths.append(hub_width)

        # --- global bucket ranges and the round-robin deal ------------------
        # bucket b: global rows [i_b, j_b); the k-th row goes to shard k % P
        # at bucket-local slot k // P.
        align = P * row_align
        ranges = []  # (width, i, j, count_per_shard)
        i = 0
        for w in widths:
            j = int(np.searchsorted(deg_sorted, w, side="right"))
            if j > i:
                ranges.append((w, i, j, _round_up(j - i, align) // P))
                i = j
        hub_i = i  # rows [hub_i, n) have degree > hub_width

        shard_of = np.zeros(n, dtype=np.int32)
        lrow_of = np.zeros(n, dtype=np.int32)
        start_local = 0
        starts = []
        for w, i0, j0, cps in ranges:
            k = np.arange(j0 - i0)
            shard_of[i0:j0] = k % P
            lrow_of[i0:j0] = start_local + k // P
            starts.append(start_local)
            start_local += cps
        # hub rows: dealt round-robin over the tail range
        hub_cps = 0
        hub_start_local = start_local
        if hub_i < n:
            k = np.arange(n - hub_i)
            shard_of[hub_i:] = k % P
            hub_cps = _round_up(n - hub_i, align) // P
            lrow_of[hub_i:] = hub_start_local + k // P
            starts.append(hub_start_local)
            start_local += hub_cps
        n_loc = max(_round_up(start_local, row_align), row_align)

        deg_loc = np.zeros((P, n_loc), dtype=np.int32)
        deg_loc[shard_of, lrow_of] = deg_sorted.astype(np.int32)

        # --- per-shard halo: distinct remote neighbor ids ------------------
        # Collect each shard's remote neighbor set from the CSR directly.
        # Edges are grouped by home shard ONCE (argsort) instead of P
        # full-edge masks — O(nnz log nnz) total, not O(P·nnz).
        col_g = inv_perm[graph.colids]  # every edge's target, global row id
        src_g = inv_perm[
            np.repeat(np.arange(n, dtype=np.int64), graph.degrees.astype(np.int64))
        ]
        edge_home = shard_of[src_g]
        remote = shard_of[col_g] != edge_home
        rcol = col_g[remote]
        rhome = edge_home[remote]
        horder = np.argsort(rhome, kind="stable")
        rcol = rcol[horder]
        bounds = np.searchsorted(rhome[horder], np.arange(P + 1))
        need = {}  # p -> distinct remote global rows, ordered (q, lrow)
        for p in range(P):
            u = np.unique(rcol[bounds[p] : bounds[p + 1]])
            order = np.lexsort((lrow_of[u], shard_of[u]))
            need[p] = u[order]
        # per-(q, p) lists share one static width: H covers the worst pair
        pair_max = 1
        for p in range(P):
            q_of = shard_of[need[p]]
            if len(q_of):
                pair_max = max(pair_max, int(np.bincount(q_of, minlength=P).max()))
        H = _round_up(pair_max, 8)

        send_idx = np.zeros((P, P, H), dtype=np.int32)
        for p in range(P):
            u = need[p]
            qs = shard_of[u]
            # slot within the (q -> p) list
            t = np.arange(len(u)) - np.searchsorted(qs, qs, side="left")
            send_idx[qs, p, t] = lrow_of[u]

        # --- per-shard ELL buckets in the remapped index space -------------
        # One REUSABLE [n] remap buffer (global row -> index into
        # [x_loc ; halo] for the current shard) instead of a dense [P, n]
        # table: O(n) memory however many shards.  Rows a shard neither owns
        # nor needs keep the harmless default 0 (only ELL padding slots,
        # masked by deg, ever point at them).
        rowptr = graph.rowptr
        remap1 = np.zeros(n, dtype=np.int32)

        def fill(rows_g: np.ndarray, width: int, out_nbr, out_deg):
            """Fill ELL rows (already ≤ width) for global rows ``rows_g``."""
            lens = deg_sorted[rows_g].astype(np.int64)
            total = int(lens.sum())
            out_deg[: len(rows_g)] = lens.astype(np.int32)
            if total:
                row_of = np.repeat(np.arange(len(rows_g)), lens)
                within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
                flat = rowptr[perm[rows_g]][row_of] + within
                out_nbr[row_of, within] = remap1[inv_perm[graph.colids[flat]]]

        # allocate all bucket arrays, then fill shard-by-shard
        buckets = []
        padded_edges = 0
        for bi, (w, i0, j0, cps) in enumerate(ranges):
            buckets.append(
                ShardBucket(
                    width=w,
                    start_local=starts[bi],
                    count=cps,
                    real_count=cps,
                    nbr=np.zeros((P, cps, w), dtype=np.int32),
                    deg=np.zeros((P, cps), dtype=np.int32),
                )
            )
            padded_edges += P * cps * w
        hub = None
        if hub_i < n:
            w = hub_width
            # virtual rows per shard: owner g contributes ceil(deg/w) rows
            per_shard = []
            for p in range(P):
                rows_g = np.arange(hub_i + p, n, P)
                lens = deg_sorted[rows_g].astype(np.int64)
                per_shard.append((rows_g, lens, int((-(-lens // w)).sum())))
            vmax = _round_up(max(v for _, _, v in per_shard), row_align)
            hub = ShardBucket(
                width=w,
                start_local=hub_start_local,
                count=vmax,
                real_count=hub_cps,
                nbr=np.zeros((P, vmax, w), dtype=np.int32),
                deg=np.zeros((P, vmax), dtype=np.int32),
                owners=np.zeros((P, vmax), dtype=np.int32),
            )
            padded_edges += P * vmax * w

        for p in range(P):
            remap1[:] = 0
            own_g = np.flatnonzero(shard_of == p)
            remap1[own_g] = lrow_of[own_g]
            u = need[p]
            qs = shard_of[u]
            t = np.arange(len(u)) - np.searchsorted(qs, qs, side="left")
            remap1[u] = n_loc + qs * H + t

            for bi, (w, i0, j0, cps) in enumerate(ranges):
                rows_g = np.arange(i0 + p, j0, P)
                fill(rows_g, w, buckets[bi].nbr[p], buckets[bi].deg[p])
            if hub is not None:
                w = hub_width
                rows_g, lens, nv = per_shard[p]
                vcounts = -(-lens // w)
                owners_v = np.repeat(rows_g, vcounts)
                vidx = np.arange(nv) - np.repeat(np.cumsum(vcounts) - vcounts, vcounts)
                vdeg = np.minimum(lens[np.repeat(np.arange(len(rows_g)), vcounts)] - vidx * w, w)
                total = int(vdeg.sum())
                row_of = np.repeat(np.arange(nv), vdeg)
                within = np.arange(total) - np.repeat(np.cumsum(vdeg) - vdeg, vdeg)
                flat = rowptr[perm[owners_v]][row_of] + vidx[row_of] * w + within
                hub.nbr[p, row_of, within] = remap1[inv_perm[graph.colids[flat]]]
                hub.deg[p, :nv] = vdeg
                hub.owners[p, :nv] = lrow_of[owners_v] - hub_start_local
        if hub is not None:
            buckets.append(hub)

        return VertexShardLayout(
            n=n,
            n_shards=P,
            n_loc=n_loc,
            halo_width=H,
            perm=perm,
            inv_perm=inv_perm,
            shard_of=shard_of,
            lrow_of=lrow_of,
            deg_loc=deg_loc,
            buckets=buckets,
            send_idx=send_idx,
            padded_edges=padded_edges,
        )
