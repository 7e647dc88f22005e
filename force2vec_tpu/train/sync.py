"""Epoch-synchronous trainer — the TPU throughput schedule.

Semantically this is the reference's own training loop at ``batch_size =
n`` (one batch per iteration: every read sees iteration-start X, one apply
at the end — sample/algorithms.cpp:569-639 with NUMSIZE = n).  What the
batch-sequential schedule buys the reference on a CPU (cache locality) it
costs a TPU dearly: hundreds of serial small dispatches per iteration.
The sync schedule turns one iteration into ONE fused device computation
over the degree-sorted ELL layout (graphs/csr.py::SyncLayout):

* per degree bucket: gather ``[count, K, D]`` neighbor rows, evaluate the
  force elementwise on the VPU, mask the padding, reduce over K — a pure
  bandwidth-bound sweep with no MXU detour and no scatter;
* hub rows (deg > hub_width) arrive pre-split into virtual rows; their
  partials reduce into owner rows with one small segment-sum;
* per-vertex negative sampling (``[n, ns]`` — the ``-bs 1`` flavor of the
  reference, sample/algorithms.cpp:686-733) for repulsion, batched over
  the whole table;
* one apply: ``X += upd`` (or the energy-normalized update for the
  FR/LinLog/ForceAtlas family).

Everything runs in relabeled (degree-sorted) vertex order; the public API
permutes in and out.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from force2vec_tpu.dist.spmd import SpmdAxes
from force2vec_tpu.graphs.csr import Graph, SyncLayout
from force2vec_tpu.models.forces import get_model
from force2vec_tpu.train.trainer import TrainConfig


class SyncForce2Vec:
    """Train with the epoch-synchronous schedule (one fused step/iter).

    Supports every sampled-repulsion model (tdist, sigmoid, rwalk, fr,
    linlog, forceatlas).  ``tdist_exact`` keeps the batch trainer (its
    O(n²) repulsion already runs as large fused chunks).
    """

    def __init__(
        self,
        graph: Graph,
        config: TrainConfig = TrainConfig(),
        min_width: int = 8,
        hub_width: int = 256,
        row_align: int = 8,
        use_pallas: Optional[bool] = None,
        tile_budget_bytes: int = 1024 * 1024 * 1024,
        width_scheme: str = "mult8",
        take_group_bytes: Optional[int] = None,
        hot_rows: Optional[int] = None,
        span_align: int = 8,
    ):
        self.graph = graph
        self.config = config
        self.model = get_model(config.model, sm_table=config.sm_table)
        if self.model.repulsion == "all":
            raise ValueError("tdist_exact uses the batch trainer, not sync mode")
        # Default ON for TPU backends (None = auto).  Measured on v5e with
        # a clean loop-in-jit harness: XLA fuses the neighbor gather into
        # the force chain and the fused loop runs at ~188 M rows/s, while a
        # STANDALONE bulk take (fast gather path) followed by the Pallas
        # force kernel (ops/pallas_force.py, opaque to fusion) runs at
        # ~227 M rows/s — the kernel wins by ~1.2-1.3x.  Off on CPU, where
        # Mosaic isn't available (tests exercise the kernel in interpret
        # mode separately).
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"
        if config.sm_table:
            use_pallas = False  # 1-D table gather has no Mosaic lowering
        self.use_pallas = bool(use_pallas)
        self.tile_budget_bytes = int(tile_budget_bytes)
        # Hot/cold gather split (PERF.md §7.6): the v5e gather engine
        # serves tables ≤ ~100 MB at ~586 M rows/s and larger tables at
        # only ~165 M rows/s; when the gather table exceeds the fast tier,
        # the high-degree suffix (40%+ of power-law slots) is fetched from
        # a compact ≤~tier-sized copy instead.  Auto (None): on exactly
        # when the table outgrows the tier; walk models keep the plain
        # layout (their attraction doesn't use bucket gathers, and the
        # walk engine samples from the ELL tables directly).
        import os as _os

        gdt_bytes = jnp.dtype(
            config.gather_dtype or config.dtype).itemsize
        tier_bytes = int(_os.environ.get("F2V_HOT_TIER_MB", "96")) * 2**20
        if hot_rows is None:
            table_bytes = graph.n * config.dim * gdt_bytes
            hot_rows = (
                0 if (self.model.attraction == "walk"
                      or table_bytes <= tier_bytes)
                else tier_bytes // (config.dim * gdt_bytes)
            )
        self.hot_rows = int(hot_rows)
        # mult8 width ladder: widths stay multiples of the 8-row sublane
        # tile, so the [C, K, D] force sweep wastes zero sublane compute
        # (Mosaic pads K up to 8); measured on v5e this beats mult4's
        # smaller gather volume (1.11x vs 1.24x nnz) now that the take
        # groups pipeline the gather — 333 vs 320 M updates/s
        # (benchmarks/profile_r3b.py, PERF.md).
        self.layout = SyncLayout.build(
            graph, min_width=min_width, hub_width=hub_width,
            row_align=row_align,
            widths=SyncLayout.widths_for(min_width, hub_width, width_scheme),
            hot_rows=self.hot_rows, span_align=span_align,
        )
        # Auto take-group size: throughput is flat for 8-32 MB groups at
        # the headline bench size (benchmarks/profile_takegroups.py,
        # re-confirmed by the r5 tile×group scan, PERF.md §8.2), and at
        # big-graph scale 32 MB measured FASTER end-to-end than 128 MB
        # (122.7 vs 115.6 M up/s, PERF.md §7.8) — so the auto cap stays
        # inside the measured-good band instead of growing with the graph
        # (the old total//40 heuristic picked 256 MB at com-Youtube scale).
        if take_group_bytes is None:
            gdt_sz = (
                jnp.dtype(config.gather_dtype).itemsize
                if config.gather_dtype else jnp.dtype(config.dtype).itemsize
            )
            total = self.layout.padded_edges * config.dim * gdt_sz
            take_group_bytes = max(
                8 * 1024 * 1024, min(32 * 1024 * 1024, total // 40)
            )
        self.take_group_bytes = int(take_group_bytes)
        self.lr = config.resolve_lr(self.model)
        self._dtype = jnp.dtype(config.dtype)

        lay = self.layout
        garr = {
            "inv_deg": jnp.asarray(
                1.0 / (lay.deg.astype(np.float64) + 1.0), dtype=self._dtype
            ),
        }
        for bi, b in enumerate(lay.buckets):
            garr[f"nbr{bi}"] = jnp.asarray(b.nbr)
            garr[f"deg{bi}"] = jnp.asarray(b.deg)
            if b.hot_spans is not None:
                garr[f"hotf{bi}"] = jnp.asarray(b.hot_flat)
                garr[f"hotdeg{bi}"] = jnp.asarray(b.hot_deg)
            if b.owners is not None:
                ol = b.owners - b.start
                garr[f"own{bi}"] = jnp.asarray(ol)
                # first virtual row per owner (owners' vrows are consecutive)
                first = np.zeros(max(lay.n_pad - b.start, 1), dtype=np.int32)
                u, idx = np.unique(ol, return_index=True)
                first[u] = idx.astype(np.int32)
                garr[f"first_vrow{bi}"] = jnp.asarray(first)
        if self.model.attraction == "walk":
            garr["deg_all"] = jnp.asarray(lay.deg)
            pool, base = _build_walk_tables(lay)
            garr["walk_pool"] = jnp.asarray(pool)
            # (deg, base) packed as one [n_pad, 2] table: the walk step
            # fetches both with ONE row-granularity take (row-rate-bound,
            # PERF.md §1) instead of two element gathers
            garr["walk_db"] = jnp.stack(
                [lay.deg.astype(np.int32), base], axis=1)
        self._garr = garr

        from force2vec_tpu.train.trainer import make_train_dispatcher

        self._iteration = self._build_iteration_fn()
        train = self._build_train_fn()
        # The jitted program CLOSES OVER the graph arrays instead of taking
        # them as parameters: measured on v5e this is worth ~2.9 ms/iter
        # (~25%) at the headline bench size — as captured constants XLA owns
        # their layout and hoists the index-table preprocessing out of the
        # loop, which it cannot do for caller-supplied parameters
        # (benchmarks/exp_r3.py trainwrap).  Big graphs cannot close over:
        # captured constants ride the (remote) compile request, and past
        # ~150 MB the compile service rejects it (HTTP 413) — there the
        # runner passes garr as real arguments (the closure's ~2.9 ms win
        # is noise at big-graph per-iteration times anyway).
        garr_bytes = sum(int(v.size) * v.dtype.itemsize for v in garr.values())
        if garr_bytes <= 128 * 2**20:
            self._train_jit = make_train_dispatcher(
                lambda k: (
                    lambda jf: (lambda g, x, key, off: jf(x, key, off))
                )(jax.jit(lambda x, key, off: train(self._garr, x, key, k, off)))
            )
        else:
            self._train_jit = make_train_dispatcher(
                lambda k: jax.jit(lambda g, x, key, off: train(g, x, key, k, off))
            )

    def split_stats(self) -> dict:
        """Hot/cold gather-split accounting (PERF.md §7.6): how many padded
        slots each gather stream serves per iteration, so artifacts can
        show the split ACTIVE rather than assert it (VERDICT r4 #4)."""
        lay = self.layout
        hot = cold = rect = 0
        for b in lay.buckets:
            if b.hot_spans is None:
                rect += b.count * b.width
                continue
            for sp in b.hot_spans:
                hot += sp.rows_pad * sp.width
                cold += sp.rows_pad * sp.cold_width
        total = hot + cold + rect
        return {
            "hot_rows": self.hot_rows,
            "hot_start": lay.hot_start,
            "hot_slots_per_iter": hot,
            "cold_slots_per_iter": cold + rect,
            "hot_fraction": round(hot / total, 4) if total else 0.0,
            "spans": sum(len(b.hot_spans) for b in lay.buckets
                         if b.hot_spans),
        }

    # -- embedding layout ---------------------------------------------------

    def init_embedding(self, seed: int = 1) -> jnp.ndarray:
        key = jax.random.PRNGKey(seed)
        shape = (self.layout.n_pad, self.config.dim)
        if self.model.init == "uniform01":
            return jax.random.uniform(key, shape, dtype=self._dtype)
        return jax.random.uniform(key, shape, dtype=self._dtype, minval=-1.0, maxval=1.0)

    def pad_embedding(self, x: np.ndarray) -> jnp.ndarray:
        """Host [n, D] (original id order) → device [n_pad, D] relabeled."""
        x = np.asarray(x, dtype=self._dtype)
        out = np.zeros((self.layout.n_pad, self.config.dim), dtype=self._dtype)
        out[: self.graph.n] = x[self.layout.perm]
        return jnp.asarray(out)

    def unpad_embedding(self, x) -> np.ndarray:
        """Device [n_pad, D] relabeled → host [n, D] original order."""
        x = np.asarray(x)[: self.graph.n]
        return x[self.layout.inv_perm]

    # -- the fused iteration -------------------------------------------------

    def _build_iteration_fn(self, spmd: SpmdAxes = SpmdAxes()):
        lay, model, cfg = self.layout, self.model, self.config
        n_pad = lay.n_pad
        ns = cfg.ns
        assert cfg.dim % spmd.n_tp == 0
        dim = cfg.dim // spmd.n_tp
        rsum = spmd.make_rsum()

        # Buckets tile [0, n) contiguously in the degree-sorted order (the
        # hub bucket owns the tail range), so the attraction update is a
        # CONCATENATION of per-bucket results — no read-modify-write of the
        # full table.  Real (unpadded) extents are static.
        n = lay.n
        bucket_meta = []
        for bi, b in enumerate(lay.buckets):
            is_hub = b.owners is not None
            end = n if is_hub or bi == len(lay.buckets) - 1 else lay.buckets[bi + 1].start
            bucket_meta.append((bi, b.width, b.start, b.count, end - b.start, is_hub))
        hub_start = lay.buckets[-1].start if lay.buckets else 0
        wl = cfg.walk_length

        # dp sharding: each rank computes a contiguous 1/n_dp slice of every
        # bucket's rows (and of the repulsion rows); one tiled all_gather
        # per piece reassembles the full update on every rank.  X stays
        # dp-replicated, so the schedule's semantics are unchanged.
        n_dp, dp_axis = spmd.n_dp, spmd.dp

        # Fused Pallas force sweep (ops/pallas_force.py): only on the real
        # TPU path and only when the lane dim is whole (tp=1) — the kernel
        # reduces over the full embedding dim locally.
        use_pallas = self.use_pallas and spmd.n_tp == 1

        gdt = None if cfg.gather_dtype is None else jnp.dtype(cfg.gather_dtype)

        # The bulk neighbor gather materializes a [rows, K, dim] tile in HBM
        # before the force sweep streams it.  On big graphs one bucket's tile
        # can exceed the whole HBM (n=1.5M, K=64 → ~8 GB), so every sweep is
        # chunked: no single materialized tile may exceed this budget.  The
        # chunks are independent slices of the same bucket; their results
        # concatenate in row order, so semantics are unchanged.
        tile_budget_bytes = self.tile_budget_bytes
        gsize = (gdt or self._dtype).itemsize

        def chunk_spans(local: int, width: int, cap_bytes: Optional[int] = None,
                        quant: int = 8):
            """Static [(row_offset, row_count)] covering [0, local)."""
            cap = (cap_bytes or tile_budget_bytes) // max(width * dim * gsize, 1)
            cap = max(quant, (cap // quant) * quant)
            if local <= cap:
                return [(0, local)]
            return [(o, min(cap, local - o)) for o in range(0, local, cap)]

        def force_sum(kind, xi, xj, dg, invd, step, pallas_ok=True):
            """Masked force sum over the K axis: Pallas kernel or jnp.

            ``pallas_ok=False`` keeps jnp for inputs that are themselves
            cheap broadcasts/expands (e.g. group-shared negatives): the
            fusion-opaque kernel would force them to materialize in HBM,
            while the jnp chain fuses the expand away.
            """
            if use_pallas and pallas_ok:
                import os as _os

                from force2vec_tpu.ops.pallas_force import (
                    ell_force,
                    ell_force_mxu,
                )

                if (
                    kind == "edge"
                    and model.edge_coeff is not None
                    and _os.environ.get("F2V_MXU_EDGE", "1") != "0"
                ):
                    # separable-form MXU sweep: dots/norms/aggregation ride
                    # the MXU, killing the per-slot lane reduction that
                    # bounds the elementwise kernel (PERF.md §7).  With a
                    # hot/cold split layout the 2 MB tile faulted the TPU
                    # worker at com-Orkut scale (kernel fault on the flat
                    # split pieces; big graphs are cold-gather-bound so the
                    # tile is throughput-neutral there — both sizes measure
                    # 114.5 M up/s) — keep the proven 512 KB tile when
                    # split pieces exist (PERF.md §8.2).
                    mxu_tb = 512 * 1024 if hot_start is not None else None
                    return ell_force_mxu(model, xi, xj, dg, invd, step,
                                         tile_bytes=mxu_tb)
                return ell_force(model, kind, xi, xj, dg, invd, step)
            if xj.dtype != xi.dtype:  # low-precision gather replica
                xj = xj.astype(xi.dtype)
            k = xj.shape[1]
            mask = (
                jnp.arange(k, dtype=jnp.int32)[None, :] < dg[:, None]
            )[:, :, None]
            if kind == "edge":
                f = model.edge_force(
                    xi[:, None, :], xj, invd[:, None, None], step, rsum=rsum,
                    mask=mask,
                )
            else:
                f = model.sample_force(
                    xi[:, None, :], xj, step, rsum=rsum, mask=mask
                )
            return jnp.sum(f, axis=1)

        def shard_rows(total: int):
            """(local_count, offset_fn) for splitting `total` rows over dp."""
            assert total % n_dp == 0, (
                f"row count {total} not divisible by dp={n_dp}"
            )
            local = total // n_dp
            return local, lambda: spmd.dp_rank() * local

        def gathered(part_local):
            if dp_axis is None:
                return part_local
            return jax.lax.all_gather(part_local, dp_axis, axis=0, tiled=True)

        # Static piece list for the attraction sweep: every (bucket, chunk
        # span) pair, packed greedily into TAKE GROUPS of at most
        # ``take_group_bytes`` of materialized tile.  One bulk ``take``
        # serves a whole group: measured on v5e, 15 per-bucket takes of the
        # same rows cost 6.8 ms where one flat take costs 3.9 ms — per-take
        # scheduling overhead (PERF.md §3).  A handful of groups (instead
        # of one giant take) keeps the gather engine pipelined against the
        # VPU force sweep of the previous group.
        group_cap = min(self.take_group_bytes, tile_budget_bytes)

        # Piece list for the attraction sweep, packed greedily into TAKE
        # GROUPS of at most ``take_group_bytes`` of materialized tile per
        # source table.  One bulk ``take`` serves a whole group: measured
        # on v5e, 15 per-bucket takes of the same rows cost 6.8 ms where
        # one flat take costs 3.9 ms — per-take scheduling overhead
        # (PERF.md §3).  With a hot/cold split layout (PERF.md §7.6) the
        # pieces come in two streams: cold/rect pieces gather from the full
        # table, hot pieces from the compact hot-suffix copy that the
        # gather engine serves ~3.6x faster at big-graph scale.
        hot_start = lay.hot_start
        # dp + split: every span chunk must divide evenly across ranks.
        # Each chunk's rows are quantized to lcm(8, n_dp); the layout's
        # span_align (ShardedSyncForce2Vec passes its dp-divisible row
        # align) guarantees the stored rects round to that quantum too.
        import math as _math

        row_quant = (8 * n_dp) // _math.gcd(8, n_dp)
        if hot_start is not None and n_dp > 1:
            bad = [sp.rows_pad for b in lay.buckets if b.hot_spans
                   for sp in b.hot_spans if sp.rows_pad % row_quant]
            if bad:
                raise ValueError(
                    f"hot/cold split under dp={n_dp} needs span rects "
                    f"aligned to {row_quant} rows — rebuild the layout "
                    f"with span_align={row_quant} (got rect rows {bad[:3]}…)"
                )

        def build_pieces():
            cold, hot = [], []
            for bi, width, start, count, real, is_hub in bucket_meta:
                b = lay.buckets[bi]
                if b.hot_spans is None:
                    local = count // n_dp
                    for c_off, c_rows in chunk_spans(local, width, group_cap):
                        cold.append(("rect", bi, width, start, count, real,
                                     is_hub, c_off, c_rows))
                    continue
                for si, sp in enumerate(b.hot_spans):
                    if sp.cold_width > 0:
                        for c_off, c_rows in chunk_spans(
                                sp.rows_pad, sp.cold_width, group_cap,
                                quant=row_quant):
                            real = min(sp.count - c_off, c_rows)
                            if real <= 0:
                                continue  # chunk holds only pad rows
                            cold.append((
                                "flat", bi, sp.cold_width, start,
                                sp.row_off + c_off, c_rows,
                                sp.cold_off + c_off * sp.cold_width,
                                sp.deg_off + c_off, real, "cold"))
                    if sp.width > 0:
                        for c_off, c_rows in chunk_spans(
                                sp.rows_pad, sp.width, group_cap,
                                quant=row_quant):
                            real = min(sp.count - c_off, c_rows)
                            if real <= 0:
                                continue
                            hot.append((
                                "flat", bi, sp.width, start,
                                sp.row_off + c_off, c_rows,
                                sp.flat_off + c_off * sp.width,
                                sp.deg_off + c_off, real, "hot"))
            return cold, hot

        def pack(pieces):
            groups, cur, cur_bytes = [], [], 0
            for pc in pieces:
                width, c_rows = pc[2], (pc[8] if pc[0] == "rect" else pc[5])
                piece_bytes = c_rows * width * dim * gsize
                if cur and cur_bytes + piece_bytes > group_cap:
                    groups.append(cur)
                    cur, cur_bytes = [], 0
                cur.append(pc)
                cur_bytes += piece_bytes
            if cur:
                groups.append(cur)
            return groups

        cold_pieces, hot_pieces = build_pieces()
        take_groups = pack(cold_pieces)
        hot_take_groups = pack(hot_pieces)
        # debug/profiling hook (benchmarks/exp_r4.py bigparts)
        self._take_groups_dbg = (take_groups, hot_take_groups)

        def run_group(g, x, src_tbl, grp, by_bucket, hot_adds, step):
            """One flat bulk take for a whole group + per-piece force sums."""
            idxs, metas = [], []
            for pc in grp:
                if pc[0] == "rect":
                    _, bi, width, start, count, real, is_hub, c_off, c_rows = pc
                    _, off = shard_rows(count)
                    r0 = off() + jnp.int32(c_off)
                    nbr = jax.lax.dynamic_slice(
                        g[f"nbr{bi}"], (r0, 0), (c_rows, width)
                    )
                    idxs.append(nbr.reshape(-1))
                    metas.append(("rect", bi, width, start, is_hub,
                                  c_off, c_rows, r0))
                else:
                    (_, bi, width, start, row_off, c_rows, f_off,
                     deg_pos, real, src) = pc
                    key = f"hotf{bi}" if src == "hot" else f"nbr{bi}"
                    # dp: each rank takes/sweeps a contiguous 1/n_dp row
                    # slice of the chunk; the all_gather in the consumer
                    # reassembles before the [:real] trim
                    loc = c_rows // n_dp
                    r0 = spmd.dp_rank() * jnp.int32(loc)
                    idxs.append(jax.lax.dynamic_slice(
                        g[key], (jnp.int32(f_off) + r0 * width,),
                        (loc * width,)))
                    metas.append(("flat", bi, width, start, row_off,
                                  loc, deg_pos, real, src, r0))
            flat_idx = idxs[0] if len(idxs) == 1 else jnp.concatenate(idxs)
            flat = jnp.take(src_tbl, flat_idx, axis=0)  # [Σ rows·width, dim]
            fo = 0
            for m in metas:
                if m[0] == "rect":
                    _, bi, width, start, is_hub, c_off, c_rows, r0 = m
                    xj = jax.lax.slice(
                        flat, (fo, 0), (fo + c_rows * width, dim)
                    ).reshape(c_rows, width, dim)
                    fo += c_rows * width
                    dg = jax.lax.dynamic_slice(g[f"deg{bi}"], (r0,), (c_rows,))
                    if is_hub:
                        owners = jax.lax.dynamic_slice(
                            g[f"own{bi}"], (r0,), (c_rows,)
                        )
                        xi = jnp.take(x, owners + jnp.int32(start), axis=0)
                        invd = jnp.take(g["inv_deg"], owners + jnp.int32(start))
                    else:
                        xi = jax.lax.dynamic_slice(
                            x, (start + r0, 0), (c_rows, dim)
                        )
                        invd = jax.lax.dynamic_slice(
                            g["inv_deg"], (start + r0,), (c_rows,)
                        )
                    by_bucket.setdefault(bi, []).append(
                        force_sum("edge", xi, xj, dg, invd, step)
                    )
                else:
                    (_, bi, width, start, row_off, loc, deg_pos,
                     real, src, r0) = m
                    xj = jax.lax.slice(
                        flat, (fo, 0), (fo + loc * width, dim)
                    ).reshape(loc, width, dim)
                    fo += loc * width
                    dkey = f"hotdeg{bi}" if src == "hot" else f"deg{bi}"
                    dg = jax.lax.dynamic_slice(
                        g[dkey], (jnp.int32(deg_pos) + r0,), (loc,))
                    xi = jax.lax.dynamic_slice(
                        x, (jnp.int32(start + row_off) + r0, 0), (loc, dim))
                    invd = jax.lax.dynamic_slice(
                        g["inv_deg"], (jnp.int32(start + row_off) + r0,),
                        (loc,))
                    res = gathered(
                        force_sum("edge", xi, xj, dg, invd, step))[:real]
                    if src == "hot":
                        hot_adds.setdefault(bi, []).append((row_off, res))
                    else:
                        by_bucket.setdefault(bi, []).append((row_off, res))

        def attraction(g, x, xg, step):
            """Σ_buckets masked ELL force — returns the [n_pad, dim] update."""
            by_bucket, hot_adds = {}, {}
            for grp in take_groups:
                run_group(g, x, xg, grp, by_bucket, hot_adds, step)
            if hot_take_groups:
                # optimization_barrier forces the suffix copy to MATERIALIZE
                # as its own compact buffer — without it XLA fuses the slice
                # into the takes (index offset into the big table), which
                # never engages the ≤~100 MB fast gather tier (measured:
                # 414 M rows/s materialized vs 165 M fused; exp_r4 hotloop)
                xg_hot = jax.lax.optimization_barrier(
                    jax.lax.slice(xg, (hot_start, 0), (n_pad, dim)))
                for grp in hot_take_groups:
                    run_group(g, x, xg_hot, grp, by_bucket, hot_adds, step)
            parts = []
            for bi, width, start, count, real, is_hub in bucket_meta:
                b = lay.buckets[bi]
                chunks = by_bucket.get(bi, [])
                if b.hot_spans is None:
                    part = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
                    part = gathered(part)  # [count, dim] on every rank
                else:
                    # cold chunks carry (row_off, res); spans with no cold
                    # slots contribute zeros
                    by_off = {ro: r for ro, r in chunks}
                    seq, cursor = [], 0
                    for ro in sorted(by_off):
                        if ro > cursor:
                            seq.append(jnp.zeros((ro - cursor, dim), x.dtype))
                        seq.append(by_off[ro])
                        cursor = ro + by_off[ro].shape[0]
                    if cursor < count:
                        seq.append(jnp.zeros((count - cursor, dim), x.dtype))
                    part = seq[0] if len(seq) == 1 else jnp.concatenate(seq)
                    for ro, res in hot_adds.get(bi, []):
                        part = part.at[ro:ro + res.shape[0]].add(res)
                if is_hub:
                    part = jax.ops.segment_sum(part, g[f"own{bi}"], num_segments=real)
                else:
                    part = part[:real]  # drop alignment-padding rows (static)
                parts.append(part)
            if n_pad > n:
                parts.append(jnp.zeros((n_pad - n, dim), dtype=x.dtype))
            return jnp.concatenate(parts, axis=0)

        def attraction_walk(g, x, xg, walks, step):
            local, off = shard_rows(n_pad)
            base = off()
            chunks = []
            for c_off, c_rows in chunk_spans(local, wl):
                r0 = base + jnp.int32(c_off)
                wb = jax.lax.dynamic_slice(walks, (r0, 0), (c_rows, wl))
                xi = jax.lax.dynamic_slice(x, (r0, 0), (c_rows, dim))
                invd = jax.lax.dynamic_slice(g["inv_deg"], (r0,), (c_rows,))
                xj = jnp.take(xg, wb.reshape(-1), axis=0).reshape(c_rows, wl, dim)
                full = jnp.full((c_rows,), wl, dtype=jnp.int32)
                chunks.append(force_sum("edge", xi, xj, full, invd, step))
            part = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
            return gathered(part)

        group = max(cfg.batch_size, 1)
        from force2vec_tpu.ops.pallas_force import rep_tile_rows

        # dp>1 qualifies too when every shard's row range starts on a group
        # boundary (then its local groups are a contiguous slice of sg) —
        # the r3 restriction to n_dp == 1 left the jnp chain re-
        # materializing ~2 ms/iter of expand temporaries on exactly the
        # multi-device path (VERDICT r3 weak #6)
        use_rep_pallas = (
            use_pallas
            and rep_tile_rows(group) > 0
            and (n_pad // n_dp) % group == 0
        )

        def repulsion(x, xg, negs, step):
            local, off = shard_rows(n_pad)
            r0 = off()
            if negs.shape[0] == n_pad:
                # per-row samples ([n_pad, ns]): bulk gathers, chunked
                base = r0
                chunks = []
                for c_off, c_rows in chunk_spans(local, ns):
                    r0c = base + jnp.int32(c_off)
                    xi = jax.lax.dynamic_slice(x, (r0c, 0), (c_rows, dim))
                    nb = jax.lax.dynamic_slice(negs, (r0c, 0), (c_rows, ns))
                    s = jnp.take(xg, nb.reshape(-1), axis=0).reshape(
                        c_rows, ns, dim
                    )
                    full = jnp.full((c_rows,), ns, dtype=jnp.int32)
                    invd0 = jnp.zeros((c_rows,), dtype=x.dtype)
                    chunks.append(
                        force_sum("sample", xi, s, full, invd0, step)
                    )
                part = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
                return gathered(part)
            # grouped samples ([ng, ns]): each batch_size-row group shares
            # one ns-sample set — the reference's own option-5 sampling
            # pattern (sample/algorithms.cpp:577-586), and the repulsion
            # gather collapses from n·ns rows to ng·ns rows.
            xi = jax.lax.dynamic_slice(x, (r0, 0), (local, dim))
            sg = jnp.take(xg, negs.reshape(-1), axis=0).reshape(
                negs.shape[0], ns, dim
            )
            if use_rep_pallas:
                # Pallas kernel: each tile reads its ONE [ns, D] group block
                # via the BlockSpec index map, so the [local, ns, D] group
                # expand never touches HBM (the jnp chain materializes ~3
                # tile-sized f32 temporaries — ~2 ms/iter at the headline
                # bench size).  Under dp, each shard slices its own
                # contiguous group range (local % group == 0 guarantees
                # alignment).
                from force2vec_tpu.ops.pallas_force import grouped_rep_force

                sg_loc = (
                    sg if n_dp == 1 else jax.lax.dynamic_slice(
                        sg,
                        (r0 // jnp.int32(group), 0, 0),
                        (local // group, ns, dim),
                    )
                )
                return gathered(
                    grouped_rep_force(model, group, xi, sg_loc, step)
                )
            # jnp fallback (CPU, dp>1, or no tile divides the group): the
            # fused chain absorbs the group expand, which the fusion-opaque
            # ell_force kernel would force to materialize.
            gid = (r0 + jnp.arange(local, dtype=jnp.int32)) // jnp.int32(group)
            s = jnp.take(sg, gid, axis=0)
            full = jnp.full((local,), ns, dtype=jnp.int32)
            invd0 = jnp.zeros((local,), dtype=x.dtype)
            return gathered(
                force_sum("sample", xi, s, full, invd0, step, pallas_ok=False)
            )

        def iteration(garr, x, negs, walks, step):
            step = jnp.asarray(step, dtype=x.dtype)
            xg = x if gdt is None else x.astype(gdt)
            if model.attraction == "walk":
                upd = attraction_walk(garr, x, xg, walks, step)
            else:
                upd = attraction(garr, x, xg, step)
            upd = upd + repulsion(x, xg, negs, step)
            if model.update == "energy":
                fnorm = rsum(upd * upd)
                safe = jnp.where(fnorm > 0, fnorm, 1.0)
                factor = jnp.where(fnorm > 0, step / jnp.sqrt(safe), 0.0)
                return x + factor * upd
            return x + upd

        return iteration

    def _build_train_fn(self, iteration=None):
        lay, model, cfg = self.layout, self.model, self.config
        iteration = iteration or self._iteration
        lr = self.lr
        n_pad = lay.n_pad

        def draw(garr, key, it):
            kit = jax.random.fold_in(key, it)
            nkey = jax.random.fold_in(kit, 0)
            if cfg.per_vertex_samples:
                negs = jax.random.randint(
                    nkey, (n_pad, cfg.ns), 0, max(lay.n - 1, 1), dtype=jnp.int32
                )
            else:
                # batch-shared samples — the reference's default flavor
                # (one ns-sample set per batch of batch_size vertices,
                # sample/algorithms.cpp:577-586); grouped over the
                # relabeled row order here
                ng = -(-n_pad // max(cfg.batch_size, 1))
                negs = jax.random.randint(
                    nkey, (ng, cfg.ns), 0, max(lay.n - 1, 1), dtype=jnp.int32
                )
            walks = None
            if model.attraction == "walk":
                # walk over the relabeled ELL graph: L uniform-neighbor steps
                wkey = jax.random.fold_in(kit, 1)
                walks = _ell_walks(garr, lay, wkey, cfg.walk_length)
            return negs, walks

        def train(garr, x, key, num_iters, iter_offset):
            def body(t, xc):
                it = iter_offset + t
                negs, walks = draw(garr, key, it)
                if model.lr_schedule == "decay999":
                    step = lr * jnp.power(jnp.float32(0.999), it).astype(x.dtype)
                else:
                    step = jnp.asarray(lr, dtype=x.dtype)
                return iteration(garr, xc, negs, walks, step)

            return jax.lax.fori_loop(0, num_iters, body, x)

        return train

    # -- public API ----------------------------------------------------------

    def run_iteration(self, x, neg_ids, walks=None, step=None):
        """One iteration with injected [n_pad, ns] negatives (relabeled ids)
        and optional [n_pad, L] walks — the parity-test entry point."""
        if step is None:
            step = self.lr
        w = None if walks is None else jnp.asarray(walks, dtype=jnp.int32)
        return self._iteration(
            self._garr, jnp.asarray(x), jnp.asarray(neg_ids, dtype=jnp.int32), w, step
        )

    def train(
        self,
        iters: int = 1200,
        seed: int = 1,
        x0: Optional[np.ndarray] = None,
        verbose: bool = False,
    ) -> np.ndarray:
        x = self.pad_embedding(x0) if x0 is not None else self.init_embedding(seed)
        key = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        x = self._train_jit(self._garr, x, key, iters, 0)
        out = self.unpad_embedding(x)  # forces completion
        self.last_train_seconds = time.perf_counter() - t0
        if verbose:
            ups = (self.graph.nnz + self.graph.n * self.config.ns) * iters
            print(
                f"sync {iters} iters in {self.last_train_seconds:.2f}s  "
                f"{ups / self.last_train_seconds / 1e6:.1f}M updates/s"
            )
        return out


def _build_walk_tables(lay: SyncLayout):
    """(pool, base): flat neighbor pool (every bucket's ELL rectangle,
    concatenated) + per-relabeled-row base offset so that the walk step's
    (vertex, slot) -> neighbor lookup is ``pool[base[v] + slot]``.

    Exact for hubs too: an owner's virtual rows are CONSECUTIVE and each
    holds ``width`` slots, so ``vrow*width + col == first_vrow*width +
    slot`` — the flat pool linearizes the whole CSR row.  Requires the
    plain (unsplit) layout; walk models build with hot_rows=0.

    Why: the previous per-step lookup where-chained a gather over every
    bucket table (~15 two-index gathers per step); measured on-chip it
    made the walk engine 90 ms of the 95 ms rwalk iteration (PERF.md
    §8.3).  One 1-D gather per step replaces all of it.
    """
    assert lay.hot_start is None, "walk tables need the unsplit layout"
    base = np.zeros(lay.n_pad, dtype=np.int64)
    pools = []
    off = 0
    for b in lay.buckets:
        pools.append(b.nbr.reshape(-1))
        if b.owners is None:
            rows = np.arange(b.count, dtype=np.int64)
            base[b.start + rows] = off + rows * b.width
        else:
            # first virtual row per owner (owners' vrows are consecutive)
            u, idx = np.unique(b.owners, return_index=True)
            base[u] = off + idx.astype(np.int64) * b.width
        off += b.nbr.size
    pool = (np.concatenate(pools) if pools
            else np.zeros(1, dtype=np.int32)).astype(np.int32)
    return pool, base.astype(np.int32)


def _ell_walks(garr, lay: SyncLayout, key, walk_length: int):
    """Vectorized L-step uniform walks over the bucketed ELL adjacency
    (relabeled space).  Each step: draw a slot in [0, deg), then ONE flat
    gather ``pool[base[v] + slot]`` (see :func:`_build_walk_tables`);
    stay-in-place for degree-0 rows (divergence from the reference's
    quirky deg<2 path documented in sampling/walks.py)."""
    n_pad = lay.n_pad
    start = jnp.arange(n_pad, dtype=jnp.int32)
    pool = garr["walk_pool"]
    db = garr["walk_db"]  # [n_pad, 2] = (deg, base)
    # (an 8-lane pool view with a row take + take_along_axis lane select
    # was chip-tested and is 1.5x SLOWER than the flat element gather —
    # the lane select lowers to another gather; 20.3 vs 13.4 ms/iter)

    def step_fn(carry, step_key):
        w = carry
        r = jax.random.randint(
            step_key, (n_pad,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        row = jnp.take(db, w, axis=0)  # one row take for (deg, base)
        d, base_w = row[:, 0], row[:, 1]
        slot = r % jnp.maximum(d, 1)
        nxt = jnp.take(pool, base_w + slot)
        nxt = jnp.where(d > 0, nxt, w)
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, targets = jax.lax.scan(step_fn, start, keys)
    return jnp.transpose(targets)
