"""Round-4 design experiments: breaking the gather wall.

PERF.md §1 pinned the schedule's roofline at XLA's gather engine
(~595 M rows/s materialize-only) — the one lever left is gathering FEWER
rows (VERDICT r3 next-round #1).  Two facts make a hot-table schedule
plausible now:

  * the degree-sorted relabeling already concentrates the power-law mass:
    hot rows are the contiguous id suffix [n-H, n);
  * this jax (0.9) lowers ``lax.gather`` inside Pallas to Mosaic's
    ``tpu.dynamic_gather`` when in.shape == idx.shape[:-1] == out.shape
    (jax/_src/pallas/mosaic/lowering.py:2464-2525) — i.e. an H-row VMEM
    table can be row-gathered *vectorized*, H rows per op, something the
    round-2/3 probes (per-row fori_loop, one-hot MXU) could not do.

Experiments (one JSON line each; failures print and continue):

  uniq     host-side: what fraction of the bench layout's padded gather
           slots hit the hot suffix [n-H, n), for a ladder of H; plus
           per-take-group unique-row fractions (the dedup headroom).
  dg       chip: tpu.dynamic_gather rows/s from a VMEM-resident [H, D]
           table, H ∈ {2K, 8K, 32K}, bf16/f32.
  vmemcap  chip: largest H whose table+result tile still compiles — the
           practical VMEM budget for the hot table.
  hotcold  chip: end-to-end hot/cold attraction prototype vs the pure
           bulk-take schedule at the bench shape.

Run: python benchmarks/exp_r4.py <exp> [exp...]
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


# -- uniq: host-side hot coverage / dedup stats ------------------------------


def exp_uniq():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.graphs.csr import SyncLayout

    g = synth_powerlaw_graph()
    lay = SyncLayout.build(
        g, min_width=8, hub_width=128, row_align=8,
        widths=SyncLayout.widths_for(8, 128, "mult8"),
    )
    n = lay.n
    # all padded gather targets, in slot order
    slots = np.concatenate([b.nbr.reshape(-1) for b in lay.buckets])
    pad_mask = np.concatenate(
        [(np.arange(b.width)[None, :] >= b.deg[:, None]).reshape(-1)
         for b in lay.buckets]
    )
    real = slots[~pad_mask]
    report(
        "uniq_total",
        n=n, padded_slots=int(slots.size), real_slots=int(real.size),
        unique_targets=int(np.unique(real).size),
        mean_refetch=round(real.size / max(np.unique(real).size, 1), 2),
    )
    # hot suffix coverage (degree-sorted ascending → hubs at the top)
    for h in (2048, 8192, 16384, 32768, 65536):
        hot = real >= (n - h)
        report(
            "uniq_hot", H=h,
            hot_frac_real=round(float(hot.mean()), 4),
            hot_frac_padded=round(
                float(((slots >= (n - h)) | pad_mask).mean()), 4),
        )
    # per-take-group unique fraction at the shipping group size (~16-64 MB)
    for group_rows in (65536, 131072, 262144):
        fracs = []
        for o in range(0, slots.size - group_rows + 1, group_rows):
            grp = slots[o:o + group_rows]
            fracs.append(np.unique(grp).size / group_rows)
        if fracs:
            report(
                "uniq_group", group_rows=group_rows,
                mean_unique_frac=round(float(np.mean(fracs)), 4),
                min_unique_frac=round(float(np.min(fracs)), 4),
            )


# -- chip probes -------------------------------------------------------------


def _chip_setup():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


def _fence_fn(jax, jnp):
    f = jax.jit(lambda a: a.reshape(-1)[:1].astype(jnp.float32))
    return lambda x: np.asarray(f(x))


def slope_time(fence, make_loop, spans=(4, 20), reps=2):
    times = {}
    for s in spans:
        f = make_loop(s)
        fence(f())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(f())
            best = min(best, time.perf_counter() - t0)
        times[s] = best
    return (times[spans[1]] - times[spans[0]]) / (spans[1] - spans[0])


def _dg_call(jnp, pl, pltpu, h, d, n_chunks, dtype):
    """pallas_call: grid over chunks; each chunk dynamic-gathers H rows
    from the resident [H, D] table."""

    def kernel(idx_ref, tbl_ref, out_ref):
        tbl = tbl_ref[:]
        bidx = jnp.broadcast_to(idx_ref[:], tbl.shape)
        # default mode (FILL_OR_DROP) is the one Mosaic's dynamic_gather
        # rule accepts; mode="clip" fails to lower
        out_ref[:] = jnp.take_along_axis(tbl, bidx, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((h, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=__import__("jax").ShapeDtypeStruct((h, d), dtype),
    )


def exp_dg():
    jax, jnp, pl, pltpu = _chip_setup()
    fence = _fence_fn(jax, jnp)
    d = 128
    for dtype in (jnp.bfloat16, jnp.float32):
        for h in (2048, 8192, 32768):
            n_chunks = max(1, 4_000_000 // h)
            total = n_chunks * h
            try:
                key = jax.random.PRNGKey(0)
                idx = jax.random.randint(
                    key, (n_chunks * h, 1), 0, h, jnp.int32)
                tbl = jax.random.normal(key, (h, d)).astype(dtype)
                call = _dg_call(jnp, pl, pltpu, h, d, n_chunks, dtype)

                def make(loops, idx=idx, tbl=tbl, call=call):
                    @jax.jit
                    def run():
                        def body(i, c):
                            o = call((idx + i) % h, tbl)
                            return c + o[0, 0].astype(jnp.float32)
                        return jax.lax.fori_loop(0, loops, body,
                                                 jnp.float32(0))
                    return run

                sec = slope_time(fence, make, spans=(3, 13), reps=2)
                report("dg", H=h, dtype=str(jnp.dtype(dtype).name),
                       m_rows_per_s=round(total / sec / 1e6, 1))
            except Exception as e:
                report("dg", H=h, dtype=str(jnp.dtype(dtype).name),
                       error=f"{type(e).__name__}: {str(e)[:200]}")


def exp_vmemcap():
    jax, jnp, pl, pltpu = _chip_setup()
    fence = _fence_fn(jax, jnp)
    d = 128
    for h in (32768, 49152, 65536, 98304, 131072):
        try:
            key = jax.random.PRNGKey(0)
            idx = jax.random.randint(key, (h, 1), 0, h, jnp.int32)
            tbl = jax.random.normal(key, (h, d)).astype(jnp.bfloat16)
            call = _dg_call(jnp, pl, pltpu, h, d, 1, jnp.bfloat16)
            out = call(idx, tbl)
            fence(out)
            report("vmemcap", H=h, bytes=h * d * 2, ok=True)
        except Exception as e:
            report("vmemcap", H=h, bytes=h * d * 2, ok=False,
                   error=f"{type(e).__name__}: {str(e)[:160]}")


def exp_iterv():
    """Full sync-iteration sec/iter on the bench config across Pallas tile
    sizes (the r3-shipping head had 512 KB → T=64-row tiles at K=16;
    per-tile overhead may be a real cost at ~2500 tiles/iter)."""
    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig
    import force2vec_tpu.ops.pallas_force as pf

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    import itertools
    tile_list = [int(v) for v in os.environ.get(
        "ITERV_TILES", "524288,1048576,2097152,4194304").split(",")]
    group_list = [int(v) if v else None for v in os.environ.get(
        "ITERV_GROUPS", "").split(",")] or [None]
    scheme = os.environ.get("ITERV_SCHEME", "mult8")
    for tb, gb in itertools.product(tile_list, group_list):
        pf._TILE_BYTES = tb
        try:
            fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                               width_scheme=scheme, take_group_bytes=gb)
            x = fv.init_embedding(seed=1)
            key = jax.random.PRNGKey(1)

            def make(loops, fv=fv, x=x, key=key):
                def run():
                    return fv._train_jit(fv._garr, x, key, loops, 0)
                return run

            sec = slope_time(fence, make, spans=(10, 60), reps=2)
            ups = graph.nnz + graph.n * cfg.ns
            report("iterv", tile_bytes=tb, group_bytes=gb, scheme=scheme,
                   ms_per_iter=round(sec * 1e3, 3),
                   m_updates_per_s=round(ups / sec / 1e6, 1))
        except Exception as e:
            report("iterv", tile_bytes=tb, group_bytes=gb,
                   error=f"{type(e).__name__}: {str(e)[:200]}")
    pf._TILE_BYTES = 512 * 1024


def exp_parts4():
    """Overlap audit of the shipping schedule shape: gather floor (take
    groups, materialize only), sweep floor (pre-materialized tiles through
    the Pallas kernel), and both combined — how much of min(G,S) the
    combined loop actually hides."""
    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    n = graph.n
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    model = get_model("tdist")
    x = fv.init_embedding(seed=1)

    flat = np.concatenate(
        [b.nbr.reshape(-1) for b in lay.buckets]).astype(np.int32)
    k = 16
    rows_per_group = (fv.take_group_bytes // (128 * 2) // k) * k
    m = (flat.size // (rows_per_group)) * rows_per_group
    flat = jnp.asarray(flat[:m])
    groups = m // rows_per_group
    t_rows = rows_per_group // k
    xi0 = x[:t_rows]
    dg_full = jnp.full((t_rows,), k, dtype=jnp.int32)
    invd0 = jnp.zeros((t_rows,), dtype=x.dtype)
    step = jnp.float32(0.02)

    def sweep(tile, i):
        return ell_force(model, "edge", xi0, tile, dg_full, invd0,
                         step + 1e-12 * i)[0, 0]

    def make_take(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    idx = jax.lax.dynamic_slice(
                        flat, (g * rows_per_group,), (rows_per_group,))
                    t = jnp.take(xg, (idx + i) % n, axis=0)
                    s = s + t[0, 0].astype(jnp.float32)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def make_both(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    idx = jax.lax.dynamic_slice(
                        flat, (g * rows_per_group,), (rows_per_group,))
                    t = jnp.take(xg, (idx + i) % n, axis=0).reshape(
                        t_rows, k, 128)
                    s = s + sweep(t, i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    g_t = slope_time(fence, make_take, spans=(5, 30), reps=2)
    b_t = slope_time(fence, make_both, spans=(5, 30), reps=2)
    report("parts4", groups=groups, rows=m,
           take_ms=round(g_t * 1e3, 3), both_ms=round(b_t * 1e3, 3))

    # sweep floor with real materialized tiles (tiles passed as an ARG —
    # a closure constant would upload 666 MB with the compile request)
    tiles_arg = jax.jit(
        lambda xg: jnp.take(xg, flat, axis=0).reshape(groups, t_rows, k, 128)
    )(x.astype(jnp.bfloat16))

    def make_sweep_real(loops):
        @jax.jit
        def run(tiles):
            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + sweep(tiles[g], i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return lambda: run(tiles_arg)

    s_t = slope_time(fence, make_sweep_real, spans=(5, 30), reps=2)
    hidden = g_t + s_t - b_t
    report("parts4", sweep_ms=round(s_t * 1e3, 3),
           hidden_ms=round(hidden * 1e3, 3),
           overlap_frac=round(hidden / min(g_t, s_t), 3))


def exp_mxusweep():
    """Sweep-only comparison over pre-materialized tiles: elementwise VPU
    kernel vs the separable MXU kernel at R ∈ {8, 16, 32, 64}."""
    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force, ell_force_mxu
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    model = get_model("tdist")
    x = fv.init_embedding(seed=1)
    flat = np.concatenate(
        [b.nbr.reshape(-1) for b in lay.buckets]).astype(np.int32)
    k = 16
    rows_per_group = (fv.take_group_bytes // (128 * 2) // k) * k
    m = (flat.size // rows_per_group) * rows_per_group
    flat = jnp.asarray(flat[:m])
    groups = m // rows_per_group
    t_rows = rows_per_group // k
    xi0 = x[:t_rows]
    dg_full = jnp.full((t_rows,), k, dtype=jnp.int32)
    invd0 = jnp.zeros((t_rows,), dtype=x.dtype)
    step = jnp.float32(0.02)
    tiles_arg = jax.jit(
        lambda xg: jnp.take(xg, flat, axis=0).reshape(groups, t_rows, k, 128)
    )(x.astype(jnp.bfloat16))

    def run_variant(name, sweep_fn):
        def make(loops):
            @jax.jit
            def run(tiles):
                def body(i, c):
                    s = jnp.float32(0)
                    for g in range(groups):
                        s = s + sweep_fn(tiles[g], i)[0, 0]
                    return c + s
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return lambda: run(tiles_arg)
        try:
            sec = slope_time(fence, make, spans=(5, 30), reps=2)
            report("mxusweep", variant=name, ms=round(sec * 1e3, 3),
                   m_rows_per_s=round(m / sec / 1e6, 1))
        except Exception as e:
            report("mxusweep", variant=name,
                   error=f"{type(e).__name__}: {str(e)[:160]}")

    run_variant("vpu", lambda t_, i: ell_force(
        model, "edge", xi0, t_, dg_full, invd0, step + 1e-12 * i))
    for r in (8, 16, 32, 64):
        run_variant(f"mxu_r{r}", lambda t_, i, r=r: ell_force_mxu(
            model, xi0, t_, dg_full, invd0, step + 1e-12 * i, group_rows=r))


def exp_sweepfloor():
    """What bounds the ~3.7 ms sweep floor: pure HBM copy of the tile
    volume, a read-only Pallas pass over the tiles, and a static-slice
    take loop (per-take overhead isolation)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    n = graph.n
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    x = fv.init_embedding(seed=1)
    flat = np.concatenate(
        [b.nbr.reshape(-1) for b in lay.buckets]).astype(np.int32)
    k = 16
    rows_per_group = (fv.take_group_bytes // (128 * 2) // k) * k
    m = (flat.size // rows_per_group) * rows_per_group
    flat_j = jnp.asarray(flat[:m])
    groups = m // rows_per_group
    t_rows = rows_per_group // k
    tiles_arg = jax.jit(
        lambda xg: jnp.take(xg, flat_j, axis=0).reshape(
            groups, t_rows, k, 128)
    )(x.astype(jnp.bfloat16))
    mb = m * 128 * 2 / 1e6

    # 1. pure copy (read+write the full tile volume)
    def make_copy(loops):
        @jax.jit
        def run(tiles):
            def body(i, c):
                t2 = tiles + jnp.bfloat16(1.0)
                return c + t2[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return lambda: run(tiles_arg)

    sec = slope_time(fence, make_copy, spans=(5, 30), reps=2)
    report("sweepfloor", variant="copy_rw", ms=round(sec * 1e3, 3),
           gb_per_s=round(2 * mb / 1e3 / sec, 1))

    # 2. read-only Pallas pass (same block structure as the force kernel)
    tbytes = 512 * 1024
    t_tile = max(8, (tbytes // (k * 128 * 4) // 8) * 8)

    def ro_kernel(xj_ref, acc_ref):
        acc_ref[:] = acc_ref[:] + jnp.sum(
            xj_ref[:].astype(jnp.float32), axis=(0, 1))

    def ro_call(tile):
        return pl.pallas_call(
            ro_kernel,
            grid=(pl.cdiv(t_rows, t_tile),),
            in_specs=[pl.BlockSpec((t_tile, k, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(tile)

    def make_ro(loops):
        @jax.jit
        def run(tiles):
            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + ro_call(tiles[g] + jnp.bfloat16(0) * i)[0, 0]
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return lambda: run(tiles_arg)

    try:
        sec = slope_time(fence, make_ro, spans=(5, 30), reps=2)
        report("sweepfloor", variant="pallas_read", ms=round(sec * 1e3, 3),
               gb_per_s=round(mb / 1e3 / sec, 1))
    except Exception as e:
        report("sweepfloor", variant="pallas_read",
               error=f"{type(e).__name__}: {str(e)[:160]}")

    # 3. static-slice takes (no dynamic_slice / no index arithmetic)
    def make_take_static(loops):
        @jax.jit
        def run():
            def body(i, c):
                xg = (x + 0.0 * i).astype(jnp.bfloat16)
                s = jnp.float32(0)
                for g in range(groups):
                    idx = jax.lax.slice(
                        flat_j, (g * rows_per_group,),
                        ((g + 1) * rows_per_group,))
                    t = jnp.take(xg, idx, axis=0)
                    s = s + t[0, 0].astype(jnp.float32)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    sec = slope_time(fence, make_take_static, spans=(5, 30), reps=2)
    report("sweepfloor", variant="take_static", ms=round(sec * 1e3, 3),
           m_rows_per_s=round(m / sec / 1e6, 1))


def exp_takesize():
    """Bulk-take rate vs embedding-table size (is the 450 M rows/s engine
    rate flat in table bytes, or does it degrade at big-graph scale?)."""
    import jax
    import jax.numpy as jnp

    fence = _fence_fn(jax, jnp)
    m = 2_000_000
    import os as _o
    sizes = [int(v) for v in _o.environ.get(
        "TAKESIZE_NS", "131072,524288,1500000,3000000").split(",")]
    dt = {"bfloat16": jnp.bfloat16, "int8": jnp.int8,
          "float32": jnp.float32}[_o.environ.get("TAKESIZE_DT", "bfloat16")]
    for n in sizes:
        idx = jax.random.randint(jax.random.PRNGKey(3), (m,), 0, n, jnp.int32)
        tbl = jnp.zeros((n, 128), dtype=dt)

        def make(loops, tbl=tbl, idx=idx, n=n):
            @jax.jit
            def run():
                def body(i, c):
                    g = jnp.take(tbl, (idx + i) % n, axis=0)
                    return c + g[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(fence, make, spans=(4, 16), reps=2)
        report("takesize", n=n, table_mb=round(n * 256 / 1e6, 1),
               m_rows_per_s=round(m / sec / 1e6, 1))


def exp_takehot():
    """Is the fast-gather regime working-set-based?  Take from a 1.5M-row
    table with indices RESTRICTED to a suffix window of R rows — if the
    rate matches the small-table rate, the engine reads through a cache
    keyed by touched bytes, and a hot/cold slot split recovers the fast
    rate for the hot share at big-graph scale."""
    import jax
    import jax.numpy as jnp

    fence = _fence_fn(jax, jnp)
    m = 2_000_000
    n = 1_500_000
    tbl = jnp.zeros((n, 128), dtype=jnp.bfloat16)
    for r in (131072, 262144, 393216, 524288, 786432, n):
        idx = jax.random.randint(
            jax.random.PRNGKey(3), (m,), n - r, n, jnp.int32)

        def make(loops, idx=idx):
            @jax.jit
            def run():
                def body(i, c):
                    g = jnp.take(tbl, n - 1 - ((idx + i) % r), axis=0)
                    return c + g[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(fence, make, spans=(4, 16), reps=2)
        report("takehot", window_rows=r, window_mb=round(r * 256 / 1e6, 1),
               m_rows_per_s=round(m / sec / 1e6, 1))


def exp_takemix():
    """Interleaved hot/cold takes from SEPARATE arrays (the schedule's real
    shape): cold from a 1.5M-row table, hot from a 393K-row (100 MB)
    compact table, alternating per chunk.  If the cold stream evicts the
    hot table from the fast tier, the interleaved total exceeds the sum of
    the pure-stream times."""
    import jax
    import jax.numpy as jnp

    fence = _fence_fn(jax, jnp)
    n, h = 1_500_000, 393_216
    m_cold, m_hot = 1_200_000, 800_000
    chunks = 8
    tbl = jnp.zeros((n, 128), dtype=jnp.bfloat16)
    tbl_hot = jnp.zeros((h, 128), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(5)
    cold = jax.random.randint(key, (m_cold,), 0, n, jnp.int32)
    hot = jax.random.randint(jax.random.fold_in(key, 1), (m_hot,), 0, h,
                             jnp.int32)

    def rate(use_cold, use_hot):
        cc, hc = m_cold // chunks, m_hot // chunks

        def make(loops):
            @jax.jit
            def run():
                def body(i, c):
                    s = jnp.float32(0)
                    for ch in range(chunks):
                        if use_cold:
                            idx = jax.lax.slice(cold, (ch * cc,),
                                                ((ch + 1) * cc,))
                            g = jnp.take(tbl, (idx + i) % n, axis=0)
                            s = s + g[0, 0].astype(jnp.float32)
                        if use_hot:
                            idx = jax.lax.slice(hot, (ch * hc,),
                                                ((ch + 1) * hc,))
                            g = jnp.take(tbl_hot, (idx + i) % h, axis=0)
                            s = s + g[0, 0].astype(jnp.float32)
                    return c + s
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run
        return slope_time(fence, make, spans=(4, 16), reps=2)

    t_cold = rate(True, False)
    t_hot = rate(False, True)
    t_both = rate(True, True)
    report("takemix", cold_ms=round(t_cold * 1e3, 3),
           hot_ms=round(t_hot * 1e3, 3), both_ms=round(t_both * 1e3, 3),
           sum_ms=round((t_cold + t_hot) * 1e3, 3),
           hot_m_rows_per_s=round(m_hot / t_hot / 1e6, 1))


def exp_hotloop():
    """Does a compact hot table keep the fast gather rate when it is (a) a
    jit argument, (b) a per-iteration lax.slice of a big loop carry
    (+ optimization_barrier), (c) its own loop carry?  Decides how the
    hot/cold schedule must materialize the suffix copy."""
    import jax
    import jax.numpy as jnp

    fence = _fence_fn(jax, jnp)
    n, h, m = 1_500_000, 393_216, 2_000_000
    big = jnp.zeros((n, 128), dtype=jnp.bfloat16)
    hot_arg = jnp.zeros((h, 128), dtype=jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(2), (m,), 0, h, jnp.int32)

    def t_a(loops):
        @jax.jit
        def run():
            def body(i, c):
                g = jnp.take(hot_arg, (idx + i) % h, axis=0)
                return c + g[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def t_b(loops):
        @jax.jit
        def run():
            def body(i, carry):
                c, x = carry
                xh = jax.lax.optimization_barrier(
                    jax.lax.slice(x, (n - h, 0), (n, 128)))
                g = jnp.take(xh, (idx + i) % h, axis=0)
                x = jax.lax.dynamic_update_slice(
                    x, g[:1] + jnp.bfloat16(0), (0, 0))
                return (c + g[0, 0].astype(jnp.float32), x)
            return jax.lax.fori_loop(0, loops, body, (jnp.float32(0), big))[0]
        return run

    def t_c(loops):
        @jax.jit
        def run():
            def body(i, carry):
                c, xh = carry
                g = jnp.take(xh, (idx + i) % h, axis=0)
                xh = jax.lax.dynamic_update_slice(
                    xh, g[:1] + jnp.bfloat16(0), (0, 0))
                return (c + g[0, 0].astype(jnp.float32), xh)
            return jax.lax.fori_loop(0, loops, body,
                                     (jnp.float32(0), hot_arg))[0]
        return run

    for name, mk in (("arg", t_a), ("slice_of_carry", t_b), ("own_carry", t_c)):
        try:
            sec = slope_time(fence, mk, spans=(4, 16), reps=2)
            report("hotloop", variant=name,
                   m_rows_per_s=round(m / sec / 1e6, 1))
        except Exception as e:
            report("hotloop", variant=name,
                   error=f"{type(e).__name__}: {str(e)[:160]}")


def exp_bigparts():
    """Phase split of the big-graph (1.5M-node) split-layout iteration:
    cold takes, hot takes, full attraction, repulsion+apply — accounts for
    the measured ~477 ms/iter."""
    import jax
    import jax.numpy as jnp

    from force2vec_tpu.graphs.io import load_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = load_graph("/tmp/bigrun_yt.mtx")
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                       take_group_bytes=32 * 2**20)
    lay = fv.layout
    n_pad = lay.n_pad
    garr = fv._garr
    x = fv.init_embedding(seed=1)
    cold_groups, hot_groups = fv._take_groups_dbg
    report("bigparts", cold_groups=len(cold_groups),
           hot_groups=len(hot_groups),
           cold_pieces=sum(len(g) for g in cold_groups),
           hot_pieces=sum(len(g) for g in hot_groups))

    def take_probe(groups, hot):
        def make(loops):
            @jax.jit
            def run(garr, x):
                def body(i, c):
                    xg = (x + 0.0 * i).astype(jnp.bfloat16)
                    src = (jax.lax.optimization_barrier(jax.lax.slice(
                        xg, (lay.hot_start, 0), (n_pad, 128)))
                        if hot else xg)
                    s = jnp.float32(0)
                    for grp in groups:
                        idxs = []
                        for pc in grp:
                            if pc[0] == "rect":
                                _, bi, w, st, cnt, real, ih, c_off, c_rows = pc
                                nbr = jax.lax.dynamic_slice(
                                    garr[f"nbr{bi}"], (c_off, 0), (c_rows, w))
                                idxs.append(nbr.reshape(-1))
                            else:
                                (_, bi, w, st, ro, c_rows, f_off,
                                 dpos, real, srckey) = pc
                                key = (f"hotf{bi}" if srckey == "hot"
                                       else f"nbr{bi}")
                                idxs.append(jax.lax.slice(
                                    garr[key], (f_off,),
                                    (f_off + c_rows * w,)))
                        fi = (idxs[0] if len(idxs) == 1
                              else jnp.concatenate(idxs))
                        t = jnp.take(src, fi, axis=0)
                        s = s + t[0, 0].astype(jnp.float32)
                    return c + s
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return lambda: run(garr, x)
        return make

    rows_c = sum((pc[8] if pc[0] == "rect" else pc[5]) * pc[2]
                 for g_ in cold_groups for pc in g_)
    rows_h = sum(pc[5] * pc[2] for g_ in hot_groups for pc in g_)
    sec = slope_time(fence, take_probe(cold_groups, False),
                     spans=(2, 6), reps=2)
    report("bigparts", phase="cold_takes", ms=round(sec * 1e3, 1),
           m_rows_per_s=round(rows_c / sec / 1e6, 1))
    sec = slope_time(fence, take_probe(hot_groups, True),
                     spans=(2, 6), reps=2)
    report("bigparts", phase="hot_takes", ms=round(sec * 1e3, 1),
           m_rows_per_s=round(rows_h / sec / 1e6, 1))

    # full iteration
    ng = -(-n_pad // 256)
    negs = jax.random.randint(jax.random.PRNGKey(2), (ng, 5), 0,
                              graph.n, jnp.int32)

    def make_full(loops):
        @jax.jit
        def run(g, x):
            def body(i, xc):
                return fv._iteration(g, xc, negs, None, 0.002)
            return jax.lax.fori_loop(0, loops, body, x)
        return lambda: run(garr, x)

    sec = slope_time(fence, make_full, spans=(2, 6), reps=2)
    ups = graph.nnz + graph.n * 5
    report("bigparts", phase="full", ms=round(sec * 1e3, 1),
           m_updates_per_s=round(ups / sec / 1e6, 1))


if __name__ == "__main__":
    exps = sys.argv[1:] or ["uniq"]
    for e in exps:
        fn = globals().get(f"exp_{e}")
        if fn is None:
            print(f"unknown exp {e}")
            continue
        try:
            fn()
        except Exception:
            traceback.print_exc()
