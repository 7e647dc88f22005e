"""Round-3 design experiments for the in-kernel-gather force sweep.

Answers, on the real chip (slope-timed so tunnel dispatch cancels):

  A. bulk-take rate vs gather dtype (f32 / bf16 / int8): is XLA's gather
     engine HBM-byte-bound (int8 helps) or row/descriptor-bound (it
     doesn't)?
  B. Pallas in-kernel gather from a VMEM-RESIDENT table — two lowerings
     (vector jnp.take, fori_loop row dynamic-slice): does Mosaic compile
     it, and at what rows/s?  This is the "hot rows live in VMEM" path.
  C. phase split of the current sync iteration: full vs attraction-only
     vs take-only — locates the 53%-of-roofline schedule overhead.
  D. one-hot-matmul gather on the MXU (rate ∝ 1/H): the fallback hot path
     if Mosaic can't lower an in-VMEM take.

Each experiment prints one JSON line; failures print the exception and
continue.  Results recorded in PERF.md.
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    return np.asarray(_FENCE(x))


_FENCE = jax.jit(lambda a: a.reshape(-1)[:1].astype(jnp.float32))


def slope_time(make_loop, spans=(4, 20), reps=2):
    """Seconds per unit via the slope between two loop lengths."""
    times = {}
    for s in spans:
        f = make_loop(s)
        fence(f())  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(f())
            best = min(best, time.perf_counter() - t0)
        times[s] = best
    return (times[spans[1]] - times[spans[0]]) / (spans[1] - spans[0])


def report(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


# -- A: take rate vs dtype ---------------------------------------------------


def exp_take_dtype(n=131072, m=2_000_000, d=128):
    idx = jax.random.randint(jax.random.PRNGKey(3), (m,), 0, n, jnp.int32)
    for dt in ("float32", "bfloat16", "int8"):
        tbl = jnp.zeros((n, d), dtype=dt)

        def make(loops, tbl=tbl):
            @jax.jit
            def run():
                def body(i, c):
                    g = jnp.take(tbl, (idx + i) % n, axis=0)
                    return c + jnp.sum(g.astype(jnp.float32))
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(make, spans=(5, 30), reps=3)
        report("take_dtype", dtype=dt, m_rows_per_s=round(m / sec / 1e6, 1),
               gb_per_s=round(m * d * jnp.dtype(dt).itemsize / sec / 1e9, 1))


# -- A2: fused take+force in pure XLA (no Pallas, no materialize) -------------


def exp_fused(n=131072, c=131072, k=16, d=128):
    """Does XLA 0.9 fuse a take into the force chain at full gather rate?
    Round-2 measured the fused form at ~188 M rows/s vs ~310 M standalone;
    re-check on this stack before investing in kernel work."""
    idx = jax.random.randint(jax.random.PRNGKey(3), (c, k), 0, n, jnp.int32)
    for dt in ("float32", "bfloat16"):
        tbl = jnp.zeros((n, d), dtype=dt)
        xi = jnp.zeros((c, d), dtype=jnp.float32)
        dg = jnp.full((c,), k // 2, jnp.int32)

        def make(loops, tbl=tbl):
            @jax.jit
            def run():
                def body(i, acc):
                    xj = jnp.take(tbl, ((idx + i) % n).reshape(-1), axis=0
                                  ).reshape(c, k, d).astype(jnp.float32)
                    diff = xi[:, None, :] - xj
                    a = jnp.sum(diff * diff, axis=-1, keepdims=True)
                    f = 0.002 * jnp.clip(-2.0 / (1.0 + a) * diff, -5.0, 5.0)
                    mask = (jnp.arange(k, dtype=jnp.int32)[None, :]
                            < dg[:, None])
                    upd = jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)
                    return acc + jnp.sum(upd)
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(make, spans=(4, 16), reps=3)
        report("fused", dtype=dt, m_rows_per_s=round(c * k / sec / 1e6, 1))


# -- B: Pallas VMEM-resident-table gather -------------------------------------


def _vmem_take_kernel(mode, k, idx_ref, tbl_ref, out_ref):
    t = out_ref.shape[0]
    d = tbl_ref.shape[1]
    if mode == "take":
        idx = idx_ref[:]  # [T, K] int32 (VMEM)
        flat = idx.reshape(-1)
        # Mosaic's dynamic-gather wants take_along_axis semantics: index
        # array shaped like the output, gathering along the sublane axis.
        idx2d = jnp.broadcast_to(flat[:, None], (t * k, d))
        g = jnp.take_along_axis(tbl_ref[:], idx2d, axis=0)
        out_ref[:] = jnp.sum(
            g.reshape(t, k, d).astype(jnp.float32), axis=1)
    else:  # rowloop: per output row, sum K table rows read at dynamic
        # sublane offsets (idx lives in SMEM; ref reads at pl.ds are
        # supported, value-level dynamic_slice is not)
        def row_body(r, _):
            def inner(j, acc):
                return acc + tbl_ref[pl.ds(idx_ref[r, j], 1), :].astype(
                    jnp.float32)
            acc = jax.lax.fori_loop(0, k, inner, jnp.zeros((1, d),
                                                           jnp.float32))
            out_ref[pl.ds(r, 1), :] = acc
            return 0
        jax.lax.fori_loop(0, t, row_body, 0)


def vmem_take(mode, tbl, idx, tile=256):
    c, k = idx.shape
    h, d = tbl.shape
    idx_space = pltpu.VMEM if mode == "take" else pltpu.SMEM
    return pl.pallas_call(
        functools.partial(_vmem_take_kernel, mode, k),
        grid=(pl.cdiv(c, tile),),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=idx_space),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d), jnp.float32),
    )(idx, tbl)


def exp_vmem_take(h=16384, d=128, c=65536, k=16):
    for mode in ("take", "rowloop"):
        for dt in ("bfloat16", "float32"):
            try:
                tbl = jnp.zeros((h, d), dtype=dt)
                idx = jax.random.randint(
                    jax.random.PRNGKey(5), (c, k), 0, h, jnp.int32)

                def make(loops, tbl=tbl, idx=idx, mode=mode):
                    @jax.jit
                    def run():
                        def body(i, acc):
                            o = vmem_take(mode, tbl, (idx + i) % h)
                            return acc + jnp.sum(o)
                        return jax.lax.fori_loop(0, loops, body,
                                                 jnp.float32(0))
                    return run

                # correctness probe first (small)
                small_idx = jax.random.randint(
                    jax.random.PRNGKey(6), (512, k), 0, h, jnp.int32)
                rtbl = jax.random.normal(
                    jax.random.PRNGKey(7), (h, d)).astype(dt)
                got = np.asarray(jax.jit(
                    functools.partial(vmem_take, mode))(rtbl, small_idx))
                want = np.asarray(
                    jnp.sum(jnp.take(rtbl, small_idx.reshape(-1), axis=0)
                            .reshape(512, k, d).astype(jnp.float32), axis=1))
                err = float(np.max(np.abs(got - want)))
                assert err < 1e-2, f"wrong result, max err {err}"
                sec = slope_time(make)
                report("vmem_take", mode=mode, dtype=dt, h=h, k=k,
                       m_rows_per_s=round(c * k / sec / 1e6, 1))
            except Exception as e:  # noqa: BLE001
                traceback.print_exc()
                report("vmem_take", mode=mode, dtype=dt, error=str(e)[:200])


# -- C: iteration phase split --------------------------------------------------


def exp_phase_split():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    x = fv.init_embedding(seed=1)
    ng = -(-lay.n_pad // cfg.batch_size)
    negs = jax.random.randint(jax.random.PRNGKey(2), (ng, 5), 0, graph.n,
                              jnp.int32)
    garr = fv._garr

    def make_full(loops):
        @jax.jit
        def run():
            def body(i, xc):
                return fv._iteration(garr, xc, negs, None, 0.002)
            return jax.lax.fori_loop(0, loops, body, x)
        return run

    # take-only: the bulk gathers of every bucket, nothing else
    def make_take(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)
            def body(i, c):
                s = jnp.float32(0)
                for bi, b in enumerate(lay.buckets):
                    nbr = garr[f"nbr{bi}"]
                    g = jnp.take(xg, (nbr.reshape(-1) + i) % graph.n, axis=0)
                    s = s + jnp.sum(g.astype(jnp.float32))
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    full = slope_time(make_full)
    take = slope_time(make_take)
    ups = graph.nnz + graph.n * cfg.ns
    report("phase_split", full_ms=round(full * 1e3, 2),
           take_ms=round(take * 1e3, 2),
           other_ms=round((full - take) * 1e3, 2),
           full_mups=round(ups / full / 1e6, 1),
           padded_rows=int(lay.padded_edges))


# -- D: one-hot matmul gather ---------------------------------------------------


def exp_onehot(c=65536, k=16, d=128):
    for h in (2048, 8192):
        idx = jax.random.randint(jax.random.PRNGKey(5), (c * k,), 0, h,
                                 jnp.int32)
        tbl = jnp.zeros((h, d), dtype=jnp.bfloat16)

        def make(loops, tbl=tbl, idx=idx, h=h):
            @jax.jit
            def run():
                def body(i, acc):
                    ii = (idx + i) % h
                    oh = (ii[:, None] ==
                          jnp.arange(h, dtype=jnp.int32)[None, :]
                          ).astype(jnp.bfloat16)
                    g = jnp.dot(oh, tbl,
                                preferred_element_type=jnp.float32)
                    return acc + jnp.sum(g)
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        try:
            sec = slope_time(make, spans=(2, 6))
            report("onehot", h=h, m_rows_per_s=round(c * k / sec / 1e6, 1))
        except Exception as e:  # noqa: BLE001
            report("onehot", h=h, error=str(e)[:200])




# -- E: take rate vs index distribution ----------------------------------------


def exp_take_dist(n=131072, m=2_000_000, d=128):
    from bench import synth_powerlaw_graph
    from force2vec_tpu.graphs.csr import SyncLayout

    graph = synth_powerlaw_graph()
    lay = SyncLayout.build(graph, min_width=8, hub_width=128)
    w16 = [b for b in lay.buckets if b.width == 16][0]
    real_idx = np.ascontiguousarray(w16.nbr.reshape(-1)[:m])
    rng = np.random.default_rng(0)
    cases = {
        "uniform": rng.integers(0, n, m),
        "zeros": np.zeros(m),
        "sorted": np.sort(rng.integers(0, n, m)),
        "real_bucket": real_idx,
        "hot_tail": rng.integers(n - 16384, n, m),
    }
    tbl = jnp.zeros((n, d), dtype=jnp.bfloat16)
    for name, ix in cases.items():
        idx = jnp.asarray(np.asarray(ix, np.int32))

        def make(loops, idx=idx):
            @jax.jit
            def run():
                def body(i, c):
                    g = jnp.take(tbl, (idx + i) % n, axis=0)
                    return c + jnp.sum(g.astype(jnp.float32))
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(make, spans=(5, 30), reps=3)
        report("take_dist", dist=name,
               m_rows_per_s=round(len(ix) / sec / 1e6, 1))


# -- F: bisect the _train_jit wrapper gap ---------------------------------------


def exp_trainwrap():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                       tile_budget_bytes=2048 * 1024 * 1024)
    x = fv.init_embedding(seed=1)
    key = jax.random.PRNGKey(1)
    garr = fv._garr
    iteration = fv._iteration
    ng = -(-fv.layout.n_pad // 256)
    lr = fv.lr
    ups = graph.nnz + graph.n * 5

    def body_of(key, off):
        def body(t, xc):
            it = off + t
            kit = jax.random.fold_in(key, it)
            nkey = jax.random.fold_in(kit, 0)
            negs = jax.random.randint(nkey, (ng, 5), 0, graph.n - 1,
                                      jnp.int32)
            step = jnp.asarray(lr, dtype=xc.dtype)
            return iteration(garr, xc, negs, None, step)
        return body

    variants = {}

    def mk_asis(span):
        f = jax.jit(lambda g, x, key, off: fv._build_train_fn()(
            g, x, key, span, off))
        return lambda: f(garr, x, key, 0)

    variants["dispatcher_asis"] = mk_asis

    def mk_static_off(span):
        f = jax.jit(lambda x, key: jax.lax.fori_loop(
            0, span, body_of(key, 0), x))
        return lambda: f(x, key)

    variants["static_off_closure_garr"] = mk_static_off

    def mk_traced_off(span):
        f = jax.jit(lambda x, key, off: jax.lax.fori_loop(
            0, span, body_of(key, off), x))
        return lambda: f(x, key, 0)

    variants["traced_off_closure_garr"] = mk_traced_off

    def mk_garr_arg(span):
        def fn(g, x, key):
            def body(t, xc):
                kit = jax.random.fold_in(key, t)
                nkey = jax.random.fold_in(kit, 0)
                negs = jax.random.randint(nkey, (ng, 5), 0, graph.n - 1,
                                          jnp.int32)
                return iteration(g, xc, negs, None,
                                 jnp.asarray(lr, dtype=xc.dtype))
            return jax.lax.fori_loop(0, span, body, x)
        f = jax.jit(fn)
        return lambda: f(garr, x, key)

    variants["static_off_garr_arg"] = mk_garr_arg

    for name, mk in variants.items():
        try:
            sec = slope_time(lambda s, mk=mk: mk(s), spans=(20, 120))
            report("trainwrap", variant=name, ms=round(sec * 1e3, 2),
                   mups=round(ups / sec / 1e6, 1))
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            report("trainwrap", variant=name, error=str(e)[:200])

# -- G: bucket-level take bisect -------------------------------------------------


def exp_bucket():
    """Per-bucket take rates vs one flat take of the same total rows —
    locates the 339-vs-467 M rows/s gap inside the bucket sweep."""
    from bench import synth_powerlaw_graph
    from force2vec_tpu.graphs.csr import SyncLayout

    graph = synth_powerlaw_graph()
    n = graph.n
    lay = SyncLayout.build(
        graph, min_width=8, hub_width=128,
        widths=SyncLayout.widths_for(8, 128, "mult4"),
    )
    xg = jnp.zeros((n, 128), dtype=jnp.bfloat16)

    total = 0
    for bi, b in enumerate(lay.buckets):
        idx = jnp.asarray(b.nbr)  # [count, width]
        rows = int(b.nbr.size)
        total += rows

        def make(loops, idx=idx):
            @jax.jit
            def run():
                def body(i, c):
                    g = jnp.take(xg, ((idx + i) % n).reshape(-1), axis=0)
                    return c + jnp.sum(g.astype(jnp.float32))
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run

        sec = slope_time(make, spans=(5, 30), reps=2)
        report("bucket_take", bi=bi, width=int(b.width), rows=rows,
               m_rows_per_s=round(rows / sec / 1e6, 1),
               ms=round(sec * 1e3, 3))

    flat = jnp.concatenate(
        [jnp.asarray(b.nbr).reshape(-1) for b in lay.buckets])

    def make_flat(loops):
        @jax.jit
        def run():
            def body(i, c):
                g = jnp.take(xg, (flat + i) % n, axis=0)
                return c + jnp.sum(g.astype(jnp.float32))
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    sec = slope_time(make_flat, spans=(5, 30), reps=2)
    report("bucket_take", bi="flat", rows=total,
           m_rows_per_s=round(total / sec / 1e6, 1), ms=round(sec * 1e3, 3))

    # same loop but WITHOUT the sum (materialize only, fence on 4 bytes)
    def make_flat_nosum(loops):
        @jax.jit
        def run():
            def body(i, c):
                g = jnp.take(xg, (flat + i) % n, axis=0)
                return c + g[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    sec = slope_time(make_flat_nosum, spans=(5, 30), reps=2)
    report("bucket_take", bi="flat_nosum", rows=total,
           m_rows_per_s=round(total / sec / 1e6, 1), ms=round(sec * 1e3, 3))


# -- H: full-iteration decomposition ---------------------------------------------


def exp_iterparts():
    """Time the sync iteration's phases in isolation on the bench graph:
    take-only (materialize), take+pallas per bucket (attraction), the
    grouped repulsion, and the apply — accounts for every ms of the
    ~9.9 ms iteration so the optimization targets are data, not guesses."""
    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    n = graph.n
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    model = get_model("tdist")
    x = fv.init_embedding(seed=1)
    garr = fv._garr
    ng = -(-lay.n_pad // 256)
    negs = jax.random.randint(jax.random.PRNGKey(2), (ng, 5), 0, n, jnp.int32)
    step = jnp.float32(0.02)

    bucket_info = []
    for bi, b in enumerate(lay.buckets):
        bucket_info.append((bi, int(b.width), int(b.count),
                            b.owners is not None))

    def attraction_probe(kernel: bool):
        def make(loops):
            @jax.jit
            def run():
                xg = x.astype(jnp.bfloat16)
                def body(i, c):
                    s = jnp.float32(0)
                    for bi, width, count, is_hub in bucket_info:
                        nbr = garr[f"nbr{bi}"]
                        dg = garr[f"deg{bi}"]
                        g = jnp.take(xg, (nbr.reshape(-1) + i) % n,
                                     axis=0).reshape(count, width, 128)
                        if kernel:
                            if is_hub:
                                own = garr[f"own{bi}"]
                                start = lay.buckets[bi].start
                                xi = jnp.take(x, own + jnp.int32(start), axis=0)
                                invd = jnp.take(garr["inv_deg"],
                                                own + jnp.int32(start))
                            else:
                                start = lay.buckets[bi].start
                                xi = jax.lax.dynamic_slice(
                                    x, (start, 0), (count, 128))
                                invd = jax.lax.dynamic_slice(
                                    garr["inv_deg"], (start,), (count,))
                            out = ell_force(model, "edge", xi, g, dg, invd,
                                            step)
                            s = s + out[0, 0]
                        else:
                            s = s + g[0, 0, 0].astype(jnp.float32)
                    return c + s
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run
        return make

    for name, mk in (("take_only", attraction_probe(False)),
                     ("take_kernel", attraction_probe(True))):
        sec = slope_time(mk, spans=(5, 30), reps=2)
        report("iterparts", phase=name, ms=round(sec * 1e3, 3))

    # grouped repulsion alone (the jnp path the iteration uses)
    def make_rep(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)
            def body(i, c):
                sg = jnp.take(xg, (negs.reshape(-1) + i) % n,
                              axis=0).reshape(ng, 5, 128)
                gid = jnp.arange(lay.n_pad, dtype=jnp.int32) // 256
                s = jnp.take(sg, gid, axis=0).astype(x.dtype)
                f = model.sample_force(x[:, None, :], s, step)
                return c + jnp.sum(f, axis=(1,)).astype(jnp.float32)[0, 0]
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    sec = slope_time(make_rep, spans=(5, 30), reps=2)
    report("iterparts", phase="repulsion", ms=round(sec * 1e3, 3))

    # apply: x + upd (fresh buffer each loop, donated semantics not modeled)
    upd = jnp.ones_like(x)

    def make_apply(loops):
        @jax.jit
        def run():
            def body(i, xc):
                return xc + upd * (1.0 / (1.0 + i))
            return jax.lax.fori_loop(0, loops, body, x)
        return run

    sec = slope_time(make_apply, spans=(5, 30), reps=2)
    report("iterparts", phase="apply", ms=round(sec * 1e3, 3))

    # the real full iteration for the same graph/instance
    def make_full(loops):
        @jax.jit
        def run():
            def body(i, xc):
                return fv._iteration(garr, xc, negs, None, 0.002)
            return jax.lax.fori_loop(0, loops, body, x)
        return run

    sec = slope_time(make_full, spans=(5, 30), reps=2)
    ups = graph.nnz + graph.n * 5
    report("iterparts", phase="full", ms=round(sec * 1e3, 3),
           mups=round(ups / sec / 1e6, 1))


# -- I: force-sweep variants ------------------------------------------------------


def exp_sweepvar():
    """Three ways to evaluate the masked force over the materialized tile:
    current Pallas kernel (VPU hsum), a Pallas kernel with the D-axis
    reduction on the MXU (matmul by ones), and take -> optimization_barrier
    -> pure-jnp chain (barrier keeps XLA's fast standalone gather while XLA
    fuses the math).  All over the real bench-graph buckets."""
    import functools as ft

    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    n = graph.n
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    model = get_model("tdist")
    x = fv.init_embedding(seed=1)
    garr = fv._garr
    step = jnp.float32(0.02)

    # MXU-hsum kernel: same chain but a = (diff*diff) @ ones via jnp.dot
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    def mxu_kernel(k, xi_ref, xj_ref, deg_ref, step_ref, out_ref):
        xi = xi_ref[:]
        xj = xj_ref[:].astype(xi.dtype)  # [T, K, D]
        stepv = step_ref[0, 0]
        t, _, d = xj.shape
        diff = xi[:, None, :] - xj
        ones = jnp.ones((d, 1), dtype=xi.dtype)
        a = jax.lax.dot_general(
            (diff * diff).reshape(t * k, d), ones,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(t, k)
        d1 = -2.0 / (1.0 + a)
        f = jnp.clip(d1[:, :, None] * diff, -5.0, 5.0) * stepv
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
        maskf = (k_iota < deg_ref[:]).astype(xi.dtype)
        out_ref[:] = jnp.sum(f * maskf[:, :, None], axis=1)

    def mxu_force(xi, xj, dg, stepv, tile=None):
        from force2vec_tpu.ops.pallas_force import _tile_rows

        c, k, d = xj.shape
        tile = tile or _tile_rows(k, d, xj.dtype.itemsize)
        grid = (pl.cdiv(c, tile),)
        step_arr = jnp.asarray(stepv, dtype=xi.dtype).reshape(1, 1)
        return pl.pallas_call(
            ft.partial(mxu_kernel, k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, d), xi.dtype),
        )(xi, xj, dg[:, None], step_arr)

    bucket_info = [(bi, int(b.width), int(b.count), b.owners is not None,
                    int(b.start)) for bi, b in enumerate(lay.buckets)]

    def xi_invd(bi, width, count, is_hub, start):
        if is_hub:
            own = garr[f"own{bi}"]
            xi = jnp.take(x, own + jnp.int32(start), axis=0)
            invd = jnp.take(garr["inv_deg"], own + jnp.int32(start))
        else:
            xi = jax.lax.dynamic_slice(x, (start, 0), (count, 128))
            invd = jax.lax.dynamic_slice(garr["inv_deg"], (start,), (count,))
        return xi, invd

    def sweep_probe(kind):
        def make(loops):
            @jax.jit
            def run():
                xg = x.astype(jnp.bfloat16)
                def body(i, c):
                    s = jnp.float32(0)
                    for bi, width, count, is_hub, start in bucket_info:
                        nbr = garr[f"nbr{bi}"]
                        dg = garr[f"deg{bi}"]
                        g = jnp.take(xg, (nbr.reshape(-1) + i) % n,
                                     axis=0).reshape(count, width, 128)
                        xi, invd = xi_invd(bi, width, count, is_hub, start)
                        if kind == "pallas":
                            out = ell_force(model, "edge", xi, g, dg, invd,
                                            step)
                        elif kind == "mxu":
                            out = mxu_force(xi, g, dg, step)
                        else:  # barrier + jnp
                            g = jax.lax.optimization_barrier(g)
                            f = model.edge_force(
                                xi[:, None, :], g.astype(x.dtype),
                                invd[:, None, None], step)
                            mask = (jnp.arange(width, dtype=jnp.int32)[None]
                                    < dg[:, None])
                            out = jnp.sum(
                                jnp.where(mask[:, :, None], f, 0), axis=1)
                        s = s + out[0, 0]
                    return c + s
                return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
            return run
        return make

    import os as _os
    kinds = _os.environ.get("SWEEP_KINDS", "pallas,mxu,barrier").split(",")
    for kind in kinds:
        try:
            sec = slope_time(sweep_probe(kind), spans=(5, 30), reps=2)
            report("sweepvar", kind=kind, ms=round(sec * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            report("sweepvar", kind=kind, error=str(e)[:200])

    # parity probe: mxu kernel vs ell_force on one real bucket
    bi, width, count, is_hub, start = bucket_info[2]
    nbr = garr[f"nbr{bi}"]
    g = jnp.take(x.astype(jnp.bfloat16), nbr.reshape(-1), axis=0).reshape(
        count, width, 128)
    xi, invd = xi_invd(bi, width, count, is_hub, start)
    dg = garr[f"deg{bi}"]
    a = np.asarray(jax.jit(lambda: mxu_force(xi, g, dg, step))())
    b = np.asarray(jax.jit(lambda: ell_force(model, "edge", xi, g, dg,
                                             invd, step))())
    report("sweepvar", kind="mxu_parity",
           max_err=float(np.max(np.abs(a - b))))


# -- J: sweep-only on pre-materialized tiles ---------------------------------------


def exp_sweeponly():
    """The force sweep with the tiles already in HBM (no takes in the
    loop): separates sweep-internal cost from gather interference."""
    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.ops.pallas_force import ell_force
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    model = get_model("tdist")
    x = fv.init_embedding(seed=1)
    garr = fv._garr
    step = jnp.float32(0.02)

    for gdt in ("bfloat16", "float32"):
        tiles, xis, invds = [], [], []
        xg = x.astype(gdt)
        for bi, b in enumerate(lay.buckets):
            nbr = garr[f"nbr{bi}"]
            tiles.append(jnp.take(xg, nbr.reshape(-1), axis=0).reshape(
                b.count, b.width, 128))
            if b.owners is not None:
                own = garr[f"own{bi}"]
                xis.append(jnp.take(x, own + jnp.int32(b.start), axis=0))
                invds.append(jnp.take(garr["inv_deg"],
                                      own + jnp.int32(b.start)))
            else:
                xis.append(jax.lax.dynamic_slice(
                    x, (b.start, 0), (b.count, 128)))
                invds.append(jax.lax.dynamic_slice(
                    garr["inv_deg"], (b.start,), (b.count,)))

        for kind in ("pallas", "jnp"):
            def make(loops, kind=kind):
                @jax.jit
                def run():
                    def body(i, c):
                        s = jnp.float32(0)
                        for bi, b in enumerate(lay.buckets):
                            t, xi, invd = tiles[bi], xis[bi], invds[bi]
                            dg = garr[f"deg{bi}"]
                            if kind == "pallas":
                                out = ell_force(model, "edge", xi, t, dg,
                                                invd, step)
                            else:
                                f = model.edge_force(
                                    xi[:, None, :], t.astype(x.dtype),
                                    invd[:, None, None], step)
                                mask = (jnp.arange(t.shape[1],
                                                   dtype=jnp.int32)[None]
                                        < dg[:, None])
                                out = jnp.sum(
                                    jnp.where(mask[:, :, None], f, 0), axis=1)
                            s = s + out[0, 0]
                        return c + s
                    return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
                return run

            try:
                sec = slope_time(make, spans=(5, 30), reps=2)
                report("sweeponly", kind=kind, gather_dtype=gdt,
                       ms=round(sec * 1e3, 3))
            except Exception as e:  # noqa: BLE001
                report("sweeponly", kind=kind, gather_dtype=gdt,
                       error=str(e)[:200])


if __name__ == "__main__":
    which = sys.argv[1:] or ["take_dtype", "vmem_take", "phase_split",
                             "onehot"]
    print(f"# platform={jax.devices()[0]}", flush=True)
    for w in which:
        try:
            globals()[f"exp_{w}"]()
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            report(w, error=str(e)[:300])
