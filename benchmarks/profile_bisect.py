"""Definitive sync-iteration bisect with SPAN DIFFERENCING.

Every earlier probe harness divided (dispatch + exec) by a step count; on
this platform dispatch is ~0.42s fixed, so short probes read ~14ms/step no
matter the body — which is also, coincidentally, the true full-iteration
cost, making those numbers useless.  Here every variant runs at two span
lengths inside one jit each, and the per-step cost is the slope — dispatch
cancels exactly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPANS = (20, 120)


def fetch1(arr):
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(arr))


def slope(make_run, x0, reps=2):
    ts = []
    for s in SPANS:
        run = make_run(s)
        xx = run(x0)
        fetch1(xx)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            xx = run(x0)
            fetch1(xx)
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (SPANS[1] - SPANS[0])


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    ups = graph.nnz + graph.n * 5

    def report(name, s):
        print(f"{name:34s} {s*1e3:8.2f} ms/iter   ({ups/s/1e6:6.0f} M ups/s)",
              flush=True)

    for pallas in (True, False):
        cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                          gather_dtype="bfloat16")
        fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                           use_pallas=pallas)
        lay = fv.layout
        x0 = fv.init_embedding(seed=1)
        key = jax.random.PRNGKey(1)
        garr = fv._garr
        iteration = fv._iteration
        n_pad, ns = lay.n_pad, 5
        ng = -(-n_pad // 256)

        def draw(it):
            kit = jax.random.fold_in(key, it)
            nkey = jax.random.fold_in(kit, 0)
            return jax.random.randint(nkey, (ng, ns), 0, graph.n - 1, jnp.int32)

        # full iteration (the real thing)
        def mk_full(span):
            def body(t, xc):
                return iteration(garr, xc, draw(t), None, jnp.float32(0.02))
            return jax.jit(lambda x: jax.lax.fori_loop(0, span, body, x))

        report(f"pallas={pallas} FULL", slope(mk_full, x0))

        def attraction_update(xc, xg, step):
            parts = []
            n = lay.n
            dim = 128
            for bi, b in enumerate(lay.buckets):
                is_hub = b.owners is not None
                end = n if is_hub or bi == len(lay.buckets) - 1 else lay.buckets[bi + 1].start
                real = end - b.start
                nbr = garr[f"nbr{bi}"]
                dg_ = garr[f"deg{bi}"]
                if is_hub:
                    owners = garr[f"own{bi}"]
                    xi = jnp.take(xc, owners + jnp.int32(b.start), axis=0)
                    invd = jnp.take(garr["inv_deg"], owners + jnp.int32(b.start))
                else:
                    xi = jax.lax.dynamic_slice(xc, (b.start, 0), (b.count, dim))
                    invd = jax.lax.dynamic_slice(garr["inv_deg"], (b.start,), (b.count,))
                xj = jnp.take(xg, nbr.reshape(-1), axis=0).reshape(b.count, b.width, dim)
                if pallas:
                    from force2vec_tpu.ops.pallas_force import ell_force
                    part = ell_force(fv.model, "edge", xi, xj, dg_, invd, step)
                else:
                    xj32 = xj.astype(xi.dtype)
                    f = fv.model.edge_force(xi[:, None, :], xj32, invd[:, None, None], step)
                    mask = jnp.arange(b.width, dtype=jnp.int32)[None, :] < dg_[:, None]
                    part = jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)
                if is_hub:
                    part = jax.ops.segment_sum(part, garr[f"own{bi}"], num_segments=real)
                else:
                    part = part[:real]
                parts.append(part)
            if n_pad > n:
                parts.append(jnp.zeros((n_pad - n, dim), dtype=xc.dtype))
            return jnp.concatenate(parts, axis=0)

        def mk_attr2(span):
            def body(t, xc):
                negs = draw(t)
                xg = xc.astype(jnp.bfloat16)
                upd = attraction_update(xc, xg, jnp.float32(0.02))
                return xc + upd + jnp.float32(1e-30) * negs[0, 0].astype(xc.dtype)
            return jax.jit(lambda x: jax.lax.fori_loop(0, span, body, x))

        report(f"pallas={pallas} attraction-only", slope(mk_attr2, x0))

        if pallas:
            continue  # repulsion/floor probes don't involve the kernel

        # repulsion only (grouped, jnp chain — same as the bench path)
        def repulsion_update(xc, xg, negs, step):
            dim = 128
            sg = jnp.take(xg, negs.reshape(-1), axis=0).reshape(ng, ns, dim)
            gid = jnp.arange(n_pad, dtype=jnp.int32) // jnp.int32(256)
            s = jnp.take(sg, gid, axis=0)
            full = jnp.full((n_pad,), ns, dtype=jnp.int32)
            f = fv.model.sample_force(xc[:, None, :], s.astype(xc.dtype), step)
            mask = jnp.arange(ns, dtype=jnp.int32)[None, :] < full[:, None]
            return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

        def mk_rep(span):
            def body(t, xc):
                negs = draw(t)
                xg = xc.astype(jnp.bfloat16)
                return xc + repulsion_update(xc, xg, negs, jnp.float32(0.02))
            return jax.jit(lambda x: jax.lax.fori_loop(0, span, body, x))

        report(f"pallas={pallas} repulsion-only", slope(mk_rep, x0))

        # rng+apply floor
        def mk_floor(span):
            def body(t, xc):
                negs = draw(t)
                return xc + jnp.float32(1e-30) * negs[0, 0].astype(xc.dtype)
            return jax.jit(lambda x: jax.lax.fori_loop(0, span, body, x))

        report(f"pallas={pallas} rng+apply floor", slope(mk_floor, x0))


if __name__ == "__main__":
    main()
