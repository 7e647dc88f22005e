"""Round-5 chip experiments: recovering the additive take↔sweep time.

VERDICT r4 #2: PERF.md §7.3 measured the per-group bulk takes and the
Pallas force sweep running ADDITIVELY (7% overlap).  This suite probes
every scheduling lever available on XLA:TPU for hiding one under the
other, plus the remaining additive reductions:

* pipe5 — program-order/pipelining variants over the same take+sweep
  workload: serial (shipping shape), all-takes-first, software-pipelined
  with optimization_barrier edges forcing take[g+1] to issue before
  sweep[g], and two interleaved chains.  If XLA:TPU's scheduler can
  overlap the gather engine's DMAs with the (VPU/MXU) sweep of the
  previous group, one of these shapes finds it.
* iterv5 — end-to-end sec/iter over {width scheme} x {Pallas tile} x
  {take group}: mult4 gathers 1.11x nnz vs mult8's 1.24x; with the MXU
  sweep (whose lane dim is D, indifferent to K sublane padding) the
  r4 reason for mult8 may be gone.

Methodology: slope between two fori_loop trip counts of one compiled
program (dispatch cancels); completion forced by a 4-byte fetch.
Run: python benchmarks/exp_r5.py pipe5|iterv5|...
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def report(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)
    with open(os.path.join(REPO, "benchmarks", "out", "exp_r5.jsonl"), "a") as f:
        f.write(json.dumps({"exp": name, **kw}) + "\n")


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


def _workload():
    """The bench graph's padded gather stream, cut into ~32 MB groups of
    K=16 ELL tiles — the §7.3 additive-overlap workload shape."""
    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    from force2vec_tpu.models.forces import get_model
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

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
    gmb = int(os.environ.get("PIPE5_GROUP_MB", "32"))
    rows_per_group = (gmb * 2**20 // (128 * 2) // k) * k
    m = (flat.size // rows_per_group) * rows_per_group
    flat = jnp.asarray(flat[:m])
    groups = m // rows_per_group
    t_rows = rows_per_group // k
    return jax, jnp, graph, model, x, flat, groups, rows_per_group, t_rows, k


def exp_pipe5():
    (jax, jnp, graph, model, x, flat, groups, rows_per_group, t_rows, k
     ) = _workload()
    from force2vec_tpu.ops.pallas_force import ell_force_mxu

    fence = _fence_fn(jax, jnp)
    n = graph.n
    xi0 = x[:t_rows]
    dg_full = jnp.full((t_rows,), k, dtype=jnp.int32)
    invd0 = jnp.zeros((t_rows,), dtype=x.dtype)
    step = jnp.float32(0.02)

    def take(xg, g, i):
        idx = jax.lax.dynamic_slice(
            flat, (g * rows_per_group,), (rows_per_group,))
        return jnp.take(xg, (idx + i) % n, axis=0)

    def sweep(tile, i):
        t = tile.reshape(t_rows, k, 128)
        return ell_force_mxu(model, xi0, t, dg_full, invd0,
                             step + 1e-12 * i)[0, 0]

    def make_serial(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + sweep(take(xg, g, i), i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def make_allfirst(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                tiles = [take(xg, g, i) for g in range(groups)]
                tiles = jax.lax.optimization_barrier(tiles)
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + sweep(tiles[g], i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def make_swpipe(loops):
        """take[g+1] issues before sweep[g] (barrier edge ties them)."""
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                cur = take(xg, 0, i)
                for g in range(groups):
                    if g + 1 < groups:
                        nxt = take(xg, g + 1, i)
                        nxt, cur = jax.lax.optimization_barrier((nxt, cur))
                    s = s + sweep(cur, i)
                    if g + 1 < groups:
                        cur = nxt
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def make_twochain(loops):
        """Even groups' takes chained ahead of odd groups' sweeps and vice
        versa — two independent streams for the scheduler to interleave."""
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                g = 0
                pend = []
                while g < groups or pend:
                    if g < groups:
                        pend.append(take(xg, g, i))
                        g += 1
                    if len(pend) >= 2 or g >= groups:
                        tile = pend.pop(0)
                        if pend:
                            out = jax.lax.optimization_barrier(
                                (pend[0], tile))
                            pend[0], tile = out
                        s = s + sweep(tile, i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    def make_take_only(loops):
        @jax.jit
        def run():
            xg = x.astype(jnp.bfloat16)

            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + take(xg, g, i)[0, 0].astype(jnp.float32)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return run

    tiles_arg = jax.jit(lambda xg: jnp.take(xg, flat, axis=0).reshape(
        groups, rows_per_group, 128))(x.astype(jnp.bfloat16))

    def make_sweep_only(loops):
        @jax.jit
        def run(tiles):
            def body(i, c):
                s = jnp.float32(0)
                for g in range(groups):
                    s = s + sweep(tiles[g], i)
                return c + s
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return lambda: run(tiles_arg)

    spans = (5, 25)
    base = {}
    for name, mk in [("take_only", make_take_only),
                     ("sweep_only", make_sweep_only),
                     ("serial", make_serial),
                     ("allfirst", make_allfirst),
                     ("swpipe", make_swpipe),
                     ("twochain", make_twochain)]:
        try:
            sec = slope_time(fence, mk, spans=spans, reps=2)
            base[name] = sec
            kw = {"ms": round(sec * 1e3, 3)}
            if name not in ("take_only", "sweep_only") and \
                    "take_only" in base and "sweep_only" in base:
                hid = base["take_only"] + base["sweep_only"] - sec
                kw["hidden_ms"] = round(hid * 1e3, 3)
                kw["overlap_frac"] = round(
                    hid / min(base["take_only"], base["sweep_only"]), 3)
            report("pipe5", variant=name, groups=groups,
                   rows=int(flat.shape[0]), **kw)
        except Exception as e:
            report("pipe5", variant=name,
                   error=f"{type(e).__name__}: {str(e)[:200]}")


def exp_iterv5():
    """End-to-end sec/iter: width scheme x Pallas tile bytes x group MB,
    MXU sweep on (the r4 default)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    import force2vec_tpu.ops.pallas_force as pf
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    schemes = os.environ.get("ITERV5_SCHEMES", "mult8,mult4").split(",")
    tiles = [int(v) for v in os.environ.get(
        "ITERV5_TILES", "2097152").split(",")]
    groups = [int(v) * 2**20 if v else None for v in os.environ.get(
        "ITERV5_GROUPS", "").split(",")] or [None]
    for sch, tb, gb in itertools.product(schemes, tiles, groups):
        pf._TILE_BYTES = tb
        try:
            fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128,
                               width_scheme=sch, take_group_bytes=gb)
            x = fv.init_embedding(seed=1)
            key = jax.random.PRNGKey(1)

            def make(loops, fv=fv, x=x, key=key):
                def run():
                    return fv._train_jit(fv._garr, x, key, loops, 0)
                return run

            sec = slope_time(fence, make, spans=(10, 60), reps=2)
            ups = graph.nnz + graph.n * cfg.ns
            report("iterv5", scheme=sch, tile_bytes=tb, group_bytes=gb,
                   padded_edges=fv.layout.padded_edges,
                   ms_per_iter=round(sec * 1e3, 3),
                   m_updates_per_s=round(ups / sec / 1e6, 1))
        except Exception as e:
            report("iterv5", scheme=sch, tile_bytes=tb, group_bytes=gb,
                   error=f"{type(e).__name__}: {str(e)[:200]}")
    pf._TILE_BYTES = int(os.environ.get("F2V_PALLAS_TILE_BYTES",
                                        512 * 1024))




def exp_walks5():
    """Decompose the rwalk iteration: the bench measured 94.9 ms/iter
    (13.8 M up/s, 4.4% of roofline) where tdist at the same graph runs
    7.4 ms.  Suspect: the per-iteration walk ENGINE (train/sync.py
    _ell_walks — a wl-step scan whose neighbor lookup where-chains over
    every bucket table), not the force sweep over walk targets."""
    import jax
    import jax.numpy as jnp

    from bench import synth_powerlaw_graph
    from force2vec_tpu.train.sync import SyncForce2Vec, _ell_walks
    from force2vec_tpu.train.trainer import TrainConfig

    fence = _fence_fn(jax, jnp)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="rwalk", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    key = jax.random.PRNGKey(1)
    n_pad = fv.layout.n_pad

    def make_walks_only(loops):
        @jax.jit
        def run():
            def body(i, c):
                w = _ell_walks(fv._garr, fv.layout,
                               jax.random.fold_in(key, i), cfg.walk_length)
                return c + w[0, 0]
            return jax.lax.fori_loop(0, loops, body, jnp.int32(0))
        return run

    x = fv.init_embedding(seed=1)
    negs = jax.random.randint(jax.random.PRNGKey(3),
                              (-(-n_pad // 256), 5), 0, graph.n - 1,
                              jnp.int32)
    walks0 = jax.random.randint(jax.random.PRNGKey(4), (n_pad, 5), 0,
                                graph.n, jnp.int32)

    def make_iter_injected(loops):
        @jax.jit
        def run():
            def body(i, xc):
                return fv._iteration(fv._garr, xc, negs, walks0,
                                     jnp.float32(0.02) + 1e-12 * i)
            return jax.lax.fori_loop(0, loops, body, x)
        return run

    def make_full(loops):
        def run():
            return fv._train_jit(fv._garr, x, key, loops, 0)
        return run

    for name, mk, spans in [("walks_only", make_walks_only, (3, 13)),
                            ("iter_injected_walks", make_iter_injected, (3, 13)),
                            ("full_train", make_full, (3, 13))]:
        try:
            sec = slope_time(fence, mk, spans=spans, reps=2)
            report("walks5", variant=name, ms=round(sec * 1e3, 3))
        except Exception as e:
            report("walks5", variant=name,
                   error=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "pipe5"
    globals()[f"exp_{which}"]()
