"""Phase breakdown of the EXACT bench.py iteration (sync schedule, grouped
negatives, bf16 gather replica, Pallas on).

Two traps this harness avoids:
* the remote-TPU tunnel transfers ~40 MB/s, so fetching the [n_pad, 128]
  result costs ~1.7 s — completion is forced by fetching a 1-element
  DEVICE-SIDE slice instead;
* loop-invariant gathers get hoisted out of fori_loop — every probe's
  gather indices depend on the loop counter (cheap index rotation).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 30


def fetch1(arr):
    """Force completion with a 4-byte transfer (device-side slice)."""
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(arr))


def timeit_loop(step_fn, init_carry, *arrays, steps=STEPS):
    @jax.jit
    def run(c, *arrs):
        return jax.lax.fori_loop(0, steps, lambda i, cc: step_fn(i, cc, *arrs), c)

    c = run(init_carry, *arrays)
    fetch1(jax.tree_util.tree_leaves(c)[0])
    t0 = time.perf_counter()
    c = run(init_carry, *arrays)
    fetch1(jax.tree_util.tree_leaves(c)[0])
    return (time.perf_counter() - t0) / steps


def main():
    from bench import synth_powerlaw_graph
    from force2vec_tpu.ops.pallas_force import ell_force
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    print(f"platform={jax.devices()[0]}", flush=True)
    graph = synth_powerlaw_graph()
    cfg = TrainConfig(dim=128, model="tdist", ns=5, batch_size=256,
                      gather_dtype="bfloat16")
    fv = SyncForce2Vec(graph, cfg, min_width=8, hub_width=128)
    lay = fv.layout
    dim = cfg.dim
    model = fv.model
    n = graph.n
    x = fv.init_embedding(seed=1)
    ng = -(-lay.n_pad // cfg.batch_size)
    negs = jax.random.randint(jax.random.PRNGKey(2), (ng, 5), 0, n, jnp.int32)
    print(f"n_pad={lay.n_pad} padded_edges={lay.padded_edges} "
          f"nnz={graph.nnz}", flush=True)

    # 0. full train step via the real dispatcher (4-byte completion fetch)
    key = jax.random.PRNGKey(1)
    xx = fv._train_jit(fv._garr, x, key, STEPS, 0)
    fetch1(xx)
    t0 = time.perf_counter()
    xx = fv._train_jit(fv._garr, x, key, STEPS, STEPS)
    fetch1(xx)
    t_full = (time.perf_counter() - t0) / STEPS
    ups = (graph.nnz + n * cfg.ns) / t_full / 1e6
    print(f"FULL iteration:            {t_full*1e3:7.2f} ms  ({ups:.0f} M updates/s)",
          flush=True)

    def jnp_force(kind, xi, xj, dg, invd, step):
        xj = xj.astype(xi.dtype)
        k = xj.shape[1]
        if kind == "edge":
            f = model.edge_force(xi[:, None, :], xj, invd[:, None, None], step)
        else:
            f = model.sample_force(xi[:, None, :], xj, step)
        mask = jnp.arange(k, dtype=jnp.int32)[None, :] < dg[:, None]
        return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

    # empty loop: fixed per-step cost floor
    def estep(i, c):
        return c + jnp.float32(i) * 1e-12
    t_floor = timeit_loop(estep, jnp.float32(0))
    print(f"empty step floor:          {t_floor*1e3:7.2f} ms", flush=True)

    # 1. bf16 replica alone (carry-dependent input)
    def astep(i, c, xx):
        xg = (xx + c * 1e-30).astype(jnp.bfloat16)
        return c + xg[0, 0].astype(jnp.float32) * 1e-30
    print(f"xg=astype(bf16):           {timeit_loop(astep, jnp.float32(0), x)*1e3:7.2f} ms",
          flush=True)

    # 2. per-bucket gather-only / gather+pallas (loop-dependent indices)
    tot_g, tot_p = 0.0, 0.0
    for bi, b in enumerate(lay.buckets):
        def gstep(i, c, g, xg, bi=bi, b=b):
            nbr = (g[f"nbr{bi}"].reshape(-1) + i) % jnp.int32(n)
            xj = jnp.take(xg, nbr, axis=0)
            return c + xj[0].astype(jnp.float32)[0] * 1e-30

        def pstep(i, c, g, xg, xx, bi=bi, b=b):
            nbr = (g[f"nbr{bi}"].reshape(-1) + i) % jnp.int32(n)
            dg_ = g[f"deg{bi}"]
            if b.owners is not None:
                xi = jnp.take(xx, g[f"own{bi}"] + jnp.int32(b.start), axis=0)
                invd = jnp.take(g["inv_deg"], g[f"own{bi}"] + jnp.int32(b.start))
            else:
                xi = jax.lax.dynamic_slice(xx, (b.start, 0), (b.count, dim))
                invd = jax.lax.dynamic_slice(g["inv_deg"], (b.start,), (b.count,))
            xj = jnp.take(xg, nbr, axis=0).reshape(b.count, b.width, dim)
            part = ell_force(model, "edge", xi, xj, dg_, invd, jnp.float32(0.02))
            return c + part[0, 0] * 1e-30

        xg = x.astype(jnp.bfloat16)
        tg = timeit_loop(gstep, jnp.float32(0), fv._garr, xg)
        tp = timeit_loop(pstep, jnp.float32(0), fv._garr, xg, x)
        tot_g += tg
        tot_p += tp
        print(f"bucket {bi} w={b.width:4d} count={b.count:6d} rows={b.count*b.width:8d}: "
              f"gather {tg*1e3:6.2f} ms ({b.count*b.width/max(tg,1e-9)/1e6:6.0f} M rows/s)  "
              f"gather+pallas {tp*1e3:6.2f} ms", flush=True)
    print(f"all buckets: gather-only {tot_g*1e3:.2f} ms, gather+pallas {tot_p*1e3:.2f} ms",
          flush=True)

    # 3. repulsion (grouped, jnp chain — the bench path)
    def rstep(i, c, xx, ng_):
        xg = (xx + c * 1e-30).astype(jnp.bfloat16)
        sg = jnp.take(xg, (ng_.reshape(-1) + i) % jnp.int32(n), axis=0)
        sg = sg.reshape(ng_.shape[0], 5, dim)
        gid = jnp.arange(lay.n_pad, dtype=jnp.int32) // jnp.int32(256)
        s = jnp.take(sg, gid, axis=0)
        full = jnp.full((lay.n_pad,), 5, dtype=jnp.int32)
        invd0 = jnp.zeros((lay.n_pad,), dtype=xx.dtype)
        part = jnp_force("sample", xx, s, full, invd0, jnp.float32(0.02))
        return c + part[0, 0] * 1e-30
    print(f"repulsion grouped (jnp):   {timeit_loop(rstep, jnp.float32(0), x, negs)*1e3:7.2f} ms",
          flush=True)

    # 4. RNG draw (negatives only; tdist has no walks)
    def nstep(i, c, k):
        kit = jax.random.fold_in(k, i + c)
        nkey = jax.random.fold_in(kit, 0)
        d = jax.random.randint(nkey, (ng, 5), 0, n - 1, jnp.int32)
        return c + d[0, 0] * 0
    print(f"RNG draw [{ng},5]:          {timeit_loop(nstep, jnp.int32(0), key)*1e3:7.2f} ms",
          flush=True)

    # 5. apply: x += upd (carry-dependent elementwise add)
    upd = jnp.full_like(x, 1e-30)
    def ustep(i, c, u):
        return c + u
    print(f"apply x+=upd:              {timeit_loop(ustep, x, upd)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
