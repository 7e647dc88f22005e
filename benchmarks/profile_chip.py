"""On-chip microbenchmarks that decide the fused-kernel design.

Every candidate runs N steps inside ONE jitted fori_loop (carry-dependent,
so steps serialize and can't be DCE'd) — the remote-TPU tunnel makes
per-dispatch timing meaningless.  Large arrays are always jit ARGUMENTS,
never closure constants (a closure constant would be re-serialized through
the tunnel).

Run: python benchmarks/profile_chip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20


def timeit_loop(step_fn, init_carry, *arrays, steps=STEPS):
    """Time `steps` sequential applications of step_fn(i, carry, *arrays)
    inside one jit; arrays are jit args (device-resident, no re-upload)."""

    @jax.jit
    def run(c, *arrs):
        return jax.lax.fori_loop(
            0, steps, lambda i, cc: step_fn(i, cc, *arrs), c
        )

    c = run(init_carry, *arrays)  # compile + warmup
    np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    t0 = time.perf_counter()
    c = run(init_carry, *arrays)
    np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / steps


def main():
    from bench import synth_powerlaw_graph

    print(f"platform={jax.devices()[0]}", flush=True)
    n, d = 131072, 128
    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (n, d), dtype=jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    m = 3_000_000
    idx = jax.random.randint(jax.random.PRNGKey(1), (m,), 0, n, dtype=jnp.int32)

    # -- 2. force chain on pre-gathered input (tdist edge force) -----------
    c_, k = 131072, 16

    def chain(xi, xj, dg, step):
        diff = xi[:, None, :] - xj
        a = jnp.sum(diff * diff, axis=-1, keepdims=True)
        d1 = (-2.0 / (1.0 + a)).astype(xj.dtype)
        f = jnp.clip(d1 * diff, -5.0, 5.0) * step
        mask = jax.lax.broadcasted_iota(jnp.int32, (c_, k), 1) < dg[:, None]
        return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)

    xj32 = jnp.take(x32, idx[: c_ * k], axis=0).reshape(c_, k, d)
    dgf = jnp.full((c_,), k, dtype=jnp.int32)

    def chain_step32(i, c, xi, xj):
        out = chain(xi + c, xj, dgf, jnp.float32(0.02))
        return out[0, 0] * 1e-9

    t = timeit_loop(chain_step32, jnp.float32(0), x32[:c_], xj32)
    print(f"chain f32 : {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)

    xj16 = xj32.astype(jnp.bfloat16)

    def chain_step16(i, c, xi, xj):
        out = chain(xi + c, xj, dgf, jnp.bfloat16(0.02))
        return (out[0, 0] * 1e-9).astype(jnp.bfloat16)

    t = timeit_loop(chain_step16, jnp.bfloat16(0), x16[:c_], xj16)
    print(f"chain bf16: {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)

    # bf16 inputs, f32 math+accum (the quality-preserving candidate)
    def chain_mixed(i, c, xi, xj):
        out = chain(
            (xi.astype(jnp.float32) + c), xj.astype(jnp.float32), dgf,
            jnp.float32(0.02),
        )
        return out[0, 0] * 1e-9

    t = timeit_loop(chain_mixed, jnp.float32(0), x16[:c_], xj16)
    print(f"chain bf16-in f32-math: {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)

    # -- 2b. fused gather + chain ------------------------------------------
    def fused_step(i, c, x, ii):
        xj = jnp.take(x, (ii + c) % n, axis=0).reshape(c_, k, d)
        out = chain(x[:c_].astype(jnp.float32), xj.astype(jnp.float32), dgf,
                    jnp.float32(0.02))
        return c + out[0, 0].astype(jnp.int32) % 2

    t = timeit_loop(fused_step, jnp.int32(0), x32, idx[: c_ * k])
    print(f"fused gather+chain f32 : {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)
    t = timeit_loop(fused_step, jnp.int32(0), x16, idx[: c_ * k])
    print(f"fused gather+chain bf16: {c_*k/t/1e6:8.1f} M edges/s ({t*1e3:.2f} ms)", flush=True)

    # -- 3. current sync iteration ------------------------------------------
    from force2vec_tpu.train.sync import SyncForce2Vec
    from force2vec_tpu.train.trainer import TrainConfig

    graph = synth_powerlaw_graph()
    for gd in (None, "bfloat16"):
        cfg = TrainConfig(dim=128, model="tdist", ns=5, per_vertex_samples=True,
                          gather_dtype=gd)
        fv = SyncForce2Vec(graph, cfg, min_width=16, hub_width=128)
        x = fv.init_embedding(seed=1)
        negs = jax.random.randint(
            jax.random.PRNGKey(2), (fv.layout.n_pad, 5), 0, n, dtype=jnp.int32
        )

        def sync_step(i, xc, g, ng, fv=fv):
            return fv._iteration(g, xc, ng, None, jnp.float32(0.02))

        t = timeit_loop(sync_step, x, fv._garr, negs)
        ups = graph.nnz + graph.n * 5
        print(f"sync iteration gather_dtype={gd}: {t*1e3:.2f} ms = "
              f"{ups/t/1e6:.1f} M updates/s "
              f"(padded_edges={fv.layout.padded_edges})", flush=True)


if __name__ == "__main__":
    main()
