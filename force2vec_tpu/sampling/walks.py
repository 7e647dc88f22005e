"""Vectorized random-walk engine (the rForce2Vec sampler).

The reference generates, once per iteration and *serially*, a 5-step random
walk from every vertex (AlgoForce2VecNSRWEFF, sample/algorithms.cpp:1097-1118,
WALKLENGTH=5).  Here the walk frontier advances for all vertices at once:
each step is one uniform draw plus one gather, so an L-step walk over n
vertices is L fused gather rounds on device instead of n·L serial libc calls.

Divergence from the reference, by design: the reference's per-step neighbor
choice excludes a row's last edge when deg > 2 (``randIndex(rowptr[w+1]-1,
rowptr[w])`` never returns the final edge index) and indexes ``colids`` with
a *vertex* id when deg < 2 (sample/algorithms.cpp:1100-1113).  We sample
uniformly over all ``deg`` edges, take the single edge when deg == 1, and
stay in place when deg == 0.  Parity tests inject walks, so the sampler
itself is validated statistically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_walks(
    key: jax.Array,
    rowptr: jnp.ndarray,  # [n_pad+1] int32
    colids: jnp.ndarray,  # [nnz_pad] int32
    n_vertices: int,  # walks start from every (padded) vertex id
    walk_length: int = 5,
) -> jnp.ndarray:
    """Return [n_vertices, walk_length] int32 walk targets (step 1..L)."""
    start = jnp.arange(n_vertices, dtype=jnp.int32)

    def step(carry, step_key):
        w = carry  # [n]
        lo = rowptr[w]
        deg = rowptr[w + 1] - lo
        r = jax.random.randint(
            step_key, (n_vertices,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        eidx = lo + r % jnp.maximum(deg, 1)
        nxt = jnp.where(deg > 0, colids[eidx], w)
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, targets = jax.lax.scan(step, start, keys)
    return jnp.transpose(targets)  # [n, L]
