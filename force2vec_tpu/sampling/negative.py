"""Negative (repulsive) sample id generation, fully on device.

The reference draws uniform vertex ids with libc ``rand()`` per batch
(``randIndex(graph.rows-1, 0)`` → uniform over ``[0, n-2]``,
sample/algorithms.cpp:55-58, :577-586) in two flavors: a batch-shared buffer
of ``ns`` ids, or a per-vertex buffer of ``ns·BATCHSIZE`` ids from which
vertex *i* reads the overlapping window ``[i_local, i_local+ns)``
(AlgoForce2VecNSBS, sample/algorithms.cpp:686-733).  The walk variant
restricts the range to the first ``min((b+1)·BATCHSIZE, n-1)`` vertices
(sample/algorithms.cpp:1123-1132).

Here the ids come from counter-based ``jax.random`` (threefry) so the whole
training loop stays on device; parity with the C++ rand() stream is defined
at the level of injected samples (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_negative_ids(
    key: jax.Array,
    num_batches: int,
    batch_size: int,
    ns: int,
    n: int,
    per_vertex: bool = False,
    neg_range: str = "global",
) -> jnp.ndarray:
    """Draw negative vertex ids for every batch of one iteration.

    Returns [num_batches, M] int32 with M = ns (shared) or ns*batch_size
    (per-vertex).  Range matches the reference: [0, n-1) for 'global',
    [0, min((b+1)*B, n-1)) for 'prefix'.
    """
    m = ns * batch_size if per_vertex else ns
    hi = max(n - 1, 1)
    if neg_range == "global":
        return jax.random.randint(key, (num_batches, m), 0, hi, dtype=jnp.int32)
    if neg_range == "prefix":
        maxv = jnp.minimum(
            (jnp.arange(num_batches, dtype=jnp.int32) + 1) * batch_size, hi
        )
        raw = jax.random.randint(
            key, (num_batches, m), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        return raw % maxv[:, None]
    raise ValueError(f"unknown neg_range {neg_range!r}")


def per_vertex_windows(batch_size: int, ns: int) -> jnp.ndarray:
    """Index matrix [B, ns] mapping batch row i to its sample-buffer window
    [i, i+ns) — the reference's overlapping per-vertex slices
    (``nsamplebase = i - b*BATCHSIZE``, sample/algorithms.cpp:719-721)."""
    return (
        jnp.arange(batch_size, dtype=jnp.int32)[:, None]
        + jnp.arange(ns, dtype=jnp.int32)[None, :]
    )
