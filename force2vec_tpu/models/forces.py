"""The Force2Vec force-model family, as pure JAX edge/sample functions.

Each model is two pure functions over embedding rows plus declarative
metadata (init distribution, update rule, learning-rate schedule).  The
training loop broadcasts these over edge chunks and negative-sample blocks;
XLA fuses the elementwise math into the surrounding gather/matmul, which is
the TPU-native replacement for the reference's ~4K lines of hand-unrolled
AVX512 register kernels (sample/algorithms.cpp:1232-4051, sample/kgen/).

Model → reference map (option numbers are the CLI ``-option`` values,
Test/Force2Vec.cpp:129-188):

=============  ======  ==========================================================
model          option  reference method (sample/algorithms.cpp)
=============  ======  ==========================================================
tdist          5       AlgoForce2VecNS (:544-652), t-distribution + neg sampling
sigmoid        6       AlgoForce2VecNSRW (:778-932), sigmoid on dot products
rwalk          7       AlgoForce2VecNSRWEFF (:1063-1203), sigmoid over 5-step walks
fr             2       AlgoForce2VecFR (:155-247), Fruchterman-Reingold flavor
linlog         3       AlgoForce2VecLL (:249-341)
forceatlas     4       AlgoForce2VecFA (:60-153)
tdist_exact    1       AlgoForce2Vec (:344-445), O(n²) exact repulsion
=============  ======  ==========================================================
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

# Gradient clamp bound (reference MAXBOUND, sample/algorithms.h:42 and
# scale(), sample/algorithms.cpp:6-10).
MAXBOUND = 5.0

# Fast-sigmoid table parameters (sample/algorithms.h:43-49).
SM_TABLE_SIZE = 2048
SM_BOUND = 6.0
SM_RESOLUTION = SM_TABLE_SIZE / (2.0 * SM_BOUND)


def _clamp(x):
    return jnp.clip(x, -MAXBOUND, MAXBOUND)


def make_sm_table() -> jnp.ndarray:
    """Precomputed 2048-entry sigmoid table over [-6, 6]
    (init_SM_TABLE, sample/algorithms.cpp:755-763)."""
    i = jnp.arange(SM_TABLE_SIZE, dtype=jnp.float32)
    x = 2.0 * SM_BOUND * i / SM_TABLE_SIZE - SM_BOUND
    return jax.nn.sigmoid(x)


def table_sigmoid(v: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Table lookup σ̂(v) (fast_SM, sample/algorithms.cpp:765-770).  Exact
    sigmoid is cheap on the TPU VPU, so this exists only for bit-level
    parity experiments with the reference."""
    idx = ((v + SM_BOUND) * SM_RESOLUTION).astype(jnp.int32)
    idx = jnp.clip(idx, 0, SM_TABLE_SIZE - 1)
    looked = table[idx]
    return jnp.where(v > SM_BOUND, 1.0, jnp.where(v < -SM_BOUND, 0.0, looked))


# ---------------------------------------------------------------------------
# Edge (attraction) forces: (xi, xj, inv_deg_i, step) -> [.., D] contribution
# accumulated into the source row's batch-local update buffer.
#
# Every force needs one scalar per edge that is a sum over the embedding
# dimension (a squared distance or a dot product).  ``rsum`` performs that
# reduction; the default is a local lane reduction, while a tensor-parallel
# caller (dim sharded over a mesh axis) passes a psum-augmented reduction so
# the same force functions run unchanged under ``shard_map``.
# ---------------------------------------------------------------------------


def _local_rsum(v):
    return jnp.sum(v, axis=-1, keepdims=True)


def _tdist_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # d1 = -2/(1+||xi-xj||²); clamp(d1·diff)·STEP  (algorithms.cpp:598-612)
    diff = xi - xj
    a = rsum(diff * diff)
    d1 = -2.0 / (1.0 + a)
    return step * _clamp(d1 * diff)


def _tdist_exact_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # clamp(d1·diff) - clamp(d2·diff) with d2 = 2/(a(1+a))
    # (algorithms.cpp:378-395)
    diff = xi - xj
    a = rsum(diff * diff)
    d1 = -2.0 / (1.0 + a)
    d2 = 2.0 / (a * (1.0 + a))
    return step * (_clamp(d1 * diff) - _clamp(d2 * diff))


def _sigmoid_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # STEP · degi · (1-σ(xi·xj)) · xj with degi = 1/(deg_i+1)
    # (algorithms.cpp:854-868)
    a = rsum(xi * xj)
    return step * inv_deg * (1.0 - jax.nn.sigmoid(a)) * xj


def _fr_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # diff = xj - xi; w = a + 1/a if a>0 else 0  (algorithms.cpp:196-211)
    diff = xj - xi
    a = rsum(diff * diff)
    w = jnp.where(a > 0.0, a + 1.0 / jnp.where(a > 0.0, a, 1.0), 0.0)
    return w * diff


def _linlog_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # w = log2(1 + sqrt(a))  (algorithms.cpp:290-303)
    diff = xj - xi
    a = rsum(diff * diff)
    w = jnp.log2(1.0 + jnp.sqrt(a))
    return w * diff


def _forceatlas_edge(xi, xj, inv_deg, step, rsum=_local_rsum):
    # w = sqrt(a) + 1/a if a>0 else 0  (algorithms.cpp:101-115)
    diff = xj - xi
    a = rsum(diff * diff)
    safe = jnp.where(a > 0.0, a, 1.0)
    w = jnp.where(a > 0.0, jnp.sqrt(safe) + 1.0 / safe, 0.0)
    return w * diff


# ---------------------------------------------------------------------------
# Sample (repulsion) forces: (xi, s, step) -> [.., D] contribution.
# ---------------------------------------------------------------------------


def _tdist_rep(xi, s, step, rsum=_local_rsum):
    # d1 = 2/(r(1+r)); STEP·clamp(d1·diff)  (algorithms.cpp:614-627).
    # The reference computes d1 unguarded; it is compiled with -ffast-math
    # (Makefile:10), so a sample coinciding with the vertex (r = 0, which
    # happens whenever a negative sample hits a batch vertex) yields no NaN
    # in practice.  We make the same outcome explicit: the force at r = 0 is
    # directionless, so its contribution is zero.
    diff = xi - s
    r = rsum(diff * diff)
    d1 = jnp.where(r > 0.0, 2.0 / jnp.where(r > 0.0, r * (1.0 + r), 1.0), 0.0)
    return step * _clamp(d1 * diff)


def _sigmoid_rep(xi, s, step, rsum=_local_rsum):
    # -STEP·σ(xi·s)·s  (algorithms.cpp:898-911)
    r = rsum(xi * s)
    return -step * jax.nn.sigmoid(r) * s


def _layout_rep(xi, s, step, rsum=_local_rsum):
    # diff = s - xi; -(1/r)·diff, guarded r>0  (algorithms.cpp:117-128)
    diff = s - xi
    r = rsum(diff * diff)
    inv = jnp.where(r > 0.0, 1.0 / jnp.where(r > 0.0, r, 1.0), 0.0)
    return -inv * diff


@dataclasses.dataclass(frozen=True)
class ForceModel:
    """Declarative description of one Force2Vec variant."""

    name: str
    edge_force: Callable  # (xi, xj, inv_deg_i, step) -> [.., D]
    sample_force: Callable  # (xi, s, step) -> [.., D]
    init: str  # 'uniform01' (randInit) | 'symmetric' (randInitF)
    update: str  # 'add' | 'energy'
    lr_schedule: str  # 'constant' | 'decay999'
    default_lr: float  # STEP at iteration 0
    uses_degree: bool = False
    attraction: str = "csr"  # 'csr' | 'walk'
    repulsion: str = "sampled"  # 'sampled' | 'all'
    neg_range: str = "global"  # 'global': [0, n-1) | 'prefix': [0, min((b+1)B, n-1))


FORCE_MODELS = {
    "tdist": ForceModel(
        name="tdist",
        edge_force=_tdist_edge,
        sample_force=_tdist_rep,
        init="symmetric",
        update="add",
        lr_schedule="constant",
        default_lr=0.02,
    ),
    "sigmoid": ForceModel(
        name="sigmoid",
        edge_force=_sigmoid_edge,
        sample_force=_sigmoid_rep,
        init="uniform01",
        update="add",  # reference seeds prev with X then replaces — identical to +=
        lr_schedule="constant",
        default_lr=0.02,
        uses_degree=True,
    ),
    "rwalk": ForceModel(
        name="rwalk",
        edge_force=_sigmoid_edge,
        sample_force=_sigmoid_rep,
        init="uniform01",
        update="add",
        lr_schedule="constant",
        default_lr=0.02,
        uses_degree=True,
        attraction="walk",
        neg_range="prefix",
    ),
    "fr": ForceModel(
        name="fr",
        edge_force=_fr_edge,
        sample_force=_layout_rep,
        init="symmetric",
        update="energy",
        lr_schedule="decay999",
        default_lr=1.0,
    ),
    "linlog": ForceModel(
        name="linlog",
        edge_force=_linlog_edge,
        sample_force=_layout_rep,
        init="symmetric",
        update="energy",
        lr_schedule="decay999",
        default_lr=1.0,
    ),
    "forceatlas": ForceModel(
        name="forceatlas",
        edge_force=_forceatlas_edge,
        sample_force=_layout_rep,
        init="symmetric",
        update="energy",
        lr_schedule="decay999",
        default_lr=1.0,
    ),
    "tdist_exact": ForceModel(
        name="tdist_exact",
        edge_force=_tdist_exact_edge,
        sample_force=_tdist_rep,
        init="symmetric",
        update="add",
        lr_schedule="decay999",
        default_lr=1.0,
        repulsion="all",
    ),
}

# CLI option-number compatibility (Test/Force2Vec.cpp:129-188). Options
# 8-11 are the reference's AVX512 builds of 5/6/7 — on TPU they are the
# same models (the Pallas/XLA kernels replace the intrinsics), so they
# alias their scalar twins.
OPTION_TO_MODEL = {
    1: "tdist_exact",
    2: "fr",
    3: "linlog",
    4: "forceatlas",
    5: "tdist",
    6: "sigmoid",
    7: "rwalk",
    8: "tdist",
    9: "sigmoid",
    10: "rwalk",
    11: "tdist",
}


def get_model(name_or_option) -> ForceModel:
    """Look up a model by name or by reference CLI option number."""
    if isinstance(name_or_option, int):
        name_or_option = OPTION_TO_MODEL[name_or_option]
    return FORCE_MODELS[name_or_option]
