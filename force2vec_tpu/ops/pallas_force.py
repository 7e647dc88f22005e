"""Pallas TPU kernel: fused masked force + K-reduction over an ELL tile.

This is the framework's counterpart of the reference's hand-unrolled
AVX512 register kernels and its kgen generator (sample/algorithms.cpp:
1232-4051, sample/kgen/genDimFrc.base): one kernel *factory* specialized
per (force model, K, D, tile) — except the specialization is done by the
Mosaic compiler from the same jnp force formulas the rest of the framework
uses (models/forces.py), so kernel parity is by construction.

Why a kernel at all (v5e measurements, loop-in-jit harness): XLA fuses the
neighbor gather INTO the force chain, and that fused loop issues its random
row reads on a slow path (~188 M rows/s at K=16).  A STANDALONE bulk
``take`` keeps XLA's fast gather engine (~310 M rows/s materializing), and
this kernel — opaque to fusion, so the take stays standalone — streams the
materialized [C, K, D] tile through VMEM exactly once, evaluating the whole
chain on the VPU with f32 math over the bf16 gather replica.  Net:
take+kernel ≈ 227 M rows/s vs 188 M for the best pure-XLA form.  The
pipeline is: bulk gather → fused Pallas sweep.

A per-row DMA gather inside the kernel was considered and rejected: DMA
descriptors issue from the scalar core at ~10 M/s, 30x below XLA's bulk
gather engine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from force2vec_tpu.models.forces import ForceModel

# VMEM budget per xj tile (bytes).  The force chain's temporaries (diff,
# per-edge scalars, masked product) cost several f32 tile-sized VMEM
# buffers on top of the double-buffered input, so the tile itself must stay
# well under the 16 MB scoped-vmem limit.  Sized against the f32 temporary
# footprint with the K axis rounded up to the 8-sublane tile (non-multiple
# K widths such as 12/20/28 are padded by Mosaic).
import os as _os

_TILE_BYTES = int(_os.environ.get("F2V_PALLAS_TILE_BYTES", 512 * 1024))
# The MXU sweep kernel runs lighter on VMEM temporaries than the
# elementwise kernel (its per-pair scalars live in [G, 8, W] blocks, not
# [T, K, D] vectors) and starves at the 512 KB tile: the r5 chip scan
# (PERF.md §8.2, benchmarks/exp_r5.py iterv5) measured the bench config
# at 6.6-7.2 ms/iter with 2 MB tiles vs 8.0 ms at 512 KB.
_TILE_BYTES_MXU = int(_os.environ.get("F2V_PALLAS_TILE_BYTES_MXU",
                                      2 * 1024 * 1024))


def _tile_rows(k: int, d: int, itemsize: int,
               tile_bytes: Optional[int] = None) -> int:
    k_pad = -(-k // 8) * 8  # sublane-rounded K as Mosaic lays it out
    t = (tile_bytes or _TILE_BYTES) // max(k_pad * d * 4, 1)
    t = max(8, min(1024, t))
    return (t // 8) * 8


def _kernel(model: ForceModel, kind: str, k: int,
            xi_ref, xj_ref, deg_ref, invd_ref, step_ref, out_ref):
    xi = xi_ref[:]              # [T, D]
    xj = xj_ref[:].astype(xi.dtype)  # [T, K, D] (bf16 gather replica ok)
    step = step_ref[0, 0]
    t = xi.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    # mask applied to the per-pair SCALAR coefficient inside the force
    # formula ([T, K, 1] vs the former [T, K, D] vector mask — 1/D the
    # VPU work, exactly-zero padded slots either way).  Float (not bool):
    # Mosaic only supports minor-dim broadcast insertion for 32-bit types,
    # so _mask1 multiplies by the 0/1 mask.
    mask = (k_iota < deg_ref[:]).astype(xi.dtype)[:, :, None]  # [T, K, 1]
    if kind == "edge":
        f = model.edge_force(
            xi[:, None, :], xj, invd_ref[:][:, :, None], step, mask=mask
        )
    else:
        f = model.sample_force(xi[:, None, :], xj, step, mask=mask)
    out_ref[:] = jnp.sum(f, axis=1)


def _rep_grouped_kernel(model: ForceModel, xi_ref, sg_ref, step_ref, out_ref):
    xi = xi_ref[:]                       # [T, D]
    s = sg_ref[0].astype(xi.dtype)       # [ns, D] — this tile's group samples
    step = step_ref[0, 0]
    f = model.sample_force(xi[:, None, :], s[None, :, :], step)  # [T, ns, D]
    out_ref[:] = jnp.sum(f, axis=1)


def rep_tile_rows(group: int, cap: int = 256) -> int:
    """Largest tile T ≤ cap with T | group and 8 | T (so every Pallas tile
    lies inside exactly one negative-sample group), or 0 if none exists."""
    t = min(group, cap)
    while t >= 8 and group % t:
        t -= 8
    return t if t >= 8 and group % t == 0 and t % 8 == 0 else 0


@functools.partial(jax.jit, static_argnames=("model", "group", "interpret"))
def grouped_rep_force(model: ForceModel, group: int, xi, sg, step,
                      interpret: bool = False):
    """Grouped-negative repulsion with the group expand kept in VMEM.

    xi [C, D] — embedding rows (row r belongs to group r // group);
    sg [ng, ns, D] — per-group negative-sample rows (already gathered; tiny).
    Returns [C, D] = Σ_ns sample_force(xi, sg[row // group]).

    The pure-jnp path materializes the [C, ns, D] group expand in HBM
    (~3 tile-sized f32 temporaries); here each Pallas tile reads its ONE
    [ns, D] sample block via the BlockSpec index map (tile size divides the
    group size, so a tile never crosses a group boundary) and the expand
    never leaves VMEM.  Requires xi row 0 to be group-aligned (single-shard
    repulsion; the dp>1 path keeps the jnp chain).
    """
    c, d = xi.shape
    ng, ns, _ = sg.shape
    t = rep_tile_rows(group)
    assert t, f"no Pallas tile divides group={group}"
    grid = (pl.cdiv(c, t),)
    step_arr = jnp.asarray(step, dtype=xi.dtype).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_rep_grouped_kernel, model),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, d), lambda i: (i * t // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d), xi.dtype),
        interpret=interpret,
    )(xi, sg, step_arr)


def _mxu_kernel(model: ForceModel, k: int, r: int,
                xi_ref, xj_ref, deg_ref, invd_ref, bd_ref, smod_ref,
                step_ref, out_ref):
    """Separable edge sweep: dots + norms + aggregation on the MXU.

    Exploits force = coeff(a) ⊗ vec (forces.py): per 8-row group the
    [8, 8K] all-pairs dot block and the Σ coeff·xj aggregation are batched
    matmuls, and for dist2 models the ||x̃j||² norms come from a
    matmul-by-ones over the f32 squares — the per-slot LANE REDUCTION that
    dominates the elementwise kernel's VPU time disappears entirely.

    Exactness: with both sides evaluated at the bf16 gather replica x̃,
    a = ‖x̃i‖² + ‖x̃j‖² − 2·x̃i·x̃j equals ‖x̃i − x̃j‖² up to f32 rounding
    (bf16 products are exact in f32, MXU accumulates f32), so the dist2
    path introduces no cancellation error beyond the replica rounding the
    elementwise kernel already has."""
    t = xi_ref.shape[0]
    d = xi_ref.shape[1]
    g = t // r
    w = r * k
    xi = xi_ref[:]                     # [T, D] f32
    xj = xj_ref[:]                     # [T, K, D] (bf16 replica or f32)
    step = step_ref[0, 0]
    xif = xi
    xir = xif.reshape(g, r, d)
    xjr = xj.reshape(g, w, d)
    xjf = xjr.astype(jnp.float32)
    if model.a_kind == "dist2":
        # f32 dots (xi stays f32 — the dist2 coefficients scale with a
        # itself, so bf16-rounding xi would shift the force ~0.5% where the
        # elementwise path would not); with f32 squares for ‖x̃j‖² the
        # norm-form a equals ‖xi − x̃j‖² to f32 rounding.  bf16 dots were
        # chip-tested in r5 and change NOTHING (373.3 vs 372.4 M up/s) —
        # the sweep is not dot-bound (PERF.md §8.2).
        dots = jax.lax.dot_general(
            xir, xjf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, 8, W]
        ones = jnp.ones((d, 1), dtype=jnp.float32)
        nj = jax.lax.dot_general(
            xjf * xjf, ones, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, 1, w)  # [G, 1, W] — Σ_d x̃j² exactly (f32 squares)
        ni = jnp.sum(xif * xif, axis=-1).reshape(g, r, 1)  # tiny: T rows
        a = ni + nj - 2.0 * dots
    else:
        # dot-product models: σ/centered coeffs tolerate the bf16 dots
        # (native MXU rate); xi·x̃j at bf16(xi) matches the replica rounding
        a = jax.lax.dot_general(
            xir.astype(xjr.dtype), xjr, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    invd = invd_ref[:].reshape(g, r, 1)
    coeff = model.edge_coeff(a, invd, step)  # [G, 8, W]
    # mask: slot s belongs to row s//K (static block-diagonal, passed in)
    # AND is a real neighbor ((s mod K) < deg of that row)
    degr = deg_ref[:].reshape(g, r, 1)
    valid = (smod_ref[:][None] < degr).astype(coeff.dtype)  # [G, 8, W]
    cm = coeff * (bd_ref[:][None] * valid)
    # aggregation in f32 (cm is f32; 3-pass bf16 decomposition on the MXU
    # is still trivial next to the gather) so coefficient rounding does not
    # leak into the force sum
    agg = jax.lax.dot_general(
        cm, xjf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, 8, D]
    if model.edge_vec == "xj":
        out = agg
    else:
        csum = jnp.sum(cm, axis=2, keepdims=True)  # [G, 8, 1]
        if model.edge_vec == "xi_minus_xj":
            out = xif.reshape(g, r, d) * csum - agg
        else:  # 'xj_minus_xi'
            out = agg - xif.reshape(g, r, d) * csum
    out_ref[:] = out.reshape(t, d).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("model", "interpret",
                                              "group_rows", "tile_bytes"))
def ell_force_mxu(model: ForceModel, xi, xj, deg, invd, step,
                  interpret: bool = False, group_rows: int = 8,
                  tile_bytes: Optional[int] = None):
    """MXU-path masked edge-force sum over an ELL bucket (same contract as
    :func:`ell_force` with kind='edge'); requires ``model.edge_coeff``.

    ``group_rows`` (R) trades MXU matmul height against block-diagonal
    waste: the dots/aggregation matmuls have M = R (array utilization
    R/128) but compute R× the needed pairs.
    """
    c, k, d = xj.shape
    r = group_rows
    t = _tile_rows(k, d, xj.dtype.itemsize,
                   tile_bytes=tile_bytes or _TILE_BYTES_MXU)
    # whole R-row groups per tile
    t = max(r, (t // r) * r)
    grid = (pl.cdiv(c, t),)
    step_arr = jnp.asarray(step, dtype=xi.dtype).reshape(1, 1)
    import numpy as np

    w = r * k
    s_iota = np.arange(w, dtype=np.int64)
    bd = (s_iota[None, :] // k == np.arange(r)[:, None]).astype(np.float32)
    smod = (s_iota % k).astype(np.int32)[None, :].repeat(r, axis=0)
    return pl.pallas_call(
        functools.partial(_mxu_kernel, model, k, r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d), xi.dtype),
        interpret=interpret,
    )(xi, xj, deg[:, None], invd[:, None], jnp.asarray(bd),
      jnp.asarray(smod), step_arr)


@functools.partial(
    jax.jit, static_argnames=("model", "kind", "interpret")
)
def ell_force(model: ForceModel, kind: str, xi, xj, deg, invd, step,
              interpret: bool = False):
    """Masked force sum over an ELL bucket.

    xi [C, D]; xj [C, K, D]; deg [C] int32 (valid neighbors per row);
    invd [C] float (1/(deg+1), used by the sigmoid family); step scalar.
    kind: 'edge' (attraction) or 'sample' (repulsion).  Returns [C, D].
    """
    c, k, d = xj.shape
    t = _tile_rows(k, d, xj.dtype.itemsize)
    grid = (pl.cdiv(c, t),)
    step_arr = jnp.asarray(step, dtype=xi.dtype).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_kernel, model, kind, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d), xi.dtype),
        interpret=interpret,
    )(xi, xj, deg[:, None], invd[:, None], step_arr)
