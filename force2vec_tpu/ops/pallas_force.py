"""Pallas TPU kernel: fused masked force + K-reduction over an ELL tile.

This is the framework's counterpart of the reference's hand-unrolled
AVX512 register kernels and its kgen generator (sample/algorithms.cpp:
1232-4051, sample/kgen/genDimFrc.base): one kernel *factory* specialized
per (force model, K, D, tile) — except the specialization is done by the
Mosaic compiler from the same jnp force formulas the rest of the framework
uses (models/forces.py), so kernel parity is by construction.

Why a kernel at all: the XLA path materializes the [C, K, D] intermediates
of the force chain (diff, a, f, mask-select) in HBM — several extra passes
over gigabytes per iteration.  Here each grid step loads one [T, K, D]
neighbor tile into VMEM once, evaluates the whole force chain on the VPU,
and writes only the [T, D] partial sums.

The neighbor gather itself stays an XLA `take` (measured row-count-bound
at ~300M rows/s on this chip; a per-row DMA gather in Pallas would be
issue-bound far below that), so the pipeline is: gather → fused sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from force2vec_tpu.models.forces import ForceModel

# VMEM budget per xj tile (bytes); tiles are [T, K, D] float32.  The force
# chain's temporaries (diff, per-edge scalars, masked product) cost several
# tile-sized VMEM buffers on top of the double-buffered input, so the tile
# itself must stay well under the 16 MB scoped-vmem limit.
_TILE_BYTES = 1024 * 1024


def _tile_rows(k: int, d: int) -> int:
    t = _TILE_BYTES // max(k * d * 4, 1)
    t = max(8, min(512, t))
    return (t // 8) * 8


def _kernel(model: ForceModel, kind: str, k: int,
            xi_ref, xj_ref, deg_ref, invd_ref, step_ref, out_ref):
    xi = xi_ref[:]              # [T, D]
    xj = xj_ref[:]              # [T, K, D]
    step = step_ref[0, 0]
    t = xi.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    # float mask (not bool): Mosaic only supports minor-dim broadcast
    # insertion for 32-bit types
    maskf = (k_iota < deg_ref[:]).astype(xi.dtype)  # [T, K]
    if kind == "edge":
        f = model.edge_force(
            xi[:, None, :], xj, invd_ref[:][:, :, None], step
        )
    else:
        f = model.sample_force(xi[:, None, :], xj, step)
    out_ref[:] = jnp.sum(f * maskf[:, :, None], axis=1)


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
    t = _tile_rows(k, d)
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
