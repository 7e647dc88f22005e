"""Pallas fused force kernel parity vs the plain-jnp path (interpret mode
on CPU; the TPU build is exercised by bench.py on hardware)."""

import numpy as np
import pytest
import jax.numpy as jnp

from force2vec_tpu.models.forces import get_model
from force2vec_tpu.ops.pallas_force import ell_force

C, K, D = 64, 8, 16


def _jnp_reference(model, kind, xi, xj, deg, invd, step):
    if kind == "edge":
        f = model.edge_force(xi[:, None, :], xj, invd[:, None, None], step)
    else:
        f = model.sample_force(xi[:, None, :], xj, step)
    mask = jnp.arange(K, dtype=jnp.int32)[None, :] < deg[:, None]
    return jnp.sum(jnp.where(mask[:, :, None], f, 0), axis=1)


@pytest.mark.parametrize("name", ["tdist", "sigmoid", "fr", "linlog", "forceatlas"])
@pytest.mark.parametrize("kind", ["edge", "sample"])
def test_pallas_kernel_matches_jnp(name, kind):
    model = get_model(name)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((C, K, D)), jnp.float32)
    deg = jnp.asarray(rng.integers(0, K + 1, C), jnp.int32)
    invd = jnp.asarray(1.0 / (rng.integers(1, 20, C)), jnp.float32)
    step = 0.02

    want = _jnp_reference(model, kind, xi, xj, deg, invd, step)
    got = ell_force(model, kind, xi, xj, deg, invd, step, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_kernel_zero_deg_rows():
    """Rows with no valid neighbors contribute exactly zero."""
    model = get_model("tdist")
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((C, K, D)), jnp.float32)
    deg = jnp.zeros(C, jnp.int32)
    invd = jnp.ones(C, jnp.float32)
    got = ell_force(model, "edge", xi, xj, deg, invd, 0.02, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


@pytest.mark.parametrize("name", ["tdist", "sigmoid"])
@pytest.mark.parametrize("c,group", [(512, 128), (400, 128), (256, 256)])
def test_grouped_rep_force_matches_jnp(name, c, group):
    """grouped_rep_force (in-VMEM group expand) == expanded jnp chain,
    including a non-tile-multiple row count (partial final block)."""
    from force2vec_tpu.ops.pallas_force import grouped_rep_force, rep_tile_rows

    assert rep_tile_rows(group) > 0
    model = get_model(name)
    ns = 5
    ng = -(-c // group)
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.standard_normal((c, D)), jnp.float32)
    sg = jnp.asarray(rng.standard_normal((ng, ns, D)), jnp.bfloat16)
    step = 0.02

    gid = np.arange(c) // group
    s = jnp.take(sg, jnp.asarray(gid, jnp.int32), axis=0).astype(jnp.float32)
    want = jnp.sum(model.sample_force(xi[:, None, :], s, step), axis=1)
    got = grouped_rep_force(model, group, xi, sg, step, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_rep_tile_rows():
    from force2vec_tpu.ops.pallas_force import rep_tile_rows

    assert rep_tile_rows(256) == 256
    assert rep_tile_rows(384) == 192
    assert rep_tile_rows(512) == 256
    assert rep_tile_rows(8) == 8
    assert rep_tile_rows(7) == 0  # no multiple-of-8 divisor


@pytest.mark.parametrize("name", ["tdist", "sigmoid", "fr", "linlog", "forceatlas"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_mxu_edge_kernel_matches_jnp(name, dtype):
    """The separable MXU edge sweep (dots/norms/aggregation as matmuls)
    equals the elementwise jnp path at the same input precision."""
    from force2vec_tpu.ops.pallas_force import ell_force_mxu

    model = get_model(name)
    assert model.edge_coeff is not None
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((C, K, D)), jnp.float32).astype(dtype)
    deg = jnp.asarray(rng.integers(0, K + 1, C), jnp.int32)
    invd = jnp.asarray(1.0 / (rng.integers(1, 20, C)), jnp.float32)
    step = 0.02

    want = _jnp_reference(
        model, "edge", xi, xj.astype(jnp.float32), deg, invd, step
    )
    got = ell_force_mxu(model, xi, xj, deg, invd, step, interpret=True)
    # norm-form a vs diff-form a differ by f32 rounding; coefficients with
    # a 1/a term (fr, forceatlas) amplify that near a→0
    tol = 2e-4 if dtype == "float32" else 6e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_mxu_edge_kernel_zero_deg_rows():
    from force2vec_tpu.ops.pallas_force import ell_force_mxu

    model = get_model("tdist")
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((C, K, D)), jnp.float32)
    got = ell_force_mxu(model, xi, xj, jnp.zeros(C, jnp.int32),
                        jnp.ones(C, jnp.float32), 0.02, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)
