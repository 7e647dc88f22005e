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
