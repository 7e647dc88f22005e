"""Multi-host plumbing tests on the virtual CPU mesh."""

import jax
import numpy as np

from force2vec_tpu.dist.multihost import initialize, is_coordinator, pod_mesh


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    initialize()  # must not raise or block


def test_pod_mesh_shape():
    mesh = pod_mesh(tp=2)
    assert mesh.shape["tp"] == 2
    assert mesh.shape["dp"] * 2 == len(jax.devices())
    assert is_coordinator()


def test_pod_mesh_runs_collective():
    mesh = pod_mesh(tp=1)
    out = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "dp"),
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("dp"),
            out_specs=jax.sharding.PartitionSpec(),
        )
    )(np.ones(len(jax.devices()), np.float32))
    assert float(np.asarray(out)[0]) == len(jax.devices())
