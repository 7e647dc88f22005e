"""Multi-device / multi-host execution (mesh, shard_map step, partitioning).

``sharded`` is loaded lazily: it imports the trainer, which itself imports
``dist.spmd``, and an eager import here would close that cycle.
"""

from force2vec_tpu.dist.spmd import SpmdAxes

__all__ = [
    "ShardedForce2Vec",
    "make_mesh",
    "SpmdAxes",
    "VertexShardedForce2Vec",
    "make_vp_mesh",
]


def __getattr__(name):
    if name in ("ShardedForce2Vec", "make_mesh"):
        from force2vec_tpu.dist import sharded

        return getattr(sharded, name)
    if name in ("VertexShardedForce2Vec", "make_vp_mesh"):
        from force2vec_tpu.dist import vertex_sharded

        return getattr(vertex_sharded, name)
    raise AttributeError(name)
