"""Graph containers, IO and device layouts."""

from force2vec_tpu.graphs.csr import Graph, DeviceGraph
from force2vec_tpu.graphs.io import (
    load_graph,
    read_mtx,
    read_edgelist,
    read_binary_csr,
    read_embeddings,
    write_embeddings,
)

__all__ = [
    "Graph",
    "DeviceGraph",
    "load_graph",
    "read_mtx",
    "read_edgelist",
    "read_binary_csr",
    "read_embeddings",
    "write_embeddings",
]
