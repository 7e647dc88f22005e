"""Multi-host bootstrap and cross-host meshes.

The reference is strictly single-process (SURVEY.md §2.5); this module is
the from-scratch scale-out story.  One process per host, each seeing its
local TPU chips; ``initialize()`` wires them into one JAX runtime
(``jax.distributed``), after which every array/collective in dist/sharded
spans the full pod slice transparently — dp/tp collectives ride ICI
within a slice and DCN across slices, chosen by XLA from the mesh layout.

Design note (BASELINE.json north star): for graphs whose embedding table
exceeds one host's HBM, the next step is an edge-partitioned mode — X
sharded by vertex over dp, per-iteration boundary-row exchange via
``ragged_all_to_all`` overlapping the local ELL sweep.  The hooks here
(mesh construction, host-local slicing helpers) are laid out for that;
the replicated-X sync/batch runners are what current hardware in this
environment can exercise (single chip + virtual CPU meshes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap this process into a multi-host JAX runtime.

    With no arguments, reads the standard env vars (JAX_COORDINATOR_ADDRESS
    / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the TPU-pod metadata that
    ``jax.distributed.initialize`` discovers natively on Cloud TPU.  Safe
    to call when single-process (no coordinator configured): it no-ops.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_pod = os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "", "localhost")
    if coordinator_address is None and not in_pod:
        return  # single process
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def pod_mesh(tp: int = 1) -> Mesh:
    """(dp, tp) mesh over every chip in the (possibly multi-host) runtime.

    Devices are ordered so that the tp axis stays within a host (tp
    collectives ride ICI) and dp spans hosts (one all_gather per step
    crosses DCN).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/output."""
    return jax.process_index() == 0
