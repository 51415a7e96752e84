"""Multi-host distributed initialization.

The reference's multi-process story is Lightning DDP spawning one process
per GPU over NCCL (SURVEY.md §5.8). The TPU-native equivalent: one process
per host, jax.distributed.initialize() to join the coordinator, a global
mesh over all chips, and per-host batch shards placed with
jax.make_array_from_process_local_data. Collectives ride ICI within a
slice and DCN across slices — no NCCL, no explicit process groups.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed coordinator (no-op for single process).

    Args default from the standard env (JAX_COORDINATOR_ADDRESS etc. or
    TPU pod metadata when launched via the usual orchestrators).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over ALL devices (all hosts), 1-D 'data' by default."""
    devices = np.array(jax.devices())
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def host_local_batch_to_global(mesh: Mesh, batch):
    """Per-host numpy shards -> one global sharded array pytree.

    Each host passes its local rows; the result behaves like a single
    global batch of size (num_hosts * local_rows) sharded on 'data'.
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
