"""Multi-host initialization and process-level utilities.

The reference is strictly single-process (SURVEY.md §1 middleware note).
This framework's multi-host story follows the standard JAX recipe:

- **DCN / process coordination**: ``jax.distributed.initialize`` connects
  the host processes (one per TPU VM); afterwards ``jax.devices()`` spans
  the whole slice and every jitted/shard_mapped computation in
  ``parallel/`` runs SPMD across hosts with XLA collectives riding ICI.
- **host-side scan feed**: each process feeds only its local shard of any
  globally-sharded input via ``jax.make_array_from_process_local_data``;
  for the streaming SLAM loop the scan stream is broadcast (small) while
  map/graph state lives sharded on device.

Nothing here is TPU-pod-specific to *call* — on CI it initializes a
single-process "cluster" and the same code paths run on the 8-virtual-
device CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the multi-host cluster.

    With no arguments, relies on the TPU environment's auto-detection
    (the normal path on Cloud TPU VMs). No-op if already initialized or
    running single-process.
    """
    # NOTE: must not touch the XLA backend (jax.devices / process_count)
    # before jax.distributed.initialize — backend init pins single-process.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        already = getattr(jax._src.distributed.global_state, "client", None) is not None
    if already:
        return
    if coordinator_address is not None:
        # explicit cluster spec: a failure to rendezvous is a real error —
        # do NOT swallow it (a silently-single process would shard wrong)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        # auto-detection path only: single-process / already-initialized
        # environments are normal here, but say so instead of hiding it
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed auto-init unavailable (%s); running single-process",
            e,
        )


def global_mesh(axis: str = "dp") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) slice."""
    return Mesh(np.array(jax.devices()), (axis,))


def replicate_to_global(x, mesh: Mesh):
    """Place a host-local array replicated across the global mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def is_coordinator() -> bool:
    return jax.process_index() == 0
