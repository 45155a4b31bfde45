"""Multi-host utilities: process init and local->global batch assembly.

Scaling from one host to a pod slice is the same ShardedTrainer code over
a bigger mesh (the reference needed a whole PS/worker deployment +
TF_CONFIG + protocol selection for this; here it is jax.distributed +
the named axis spanning ICI/DCN).

Usage on every host of the job:

    from deeprec_tpu.parallel import multihost
    multihost.initialize()                      # once, before jax use
    mesh = make_mesh()                          # all global devices
    tr = ShardedTrainer(..., mesh=mesh)
    # feed each host its own batch shard; prepare_batch globalizes it
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — the TF_CONFIG
    analog). No-op on single-process runs with no configuration."""
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None
        else int(os.environ.get("PROCESS_ID", "0")),
    )


def globalize(mesh, spec, local_array):
    """Assemble a process-local numpy shard into a global jax.Array with
    the given PartitionSpec (each process holds its slice of the batch —
    the per-worker input pipeline of the reference)."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_array))
