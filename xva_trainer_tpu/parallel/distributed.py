"""Multi-host / multi-slice runtime helpers.

The reference has no multi-node capability (SURVEY.md §2.6: DataParallel only,
NCCL as dead config). The TPU-native equivalent needs no comm library at all:
``jax.distributed.initialize`` brings every host into one runtime, pjit emits
XLA collectives that ride ICI within a slice and DCN across slices, and
``multihost_utils`` covers host-side sync. These helpers wrap that recipe.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring this host into the multi-host jax runtime (no-op single-host).

    On Cloud TPU pods the arguments auto-detect from the metadata server;
    elsewhere pass coordinator/num/id explicitly (or via JAX_COORDINATOR_*).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None and (
        "JAX_COORDINATOR_ADDRESS" not in os.environ
    ):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(dp_per_host: Optional[int] = None, model: int = 1):
    """Global mesh over all hosts' devices: ("data", "model").

    DP gradients all-reduce over ICI within each slice; crossing slices rides
    DCN automatically — the mesh is laid out devices-major so neighboring data
    shards share a slice.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n = len(devs)
    data = n // model
    return Mesh(devs[: data * model].reshape(data, model), ("data", "model"))


def broadcast_from_host0(tree):
    """Replicate host-0's pytree to every process (checkpoint fan-out)."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def global_batch_to_local(batch: dict, mesh) -> dict:
    """Per-host slice of a global batch for jax.make_array_from_process_local_data."""
    import jax

    if jax.process_count() == 1:
        return batch
    pc, pi = jax.process_count(), jax.process_index()
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1:
            per = v.shape[0] // pc
            out[k] = v[pi * per : (pi + 1) * per]
        else:
            out[k] = v
    return out
