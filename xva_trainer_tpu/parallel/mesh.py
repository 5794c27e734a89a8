"""Device mesh + sharding strategy.

The reference's only parallelism is single-host nn.DataParallel + grad accum
(SURVEY.md §2.6). Here parallelism is SPMD over a jax mesh:

- axis "data": batch sharding (DP) — gradients all-reduce over ICI via pjit.
- axis "model": tensor sharding. parallel/tp.py implements the Megatron
  column/row split of the 1536-wide FFN stacks over this axis (opt-in;
  models are ≤100M params, so DP alone suffices for parity — SURVEY.md §2.6).

Batches are sharded (data, None, ...); params replicated. Multi-host would
extend the mesh over jax.distributed processes; no other comm layer exists.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    devs = jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    devices = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def make_mesh_for_batch(batch_size: int, n_model: int = 1) -> Mesh:
    """DP mesh whose data axis divides the batch size (largest such divisor
    that fits the available devices)."""
    max_data = max(1, len(jax.devices()) // n_model)
    n_data = 1
    for d in range(1, max_data + 1):
        if batch_size % d == 0:
            n_data = d
    return make_mesh(n_data=n_data, n_model=n_model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def commit_replicated(tree, mesh: Mesh):
    """device_put a pytree (train state) replicated over the mesh.

    Un-committed arrays (fresh init on the default device) give jit a
    different cache key than the committed arrays every later step produces —
    the first step would compile a second variant of its bucket shape
    (~minutes over a remote-compile tunnel). Committing up front means one
    compile per batch shape, ever.
    """
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def cpu_init_device():
    """Context that pins un-committed computation to the host CPU backend.

    Used around ``model.init`` / ``tx.init``: init only *creates* parameter
    pytrees (shapes depend on feature dims, not batch or data), so compiling
    the init graph for the accelerator is pure waste — measured 207s for the
    full-size FastPitch init over the remote-compile tunnel vs seconds on
    XLA:CPU. JAX's threefry PRNG gives bit-identical random *bits* for a
    seed on any backend; initializer float math (e.g. truncated-normal's
    erfinv) may differ across backends by float-rounding noise, so the
    values are deterministic given the seed but not guaranteed bit-exact
    cross-platform. Callers commit the result onto the mesh afterwards
    (``commit_replicated``)."""
    import contextlib

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place each (B, ...) array with batch dim sharded over "data"."""
    out = {}
    for k, v in batch.items():
        if k == "ids":
            continue
        arr = jax.numpy.asarray(v)
        spec = P("data", *([None] * (arr.ndim - 1)))
        out[k] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def sds_batch(mesh: Mesh, batch: dict) -> dict:
    """ShapeDtypeStructs with exactly shard_batch's shardings — the abstract
    mirror of a device batch, for AOT ``.lower().compile()`` compile-warming
    (no H2D, no HBM)."""
    import numpy as np

    out = {}
    for k, v in batch.items():
        if k == "ids":
            continue
        arr = np.asarray(v)
        spec = P("data", *([None] * (arr.ndim - 1)))
        out[k] = jax.ShapeDtypeStruct(arr.shape, arr.dtype,
                                      sharding=NamedSharding(mesh, spec))
    return out


def sds_replicated(mesh: Mesh, tree):
    """ShapeDtypeStructs with the replicated sharding ``commit_replicated``
    gives — the abstract mirror of a committed state pytree."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype,
                                       sharding=repl),
        tree,
    )
