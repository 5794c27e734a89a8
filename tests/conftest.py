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
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
