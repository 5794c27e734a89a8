"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding is validated on this virtual mesh (the analogue of the
reference's absent multi-GPU test rig — see SURVEY.md §4): real TPU hardware is
single-chip in CI, so every pjit/shard_map test runs against
``--xla_force_host_platform_device_count=8``.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
