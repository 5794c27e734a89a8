"""Persistent-cache safety: CPU-backend executables must never be persisted
or served (VERDICT r3 weak #5 / next #7).

XLA:CPU cache entries are AOT host-ISA machine code; serving one compiled on
another machine can SIGILL mid-run, and the host fingerprint dir cannot fully
prevent it (two hosts with identical /proc/cpuinfo flag lines can still have
different XLA codegen targets — observed in MULTICHIP_r03). Accelerator
executables target the accelerator and round-trip safely."""
import glob
import os

import jax

from xva_trainer_tpu.utils import cache as xcache


def test_exclude_patch_blocks_cpu_backend():
    xcache._exclude_cpu_backend()
    assert xcache._cpu_excluded  # the jax internals it patches still exist
    from jax._src import compilation_cache as cc

    class FakeCpu:
        platform = "cpu"

    # the patched entry points must refuse CPU backends outright
    assert cc.get_executable_and_time("k", None, FakeCpu(), []) == (None, None)
    assert cc.put_executable_and_time("k", "m", None, FakeCpu(), 9.9) is None


def test_cpu_jit_writes_nothing_to_cache_dir(tmp_path, monkeypatch):
    """End-to-end: with the persistent cache pointed at a fresh dir and the
    min-compile-time floor at 0, a CPU jit compile must leave the dir empty
    (these tests run on the CPU backend — see tests/conftest.py)."""
    import jax.numpy as jnp

    d = str(tmp_path / "cache")
    os.makedirs(d)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        xcache._exclude_cpu_backend()

        @jax.jit
        def f(x):
            return (x @ x.T).sum() * 3.0

        float(f(jnp.ones((64, 64))))
        assert glob.glob(os.path.join(d, "**", "*"), recursive=True) == []
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
