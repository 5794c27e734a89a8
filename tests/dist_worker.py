"""Worker for the two-process jax.distributed smoke test
(tests/test_distributed_multiproc.py). Run as:

    python tests/dist_worker.py <coordinator> <num_procs> <proc_id> <workdir>

Exercises parallel/distributed.py's real multi-process path (previously only
unit-tested single-process): initialize → cross-process psum over a global
mesh → host-0 checkpoint fan-out via broadcast_from_host0. Prints one JSON
line with the results; the parent asserts on it.
"""
import json
import os
import sys


def main():
    coord, n, pid, workdir = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                              sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    # the axon sitecustomize overrides the env var alone; pin via config too
    # so a dead TPU tunnel can't hang backend init
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from xva_trainer_tpu.parallel.distributed import (
        broadcast_from_host0,
        initialize_distributed,
        make_multihost_mesh,
    )

    initialize_distributed(coordinator_address=coord, num_processes=n,
                           process_id=pid)
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == 2 * n  # 2 virtual CPU devices per process

    # cross-process psum: each process contributes (pid+1) on each of its
    # local devices → global sum = 2 * (1 + 2) = 6 for n=2
    mesh = make_multihost_mesh()
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    local = [jax.device_put(jnp.full((1,), float(pid + 1)), d)
             for d in jax.local_devices()]
    garr = jax.make_array_from_single_device_arrays(
        (jax.device_count(),), sharding, local)

    from jax.experimental.shard_map import shard_map

    summed = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, axis),
        mesh=mesh, in_specs=P(axis), out_specs=P()))(garr)
    psum_val = float(np.asarray(jax.device_get(summed))[0])

    # host-0 state fan-out (checkpoint restore pattern): proc 0 "loads" the
    # checkpoint, everyone else receives it
    state = ({"w": jnp.arange(4.0) * 3, "step": jnp.asarray(7)}
             if pid == 0 else
             {"w": jnp.zeros(4), "step": jnp.asarray(0)})
    synced = broadcast_from_host0(state)
    w = np.asarray(jax.device_get(synced["w"]))
    step = int(jax.device_get(synced["step"]))

    # a real file checkpoint written by proc-0 restores on both processes
    ckpt = os.path.join(workdir, "ckpt.npz")
    if pid == 0:
        np.savez(ckpt, w=w, step=step)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")
    with np.load(ckpt) as z:
        restored_ok = bool(np.array_equal(z["w"], np.arange(4.0) * 3)
                           and int(z["step"]) == 7)

    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "psum": psum_val,
        "bcast_w": w.tolist(),
        "bcast_step": step,
        "restored_ok": restored_ok,
    }), flush=True)


if __name__ == "__main__":
    main()
