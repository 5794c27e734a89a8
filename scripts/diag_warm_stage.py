"""Diagnose the warm north-star stage warmups (VERDICT r4 weak #4, part 2).

diag_cache_miss.py proved donation + mesh do NOT break the persistent
cache on a toy program (warm compiles 0.08s). This script runs the REAL
FastPitch stage-1 program through the production path — trainer-built
step, mesh, donation, persistent cache — in two subprocesses and times
each phase separately:

    trace+lower   pure Python, never cached across processes (the floor)
    compile       XLA; should be a persistent-cache HIT on run 2
    total

plus jax_explain_cache_misses stderr. Three outcomes:
  - run2 compile ~seconds but trace+lower ~minutes → the "warm recompile"
    is really retracing cost; fix = fewer/smaller programs or jax.export.
  - run2 compile repeats the cold time with a MISS line → key
    nondeterminism in OUR program; the printed keys diff shows where.
  - both fast → the stall lives elsewhere (e.g. GIL contention from
    background precompile threads racing the measured epoch).

Run: python scripts/diag_warm_stage.py  [--big]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from xva_trainer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(%(repo)r + "/.diag_cache_root")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_explain_cache_misses", True)

from xva_trainer_tpu.models.fastpitch import FastPitch, FastPitchConfig
from xva_trainer_tpu.parallel.mesh import (cpu_init_device, make_mesh,
                                           sds_batch, sds_replicated)
from xva_trainer_tpu.train.fastpitch_trainer import TrainState, make_stage_step
from xva_trainer_tpu.train.optim import make_fastpitch_optimizer

B, T_TEXT, T_MEL = %(batch)d, 128, 512
model = FastPitch(FastPitchConfig())
tx = make_fastpitch_optimizer(0.1, 1e-6, 1000)
t0 = time.perf_counter()
with cpu_init_device():
    tokens = np.zeros((1, T_TEXT), np.int32)
    mel = np.zeros((1, T_MEL, 80), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens,
                        np.full((1,), T_TEXT, np.int32), mel,
                        np.full((1,), T_MEL, np.int32),
                        np.zeros((1, 1, T_MEL), np.float32),
                        np.zeros((1, T_MEL), np.float32),
                        np.full((1, T_MEL, T_TEXT), 1.0 / T_TEXT, np.float32))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
init_s = time.perf_counter() - t0

mesh = make_mesh()
state_sds = sds_replicated(mesh, state)
# exactly the production stage-1 feed: zero_batch half-feed + device prior,
# filtered to the keys the step reads (precompile_stage mirrors this)
from xva_trainer_tpu.data.dataset import Bucket, zero_batch
from xva_trainer_tpu.train.fastpitch_trainer import batch_keys_for

zb = zero_batch(Bucket(T_TEXT, T_MEL), B, with_prior=False, with_durs=False)
zb.pop("ids", None)
keys = batch_keys_for(1, False, True)
if keys is not None:
    zb = {k: v for k, v in zb.items() if k in keys}
batch_sds = sds_batch(mesh, zb)
step = make_stage_step(model, 1, tx, use_gt_durs=False, device_prior=True)
_, _sub = jax.random.split(jax.random.PRNGKey(0))
kl_sds = jax.ShapeDtypeStruct((), jnp.float32)
rng_sds = jax.ShapeDtypeStruct(_sub.shape, _sub.dtype)
with mesh:
    t0 = time.perf_counter()
    lowered = step.lower(state_sds, batch_sds, kl_sds, rng_sds)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
print(json.dumps({"init_s": round(init_s, 1),
                  "trace_lower_s": round(lower_s, 1),
                  "compile_s": round(compile_s, 1)}), flush=True)
"""


def run_child(tag, batch):
    code = CHILD % {"repo": REPO, "batch": batch}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    print(f"--- {tag} ---")
    print(r.stdout)
    lines = [l for l in r.stderr.splitlines()
             if "PERSISTENT COMPILATION CACHE" in l]
    for l in lines:
        # keep only the program name + hit/miss, keys are long
        print(l.split("WARNING:")[-1][:160])
    if r.returncode != 0:
        print(r.stderr[-3000:])
    return r


if __name__ == "__main__":
    batch = 8 if "--big" not in sys.argv else 32
    import shutil

    root = os.path.join(REPO, ".diag_cache_root")
    shutil.rmtree(root, ignore_errors=True)
    run_child("cold", batch)
    run_child("warm", batch)
