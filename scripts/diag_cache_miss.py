"""Diagnose persistent-compile-cache misses (VERDICT r4 weak #4).

Round-4 evidence: on a warm cache, the non-donated align program's AOT
compile dropped 93s -> 9.2s (HIT) while every donated train-step program
stayed ~150s (MISS). This script isolates the variables in-process and
across processes:

  phase A (subprocess 1): compile four variants of a big-enough program —
    plain jit, donated jit, jit-under-mesh (replicated), donated+mesh —
    and report compile seconds + cache-dir entry count after each.
  phase B (subprocess 2): same compiles again; a HIT is ~seconds, a MISS
    repeats the cold time. jax_explain_cache_misses prints the reason.

Run: python scripts/diag_cache_miss.py
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
cache_dir = enable_persistent_cache(%(repo)r + "/.diag_cache_root")
import jax, jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_explain_cache_misses", True)

def entries():
    return len([f for f in os.listdir(cache_dir)])

def report(name, fn, *args, lower_kwargs=None):
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    c = lowered.compile()
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": name, "compile_s": round(dt, 2),
                      "cache_entries": entries()}), flush=True)

N = 4096  # big enough to exceed min_compile_time 1s on any backend
w = jnp.ones((N, N), jnp.bfloat16)
x = jnp.ones((N, N), jnp.bfloat16)

def body(w, x):
    for _ in range(8):
        x = jnp.tanh(x @ w)
    return w + 1e-3 * x, x.sum()

plain = jax.jit(body)
donated = jax.jit(body, donate_argnums=(0,))
report("plain_jit", plain, w, x)
report("donated_jit", donated, w, x)

mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
repl = NamedSharding(mesh, P())
wm = jax.device_put(w, repl)
xm = jax.device_put(x, repl)
with mesh:
    plain_m = jax.jit(body)
    donated_m = jax.jit(body, donate_argnums=(0,))
    report("plain_jit_mesh", plain_m, wm, xm)
    report("donated_jit_mesh", donated_m, wm, xm)
"""


def run_child(tag):
    code = CHILD % {"repo": REPO}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    print(f"--- {tag} stdout ---")
    print(r.stdout)
    misses = [l for l in r.stderr.splitlines()
              if "miss" in l.lower() or "cache" in l.lower()]
    if misses:
        print(f"--- {tag} cache-related stderr ---")
        print("\n".join(misses[:30]))
    if r.returncode != 0:
        print(r.stderr[-3000:])
    return r


if __name__ == "__main__":
    import shutil

    root = os.path.join(REPO, ".diag_cache_root")
    shutil.rmtree(root, ignore_errors=True)
    run_child("cold")
    run_child("warm")
