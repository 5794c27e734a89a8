"""Diagnose why the production precompile path misses the persistent cache
across runs (VERDICT r4 weak #4, part 3).

Evidence chain:
- diag_cache_miss.py: donation+mesh on a toy program → warm HIT (0.1s).
- diag_warm_stage.py: the REAL stage-1 step via make_stage_step directly
  → warm HIT (compile 2.0s vs 14.4s cold).
- northstar_warm.json: every precompile task repeats its cold time
  (fp_stage1 152s warm vs 140s cold) → the stage warmups that overlap them
  are starved, which IS the "warm recompile" symptom.

So the miss lives in what FastPitchTrainer.precompile_stage does differently
from the bare step: trainer-built optimizer (freeze masks, schedules),
eval_shape'd opt-state avals, zero_batch key filtering. This script runs the
production precompile (real trainer, tiny 30-clip dataset, ONE bucket,
full-size model) in two subprocesses and prints every persistent-cache
HIT/MISS with its key, so a cross-run key diff (program nondeterminism) is
distinguishable from a get/put failure (same key, still MISS).

Run: python scripts/diag_precompile_miss.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from xva_trainer_tpu.utils.cache import enable_persistent_cache
cache_dir = enable_persistent_cache(%(repo)r + "/.diag_cache_root")
import jax
jax.config.update("jax_explain_cache_misses", True)

from bench_northstar import build_dataset
from xva_trainer_tpu.data.dataset import FeatureCache
from xva_trainer_tpu.data.text import TextProcessor
from xva_trainer_tpu.data.dataset import BucketBatcher
from xva_trainer_tpu.train.fastpitch_trainer import (FastPitchTrainConfig,
                                                     FastPitchTrainer)

root = "/tmp/xva_diag_pre"
os.makedirs(root, exist_ok=True)
ds = build_dataset(root, 30, 3.0)
cache = FeatureCache(ds, TextProcessor().encode)
cache.build()
cfg = FastPitchTrainConfig(output_dir=os.path.join(root, "out"), batch_size=8)
tr = FastPitchTrainer(cache, cfg)
batcher = BucketBatcher(cache, batch_size=8, with_prior=False,
                        device_prior=True)
tr.setup(batcher, resume=False)
occupied = [b for b, items in batcher.assignment.items() if items][:1]
t0 = time.perf_counter()
n = tr.precompile_stage(1, 8, occupied)
print(json.dumps({"buckets": n,
                  "precompile_s": round(time.perf_counter() - t0, 1),
                  "cache_entries": len(os.listdir(cache_dir))}), flush=True)
"""


def run_child(tag):
    code = CHILD % {"repo": REPO}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    print(f"--- {tag} ---")
    print(r.stdout)
    for l in r.stderr.splitlines():
        if "PERSISTENT COMPILATION CACHE" in l and "jit_" in l:
            # name + full key so cross-run diffs are visible
            print(l.split("WARNING:")[-1].split("jax._src")[-1][:200])
    if r.returncode != 0:
        print(r.stderr[-3000:])
    return r


if __name__ == "__main__":
    import shutil

    phases = sys.argv[1:] or ["cold", "warm"]
    if "cold" in phases:
        shutil.rmtree(os.path.join(REPO, ".diag_cache_root"),
                      ignore_errors=True)
        shutil.rmtree("/tmp/xva_diag_pre", ignore_errors=True)
    for p in phases:
        run_child(p)
