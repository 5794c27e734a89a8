#!/bin/bash
# Round-3 TPU evidence capture (VERDICT r2 next-round #1/#2/#9).
#
# Run this the moment the TPU tunnel is back. Captures, in cheapest-first
# order so partial runs still yield evidence:
#   1. bench.py              — headline JSON line (kernel + train metrics)
#   2. bench_train.py        — per-model steps/s + the v2 trainer-loop
#                              (prefetch feed vs device-only done-criterion)
#   3. bench_ab_hifigan.py   — G/D ordering A/B reconfirmation
#   4. bench_northstar.py    — FULL 1200-clip, full-size models (~hours)
# Logs under /tmp/tpu_r3/; artifacts (northstar.json, ab_hifigan.json) are
# written in-repo by the scripts themselves.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
echo "== capture started $(date) ==" | tee -a "$OUT/capture.log"

run() {
  name="$1"; tmo="$2"; shift 2
  echo "-- $name: $* (timeout ${tmo}s) $(date)" | tee -a "$OUT/capture.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "-- $name rc=$rc $(date)" | tee -a "$OUT/capture.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/capture.log"
}

XVA_BENCH_BUDGET=1700 run bench 1800 python bench.py
XVA_BENCH_LOOP=1 run bench_train 2400 python bench_train.py
# feed A/Bs (VERDICT r2 #9: measured step wins with before/afters):
# v2 host-collated prior vs on-device prior; v3 f32 host-spec feed vs
# int16-audio/device-spec feed
run loop_ab_prior 1800 python -c "
import json
from bench_train import bench_v2_trainer_loop, _enable_compile_cache
_enable_compile_cache()
host = bench_v2_trainer_loop(device_prior=False)
dev = bench_v2_trainer_loop(device_prior=True)
print(json.dumps({'host_prior': host, 'device_prior': dev}))
"
run loop_ab_spec 2400 python -c "
import json
from bench_train import bench_v3_trainer_loop, _enable_compile_cache
_enable_compile_cache()
host = bench_v3_trainer_loop(device_spec=False)
dev = bench_v3_trainer_loop(device_spec=True)
print(json.dumps({'host_spec': host, 'device_spec': dev}))
"
run ab_hifigan 2400 python bench_ab_hifigan.py
run profile 1800 python scripts/profile_step.py
# full north star: 1200 clips, full-size models; give it 4h
run northstar 14400 python bench_northstar.py
echo "== capture finished $(date) ==" | tee -a "$OUT/capture.log"
