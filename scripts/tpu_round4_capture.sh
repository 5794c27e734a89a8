#!/bin/bash
# Round-4 TPU evidence capture (VERDICT r3 next-round #1/#2/#3).
#
# Cheapest-first so partial runs still yield evidence:
#   1. bench_ab_fused_gd.py  — fused single-backward G+D step A/B (+MFU)
#   2. bench.py              — headline JSON line (now incl. default-on MFU)
#   3. bench_northstar.py    — warm-cache re-run (the cold run is captured
#                              separately; this shows warmups ~0 on repeat)
# Logs under /tmp/tpu_r4/; artifacts (ab_fused_gd.json, northstar.json) are
# written in-repo by the scripts themselves.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r4
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

run ab_fused_gd 3600 python bench_ab_fused_gd.py
XVA_BENCH_BUDGET=1700 run bench 1800 python bench.py
run northstar_warm 7200 python bench_northstar.py --root /tmp/xva_northstar_warm
echo "== capture done $(date) ==" | tee -a "$OUT/capture.log"
