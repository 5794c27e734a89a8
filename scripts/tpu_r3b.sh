#!/bin/bash
# Round-3 TPU capture, part 2 (takes over from tpu_round3_capture.sh).
# Order rationale: bench_train first — it warms the persistent compile cache
# for every sub-bench the driver's end-of-round `python bench.py` (540s
# budget) must reach to print the xvapitch train headline (VERDICT r2 #1's
# done-criterion), and streams partials so a timeout still yields numbers.
# Then a warm bench.py validation at the driver's exact budget, then the
# full north star, then the profiler (cheap, lowest stakes last).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
echo "== capture part 2 started $(date) ==" | tee -a "$OUT/capture.log"

# wait for any still-running ab_hifigan from part 1 (orphaned child) —
# bounded: a stale/recycled pid must not silently eat the capture window
deadline=$(( $(date +%s) + 3600 ))
while pid=$(cat "$OUT/wait.pid" 2>/dev/null) && [ -n "${pid:-}" ] \
      && kill -0 "$pid" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "wait.pid $pid still alive after 1h — proceeding anyway" \
      | tee -a "$OUT/capture.log"
    break
  fi
  sleep 15
done

run() {
  name="$1"; tmo="$2"; shift 2
  echo "-- $name: $* (timeout ${tmo}s) $(date)" | tee -a "$OUT/capture.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "-- $name rc=$rc $(date)" | tee -a "$OUT/capture.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/capture.log"
}

XVA_BENCH_LOOP=1 XVA_BENCH_TRAIN_BUDGET=2300 \
  run bench_train2 2500 python bench_train.py
XVA_BENCH_BUDGET=540 run bench_warm 600 python bench.py
run northstar 10800 python bench_northstar.py
run profile 1800 python scripts/profile_step.py
echo "== capture part 2 finished $(date) ==" | tee -a "$OUT/capture.log"
