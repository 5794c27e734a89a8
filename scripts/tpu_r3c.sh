#!/bin/bash
# Round-3 TPU capture, part 3: after the profiler frees the chip,
# (a) validate the exact end-of-round driver invocation (`python bench.py`,
#     default budget) with the reordered flagship-first plan;
# (b) re-run the full north star uncontended (the committed 208.6s stage-2
#     epoch was measured while CPU tests competed for the single host core)
#     and with the new float16 v2 feed.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
echo "== capture part 3 started $(date) ==" | tee -a "$OUT/capture.log"

deadline=$(( $(date +%s) + 2400 ))
while pid=$(cat "$OUT/wait3.pid" 2>/dev/null) && [ -n "${pid:-}" ] \
      && kill -0 "$pid" 2>/dev/null; do
  [ "$(date +%s)" -ge "$deadline" ] && break
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

run bench_driver 1300 python bench.py
run northstar2 7200 python bench_northstar.py
echo "== capture part 3 finished $(date) ==" | tee -a "$OUT/capture.log"
