#!/usr/bin/env bash
# Cold-machine driver-check rehearsal (VERDICT r1 #1).
#
# Runs both round-end driver checks exactly as the driver does, but against an
# EMPTY compilation cache (XVA_COLD=1 makes utils/cache.py use a throwaway
# temp dir), proving they pass rc=0 within the 600s driver timeout on a
# machine that has never compiled anything:
#   1. python bench.py                      (real TPU; watchdog-bounded)
#   2. dryrun_multichip(8) on a virtual CPU mesh
#
# Usage: ./verify_cold.sh [bench|multichip]   (default: both)
set -u
cd "$(dirname "$0")"
what="${1:-both}"
rc=0

if [ "$what" = "bench" ] || [ "$what" = "both" ]; then
  echo "== cold bench.py (budget ${XVA_BENCH_BUDGET:-540}s) =="
  start=$(date +%s)
  # pin the watchdog under the external timeout: the shipping default is
  # 1200s, which would let `timeout 600` SIGTERM the process line-less
  XVA_COLD=1 XVA_BENCH_BUDGET="${XVA_BENCH_BUDGET:-540}" timeout 600 python bench.py
  r=$?
  echo "bench.py: rc=$r  wall=$(( $(date +%s) - start ))s"
  [ $r -ne 0 ] && rc=1
fi

if [ "$what" = "multichip" ] || [ "$what" = "both" ]; then
  echo "== cold dryrun_multichip(8) =="
  start=$(date +%s)
  XVA_COLD=1 JAX_PLATFORMS=cpu timeout 600 python -c \
    "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip ok')"
  r=$?
  echo "dryrun_multichip: rc=$r  wall=$(( $(date +%s) - start ))s"
  [ $r -ne 0 ] && rc=1
fi

exit $rc
