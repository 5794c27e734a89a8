#!/bin/bash
# Watch for the TPU tunnel to come back, then fire the round-3 evidence
# capture (scripts/tpu_round3_capture.sh) exactly once.
#
# The axon backend init blocks FOREVER in-process when the tunnel is down,
# so the probe is a timeout-bounded subprocess. Probe every 5 min; log to
# /tmp/tpu_autowatch.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_autowatch.log
echo "== autowatch started $(date) ==" >> "$LOG"
while true; do
  if timeout 150 python -c 'import jax; assert jax.devices()[0].platform != "cpu"' \
      >> "$LOG" 2>&1; then
    echo "== TPU is BACK $(date) — starting capture ==" >> "$LOG"
    bash scripts/tpu_round3_capture.sh >> "$LOG" 2>&1
    echo "== capture script finished $(date) ==" >> "$LOG"
    exit 0
  fi
  echo "probe failed $(date)" >> "$LOG"
  sleep 300
done
