#!/bin/bash
# Post-reproduction TPU measurement queue.  Waits for the run_all_tpu.py
# process to release the chip, then runs the queued single-chip measurements
# strictly sequentially (only one process can hold the TPU).
#
#   bash studies/tpu_queue.sh <pid-to-wait-for>
#
# Outputs append to /tmp/tpu_queue.log.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
LOG=/tmp/tpu_queue.log

if [ -n "$WAIT_PID" ]; then
  echo "[queue] waiting for pid $WAIT_PID" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue] pid $WAIT_PID exited at $(date)" >> "$LOG"
fi

run() {
  echo "===== $* ($(date)) =====" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "[queue] rc=$? for: $*" >> "$LOG"
}

# 1. loop-carry precision probe (fast; decides scanned-solver TPU safety)
run python studies/axon_while_probe.py
# 2. scanned-Krylov headline level: cold compile time + accuracy vs unrolled
run python studies/perf_probe.py scanned
# 3. f32 production-mode bench datapoint
run env NA_DD_TPU_X64=0 python bench.py
# 4. f32 + pallas stencil backend bench datapoint
run env NA_DD_TPU_X64=0 NA_DD_TPU_STENCIL=pallas python bench.py
# 5. f64 headline bench (warms the driver's end-of-round cache entry)
run python bench.py
echo "[queue] all done at $(date)" >> "$LOG"
