#!/bin/bash
# Round-4 queue C: retry of the f32 3-D jnp ladder (lost to a compile stall
# before incremental archiving landed) + the full FAST-mode reproduction
# refresh (mixed+batched with f64 spot-checks and CPU-x64 adjudication —
# VERDICT r3 tasks 5/10).
#
#   nohup bash studies/tpu_queue_r4c.sh [wait_pid] > /tmp/queue_r4c.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue r4c] pid $WAIT_PID exited at $(date)"
fi

# 1) f32 3-D jnp ladder to N=64 (incremental per-level archiving now).
NA_DD_TPU_X64=0 timeout 5400 python studies/three_d_study.py \
  --levels 5 --n0 4 --out studies/results/three_d_study_tpu_f32.json

# 2) Full fast-mode reproduction refresh: 18 runs, REPRODUCTION.md rewrite.
timeout 14000 python studies/run_all_tpu.py

echo "[queue r4c] all done at $(date)"
