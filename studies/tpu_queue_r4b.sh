#!/bin/bash
# Round-4 queue B: mixed-mode perf A/B at the headline level, the 3-D
# temporal + mixed ladders (VERDICT r3 task 9), and a full bench refresh
# with the new roofline fields.  Strictly sequential; optionally waits for a
# PID (queue A) to release the chip first.
#
#   nohup bash studies/tpu_queue_r4b.sh [wait_pid] > /tmp/queue_r4b.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue r4b] pid $WAIT_PID exited at $(date)"
fi

# 1) Mixed-mode perf A/B at the headline level (pol N=256, 41 steps).
#    Target (VERDICT r3 task 3): <=0.06 s at unchanged 4.3828e-9 error.
#    a. round-3 baseline shape (per-system refinement, jvp couplings)
BENCH_MODES=mixed_pallas timeout 3600 python bench.py
#    b. fused-triple BLOCK refinement (one kernel per refinement pass)
NA_DD_TPU_COUPLING=analytic BENCH_MODES=mixed_pallas timeout 3600 python bench.py
#    c. block refinement + one fewer refinement pass
NA_DD_TPU_COUPLING=analytic NA_DD_TPU_MIXED_REFINE=1 BENCH_MODES=mixed_pallas \
  timeout 3600 python bench.py
#    d. per-system refinement + one fewer pass (isolates the two levers)
NA_DD_TPU_MIXED_REFINE=1 BENCH_MODES=mixed_pallas timeout 3600 python bench.py

# 2) 3-D temporal ladder (fixed N=16, dt=1e-2/2^k, f32 production mode).
NA_DD_TPU_X64=0 timeout 3600 python studies/three_d_study.py --temporal \
  --levels 5 --n0 16 --dt0 1e-2 --tf 0.02 \
  --out studies/results/three_d_study_tpu_f32_temporal.json

# 3) Mixed-precision 3-D spatial ladder (f64-accurate, native-f32 Krylov).
NA_DD_TPU_PRECISION=mixed timeout 5400 python studies/three_d_study.py \
  --levels 4 --n0 4 --out studies/results/three_d_study_tpu_mixed.json

# 4) Full multi-mode bench refresh (writes the roofline fields the driver
#    will archive in BENCH_r04.json).
timeout 7200 python bench.py

echo "[queue r4b] all done at $(date)"
