#!/bin/bash
# Round-4 queue D: the evidence obligations on the refreshed code base.
#   1. Full FAST-mode reproduction refresh (REPRODUCTION.md + 18 study JSONs,
#      CPU-x64 adjudication columns) — VERDICT r3 tasks 5/10 on the new code.
#   2. f32 3-D jnp spatial ladder retry to N=64 (task 9; incremental
#      archiving keeps completed levels across endpoint stalls).
#   3. 3-D temporal ladder with --self-reference in mixed precision (the
#      temporal-order evidence the floored f32 ladder could not give);
#      scanned Krylov body keeps the 3-D mixed compile tractable.
#   4. Mixed-precision 3-D spatial ladder retry (scanned body; the unrolled
#      variant hit a >90 min compile stall on 2026-08-19).
#   5. Full multi-mode bench refresh incl. the new mixed_fast row.
#
#   nohup bash studies/tpu_queue_r4d.sh > /tmp/queue_r4d.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

timeout 14000 python studies/run_all_tpu.py

NA_DD_TPU_X64=0 timeout 5400 python studies/three_d_study.py \
  --levels 5 --n0 4 --out studies/results/three_d_study_tpu_f32.json

NA_DD_TPU_PRECISION=mixed NA_DD_TPU_SCANNED=1 timeout 7200 \
  python studies/three_d_study.py --temporal --self-reference \
  --levels 5 --n0 16 --dt0 1e-2 --tf 0.02 \
  --out studies/results/three_d_study_tpu_mixed_temporal_selfref.json

NA_DD_TPU_PRECISION=mixed NA_DD_TPU_SCANNED=1 timeout 7200 \
  python studies/three_d_study.py --levels 4 --n0 4 \
  --out studies/results/three_d_study_tpu_mixed.json

timeout 10000 python bench.py

echo "[queue r4d] all done at $(date)"
