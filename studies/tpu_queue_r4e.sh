#!/bin/bash
# Round-4 queue E: resume the reproduction refresh after the 19:15 endpoint
# crash (pol + expsin spatial/eta completed and archived before it), then
# the remaining 3-D evidence and the final bench.
#
#   nohup bash studies/tpu_queue_r4e.sh > /tmp/queue_r4e.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# expsin temporal re-run on the f64-pinned program shape
timeout 4000 python studies/run_all_tpu.py --only expsin temporal

timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH2_TclcdH3
timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH2_TclcdH2
timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH1_TclcdH2
timeout 8000 python studies/run_all_tpu.py --only peaks_fast1e1

# 3-D temporal self-reference (mixed precision, scanned Krylov body)
NA_DD_TPU_PRECISION=mixed NA_DD_TPU_SCANNED=1 timeout 7200 \
  python studies/three_d_study.py --temporal --self-reference \
  --levels 5 --n0 16 --dt0 1e-2 --tf 0.02 \
  --out studies/results/three_d_study_tpu_mixed_temporal_selfref.json

# full multi-mode bench incl. the new mixed_fast row
timeout 10000 python bench.py

echo "[queue r4e] all done at $(date)"
