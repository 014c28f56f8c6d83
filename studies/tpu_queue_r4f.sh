#!/bin/bash
# Round-4 queue F: endpoint-outage-tolerant resumption of the remaining
# evidence jobs.  Before EVERY job: wait until a small on-chip computation
# succeeds (the 2026-08-19 outage pattern: the endpoint crashed at 19:15,
# recovered ~15 min, crashed again at ~19:47 — a fixed queue burns through
# its jobs with UNAVAILABLE errors).
#
#   nohup bash studies/tpu_queue_r4f.sh > /tmp/queue_r4f.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

wait_healthy() {
  while true; do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float(jnp.sum(x @ x)))" >/dev/null 2>&1; then
      echo "[queue r4f] endpoint healthy at $(date)"
      return 0
    fi
    echo "[queue r4f] endpoint down at $(date); retry in 8 min"
    sleep 480
  done
}

wait_healthy
timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH2_TclcdH3

wait_healthy
timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH2_TclcdH2

wait_healthy
timeout 6000 python studies/run_all_tpu.py --only nfsp_cpcsH1_TclcdH2

wait_healthy
timeout 8000 python studies/run_all_tpu.py --only peaks_fast1e1

wait_healthy
timeout 10000 python bench.py

wait_healthy
NA_DD_TPU_PRECISION=mixed NA_DD_TPU_SCANNED=1 timeout 7200 \
  python studies/three_d_study.py --temporal --self-reference \
  --levels 5 --n0 16 --dt0 1e-2 --tf 0.02 \
  --out studies/results/three_d_study_tpu_mixed_temporal_selfref.json

echo "[queue r4f] all done at $(date)"
