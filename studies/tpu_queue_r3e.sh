#!/bin/bash
# Round-3 follow-up TPU queue: 3-D direct solve on hardware + the fused
# triple-solve bench A/B.  Strictly sequential (only one process may hold
# the TPU).  Usage:
#   nohup bash studies/tpu_queue_r3e.sh > /tmp/queue_r3e.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 1) 3-D direct solve on real hardware: one PC step direct vs krylov at
#    N=8/12 in both f32 (XLA LU) and f64 (pivoted batched Gauss-Jordan --
#    the TPU backend has no f64 LuDecomposition), plus steady timings.
timeout 3600 python - <<'PYEOF'
import time, json
import numpy as np
import jax
from na_dd_tpu import config
config.setup_x64()
config.enable_persistent_compilation_cache()
import jax.numpy as jnp
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.three_d import (
    LOCAL_OPS3, MMSCaseExpSin3, make_setup3, state_from_mms_when3,
)

MC = default_model_consts._replace(
    K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0,
    Dd_max=1e-6, gamma_T=1e-2)
model = Model02(MC)

def _t(f):
    t0 = time.perf_counter(); f(); return time.perf_counter() - t0

out = {}
for N in (8, 12):
    # f64 here (the Gauss-Jordan inverse path); the f32 production mode is
    # covered by item 2 below.
    g, case, field, integ_k = make_setup3(
        MMSCaseExpSin3, N=N, model=model,
        integrator_params=dict(krylov_unroll=24))
    _, _, _, integ_d = make_setup3(
        MMSCaseExpSin3, N=N, model=model,
        integrator_params=dict(linear_solver="direct"))
    s0 = state_from_mms_when3(mms_case=case, t=0.0, grid=g)
    step_k = jax.jit(integ_k.step_fn, static_argnums=1)
    step_d = jax.jit(integ_d.step_fn, static_argnums=1)
    sk, dk = jax.block_until_ready(step_k(g, LOCAL_OPS3, s0, 0.0, 1e-3))
    sd, dd = jax.block_until_ready(step_d(g, LOCAL_OPS3, s0, 0.0, 1e-3))
    dev = max(float(jnp.max(jnp.abs(getattr(sk, v) - getattr(sd, v))))
              for v in ("cp", "T", "cl", "cd", "cs"))
    tk = min(_t(lambda: jax.block_until_ready(
        step_k(g, LOCAL_OPS3, s0, 0.0, 1e-3))) for _ in range(5))
    td = min(_t(lambda: jax.block_until_ready(
        step_d(g, LOCAL_OPS3, s0, 0.0, 1e-3))) for _ in range(5))
    key = f"N{N}_f64"
    out[key] = dict(max_step_dev=dev, krylov_s=tk, direct_s=td,
                    direct_converged=bool(dd.krylov_converged))
    print(key, out[key], flush=True)
    assert dev < 5e-11, (key, dev)
    json.dump(out, open('studies/results/direct3_tpu.json', 'w'), indent=1)
json.dump(out, open('studies/results/direct3_tpu.json', 'w'), indent=1)
PYEOF

# 2) f32 3-D direct step (the LU path Mosaic-free, pure XLA): quick parity
#    at N=8 in the f32 production mode via mms_error3
NA_DD_TPU_X64=0 timeout 1800 python - <<'PYEOF'
import json
from na_dd_tpu import config
config.setup_x64()
config.enable_persistent_compilation_cache()
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.three_d import MMSCaseExpSin3, mms_error3

MC = default_model_consts._replace(
    K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0,
    Dd_max=1e-6, gamma_T=1e-2)
model = Model02(MC)
common = dict(N=8, model=model, Tf=0.01, dt=2.5e-3)
e_k = mms_error3(MMSCaseExpSin3, **common,
                 integrator_params=dict(krylov_unroll=24))
e_d = mms_error3(MMSCaseExpSin3, **common,
                 integrator_params=dict(linear_solver="direct"))
rel = abs(e_d - e_k) / e_k
print("f32 direct vs krylov:", e_k, e_d, rel, flush=True)
out = json.load(open('studies/results/direct3_tpu.json'))
out["N8_f32_mms"] = dict(err_krylov=float(e_k), err_direct=float(e_d),
                         rel_dev=float(rel))
json.dump(out, open('studies/results/direct3_tpu.json', 'w'), indent=1)
assert rel < 1e-5, rel
PYEOF

# 3) Fused TRIPLE-solve bench A/B at the headline level (N=256 f32):
#    coupling_source=analytic engages triple_solve_pallas (25 planes in
#    VMEM) vs the per-solve fused kernel of the default jvp coupling.
BENCH_MODES=f32_pallas timeout 3600 python bench.py
NA_DD_TPU_COUPLING=analytic BENCH_MODES=f32_pallas timeout 3600 python bench.py

# 4) Ensemble (parameter-screening) throughput — the serving benchmark:
#    B independent full simulations as ONE vmapped program, f32 production
#    mode and f64 parity mode
NA_DD_TPU_X64=0 timeout 3600 python studies/ensemble_throughput.py \
  --batches 1,8,32,128 --out studies/results/ensemble_throughput_f32.json
timeout 3600 python studies/ensemble_throughput.py \
  --batches 1,8,32 --out studies/results/ensemble_throughput.json
