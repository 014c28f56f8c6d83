#!/bin/bash
# Round-4 evidence-restoration queue (VERDICT.md task 2): regenerate every
# studies/results/*.json cited by README/ROADMAP/REPRODUCTION that was lost
# to the old `.gitignore` trap, strictly sequentially (one TPU process at a
# time).  Each item re-measures on the attached chip and archives in-repo,
# matching the reference's own standard of saved outputs.
#
#   nohup bash studies/tpu_queue_r4.sh > /tmp/queue_r4.log 2>&1 &
#   echo $! > /tmp/queue_r4.pid
set -x
cd "$(dirname "$0")/.."

# 1) Scale probe beyond the reference ceiling: N=512/1024/2048 f32,
#    jnp vs pallas backends (row-tiled apply engages at N>=1024).
NA_DD_TPU_X64=0 timeout 3600 python studies/scale_probe.py

# 2) Direct-solve stiffness backstop: dt up to 1.0 at N=256, krylov-vs-BCR
#    disagreement + warning counts (f64).
timeout 5400 python studies/direct_stiff_probe.py

# 3) Ensemble (serving) throughput: f32 production, f64 parity, and the
#    headline-grid N=256 datapoint (pol spatial protocol dt=h^1.5, 41 steps).
NA_DD_TPU_X64=0 timeout 3600 python studies/ensemble_throughput.py \
  --batches 1,8,32,128 --out studies/results/ensemble_throughput_f32.json
timeout 3600 python studies/ensemble_throughput.py \
  --batches 1,8,32 --out studies/results/ensemble_throughput.json
NA_DD_TPU_X64=0 timeout 3600 python studies/ensemble_throughput.py \
  --n 256 --tf 0.01 --dt 2.44140625e-4 --batches 1,8 \
  --out studies/results/ensemble_throughput_f32_N256.json

# 4) 3-D model ladders: f32 jnp to N=64, f64 batched (ONE vmapped compile),
#    f32 pallas (fused Stencil7 solve kernel to N<=31), N=128 scale point.
NA_DD_TPU_X64=0 timeout 3600 python studies/three_d_study.py \
  --levels 5 --n0 4 --out studies/results/three_d_study_tpu_f32.json
timeout 5400 python studies/three_d_study.py --batched \
  --levels 3 --n0 4 --out studies/results/three_d_study_tpu_f64_batched.json
NA_DD_TPU_X64=0 NA_DD_TPU_STENCIL=pallas timeout 3600 python studies/three_d_study.py \
  --levels 4 --n0 4 --out studies/results/three_d_study_tpu_f32_pallas.json
NA_DD_TPU_X64=0 timeout 3600 python studies/three_d_study.py \
  --levels 1 --n0 128 --out studies/results/three_d_study_tpu_f32_N128.json

# 5) 3-D heat-solve datapoint (CN step ladder, f32).
NA_DD_TPU_X64=0 timeout 1800 python - <<'EOF'
import time, json
import jax
from na_dd_tpu import config
config.setup_x64()
config.enable_persistent_compilation_cache()
from na_dd_tpu.three_d import heat_mms_error
out = {}
for N in (16, 32, 64):
    t0 = time.perf_counter()
    e = float(heat_mms_error(N, Tf=0.05, dt=0.05/(2*N)))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    e = float(heat_mms_error(N, Tf=0.05, dt=0.05/(2*N)))
    warm = time.perf_counter() - t0
    out[N] = dict(err=e, cold_s=cold, warm_s=warm)
    print(N, out[N], flush=True)
json.dump(dict(backend=jax.default_backend(), levels=out),
          open('studies/results/heat3d_tpu.json', 'w'), indent=1)
EOF

# 6) 3-D direct solve on real hardware: PC step direct vs krylov, f64
#    (Gauss-Jordan path) at N=8/12 + f32 (LU path) MMS parity at N=8.
timeout 3600 python - <<'PYEOF'
import time, json
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

# 7) 3-D fused-solve Pallas kernel probe (hardware VMEM boundary) + the
#    x-slab-tiled apply validation at N=64/96/128.
NA_DD_TPU_X64=0 timeout 3600 python studies/stencil7_fused_probe.py
NA_DD_TPU_X64=0 timeout 1800 python - <<'PYEOF'
import time, json
import numpy as np
import jax, jax.numpy as jnp
from na_dd_tpu import config
config.setup_x64()
config.enable_persistent_compilation_cache()
from na_dd_tpu.ops.pallas_kernels import (
    _pick_slab_tile3, apply3_fits, apply3_tiled_fits, stencil7_apply_tiled,
)
from na_dd_tpu.three_d.diffusion import Stencil7
from na_dd_tpu.three_d.shifts import LOCAL_OPS3

def _t(f):
    t0 = time.perf_counter(); f(); return time.perf_counter() - t0

out = {}
rng = np.random.RandomState(3)
for N in (64, 96, 128):
    shape = (N + 1,) * 3
    assert not apply3_fits(shape, jnp.float32)
    if not apply3_tiled_fits(shape, jnp.float32):
        print(N, 'no feasible slab tile; skipping', flush=True)
        continue
    mk = lambda: jnp.asarray(rng.rand(*shape), dtype=jnp.float32)
    st = Stencil7(c0=mk(), cxm=mk(), cxp=mk(), cym=mk(), cyp=mk(),
                  czm=mk(), czp=mk())
    u = mk()
    k = jax.jit(lambda st, u: stencil7_apply_tiled(st, u))
    j = jax.jit(lambda st, u: st.apply(LOCAL_OPS3, u))
    got = jax.block_until_ready(k(st, u))
    want = jax.block_until_ready(j(st, u))
    dev = float(jnp.max(jnp.abs(got - want)))
    tk = min(_t(lambda: jax.block_until_ready(k(st, u))) for _ in range(20))
    tj = min(_t(lambda: jax.block_until_ready(j(st, u))) for _ in range(20))
    out[N] = dict(slab_tile=_pick_slab_tile3(shape, jnp.float32),
                  max_abs_dev=dev, pallas_s=tk, jnp_s=tj)
    print(N, out[N], flush=True)
    assert dev < 1e-5 * float(jnp.max(jnp.abs(want))), dev
    json.dump(out, open('studies/results/stencil7_tiled_tpu.json', 'w'), indent=1)
json.dump(out, open('studies/results/stencil7_tiled_tpu.json', 'w'), indent=1)
PYEOF

echo "[queue r4] all done at $(date)"
