#!/bin/bash
# Round-3 3-D TPU measurement queue — run when the tunnel is back.
# Strictly sequential (only one process may hold the TPU).  Usage:
#   nohup bash studies/tpu_queue_r3d.sh > /tmp/queue_r3d.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 1) 3-D model study, f32 production mode (fast compiles), up to N=64
NA_DD_TPU_X64=0 timeout 3600 python studies/three_d_study.py \
  --levels 5 --n0 4 --out studies/results/three_d_study_tpu_f32.json

# 2) 3-D model study, f64 parity mode (emulated f64 — slow compiles):
#    batched = ONE compile for the whole ladder (the compile-cost lever)
timeout 5400 python studies/three_d_study.py --batched \
  --levels 3 --n0 4 --out studies/results/three_d_study_tpu_f64_batched.json

# 3) 3-D heat solve datapoint (the round-3 in-flight measurement): one CN
#    step ladder through heat_mms_error at N=64 f32
NA_DD_TPU_X64=0 timeout 1800 python - <<'EOF'
import time, json, os
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

# 4) full multi-mode bench refresh (warms every mode's cache for the driver)
timeout 7200 python bench.py

# 5) 3-D Pallas apply kernel: REAL Mosaic lowering validation + timing
#    (interpret mode cannot see lowering constraints — 2-D tiled-apply lesson)
NA_DD_TPU_X64=0 timeout 1800 python - <<'PYEOF'
import time, json
import numpy as np
import jax, jax.numpy as jnp
from na_dd_tpu import config
config.setup_x64()
config.enable_persistent_compilation_cache()
from na_dd_tpu.models import Model02, default_model_consts
from na_dd_tpu.ops.pallas_kernels import apply3_fits, stencil7_apply_pallas
from na_dd_tpu.three_d import (
    LOCAL_OPS3, MMSCaseExpSin3, make_setup3, newton_planes3,
    state_from_mms_when3,
)
def _t(f):
    t0 = time.perf_counter(); f(); return time.perf_counter() - t0
out = {}
for N in (32, 48):  # apply fits to N<=55 (tile-padded); fused to N<=31 (hw-calibrated)
    g, case, field, _ = make_setup3(
        MMSCaseExpSin3, N=N, model=Model02(default_model_consts))
    s = state_from_mms_when3(mms_case=case, t=0.1, grid=g)
    st = newton_planes3(g, LOCAL_OPS3, field.stencil_dFcd_dcd(g, LOCAL_OPS3, s), 1e-3)
    u = jnp.asarray(np.random.RandomState(0).randn(*g.full_shape),
                    dtype=g.xx.dtype)
    if not apply3_fits(u.shape, u.dtype):
        print(N, 'apply3 does not fit VMEM; skipping', flush=True)
        continue
    k = jax.jit(lambda st, u: stencil7_apply_pallas(st, u))
    j = jax.jit(lambda st, u: st.apply(LOCAL_OPS3, u))
    got = jax.block_until_ready(k(st, u))
    want = jax.block_until_ready(j(st, u))
    dev = float(jnp.max(jnp.abs(got - want)))
    tk = min(_t(lambda: jax.block_until_ready(k(st, u))) for _ in range(20))
    tj = min(_t(lambda: jax.block_until_ready(j(st, u))) for _ in range(20))
    out[N] = dict(max_abs_dev=dev, pallas_s=tk, jnp_s=tj)
    print(N, out[N], flush=True)
    assert dev < 1e-5 * float(jnp.max(jnp.abs(want))), dev
    # fused whole-solve kernel (fits to N<=~55 f32)
    from na_dd_tpu.ops.pallas_kernels import bicgstab_solve3_pallas, fused_solve3_fits
    from na_dd_tpu.ops import linsolve
    if fused_solve3_fits(u.shape, u.dtype):
        mask = g.interior_mask
        b = u * mask
        invd = jnp.where(mask > 0, 1.0 / jnp.where(st.c0 == 0, 1.0, st.c0), 0.0)
        xk, infok = bicgstab_solve3_pallas(st, b, invd, mask, tol=1e-5, iters=48)
        xu, infou = linsolve.bicgstab_unrolled(
            lambda w: st.apply(LOCAL_OPS3, w), b, jnp.zeros_like(b),
            dot=lambda a, c: jnp.sum(a * c), minv=lambda r: r * invd,
            tol=1e-5, iters=48)
        dsol = float(jnp.max(jnp.abs(xk * mask - xu * mask)))
        out[N]['solve_max_abs_dev'] = dsol
        out[N]['solve_iters'] = [int(infok['iters']), int(infou['iters'])]
        ks = jax.jit(lambda st, b: bicgstab_solve3_pallas(st, b, invd, mask, tol=1e-5, iters=48)[0])
        ju = jax.jit(lambda st, b: linsolve.bicgstab_unrolled(
            lambda w: st.apply(LOCAL_OPS3, w), b, jnp.zeros_like(b),
            dot=lambda a, c: jnp.sum(a * c), minv=lambda r: r * invd,
            tol=1e-5, iters=48)[0])
        jax.block_until_ready(ks(st, b)); jax.block_until_ready(ju(st, b))
        out[N]['solve_pallas_s'] = min(_t(lambda: jax.block_until_ready(ks(st, b))) for _ in range(10))
        out[N]['solve_jnp_s'] = min(_t(lambda: jax.block_until_ready(ju(st, b))) for _ in range(10))
        print(N, 'solve', {k: out[N][k] for k in ('solve_max_abs_dev','solve_iters','solve_pallas_s','solve_jnp_s')}, flush=True)
    # dump incrementally: a failure at a later N keeps earlier datapoints
    json.dump(out, open('studies/results/stencil7_pallas_tpu.json', 'w'), indent=1)
json.dump(out, open('studies/results/stencil7_pallas_tpu.json', 'w'), indent=1)
PYEOF

# 6) 3-D integrator-level pallas path (routed via _pallas_ops this round):
#    f32 ladder to N=32 with the fused Stencil7 solve kernel engaged
#    (fused fits to N<=31, hw-calibrated), vs item 1's jnp-f32 timings
NA_DD_TPU_X64=0 NA_DD_TPU_STENCIL=pallas timeout 3600 python studies/three_d_study.py \
  --levels 4 --n0 4 --out studies/results/three_d_study_tpu_f32_pallas.json

# 7) x-slab-tiled 3-D apply kernel: REAL Mosaic lowering validation + timing
#    at cubes beyond the single-block budget (leading-dim tiling has no
#    8-sublane rule, but only hardware can confirm the lowering)
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
