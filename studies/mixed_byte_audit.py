#!/usr/bin/env python
"""Byte audit of the mixed_fast integrator step (the ROADMAP round-5 lead).

The bench A/B (2026-08-19) settled that mixed_fast is BANDWIDTH-bound:
1.24 GB moved per step at ~89% of v5e HBM peak, so the remaining path to
the 0.06 s target is removing bytes, not flops.  This script attributes
the step's cost-model bytes by compiling ABLATED variants of the SAME
step program on the chip and differencing XLA's post-optimization
`cost_analysis()` (the exact quantity bench.py's roofline reports):

* refinement pass cost       = refine=1 - refine=0
* final-check cost           = check=on - check=off
* whole-solve cost           = mixed - (precision=full, f64 krylov)
* coupling-source cost       = jvp - analytic (block-triangular sweep)
* dtype floor                = the same step in pure f32 (+pallas)

Writes studies/results/mixed_byte_audit.json incrementally (one entry per
compiled variant; an endpoint stall loses nothing).

    python studies/mixed_byte_audit.py          # TPU
    PROBE_ONLY=refine python studies/mixed_byte_audit.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

X64 = os.environ.get("NA_DD_TPU_X64", "1") != "0"
setup_x64()
if "--cpu" not in sys.argv:
    enable_persistent_compilation_cache()

from na_dd_tpu.harness.studies import _make_trial, choose_krylov_unroll, study_consts
from na_dd_tpu.mms import cases as mms_cases
from na_dd_tpu.mms.engine import state_from_mms_when

N = int(os.environ.get("PROBE_N", "256"))
ONLY = [s for s in os.environ.get("PROBE_ONLY", "").split(",") if s]

_OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "mixed_byte_audit.json"
)

results = {}


def _archive():
    merged = {}
    if os.path.exists(_OUT):
        try:
            with open(_OUT) as f:
                merged = json.load(f).get("variants", {})
        except Exception:
            merged = {}
    merged.update(results)
    with open(_OUT, "w") as f:
        json.dump(
            {
                "N": N,
                "x64": X64,
                "variants": merged,
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
            f,
            indent=1,
        )


def audit(label, **kw):
    if ONLY and not any(s in label for s in ONLY):
        return
    mc = study_consts("pol")
    dt = (1.0 / N) ** 1.5
    args = dict(krylov_unroll=choose_krylov_unroll(N, dt, mc), track_residuals=False)
    args.update(kw)
    trial = _make_trial(mms_cases.MMSCasePol, N, 50.0, mc=mc, **args)
    s0 = state_from_mms_when(mms_case=trial.mms_case, t=0.0, grid=trial.grid)
    step = jax.jit(trial.integrator.step_fn, static_argnums=1)
    t0 = time.perf_counter()
    compiled = step.lower(trial.grid, trial.ops, s0, 0.0, dt).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    row = {
        "bytes_accessed_mb": round(float(ca.get("bytes accessed", float("nan"))) / 1e6, 1),
        "flops_g": round(float(ca.get("flops", float("nan"))) / 1e9, 3),
        "transcendentals_m": round(
            float(ca.get("transcendentals", 0.0)) / 1e6, 3
        ),
        "compile_s": round(compile_s, 1),
    }
    results[label] = row
    print(f"[audit {label:28s}] {row}", flush=True)
    _archive()


def main():
    print(f"device={jax.devices()[0]} N={N} x64={X64}", flush=True)
    mixed = dict(precision="mixed", stencil_backend="pallas",
                 mixed_final_check=False)
    if X64:
        audit("mixed_r1_nocheck", mixed_refine=1, **mixed)
        audit("mixed_r0_nocheck", mixed_refine=0, **mixed)
        audit("mixed_r2_nocheck", mixed_refine=2, **mixed)
        audit("mixed_r1_check", mixed_refine=1, precision="mixed",
              stencil_backend="pallas", mixed_final_check=True)
        audit("mixed_r1_nocheck_df", mixed_refine=1, mixed_df=True, **mixed)
        audit("mixed_r1_analytic_triple", mixed_refine=1,
              coupling_source="analytic", **mixed)
        # pin the baseline explicitly: without these the row would inherit
        # NA_DD_TPU_PRECISION / NA_DD_TPU_STENCIL from the environment and
        # silently record a mixed/pallas step under the f64 label (ADVICE r4)
        audit("f64_full_jnp", precision="full", stencil_backend="jnp")
        # round 5: the f32-state DF step — the whole point is the byte count
        # (target: well under the mixed r0 floor of 1041 MB/step)
        audit("df_r1_nocheck", precision="df", stencil_backend="pallas",
              mixed_refine=1, mixed_final_check=False)
        audit("df_r0_nocheck", precision="df", stencil_backend="pallas",
              mixed_refine=0, mixed_final_check=False)
    else:
        audit("f32_pallas", stencil_backend="pallas")


if __name__ == "__main__":
    main()
