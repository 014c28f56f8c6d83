#!/usr/bin/env python
"""Adjudicate ONE 3-D study level on CPU x64 (exact f64 arithmetic).

Extends the TPU-noise defense (studies/adjudicate_level.py, VERDICT r3
task 5) to the 3-D self-reference ladders (VERDICT r4 task 6): the 3-D
study is a beyond-reference capability with no external golden values, so
the adjudication standard is CPU-x64 agreement — TPU f64 emulation is
program-shape-dependent (docs/axon_f64_scan_fusion_bug.md) while CPU x64 is
exact f64; a TPU level error that deviates from its CPU-x64 twin beyond the
tolerance is flagged as emulation noise in the archived JSON (and a CPU
re-run that DISAGREES with itself across precisions would indicate a real
bug, not noise).

Runs in a fresh CPU-forced subprocess (the study driver's own process is
bound to the TPU backend).  Recomputes the level with precision="full"
(pure f64) regardless of the TPU run's precision mode — the modes agree far
inside the tolerance by construction (mixed refinement contracts to the f64
fixpoint; tests/test_mixed_precision.py).

Usage:
    python studies/adjudicate_three_d.py --N 16 --dt 1e-2 --tf 0.02 \
        --eta 50 --variant reghcs --tpu-error 1.234e-5

Prints one machine-readable line:  ADJUDICATION_JSON: {...}
Exit 0 = adjudicated pass, 2 = adjudicated FAIL, 3 = protocol error.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the adjudicator's whole point is exact f64 on CPU
os.environ["NA_DD_TPU_PRECISION"] = "full"
os.environ["NA_DD_TPU_STENCIL"] = "jnp"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

#: relative agreement demanded between the TPU level error and its CPU-x64
#: twin.  Calibrated to the MEASURED TPU f64-emulation envelope, not the
#: CPU parity gate: the mixed temporal ladder's level 0 (N=16, 2 steps)
#: deviates 2.0e-4 RELATIVE from its bit-identical-across-precisions CPU
#: twin (6.7e-9 absolute on the 3.35e-5 floored error — consistent with
#: the documented ~2e-9/step scan-fusion emulation drift,
#: docs/axon_f64_scan_fusion_bug.md; measured 2026-08-20, and CPU mixed ==
#: CPU full to the last bit, so the deviation is ALL emulation noise).
#: The gate's job is catching poisoned numbers — the known pathological
#: shapes drift ~1e-2 relative (the peaks N=128 unroll-8 case) — so it sits
#: an order below that and an order above the measured noise floor.
TOL = 1e-3


def run_level(args) -> float:
    import numpy as np

    from na_dd_tpu.models import Model02, default_model_consts
    from na_dd_tpu.three_d import MMSCaseExpSin3, make_setup3
    from na_dd_tpu.three_d.harness import build_runner3

    MC = default_model_consts._replace(
        K1=1e-3, K2=1e-3, K3=1e-3, K4=1e-3, Dl_max=1e-5, Kd=1e-2, Sd=1.0,
        Dd_max=1e-6,
    )
    g, case, _field, integ = make_setup3(
        MMSCaseExpSin3,
        N=args.N,
        model=Model02(MC),
        variant=args.variant,
        eta=args.eta,
        integrator_params=dict(num_newton_steps=2),
    )
    run, s0 = build_runner3(g, case, integ, Tf=args.tf, dt=args.dt)
    res = jax.block_until_ready(run(s0))
    _s_fin, worst, conv, hcs_ok, _per = res
    if not (bool(conv) and bool(hcs_ok)):
        raise SystemExit(3)
    return float(np.sqrt(worst))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, required=True)
    ap.add_argument("--dt", type=float, required=True)
    ap.add_argument("--tf", type=float, required=True)
    ap.add_argument("--eta", type=float, default=50.0)
    ap.add_argument("--variant", default="reghcs", choices=["cs", "hcs", "reghcs"])
    ap.add_argument(
        "--tpu-error", type=float, required=True,
        help="the TPU-computed combined-H error of the same level",
    )
    args = ap.parse_args()

    t0 = time.perf_counter()
    cpu_err = run_level(args)
    wall = time.perf_counter() - t0
    rel = (
        abs(cpu_err - args.tpu_error) / cpu_err
        if cpu_err != 0.0
        else (0.0 if args.tpu_error == 0.0 else float("inf"))
    )
    out = dict(
        N=args.N, dt=args.dt, Tf=args.tf, eta=args.eta, variant=args.variant,
        cpu_error=cpu_err, tpu_error=args.tpu_error, rel_dev=rel,
        passed=rel <= TOL, tol=TOL, wallclock_s=round(wall, 1),
        backend="cpu-x64",
    )
    print("ADJUDICATION_JSON: " + json.dumps(out), flush=True)
    if not out["passed"]:
        sys.exit(2)


if __name__ == "__main__":
    main()
