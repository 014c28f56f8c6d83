#!/usr/bin/env python
"""Adjudicate the round-1 expsin spatial N=256 deviation (VERDICT item 4).

Round 1 measured 1.853e-9 on TPU vs the reference notebook's saved 1.28e-9
(MMSCaseExpSin_reghcstriple_convergence_study.ipynb cell 9).  This script
re-runs that single ladder level on CPU x64 (exact f64 arithmetic) with
(a) the unrolled BiCGStab at the study budget, (b) a doubled budget, and
(c) the while_loop solver, to split algorithm error from TPU f64-emulation
noise and from Krylov tolerance.  Writes studies/results/expsin_cpu_check.json.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from na_dd_tpu.harness.studies import STUDIES, choose_krylov_unroll, study_consts, _make_trial

REF_FINEST = 1.28e-9  # notebook cell 9 saved output, N=256
TPU_R1 = 1.853e-9  # REPRODUCTION.md round 1

N = 256
Tf = STUDIES["expsin"]["spatial_Tf"]
dt = (1.0 / N) ** 1.5
mc = study_consts("expsin")
budget = choose_krylov_unroll(N, dt, mc)

results = {}
for label, unroll in [
    (f"unrolled_{budget}", budget),
    (f"unrolled_{2 * budget}", 2 * budget),
    ("while_loop", None),
]:
    trial = _make_trial(STUDIES["expsin"]["case_cls"], N, 50.0, mc=mc, krylov_unroll=unroll)
    t0 = time.perf_counter()
    summary = trial.run_for_errors(Tf=Tf, dt=dt)
    err = float(summary.overall_combined_error)
    results[label] = err
    print(
        f"{label:16s} err={err:.10e}  vs ref {REF_FINEST:.3e} "
        f"(rel dev {abs(err - REF_FINEST) / REF_FINEST:.2e})  [{time.perf_counter() - t0:.1f}s]",
        flush=True,
    )

out = dict(
    N=N,
    dt=dt,
    Tf=Tf,
    reference=REF_FINEST,
    tpu_round1=TPU_R1,
    cpu_x64=results,
)
path = os.path.join(os.path.dirname(__file__), "results", "expsin_cpu_check.json")
os.makedirs(os.path.dirname(path), exist_ok=True)
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(f"wrote {path}")
