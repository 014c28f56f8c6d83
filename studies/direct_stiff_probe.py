#!/usr/bin/env python
"""Stiff-regime comparison: Krylov tier budgets vs the exact direct solver.

At coarse dt the trapezoidal Jacobian's stiffness number s = 4 dt D_max/h²
drives the Jacobi-BiCGStab iteration demand like sqrt(s): the tier table
(harness/studies.choose_krylov_unroll) reaches budget 96 at s>64 and 160 at
s>256, and compile cost grows ~linearly with the budget.  The BCR direct
solver (ops/direct_solve.py, linear_solver="direct") has NO iteration
budget — its cost and accuracy are independent of s — so the crossover
regime is exactly these coarse-dt levels.

This probe runs pol N=256 one-level simulations at escalating dt under
precision="mixed" (the production f64-accurate mode) with (a) the registry's
Krylov tier and (b) the direct solver, and reports cold/steady wall-clock,
final study error, and cross-solver agreement.  Both modes drive the SAME
Newton iteration to the same f64 tolerance, so the errors must agree to
rounding; the interesting output is the timing crossover and the
convergence-warning behavior.

Usage:  python studies/direct_stiff_probe.py [N]
Writes studies/results/direct_stiff_probe.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()
enable_persistent_compilation_cache()

import json
import time
import warnings

from na_dd_tpu.harness.studies import (
    STUDIES,
    _make_trial,
    choose_krylov_unroll,
    study_consts,
)


def run_one(cfg, mc, N, dt, Tf, **kw):
    trial = _make_trial(cfg["case_cls"], N, 50.0, mc=mc, precision="mixed", **kw)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        steady = time.perf_counter() - t0
    return {
        "error": float(summary.overall_combined_error),
        "cold_s": round(cold, 3),
        "steady_s": round(steady, 4),
        "krylov_warnings": len([w for w in caught if "Krylov" in str(w.message)]),
    }


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    study = "pol"
    cfg = STUDIES[study]
    mc = study_consts(study)

    out = {"study": study, "N": N, "configs": []}
    for dt, n_steps in [(1e-2, 10), (0.25, 5), (1.0, 5)]:
        Tf = dt * n_steps
        tier = choose_krylov_unroll(N, dt, mc)
        row = {"dt": dt, "Tf": Tf, "stiffness": 4 * dt * max(mc.DT, mc.Dl_max, mc.Dd_max) * N * N,
               "krylov_tier": tier}
        row["krylov"] = run_one(cfg, mc, N, dt, Tf, krylov_unroll=tier)
        row["direct"] = run_one(cfg, mc, N, dt, Tf, linear_solver="direct")
        ek, ed = row["krylov"]["error"], row["direct"]["error"]
        row["rel_disagreement"] = abs(ed - ek) / max(abs(ek), 1e-300)
        out["configs"].append(row)
        print(json.dumps(row))

    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "results"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results", "direct_stiff_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()
