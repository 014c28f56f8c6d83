#!/usr/bin/env python
"""Adjudicate ONE study level on CPU x64 (exact f64 arithmetic).

The TPU parity defense-in-depth (VERDICT r3 task 5): TPU f64 emulation is
program-shape-dependent (docs/axon_f64_scan_fusion_bug.md), so whenever a
TPU study level deviates from the reference beyond the 1e-8 gate, the study
driver re-runs the worst level HERE — a fresh CPU-forced subprocess (the
driver's own process is bound to the TPU backend) — and records the verdict
in the study JSON + REPRODUCTION.md.  CPU x64 has reproduced the reference
to <=1e-8 relative for every solver shape measured so far
(tests/test_parity_golden.py, studies/expsin_cpu_check.json, the peaks
bisect); a CPU failure would therefore indicate a genuine algorithm/protocol
bug, not emulation noise.

Usage:  python studies/adjudicate_level.py <study> <spatial|temporal|eta> <level>

Prints one machine-readable line:  ADJUDICATION_JSON: {...}
Exit code 0 = adjudicated pass, 2 = adjudicated FAIL, 3 = usage/protocol error.
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

GATE = 1e-8  # the repo-wide reference-parity gate (relative)


def level_cost(study: str, kind: str, level: int) -> float:
    """Node-steps estimate of the level (cost model for the driver's budget
    pick; import-light so the driver can call it without touching jax)."""
    # local import so the TPU driver can import this module cheaply
    from na_dd_tpu.harness.studies import STUDIES

    cfg = STUDIES[study]
    if kind == "spatial":
        N = 2 * 2**level
        dt = (1.0 / N) ** 1.5
        steps = math.ceil(cfg["spatial_Tf"] / dt)
    elif kind == "temporal":
        tcfg = cfg["temporal"]
        dt = tcfg["base_dt"] / 2**level
        n_of_dt = tcfg.get("N_of_dt")
        N = n_of_dt(dt) if n_of_dt is not None else tcfg["N"]
        if N < 2:
            return 0.0
        steps = math.ceil(tcfg["Tf"] / dt)
    else:  # eta sweep: fixed N=32, dt=5e-4, Tf=0.01 protocol
        N, steps = 32, 20
    return steps * (N + 1) ** 2


def run_level(study: str, kind: str, level: int) -> dict:
    from na_dd_tpu.harness.studies import (
        ETA_LADDER,
        STUDIES,
        _make_trial,
        _study_unroll,
        study_consts,
    )
    from studies.reference_values import REFERENCE_ERRORS

    cfg = STUDIES[study]
    mc = study_consts(study)
    ref_list = REFERENCE_ERRORS.get((study, kind))
    ref = ref_list[level] if ref_list and level < len(ref_list) else None

    t0 = time.perf_counter()
    if kind == "spatial":
        N = 2 * 2**level
        dt = (1.0 / N) ** 1.5
        Tf = cfg["spatial_Tf"]
        trial = _make_trial(
            cfg["case_cls"], N, 50.0, mc=mc,
            krylov_unroll=_study_unroll(cfg, N, dt, mc),
        )
        err = float(trial.run_for_errors(Tf=Tf, dt=dt).overall_combined_error)
    elif kind == "temporal":
        tcfg = cfg["temporal"]
        dt = tcfg["base_dt"] / 2**level
        n_of_dt = tcfg.get("N_of_dt")
        N = n_of_dt(dt) if n_of_dt is not None else tcfg["N"]
        Tf = tcfg["Tf"]
        if N < 2:
            err = 0.0  # degenerate all-boundary grid (peaks quirk)
        else:
            trial = _make_trial(
                cfg["case_cls"], N, 50.0, mc=mc,
                krylov_unroll=_study_unroll(cfg, N, dt, mc),
            )
            err = float(trial.run_for_errors(Tf=Tf, dt=dt).overall_combined_error)
    elif kind == "eta":
        from na_dd_tpu.harness.studies import run_eta_study_batched

        eta = ETA_LADDER[level]
        res = run_eta_study_batched(study, etas=[eta], verbose=False)
        err = float(res["errors"][0])
        N, dt, Tf = res["N"], res["dt"], res["Tf"]
    else:
        raise SystemExit(f"unknown kind {kind!r}")

    wall = time.perf_counter() - t0
    quant_digits = None
    if ref is None:
        rel = None
        ok = None
    elif ref == 0.0:
        rel = 0.0 if err == 0.0 else float("inf")
        ok = err == 0.0
    else:
        rel = abs(err - ref) / abs(ref)
        # The reference values are the notebooks' PRINTED outputs: the pol
        # notebook quotes 6 significant digits (others 13 — see
        # studies/reference_values.py), so the best achievable agreement
        # against a 6-digit quote is its decimal quantization (~5e-7
        # relative), not the 1e-8 gate.  Verdict: pass if within the gate OR
        # if the CPU value rounds to the quoted reference at its own printed
        # precision (i.e. agreement is exact to every digit the notebook
        # saved).
        quant_digits = next(
            (d + 1 for d in range(5, 17) if float(f"{ref:.{d}e}") == ref), 17
        )
        rounds_to_ref = float(f"{err:.{quant_digits - 1}e}") == ref
        ok = rel <= GATE or rounds_to_ref
    return dict(
        study=study, kind=kind, level=level, N=N, dt=dt, Tf=Tf,
        cpu_error=err, reference=ref, cpu_rel_dev=rel, passed=ok,
        reference_quoted_digits=quant_digits,
        gate=GATE, wallclock_s=round(wall, 1), backend="cpu-x64",
    )


def main():
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    study, kind, level = sys.argv[1], sys.argv[2], int(sys.argv[3])
    out = run_level(study, kind, level)
    print("ADJUDICATION_JSON: " + json.dumps(out), flush=True)
    if out["passed"] is False:
        sys.exit(2)


if __name__ == "__main__":
    main()
