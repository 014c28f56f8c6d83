#!/usr/bin/env python
"""CLI replacement for the six reference convergence-study notebooks.

Examples:
    python studies/run_study.py --study expsin --kind spatial --levels 6
    python studies/run_study.py --study pol --kind temporal
    python studies/run_study.py --study pol --kind eta
    python studies/run_study.py --all --levels 8        # full reproduction

Results are printed and archived as JSON under studies/results/.
"""

import argparse
import json
import os
import sys
import time

# repo root on sys.path without touching PYTHONPATH (which carries the
# device-plugin site dir on this machine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()  # f64 by default; NA_DD_TPU_X64=0 selects the f32 production mode
enable_persistent_compilation_cache()

from na_dd_tpu.harness.rates import report_on_rates
from na_dd_tpu.harness.studies import (
    STUDIES,
    run_eta_study,
    run_eta_study_batched,
    run_spatial_study,
    run_temporal_study,
)

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def _save(result: dict):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(
        RESULTS_DIR, f"{result['study']}_{result['kind']}_{int(time.time())}.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"saved -> {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--study", choices=sorted(STUDIES), default="expsin")
    p.add_argument("--kind", choices=["spatial", "temporal", "eta"], default="spatial")
    p.add_argument("--levels", type=int, default=None, help="ladder depth override")
    p.add_argument("--all", action="store_true", help="run all six studies, all kinds")
    p.add_argument("--expected-rate", type=float, default=2.0)
    p.add_argument("--serial-eta", action="store_true",
                   help="run the eta sweep serially instead of vmapped")
    p.add_argument("--batched", action="store_true",
                   help="spatial ladders: pad-to-max + vmap — ALL levels in "
                        "ONE XLA program/compile (harness/batched_ladder.py)")
    p.add_argument("--shared-compile", action="store_true",
                   help="temporal ladders: traced-dt padded-scan mode — one "
                        "XLA compile per grid size instead of per level")
    p.add_argument("--measure-steady", action="store_true",
                   help="re-run each level warm for a compile-free time")
    args = p.parse_args()

    def run_one(study, kind, levels):
        print(f"\n===== {study} / {kind} =====")
        if kind == "spatial":
            if args.batched:
                from na_dd_tpu.harness.batched_ladder import run_spatial_ladder_batched

                res = run_spatial_ladder_batched(
                    study, levels=levels or 8,
                    measure_steady=args.measure_steady,
                )
            else:
                res = run_spatial_study(study, levels=levels or 8,
                                        measure_steady=args.measure_steady)
        elif kind == "temporal":
            res = run_temporal_study(study, levels=levels,
                                     shared_compile=args.shared_compile,
                                     measure_steady=args.measure_steady)
        else:
            # the vmapped sweep runs all seven eta values in ONE XLA program;
            # --serial-eta keeps the reference's one-run-per-eta loop
            runner = run_eta_study if args.serial_eta else run_eta_study_batched
            res = runner(study)
        if kind in ("spatial", "temporal") and len(res["errors"]) >= 3:
            report_on_rates(
                res["errors"],
                expected_rate=args.expected_rate,
                tolerance=0.3,
                title=f"{study} {kind} rates",
            )
        _save(res)
        return res

    if args.all:
        for study in STUDIES:
            for kind in ("spatial", "temporal", "eta"):
                run_one(study, kind, args.levels)
    else:
        run_one(args.study, args.kind, args.levels)


if __name__ == "__main__":
    main()
