#!/usr/bin/env python
"""Full reproduction of all six reference convergence-study notebooks.

Runs every study (spatial + temporal + one eta sweep) sequentially on the
attached accelerator, saving per-study JSON under studies/results/ and a
combined REPRODUCTION.md at the repo root.  Ordered so the cheap headline
studies land first; safe to interrupt (results are flushed per study).
"""

import json
import os
import sys
import time
import traceback

# repo root on sys.path without touching PYTHONPATH (which carries the
# device-plugin site dir on this machine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from na_dd_tpu.config import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from na_dd_tpu.harness.studies import (
    STUDIES,
    run_eta_study_batched,
    run_spatial_study,
    run_temporal_study,
)

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")
REPRO_MD = os.path.join(os.path.dirname(__file__), "..", "REPRODUCTION.md")

# Reference notebook outputs for comparison (BASELINE.md / SURVEY.md §6).
REFERENCE = {
    ("pol", "spatial"): dict(final_error=4.38e-9, final_rate=1.993, wallclock_finest=280.4),
    ("expsin", "spatial"): dict(final_error=1.28e-9, final_rate=2.004, wallclock_finest=247.1),
    ("nfsp_cpcsH2_TclcdH3", "spatial"): dict(final_error=1.18e-8, final_rate=1.961, wallclock_finest=24204.0),
    ("nfsp_cpcsH2_TclcdH2", "spatial"): dict(final_error=7.64e-8, final_rate=4.482, wallclock_finest=23092.0),
    ("nfsp_cpcsH1_TclcdH2", "spatial"): dict(final_error=8.65e-8, final_rate=1.054, wallclock_finest=24416.0),
    ("peaks_fast1e1", "spatial"): dict(final_error=1.33e-5, final_rate=2.092, wallclock_finest=25145.0),
    ("peaks_fast1e1", "temporal"): dict(final_error=1.34e-3, final_rate=1.996, wallclock_finest=2108.5),
}

# Ordered so already-cached/cheap studies land first; the stiff peaks
# temporal ladder (biggest unrolled programs -> slowest compiles) runs last.
PLAN = [
    ("pol", "spatial", dict(levels=8)),
    ("pol", "eta", {}),
    ("expsin", "spatial", dict(levels=8)),
    ("expsin", "temporal", {}),
    ("peaks_fast1e1", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH3", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH2", "spatial", dict(levels=8)),
    ("nfsp_cpcsH1_TclcdH2", "spatial", dict(levels=8)),
    ("pol", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH3", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH2", "temporal", {}),
    ("nfsp_cpcsH1_TclcdH2", "temporal", {}),
    ("peaks_fast1e1", "temporal", {}),
]


def _save_json(result):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"{result['study']}_{result['kind']}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)


def _append_md(lines):
    with open(REPRO_MD, "a") as f:
        f.write("\n".join(lines) + "\n")


def main():
    device = str(jax.devices()[0])
    with open(REPRO_MD, "w") as f:
        f.write(
            "# REPRODUCTION — the six reference convergence studies on TPU\n\n"
            f"Device: {device}; float64; PC-RegHCsTriple, eta=50; protocols and\n"
            "study constants identical to the reference notebooks.\n"
            "Reference wall-clocks are the saved notebook outputs (author CPU).\n\n"
            "| study | kind | final error (ours) | final error (ref) | final rate (ours/ref) "
            "| finest-level wall-clock ours vs ref |\n"
            "|---|---|---|---|---|---|\n"
        )

    for study, kind, kwargs in PLAN:
        print(f"\n########## {study} / {kind} ##########", flush=True)
        t0 = time.time()
        try:
            if kind == "spatial":
                res = run_spatial_study(study, **kwargs)
            elif kind == "temporal":
                res = run_temporal_study(study, **kwargs)
            else:
                # all eta values in one vmapped program (reference loops them)
                res = run_eta_study_batched(study, **kwargs)
        except Exception:
            traceback.print_exc()
            _append_md([f"| {study} | {kind} | FAILED | | | |"])
            continue
        res["total_wallclock_s"] = time.time() - t0
        _save_json(res)

        ref = REFERENCE.get((study, kind), {})
        final_err = res["errors"][-1]
        final_rate = res["rates"][-1] if res.get("rates") else float("nan")
        ours_t = res["wallclock_s"][-1]
        ref_e = ref.get("final_error")
        ref_r = ref.get("final_rate")
        ref_t = ref.get("wallclock_finest")
        _append_md(
            [
                f"| {study} | {kind} | {final_err:.3e} | "
                f"{(f'{ref_e:.3e}' if ref_e else '—')} | "
                f"{final_rate:.3f} / {(f'{ref_r:.3f}' if ref_r else '—')} | "
                f"{ours_t:.2f}s vs {(f'{ref_t:.0f}s ({ref_t/ours_t:.0f}x)' if ref_t else '—')} |"
            ]
        )
        print(f"########## done {study}/{kind} in {res['total_wallclock_s']:.1f}s", flush=True)


if __name__ == "__main__":
    main()
