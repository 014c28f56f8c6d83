#!/usr/bin/env python
"""Full reproduction of all six reference convergence-study notebooks.

Runs every study (spatial + temporal + eta sweep, 18 runs total) sequentially
on the attached accelerator, saving per-study JSON under studies/results/ and
a combined REPRODUCTION.md at the repo root with per-level comparison against
the notebooks' saved outputs (studies/reference_values.py).  Safe to
interrupt: results are flushed per study and completed levels replay from the
persistent compilation cache.
"""

import json
import math
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
    run_eta_study_batched,
    run_spatial_study,
    run_temporal_study,
)
from studies.reference_values import (
    REFERENCE_ERRORS,
    REFERENCE_FINAL_RATE,
    REFERENCE_FINEST_WALLCLOCK,
)

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")
REPRO_MD = os.path.join(os.path.dirname(__file__), "..", "REPRODUCTION.md")

# Ordered so the cheap/headline studies land first; heavy Tf=1 spatial
# ladders in the middle; the long peaks temporal ladder last.
PLAN = [
    ("pol", "spatial", dict(levels=8)),
    ("pol", "temporal", {}),
    ("pol", "eta", {}),
    ("expsin", "spatial", dict(levels=8)),
    ("expsin", "temporal", {}),
    ("expsin", "eta", {}),
    ("nfsp_cpcsH2_TclcdH3", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH3", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH3", "eta", {}),
    ("nfsp_cpcsH2_TclcdH2", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH2", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH2", "eta", {}),
    ("nfsp_cpcsH1_TclcdH2", "spatial", dict(levels=8)),
    ("nfsp_cpcsH1_TclcdH2", "temporal", {}),
    ("nfsp_cpcsH1_TclcdH2", "eta", {}),
    ("peaks_fast1e1", "spatial", dict(levels=8)),
    ("peaks_fast1e1", "eta", {}),
    ("peaks_fast1e1", "temporal", {}),
]


def _save_json(result):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"{result['study']}_{result['kind']}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)


def _max_rel_dev(ours, ref):
    """Max per-level relative deviation vs the reference list (nan-safe)."""
    devs = []
    for a, b in zip(ours, ref):
        if b == 0.0:
            devs.append(0.0 if a == 0.0 else math.inf)
        else:
            devs.append(abs(a - b) / abs(b))
    return max(devs) if devs else float("nan")


def main():
    device = str(jax.devices()[0])
    rows = []
    t_start = time.time()

    for study, kind, kwargs in PLAN:
        print(f"\n########## {study} / {kind} ##########", flush=True)
        t0 = time.time()
        try:
            if kind == "spatial":
                res = run_spatial_study(study, measure_steady=True, **kwargs)
            elif kind == "temporal":
                res = run_temporal_study(study, measure_steady=True, **kwargs)
            else:
                # all eta values in one vmapped program (reference loops them)
                res = run_eta_study_batched(study, **kwargs)
        except Exception:
            traceback.print_exc()
            rows.append((study, kind, None))
            continue
        res["total_wallclock_s"] = time.time() - t0

        ref_errors = REFERENCE_ERRORS.get((study, kind.replace("eta_batched", "eta")))
        if ref_errors:
            res["reference_errors"] = ref_errors
            res["max_rel_dev_vs_reference"] = _max_rel_dev(res["errors"], ref_errors)
        _save_json(res)
        rows.append((study, kind, res))
        print(
            f"########## done {study}/{kind} in {res['total_wallclock_s']:.1f}s "
            f"max_rel_dev={res.get('max_rel_dev_vs_reference', float('nan')):.2e}",
            flush=True,
        )

    # ---- REPRODUCTION.md ----
    lines = [
        "# REPRODUCTION — the six reference convergence studies on TPU",
        "",
        f"Device: {device}; float64; PC-RegHCsTriple, eta=50 (eta studies sweep",
        "10..1000); protocols and per-notebook model constants identical to the",
        "reference notebooks (see studies/reference_values.py for the extracted",
        "ground truth and protocol notes).  'max rel dev' is the worst per-level",
        "relative deviation of our error vs the notebook's saved output across",
        "the WHOLE ladder, not just the finest level.  'steady' is the warm-cache",
        "compile-free wall-clock of the finest level (the honest apples-to-apples",
        "number vs the reference's serial CPU time); 'first' includes one-time",
        "XLA compilation / cache loading.",
        "",
        "| study | kind | levels | final error (ours) | final error (ref) | "
        "max rel dev | final rate (ours/ref) | finest steady vs ref | speedup |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for study, kind, res in rows:
        kindkey = "eta" if kind.startswith("eta") else kind
        if res is None:
            lines.append(f"| {study} | {kindkey} | FAILED | | | | | | |")
            continue
        ref_errors = REFERENCE_ERRORS.get((study, kindkey), [])
        ref_rate = REFERENCE_FINAL_RATE.get((study, kindkey))
        ref_t = REFERENCE_FINEST_WALLCLOCK.get((study, kindkey))
        final_err = res["errors"][-1]
        final_rate = res["rates"][-1] if res.get("rates") else float("nan")
        steady = (res.get("steady_s") or res["wallclock_s"])[-1]
        dev = res.get("max_rel_dev_vs_reference", float("nan"))
        lines.append(
            f"| {study} | {kindkey} | {len(res['errors'])} | {final_err:.3e} | "
            f"{(f'{ref_errors[-1]:.3e}' if ref_errors else '—')} | "
            f"{dev:.1e} | "
            f"{final_rate:.3f} / {(f'{ref_rate:.3f}' if ref_rate else '—')} | "
            f"{steady:.2f}s vs {(f'{ref_t:.0f}s' if ref_t else '—')} | "
            f"{(f'{ref_t / steady:.0f}x' if ref_t and steady > 0 else '—')} |"
        )

    lines += [
        "",
        "## Per-level detail",
        "",
        "Full per-level errors, reference values, first-run and steady",
        "wall-clocks are archived in `studies/results/*.json`",
        "(`errors` / `reference_errors` / `wallclock_s` / `steady_s`).",
        "",
        "## Notes",
        "",
        "- Eta sweeps run all seven regularization factors in ONE vmapped XLA",
        "  program (the reference loops them serially); the sweep's wall-clock",
        "  column is the whole batch.",
        "- The peaks temporal ladder reproduces the reference protocol exactly,",
        "  including its quirk: the notebook recomputes N = ceil(1/(2 dt)) per",
        "  level (FIXED_GRID_SIZE=200 is dead code in cell 11) and its first",
        "  two levels use an N=1 all-boundary grid whose error is identically",
        "  0.0 (every node is pinned to the boundary value and the manufactured",
        "  solution vanishes there).",
        "- Temporal ladders whose rates are nan/negative reproduce the",
        "  reference's own behavior (errors sitting on the spatial floor).",
        f"- Total reproduction wall-clock: {time.time() - t_start:.0f}s",
        "  (one TPU v5e chip, f64, persistent compile cache).",
    ]
    with open(REPRO_MD, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {REPRO_MD}", flush=True)


if __name__ == "__main__":
    main()
